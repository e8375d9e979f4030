ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lakehouse_dba_toolsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The round driver keeps only a 2000-char stdout TAIL of `sbt "runMain
// graft.Bench"` and parses its last line as JSON. Two sbt decorations broke
// that for four rounds (BENCH_r15..r18 all record "parsed": null):
// (1) forked-process stdout was routed through sbt's logger, prefixing
//     every line with "[info] " — StdoutOutput passes it through raw;
// (2) sbt appended "[success] Total time: ..." AFTER the program's final
//     line — showSuccess/showTiming := false suppress it (exit codes are
//     unaffected; the driver's rc field still works).
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// read by sbt's command engine, not by tasks — lint can't see that
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
