package graft.harness

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan (post-AQE when it can be executed
  * cheaply) for one or more `SparkEntry.queries` entries — the
  * `.explain("formatted")` loop the build brief asks for, as a runnable
  * main instead of ad-hoc shell sessions.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_QUERIES=a,b \
  *          runMain graft.harness.PlanProbe [--run]
  * `--run` executes each query against the noop sink first so the printed
  * plan carries AQE's final shape (reused exchanges, broadcast demotions).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val run = args.contains("--run")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = graft.SparkEntry.querySubset
      .getOrElse(sys.error("set SPARK_GRAFT_QUERIES"))
    for ((name, fn) <- graft.SparkEntry.queries if wanted(name)) {
      println(s"========== $name @ $dir ==========")
      val df = fn(spark, dir)
      if (run) {
        df.write.format("noop").mode("overwrite").save()
        // after execution the AQE plan is final: print the executed plan
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
