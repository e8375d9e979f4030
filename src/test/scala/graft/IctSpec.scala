package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DeltaLite

/** IN-COMMIT TIMESTAMPS — the `inCommitTimestamp` writer feature: the
  * authoritative commit clock lives inside each commit's leading
  * commitInfo, strictly monotonic per table, instead of in filesystem
  * mtimes (which object stores rewrite) or wall clocks (which drift
  * backward across writers). Every commit path on an enabled table must
  * stamp — one missing stamp breaks monotonic TIMESTAMP AS OF
  * resolution for every other engine reading the table.
  */
class IctSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def ictOf(t: String, v: Long): Option[Long] =
    DeltaLite.history(spark, t)
      .filter(col("version") === v)
      .select("in_commit_timestamp").collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))

  test("enable stamps its own commit equal to the recorded enablement " +
    "timestamp; later commits stamp strictly increasing; TIMESTAMP AS " +
    "OF at each stamp resolves exactly that snapshot; pre-enable " +
    "versions carry no stamp") {
    val t = newTable("graft_ict")
    val df = (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s")
    DeltaLite.commit(spark, t, df.filter($"k" < 50))        // v0
    val ev = DeltaLite.enableInCommitTimestamps(spark, t)   // v1
    DeltaLite.commit(spark, t, df.filter($"k" >= 50))       // v2
    DeltaLite.optimizeCompact(spark, t, targetFiles = 1)    // v3

    assert(ictOf(t, 0).isEmpty, "pre-enable commits carry no stamp")
    val s1 = ictOf(t, ev).get
    val s2 = ictOf(t, 2).get
    val s3 = ictOf(t, 3).get
    assert(s1 < s2 && s2 < s3, s"stamps must strictly increase: $s1 $s2 $s3")

    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.writerFeatures.contains("inCommitTimestamp"))
    assert(snap.configuration.get(DeltaLite.IctProperty).contains("true"))
    assert(snap.configuration
      .get("delta.inCommitTimestampEnablementVersion").contains(ev.toString))
    assert(snap.configuration
      .get("delta.inCommitTimestampEnablementTimestamp")
      .contains(s1.toString),
      "the enablement property must equal the enablement commit's stamp")

    assert(DeltaLite.readAsOf(spark, t, s1).count() == 50L)
    assert(DeltaLite.readAsOf(spark, t, s2).count() == 100L)
    assert(DeltaLite.readAsOf(spark, t, s3).count() == 100L)
    // between two stamps resolves the EARLIER version (s2-1 ≥ s1)
    assert(DeltaLite.readAsOf(spark, t, s2 - 1).count() == 50L)
  }

  test("monotonicity beats a skewed clock: a forged far-future tip " +
    "stamp forces the next commit one past it; metaData-less commit " +
    "paths stamp too") {
    val t = newTable("graft_ict_skew")
    val df = (0L until 40L).map(k => (k, k % 5)).toDF("k", "grp")
    DeltaLite.commit(spark, t, df)
    DeltaLite.enableInCommitTimestamps(spark, t)
    // a foreign writer with a fast clock stamped the tip way ahead
    val future = System.currentTimeMillis() + 1000L * 86400 * 365
    val v = 2L
    Files.write(
      java.nio.file.Paths.get(t, "_delta_log", f"$v%020d.json"),
      (s"""{"commitInfo":{"operation":"FOREIGN","timestamp":$future,"inCommitTimestamp":$future}}""" +
        "\n").getBytes("UTF-8"))
    DeltaLite.commit(spark, t, df.filter($"k" < 2))          // v3
    assert(ictOf(t, 3).contains(future + 1),
      "our stamp must sit one past the skewed tip, not at wall clock")
    // deleteVectors publishes a metaData-less commit — enablement must
    // still be detected (from the tip's stamp) and the commit stamped
    DeltaLite.deleteVectors(spark, t,
      Seq(1L).toDF("k"), Seq("k"))                            // v4
    assert(ictOf(t, 4).contains(future + 2),
      "metaData-less commits on an enabled table must stamp")
  }

  test("forged foreign ICT table reads and continues; disabling stops " +
    "stamping from the disable commit on") {
    val t = newTable("graft_ict_foreign")
    val df = (0L until 30L).map(k => (k, s"x$k")).toDF("k", "s")
    DeltaLite.commit(spark, t, df)
    DeltaLite.enableInCommitTimestamps(spark, t)
    DeltaLite.commit(spark, t, df.filter($"k" === 0L))
    assert(ictOf(t, 2).nonEmpty)

    // disable: the property flips false; stamping stops at once (the
    // disable commit's own metaData is authoritative)
    DeltaLite.setTableProperty(spark, t, DeltaLite.IctProperty, "false")
    assert(ictOf(t, 3).isEmpty, "the disable commit itself must not stamp")
    DeltaLite.commit(spark, t, df.filter($"k" === 1L))
    assert(ictOf(t, 4).isEmpty, "commits after disable must not stamp")

    // re-enable refuses nothing — fresh stamps resume monotonic over
    // wall clock
    DeltaLite.enableInCommitTimestamps(spark, t)
    assert(ictOf(t, 5).nonEmpty)
  }

  test("vacuumRetainHours keeps the version a reader AT the cutoff " +
    "still resolves (files removed inside the window survive); " +
    "zero-stamp logs refuse the wall-clock flavor") {
    val t = newTable("graft_ict_vac")
    val df = (0L until 60L).map(k => (k, s"v$k")).toDF("k", "s")
    DeltaLite.commit(spark, t, df)                           // v0 (stamp 0)
    intercept[IllegalArgumentException](
      DeltaLite.vacuumRetainHours(spark, t, 168.0))
    DeltaLite.enableInCommitTimestamps(spark, t)             // v1
    DeltaLite.commit(spark, t, df.filter($"k" < 40),
      overwrite = true)                                      // v2
    val s2 = ictOf(t, 2).get
    Thread.sleep(1200)
    DeltaLite.commit(spark, t, df.filter($"k" < 20),
      overwrite = true)                                      // v3
    val s3 = ictOf(t, 3).get
    // cutoff between the two stamps: a reader at `mid` resolves v2, so
    // v2's files must SURVIVE even though v3 removed them inside the
    // window; v0's files (removed before the window) reap
    val mid = (s2 + s3) / 2
    val hours = (System.currentTimeMillis() - mid) / 3600000.0
    val reaped = DeltaLite.vacuumRetainHours(spark, t, hours)
    assert(reaped.nonEmpty, "the pre-window v0 files must reap")
    assert(DeltaLite.readAsOf(spark, t, mid).count() == 40L,
      "the version current at the cutoff must stay readable")
    assert(DeltaLite.read(spark, t).count() == 20L)
  }
}
