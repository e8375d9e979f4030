package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLite, IcebergLite}

/** UNIVERSAL FORMAT — `delta.universalFormat.enabledFormats = iceberg`:
  * the table keeps ONE copy of the data; every Delta commit regenerates
  * an Iceberg metadata face beside the log so Iceberg-only readers
  * follow along. Delta is the source of truth; states the face cannot
  * express (live DVs) skip the sync and the next expressible commit
  * catches up.
  */
class UniformSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String)].collect().sortBy(_._1).toSeq

  test("enable generates the face; appends and overwrites keep it in " +
    "sync; both faces read identical rows off the same parquet files") {
    val t = newTable("graft_uniform")
    val a = (0L until 100L).map(k => (k, s"a$k")).toDF("k", "s")
    DeltaLite.commit(spark, t, a.repartition(4))
    DeltaLite.setTableProperty(spark, t,
      "delta.universalFormat.enabledFormats", "iceberg")
    // the face exists at enable time and matches
    assert(sortedRows(IcebergLite.read(spark, t)) ==
      sortedRows(DeltaLite.read(spark, t)))

    DeltaLite.commit(spark, t,
      (100L until 120L).map(k => (k, s"b$k")).toDF("k", "s"))
    assert(IcebergLite.read(spark, t).count() == 120L)
    assert(sortedRows(IcebergLite.read(spark, t)) ==
      sortedRows(DeltaLite.read(spark, t)))

    DeltaLite.commit(spark, t,
      (0L until 10L).map(k => (k, s"c$k")).toDF("k", "s"),
      overwrite = true)
    assert(sortedRows(IcebergLite.read(spark, t)) ==
      sortedRows(DeltaLite.read(spark, t)))
    assert(IcebergLite.read(spark, t).count() == 10L)

    // the face accumulates its own snapshot history across syncs
    assert(IcebergLite.history(spark, t).count() >= 3L)
    // zero data copies: every face-listed file is a Delta-listed file
    val root = new org.apache.hadoop.fs.Path(t)
    val deltaFiles = DeltaLite.snapshot(spark, t).files
      .map(p => new org.apache.hadoop.fs.Path(root, p).toUri.getPath).toSet
    val faceFiles = IcebergLite.snapshot(spark, t).files
      .map { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        (if (hp.isAbsolute) hp
         else new org.apache.hadoop.fs.Path(root, p)).toUri.getPath
      }.toSet
    assert(faceFiles == deltaFiles,
      s"the face must list exactly the Delta files:\n$faceFiles\n$deltaFiles")
  }

  test("DV deletes and the uniform face exclude each other in BOTH " +
    "directions: deleteVectors refuses on a uniform table (naming the " +
    "copy-on-write path, which syncs), enabling uniform refuses over " +
    "live DVs until a purge folds them") {
    val t = newTable("graft_uniform_dv")
    DeltaLite.commit(spark, t,
      (0L until 50L).map(k => (k, s"v$k")).toDF("k", "s"))
    DeltaLite.setTableProperty(spark, t,
      "delta.universalFormat.enabledFormats", "iceberg")
    assert(IcebergLite.read(spark, t).count() == 50L)

    // a merge-on-read delete would silently diverge the Iceberg face
    // (its readers would keep seeing the deleted rows) — refused, with
    // the face-syncing verb named
    val e = intercept[IllegalArgumentException](
      DeltaLite.deleteVectors(spark, t, Seq(7L).toDF("k"), Seq("k")))
    assert(e.getMessage.contains("selectiveDelete"))
    assert(DeltaLite.read(spark, t).count() == 50L)
    assert(IcebergLite.read(spark, t).count() == 50L)

    // the copy-on-write delete works AND syncs the face in one commit
    DeltaLite.selectiveDelete(spark, t, Seq(7L).toDF("k"), Seq("k"))
    assert(DeltaLite.read(spark, t).count() == 49L)
    assert(IcebergLite.read(spark, t).count() == 49L)

    // the mirror: live DVs block ENABLING uniform; purge unblocks
    val t2 = newTable("graft_uniform_dv2")
    DeltaLite.commit(spark, t2,
      (0L until 20L).map(k => (k, s"v$k")).toDF("k", "s"))
    DeltaLite.deleteVectors(spark, t2, Seq(3L).toDF("k"), Seq("k"))
    val e2 = intercept[IllegalArgumentException](
      DeltaLite.setTableProperty(spark, t2,
        "delta.universalFormat.enabledFormats", "iceberg"))
    assert(e2.getMessage.contains("purgeDvs"))
    DeltaLite.purgeDvs(spark, t2)
    DeltaLite.setTableProperty(spark, t2,
      "delta.universalFormat.enabledFormats", "iceberg")
    assert(IcebergLite.read(spark, t2).count() == 19L)
  }
}
