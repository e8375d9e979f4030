package graft

import org.apache.spark.sql.functions._

import graft.sources.DeltaLite

/** The symmetric-diff CDC classifier (sources/ChangeFeed) — the r14
  * rewrite of both formats' `changes()` cancellation. Pins the exact
  * exceptAll semantics the count-aggregation formulation must preserve:
  * MULTIPLICITY (duplicate identical rows diff by surplus count) and
  * NULL-SAFE field comparison (null fields compare equal, so an
  * unchanged null-bearing row cancels).
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(): String =
    java.nio.file.Files.createTempDirectory("graft_cfeed").toString + "/t"

  test("multiplicity: deleting one of two identical rows emits exactly " +
    "one delete event") {
    val t = newTable()
    // two IDENTICAL rows for k=1 (no dedup on commit), one for k=2
    DeltaLite.commit(spark, t,
      Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "s").coalesce(1))
    // overwrite keeping ONE copy of the k=1 row
    DeltaLite.commit(spark, t,
      Seq((1L, "x"), (2L, "y")).toDF("k", "s").coalesce(1),
      overwrite = true)
    val ch = DeltaLite.changes(spark, t, 0L, 1L, Seq("k"))
      .select("k", "s", "_change_type")
      .as[(Long, String, String)].collect().toList
    assert(ch == List((1L, "x", "delete")),
      s"surplus of one identical row = one delete, got $ch")
  }

  test("null-safe comparison: rows with null fields cancel when " +
    "unchanged and classify when changed") {
    val t = newTable()
    DeltaLite.commit(spark, t,
      Seq((1L, Option.empty[String]), (2L, Option("b")),
        (3L, Option.empty[String])).toDF("k", "s").coalesce(1))
    // rewrite the SAME file set contents, changing only k=2 → null
    DeltaLite.commit(spark, t,
      Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
        (3L, Option.empty[String])).toDF("k", "s").coalesce(1),
      overwrite = true)
    val ch = DeltaLite.changes(spark, t, 0L, 1L, Seq("k"))
      .select("k", "s", "_change_type")
      .as[(Long, Option[String], String)].collect().toSet
    assert(ch == Set(
      (2L, Option("b"), "update_preimage"),
      (2L, Option.empty[String], "update_postimage")),
      s"null rows for k=1,3 must cancel; only k=2 changed: $ch")
  }

  test("iceberg changes() across a v3 DV snapshot: exactly the masked " +
    "rows classify as deletes, and the DV's identity is scoped to its " +
    "referenced file (an untouched file never re-reads)") {
    import graft.sources.IcebergLite
    val t = java.nio.file.Files.createTempDirectory("graft_cfeed_v3")
      .toString + "/t"
    // two files: keys 0..19 (file A), 20..39 (file B)
    IcebergLite.commit(spark, t,
      (0L until 40L).map(k => (k, s"r$k")).toDF("k", "s")
        .repartitionByRange(2, col("k")))
    val preId = IcebergLite.snapshot(spark, t).snapshotId
    // DV delete hits keys in ONE file only
    IcebergLite.deleteRowsV3(spark, t, Seq(3L, 7L).toDF("k"), Seq("k"))
    val ch = IcebergLite.changes(spark, t, preId, None, Seq("k"))
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(ch == Set((3L, "delete"), (7L, "delete")),
      s"exactly the DV-masked rows must classify as deletes: $ch")
    // a second DV delete into the OTHER file diffs only that file's rows
    val midId = IcebergLite.snapshot(spark, t).snapshotId
    IcebergLite.deleteRowsV3(spark, t, Seq(25L).toDF("k"), Seq("k"))
    val ch2 = IcebergLite.changes(spark, t, midId, None, Seq("k"))
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(ch2 == Set((25L, "delete")), s"got $ch2")
    // the ECONOMICS pin (what the DV scoping buys): only the referenced
    // file's visibility changed, so exactly ONE file plans for re-read
    // on each side — unscoped identity would list both files here
    val (nw, old) = IcebergLite.changedSplit(spark, t,
      IcebergLite.snapshot(spark, t, Some(midId)),
      IcebergLite.snapshot(spark, t))
    assert(nw.size == 1 && old.size == 1,
      s"only the DV-referenced file may re-read: new=${nw.map(_.path)} " +
        s"old=${old.map(_.path)}")
  }
}
