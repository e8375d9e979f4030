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
}
