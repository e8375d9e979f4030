package graft

import org.apache.spark.sql.functions._

import graft.operators.{LakehouseOps, MergeClause => MC}
import graft.sources.{DeltaLite, IcebergLite}

/** The FULL MERGE grammar (LakehouseOps.mergeClauses + both formats'
  * selectiveMerge clause path): conditional whenMatched update/delete,
  * whenNotMatched insert, whenNotMatchedBySource update/delete —
  * first-clause-wins ordering, `t.`/`s.` condition addressing, and the
  * prune-vs-full-scan economics by-source clauses force.
  */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("clause semantics: conditional update/delete, insert, bySource " +
    "update+delete, first-clause-wins ordering") {
    val target = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (5L, "e", 50.0)).toDF("k", "s", "v")
    val source = Seq(
      (1L, "DEL", 0.0),   // matched delete (op condition)
      (2L, "upd", 99.0),  // matched conditional update (v only)
      (6L, "new", 60.0)   // unmatched → insert
    ).toDF("k", "op", "v")
    val clauses = Seq(
      MC.MatchedDelete(Some(col("s.op") === "DEL")),
      // first-match-wins: this update must NOT also fire for k=1
      MC.MatchedUpdate(None, Map("v" -> col("s.v"))),
      MC.NotMatchedInsert(None),
      // by-source: rows the source never mentions
      MC.NotMatchedBySourceUpdate(Some(col("t.k") === 4L),
        Map("s" -> concat(col("t.s"), lit("!")))),
      MC.NotMatchedBySourceDelete(Some(col("t.k") === 5L)))
    val out = LakehouseOps.mergeClauses(target, source, Seq("k"), clauses)
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set(
      (2L, "b", 99.0),      // updated v, kept s
      (3L, "c", 30.0),      // untouched (no bySource clause fired)
      (4L, "d!", 40.0),     // bySource update
      (6L, null, 60.0)      // insertAll: s column absent in source → null
    ), s"got $out")
  }

  test("updateAll (empty set) takes every same-named source column; " +
    "unmatched source rows drop without an insert clause") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val source = Seq((1L, "S", 11.0), (9L, "X", 90.0)).toDF("k", "s", "v")
    val out = LakehouseOps.mergeClauses(target, source, Seq("k"),
      Seq(MC.MatchedUpdate())).as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "S", 11.0), (2L, "b", 20.0)), s"got $out")
  }

  test("delta selectiveMerge with clauses: key-pruned without bySource, " +
    "full-scan with it, results exact either way") {
    val t = newTable("graft_mc_delta")
    DeltaLite.commit(spark,
      t, (0L until 80L).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartitionByRange(8, col("k")))
    // no bySource clause: the 8-file layout must prune
    val ms = DeltaLite.selectiveMerge(spark, t,
      Seq((1L, "U", 100.0), (2L, "D", 0.0)).toDF("k", "op", "v"),
      Seq("k"), clauses = Seq(
        MC.MatchedDelete(Some(col("s.op") === "D")),
        MC.MatchedUpdate(None, Map("v" -> col("s.v")))))
    assert(ms.filesSkipped > 0 && ms.filesRewritten < 8,
      s"clause merge without bySource must keep pruning: $ms")
    val got = DeltaLite.read(spark, t).as[(Long, Double)].collect().toMap
    assert(got(1L) == 100.0 && !got.contains(2L) && got(3L) == 3.0)
    // a bySource clause forces the full scan — and applies to every row
    val ms2 = DeltaLite.selectiveMerge(spark, t,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"), clauses = Seq(
        MC.MatchedUpdate(None, Map("v" -> col("s.v"))),
        MC.NotMatchedBySourceDelete(Some(col("t.k") >= 70L))))
    assert(ms2.filesSkipped == 0,
      s"bySource clauses involve every row — no pruning: $ms2")
    val got2 = DeltaLite.read(spark, t).select("k").as[Long].collect().toSet
    assert(got2 == ((0L until 70L).toSet - 2L), s"got ${got2.size} keys")
  }

  test("iceberg selectiveMerge with clauses: same grammar on the other " +
    "format, merge-on-read reads feed the clause engine") {
    val t = newTable("graft_mc_iceberg")
    IcebergLite.commit(spark, t,
      (0L until 40L).map(k => (k, s"r$k")).toDF("k", "s")
        .repartitionByRange(4, col("k")))
    // a prior merge-on-read delete: the clause merge must see masked rows
    IcebergLite.deleteRows(spark, t, Seq(39L).toDF("k"), Seq("k"))
    val ms = IcebergLite.selectiveMerge(spark, t,
      Seq((1L, "D"), (2L, "U")).toDF("k", "op"), Seq("k"), clauses = Seq(
        MC.MatchedDelete(Some(col("s.op") === "D")),
        MC.MatchedUpdate(None, Map("s" -> lit("UPD"))),
        MC.NotMatchedBySourceDelete(Some(col("t.k") >= 35L))))
    assert(ms.filesSkipped == 0, s"bySource → full scan: $ms")
    val got = IcebergLite.read(spark, t).as[(Long, String)].collect().toMap
    assert(!got.contains(1L) && got(2L) == "UPD" && got(3L) == "r3")
    assert(got.keySet.forall(_ < 35L), "bySource delete band erased")
    assert(!got.contains(39L), "the pre-masked row must stay dead")
  }
}
