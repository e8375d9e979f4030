package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLite, IcebergLite}

/** MERGE WITH SCHEMA EVOLUTION — the drift shape API-ingest merges hit
  * daily: the source grows a column the target lacks; with
  * `schemaEvolution` the column joins the table schema additively,
  * touched rows carry its values, untouched files read it as null, and
  * rows only in the target keep their values for columns the source
  * lacks. Without the flag, drift refuses (nothing silently drops).
  */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  // range-clustered layout: the low-key merge batch must prune files
  private def target = (0L until 100L).map(k => (k, s"a$k"))
    .toDF("k", "a").repartitionByRange(8, col("k"))

  // touched keys 0..9 get new values + the NEW column b; key 100 is a
  // fresh insert
  private def source = ((0L until 10L).map(k =>
    (k, s"A$k", s"b$k")) :+ (100L, "A100", "b100"))
    .toDF("k", "a", "b")

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.columns.toSeq == Seq("k", "a", "b"),
      s"schema must evolve additively in order: ${df.columns.toSeq}")
    assert(df.count() == 101L)
    val touched = df.filter($"k" < 10 || $"k" === 100).collect()
    assert(touched.length == 11 &&
      touched.forall(r => r.getString(1).startsWith("A") &&
        r.getString(2).startsWith("b")),
      "touched rows must carry the new column")
    val untouched = df.filter($"k" >= 10 && $"k" < 100)
    assert(untouched.count() == 90L)
    assert(untouched.filter($"b".isNotNull).count() == 0L,
      "files the merge never rewrote read the new column as null")
    assert(untouched.filter(!$"a".startsWith("a")).count() == 0L)
  }

  test("delta selectiveMerge(schemaEvolution): source-only columns join " +
    "the schema; undeclared drift refuses; clauses compose refuses") {
    val t = newTable("graft_mergevo_d")
    DeltaLite.commit(spark, t, target)
    // drift WITHOUT the flag refuses (the source column has nowhere to go)
    intercept[Exception](
      DeltaLite.selectiveMerge(spark, t, source, Seq("k")))
    val st = DeltaLite.selectiveMerge(spark, t, source, Seq("k"),
      schemaEvolution = true)
    assert(st.filesRewritten > 0 && st.filesSkipped > 0,
      s"add-stats pruning must survive the evolving merge: $st")
    check(DeltaLite.read(spark, t))
    intercept[IllegalArgumentException](
      DeltaLite.selectiveMerge(spark, t, source, Seq("k"),
        schemaEvolution = true,
        clauses = Seq(graft.operators.MergeClause.MatchedDelete())))
  }

  test("iceberg selectiveMerge(schemaEvolution): same contract on the " +
    "other format") {
    val t = newTable("graft_mergevo_i")
    IcebergLite.commit(spark, t, target)
    intercept[Exception](
      IcebergLite.selectiveMerge(spark, t, source, Seq("k")))
    val st = IcebergLite.selectiveMerge(spark, t, source, Seq("k"),
      schemaEvolution = true)
    assert(st.filesRewritten > 0 && st.filesSkipped > 0,
      s"bounds pruning must survive the evolving merge: $st")
    check(IcebergLite.read(spark, t))
  }
}
