package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DeltaLite

/** Writer-feature ENFORCEMENT — CHECK constraints, column invariants,
  * generated and identity columns: declared at creation
  * (`commitWithFeatures`) or later (`addCheckConstraint`), enforced on
  * every data commit (plain appends AND the selective merge path that
  * rides `commit`), honored identically on foreign-written tables
  * because the contracts live in the log. The writer gate that used to
  * REFUSE such tables now admits exactly what this enforcement covers.
  */
class TableFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def logJson(t: String, v: Long): String = {
    val p = java.nio.file.Paths.get(t, "_delta_log", f"$v%020d.json")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("check constraints: add validates existing data, violating " +
    "appends refuse naming the constraint, drop re-admits them") {
    val t = newTable("graft_check")
    DeltaLite.commit(spark, t, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt"))
    DeltaLite.addCheckConstraint(spark, t, "amt_pos", "amt > 0")
    // the upgrade commit declares checkConstraints at v7, readers stay legacy
    assert(logJson(t, 1L).contains("\"checkConstraints\""))
    assert(logJson(t, 1L).contains("\"minWriterVersion\":7"))
    assert(logJson(t, 1L).contains("\"minReaderVersion\":1"))

    // a second constraint over existing-violating data must refuse
    intercept[IllegalArgumentException](
      DeltaLite.addCheckConstraint(spark, t, "k_big", "k > 100"))

    // violating append refuses and names the constraint; nothing lands
    val e = intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq((3L, -5.0)).toDF("k", "amt")))
    assert(e.getMessage.contains("amt_pos"))
    assert(DeltaLite.read(spark, t).count() == 2L)
    // NULL constraint results PASS (SQL CHECK semantics)
    DeltaLite.commit(spark, t,
      Seq((3L, Option.empty[Double])).toDF("k", "amt"))
    assert(DeltaLite.read(spark, t).count() == 3L)

    DeltaLite.dropCheckConstraint(spark, t, "amt_pos")
    DeltaLite.commit(spark, t, Seq((4L, -5.0)).toDF("k", "amt"))
    assert(DeltaLite.read(spark, t).count() == 4L)
  }

  test("generated columns: populated when the batch lacks them, " +
    "validated when supplied, refused on mismatch") {
    val t = newTable("graft_gen")
    DeltaLite.commitWithFeatures(spark, t,
      Seq((1L, "2024-03-15"), (2L, "2025-07-01")).toDF("k", "d"),
      generated = Map("yr" -> "substring(d, 1, 4)"))
    assert(DeltaLite.read(spark, t).select("yr").as[String].collect()
      .sorted.toSeq == Seq("2024", "2025"))

    // append WITHOUT the generated column → populated
    DeltaLite.commit(spark, t, Seq((3L, "2026-01-02")).toDF("k", "d"))
    assert(DeltaLite.read(spark, t).filter(col("k") === 3L)
      .select("yr").as[String].head() == "2026")
    // append WITH a correct value → validated, passes
    DeltaLite.commit(spark, t,
      Seq((4L, "2023-05-06", "2023")).toDF("k", "d", "yr"))
    // append WITH a wrong value → refused
    val e = intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq((5L, "2022-05-06", "1999")).toDF("k", "d", "yr")))
    assert(e.getMessage.contains("GENERATED"))
    assert(DeltaLite.read(spark, t).count() == 4L)
  }

  test("identity columns: contiguous assignment across appends and " +
    "partitions, explicit inserts gated and watermark-advancing") {
    val t = newTable("graft_id")
    DeltaLite.commitWithFeatures(spark, t,
      (1 to 50).map(i => (s"u$i", i * 2)).toDF("name", "x")
        .repartition(7),
      identity = Map("id" -> DeltaLite.IdentitySpec(start = 100L,
        step = 10L)))
    val ids0 = DeltaLite.read(spark, t).select("id").as[Long].collect()
    assert(ids0.sorted.toSeq == (0 until 50).map(100L + 10L * _),
      "creation assigns a contiguous range from start, step-spaced")

    // appends continue past the watermark, still unique + contiguous
    DeltaLite.commit(spark, t,
      (51 to 60).map(i => (s"u$i", i * 2)).toDF("name", "x")
        .repartition(3))
    val ids1 = DeltaLite.read(spark, t).select("id").as[Long].collect()
    assert(ids1.sorted.toSeq == (0 until 60).map(100L + 10L * _),
      s"appends must continue from the high watermark")

    // explicit values are refused unless the declaration allows them
    intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq(("ux", 1, 9999L)).toDF("name", "x", "id")))

    val t2 = newTable("graft_id_expl")
    DeltaLite.commitWithFeatures(spark, t2,
      Seq(("a", 1)).toDF("name", "x"),
      identity = Map("id" -> DeltaLite.IdentitySpec(
        allowExplicitInsert = true)))
    DeltaLite.commit(spark, t2, Seq(("b", 2, 500L)).toDF("name", "x", "id"))
    // the explicit 500 moved the watermark: the next assigned id is 501
    DeltaLite.commit(spark, t2, Seq(("c", 3)).toDF("name", "x"))
    val byName = DeltaLite.read(spark, t2).select("name", "id").as[(String, Long)]
      .collect().toMap
    assert(byName == Map("a" -> 1L, "b" -> 500L, "c" -> 501L), s"$byName")
  }

  test("foreign tables: constraints/invariants in a hand-written log " +
    "enforce on our commits; unknown writer features still refuse") {
    val t = newTable("graft_foreign_feat")
    val log = java.nio.file.Paths.get(t, "_delta_log")
    java.nio.file.Files.createDirectories(log)
    // a foreign writer-v3 table: CHECK constraint in configuration,
    // an invariant riding the schema metadata (spec JSON shape)
    val schema = """{"type":"struct","fields":[""" +
      """{"name":"k","type":"long","nullable":true,"metadata":{}},""" +
      """{"name":"qty","type":"long","nullable":true,"metadata":""" +
      """{"delta.invariants":"{\"expression\":{\"expression\":\"qty < 1000\"}}"}}]}"""
    val actions = Seq(
      """{"commitInfo":{"operation":"CREATE","timestamp":1}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
      s"""{"metaData":{"id":"f1","format":{"provider":"parquet"},"schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString(schema)},"partitionColumns":[],"configuration":{"delta.constraints.k_pos":"k > 0"}}}""")
    java.nio.file.Files.write(log.resolve(f"${0L}%020d.json"),
      actions.mkString("\n").getBytes("UTF-8"))

    // valid rows commit; constraint and invariant violations refuse
    DeltaLite.commit(spark, t, Seq((5L, 10L)).toDF("k", "qty"))
    assert(DeltaLite.read(spark, t).count() == 1L)
    assert(intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq((-1L, 10L)).toDF("k", "qty"))).getMessage.contains("k_pos"))
    assert(intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq((5L, 5000L)).toDF("k", "qty"))).getMessage.contains("INVARIANT"))

    // a v7 table demanding a feature we don't implement still refuses
    val t3 = newTable("graft_foreign_unknown")
    val log3 = java.nio.file.Paths.get(t3, "_delta_log")
    java.nio.file.Files.createDirectories(log3)
    java.nio.file.Files.write(log3.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV2"]}}""",
      """{"metaData":{"id":"f3","format":{"provider":"parquet"},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{}}}""")
      .mkString("\n").getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](DeltaLite.commit(spark, t3,
      Seq(Tuple1(1L)).toDF("k"))).getMessage.contains("icebergCompatV2"))
  }

  test("merge + schema verbs respect the contracts: selectiveMerge " +
    "enforces constraints; rename/drop of a referenced column refuses") {
    val t = newTable("graft_feat_merge")
    DeltaLite.commit(spark, t,
      (1L to 20L).map(k => (k, 10.0)).toDF("k", "amt"))
    DeltaLite.addCheckConstraint(spark, t, "amt_pos", "amt > 0")
    // a merge whose updates violate the constraint refuses via commit
    intercept[IllegalArgumentException](DeltaLite.selectiveMerge(spark, t,
      Seq((3L, -1.0)).toDF("k", "amt"), Seq("k")))
    // a clean merge passes and the constraint survives
    DeltaLite.selectiveMerge(spark, t, Seq((3L, 99.0), (21L, 1.0))
      .toDF("k", "amt"), Seq("k"))
    val m = DeltaLite.read(spark, t).filter(col("k") === 3L)
      .select("amt").as[Double].head()
    assert(m == 99.0 && DeltaLite.read(spark, t).count() == 21L)

    // overwrite replaces schema but config constraints persist + enforce
    intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq((1L, -3.0)).toDF("k", "amt"), overwrite = true))

    // a mapped table whose column a constraint references: rename/drop
    // must refuse while the constraint lives, succeed after dropping it
    val t2 = newTable("graft_feat_ren")
    DeltaLite.commit(spark, t2, Seq((1L, 2.0)).toDF("k", "amt"),
      columnMapping = true)
    DeltaLite.addCheckConstraint(spark, t2, "amt_pos", "amt > 0")
    intercept[IllegalArgumentException](
      DeltaLite.renameColumn(spark, t2, "amt", "amount"))
    intercept[IllegalArgumentException](
      DeltaLite.dropColumn(spark, t2, "amt"))
    DeltaLite.dropCheckConstraint(spark, t2, "amt_pos")
    DeltaLite.renameColumn(spark, t2, "amt", "amount")
    assert(DeltaLite.read(spark, t2).columns.toSeq == Seq("k", "amount"))
  }

  test("identity tables accept selective DELETE/MERGE rewrites (rows " +
    "carry their EXISTING ids — not explicit inserts); fresh explicit " +
    "ids still refuse on plain appends") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_id_rewrite")
      .toString + "/t"
    val df = (0L until 40L).map(k => (k, s"v$k")).toDF("k", "s")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
    DeltaLite.commitWithFeatures(spark, t, df,
      identity = Map("rid" -> DeltaLite.IdentitySpec()))
    val before = DeltaLite.read(spark, t)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(before == (1L to 40L))

    // copy-on-write DELETE: rewritten rows keep their ids
    DeltaLite.selectiveDelete(spark, t,
      Seq(3L, 7L).toDF("k"), Seq("k"))
    val after = DeltaLite.read(spark, t).count()
    assert(after == 38L)

    // selective MERGE updating existing rows: ids survive untouched
    DeltaLite.selectiveMerge(spark, t,
      DeltaLite.read(spark, t).filter($"k" < 5)
        .withColumn("s", org.apache.spark.sql.functions.lit("upd")),
      Seq("k"))
    val rids = DeltaLite.read(spark, t)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(rids.size == 38 && rids.distinct.size == 38,
      s"rewrites must never duplicate or reassign ids: $rids")

    // a plain append with explicit ids still refuses
    intercept[IllegalArgumentException](DeltaLite.commit(spark, t,
      Seq((100L, "x", 999L)).toDF("k", "s", "rid")))
    // and a feature-assigned append continues past the watermark
    DeltaLite.commit(spark, t, Seq((100L, "x")).toDF("k", "s"))
    val top = DeltaLite.read(spark, t)
      .agg(org.apache.spark.sql.functions.max("rid")).head().getLong(0)
    assert(top == 41L, s"assignment must continue past the watermark: $top")
  }
}
