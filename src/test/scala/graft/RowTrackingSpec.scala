package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DeltaLite

/** ROW TRACKING (the `rowTracking` writer feature): durable per-row ids
  * = file baseRowId + parquet row index, fresh ranges past the
  * `delta.rowTracking` domain watermark. Enablement BACKFILLS existing
  * files metadata-only; DV deletes keep surviving ids stable
  * (merge-on-read never touches files); copy-on-write rewrites assign
  * fresh ids (the spec's non-materialized semantics); checkpoints carry
  * baseRowId so a bootstrap loses nothing.
  */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  private def idsByKey(t: String): Map[Long, Long] =
    DeltaLite.readWithRowIds(spark, t)
      .select(col("k"), col("_row_id")).as[(Long, Long)]
      .collect().toMap

  test("enable backfills existing files; appends take fresh disjoint " +
    "ranges; ids are unique and dense from 0") {
    val t = newTable("graft_rowids")
    DeltaLite.commit(spark, t,
      (0L until 10L).map(k => (k, s"a$k")).toDF("k", "s")
        .repartitionByRange(2, col("k")))                         // v0
    DeltaLite.commit(spark, t,
      (10L until 15L).map(k => (k, s"b$k")).toDF("k", "s"))       // v1
    DeltaLite.enableRowTracking(spark, t)                         // v2
    val withIds = DeltaLite.readWithRowIds(spark, t)
    assert(withIds.columns.endsWith(Seq("_row_id", "_row_commit_version")))
    val rows = withIds.select("_row_id", "_row_commit_version")
      .as[(Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0L until 15L),
      "backfill must assign dense unique ids from 0")
    assert(rows.forall(_._2 == 2L),
      "backfilled files carry the enablement commit version")

    DeltaLite.commit(spark, t,
      (15L until 18L).map(k => (k, s"c$k")).toDF("k", "s"))       // v3
    val rows2 = DeltaLite.readWithRowIds(spark, t)
      .select("k", "_row_id", "_row_commit_version")
      .as[(Long, Long, Long)].collect()
    assert(rows2.map(_._2).sorted.toSeq == (0L until 18L),
      "appends must continue past the watermark, no overlap")
    assert(rows2.filter(_._1 >= 15L).forall(_._3 == 3L),
      "new files carry their own commit version")
  }

  test("DV deletes keep surviving ids STABLE; copy-on-write rewrites " +
    "assign fresh ids past the watermark") {
    val t = newTable("graft_rowids_dv")
    DeltaLite.commit(spark, t,
      (0L until 12L).map(k => (k, k * 2.0)).toDF("k", "v"))
    DeltaLite.enableRowTracking(spark, t)
    val before = idsByKey(t)
    // merge-on-read: the file is untouched, the mask drops rows 3/7
    DeltaLite.deleteVectors(spark, t, Seq(3L, 7L).toDF("k"), Seq("k"))
    val after = idsByKey(t)
    assert(!after.contains(3L) && !after.contains(7L))
    assert(after.forall { case (k, id) => before(k) == id },
      "DV-surviving rows must keep their row ids")

    // copy-on-write: the touched file is REWRITTEN — fresh ids
    val wmBefore = after.values.max
    DeltaLite.selectiveMerge(spark, t,
      Seq((5L, 99.0)).toDF("k", "v"), Seq("k"))
    val merged = idsByKey(t)
    assert(merged(5L) > wmBefore,
      s"rewritten rows get fresh ids past the watermark, got ${merged(5L)}")
    assert(merged.keySet == after.keySet, "no rows lost in the rewrite")
  }

  test("checkpoints carry baseRowId — a bootstrap-only resolution " +
    "keeps every id; foreign logs with baseRowId read as-is") {
    val t = newTable("graft_rowids_cp")
    DeltaLite.commit(spark, t,
      (0L until 8L).map(k => (k, s"x$k")).toDF("k", "s"))
    DeltaLite.enableRowTracking(spark, t)
    DeltaLite.commit(spark, t, Seq((8L, "y")).toDF("k", "s"))
    val before = idsByKey(t)
    DeltaLite.checkpoint(spark, t)
    DeltaLite.cleanupLogs(spark, t, retainVersions = 1)
    assert(idsByKey(t) == before,
      "checkpoint bootstrap must preserve every baseRowId")

    // a FOREIGN table whose log carries baseRowId (no local writer):
    val tf = newTable("graft_rowids_foreign")
    val log = java.nio.file.Paths.get(tf, "_delta_log")
    java.nio.file.Files.createDirectories(log)
    // stage one real parquet data file via a scratch write
    val scratch = newTable("graft_rowids_scratch")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1)
      .write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(tf, "data.parquet"))
    java.nio.file.Files.write(log.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}""",
      """{"metaData":{"id":"f","format":{"provider":"parquet"},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"k\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"s\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"}}}""",
      s"""{"add":{"path":"data.parquet","size":${part.length()},"partitionValues":{},"modificationTime":0,"dataChange":true,"baseRowId":700,"defaultRowCommitVersion":0}}""",
      """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":701}","removed":false}}""")
      .mkString("\n").getBytes("UTF-8"))
    assert(idsByKey(tf) == Map(1L -> 700L, 2L -> 701L),
      "foreign baseRowId must surface verbatim")
    // ...and OUR append to the foreign table continues past its watermark
    DeltaLite.commit(spark, tf, Seq((3L, "c")).toDF("k", "s"))
    assert(idsByKey(tf)(3L) == 702L,
      "the foreign watermark governs our assignment")
  }

  test("contended commits refuse row-tracking tables (range race)") {
    val t = newTable("graft_rowids_occ")
    DeltaLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s"))
    DeltaLite.enableRowTracking(spark, t)
    val e = intercept[IllegalArgumentException](
      DeltaLite.commitContended(spark, t, Seq((2L, "b")).toDF("k", "s")))
    assert(e.getMessage.contains("single-writer"))
  }
}
