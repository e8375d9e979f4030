package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.DeltaLite

/** LIQUID CLUSTERING — the `delta.clustering` domain + `clustering`
  * writer feature: `clusterBy` declares keys metadata-only, OPTIMIZE
  * re-clusters by them through the shared Z-order kernel (plain
  * bin-packing would shred the locality), explicit ZORDER BY on a
  * clustered table refuses, `clusterByNone` reverts OPTIMIZE to
  * bin-packing. Foreign clustered tables (physical-name array-of-arrays
  * in the domain) parse and re-cluster identically — the state lives in
  * the log, not in this writer.
  */
class LiquidClusterSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("clusterBy declares keys metadata-only; OPTIMIZE re-clusters " +
    "and add-stats pruning bites; the domain survives the overwrite; " +
    "ZORDER BY refuses; clusterByNone reverts to bin-packing") {
    val t = newTable("graft_liquid")
    val df = (0L until 4000L).map(k => (k, k % 7, s"v$k"))
      .toDF("k", "grp", "s")
    // scattered layout: every file spans the whole key domain
    DeltaLite.commit(spark, t, df.repartition(8))
    assert(DeltaLite.clusteringColumns(spark, t).isEmpty)

    DeltaLite.clusterBy(spark, t, Seq("k"))
    val s1 = DeltaLite.snapshot(spark, t)
    assert(s1.writerFeatures.contains("clustering") &&
      s1.writerFeatures.contains("domainMetadata"))
    assert(DeltaLite.clusteringColumns(spark, t).contains(Seq("k")))
    // declaration moves no data: scattered files still all survive a
    // narrow key slice
    val pre = DeltaLite.readWhere(spark, t, "k", 100L, 120L)
    assert(pre.filesSkipped == 0, s"scattered layout must not prune: $pre")

    // OPTIMIZE (no ZORDER BY) re-clusters by the declared keys
    DeltaLite.optimizeCompact(spark, t, targetFiles = 8)
    assert(DeltaLite.clusteringColumns(spark, t).contains(Seq("k")),
      "the clustering domain must survive the overwrite")
    val post = DeltaLite.readWhere(spark, t, "k", 100L, 120L)
    assert(post.filesSkipped >= 6,
      s"clustered layout must prune the off-range files: $post")
    assert(post.df.count() == 21L)
    assert(DeltaLite.read(spark, t).as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq ==
      df.as[(Long, Long, String)].collect().sortBy(_._1).toSeq)

    // an explicit ZORDER BY on different keys fights the declared
    // clustering — refused with the remedy named
    val e = intercept[IllegalArgumentException](
      DeltaLite.optimizeZorder(spark, t, Seq("grp"), targetFiles = 4))
    assert(e.getMessage.contains("liquid-clustered"))

    DeltaLite.clusterByNone(spark, t)
    assert(DeltaLite.clusteringColumns(spark, t).isEmpty)
    // OPTIMIZE is plain bin-packing again
    DeltaLite.optimizeCompact(spark, t, targetFiles = 1)
    assert(DeltaLite.snapshot(spark, t).files.size == 1)
    assert(DeltaLite.read(spark, t).count() == 4000L)
    // and with no clustering declared, explicit ZORDER works again
    DeltaLite.optimizeZorder(spark, t, Seq("grp"), targetFiles = 4)
  }

  test("foreign clustered table: a hand-written physical-name domain " +
    "parses, OPTIMIZE clusters by it; guards refuse partitioned tables " +
    "and unknown columns") {
    val t = newTable("graft_liquid_foreign")
    DeltaLite.commit(spark, t,
      (0L until 1000L).map(k => (k, s"v$k")).toDF("k", "s")
        .repartition(4))
    // forge the domain exactly as real engines write it: array of
    // physical-name paths, feature-bearing protocol
    val v = 1L
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_delta_log", f"$v%020d.json"),
      (s"""{"commitInfo":{"operation":"CLUSTER BY","timestamp":1}}""" +
        "\n" +
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly","invariants","clustering","domainMetadata"]}}""" +
        "\n" +
        """{"domainMetadata":{"domain":"delta.clustering","configuration":"{\"clusteringColumns\":[[\"k\"]]}","removed":false}}""" +
        "\n").getBytes("UTF-8"))
    assert(DeltaLite.clusteringColumns(spark, t).contains(Seq("k")))
    DeltaLite.optimizeCompact(spark, t, targetFiles = 4)
    val scan = DeltaLite.readWhere(spark, t, "k", 0L, 99L)
    assert(scan.filesSkipped >= 2,
      s"foreign clustering keys must drive the rewrite: $scan")
    assert(DeltaLite.read(spark, t).count() == 1000L)

    // guards
    val tp = newTable("graft_liquid_part")
    DeltaLite.commit(spark, tp,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), partitionBy = Seq("s"))
    val ep = intercept[IllegalArgumentException](
      DeltaLite.clusterBy(spark, tp, Seq("k")))
    assert(ep.getMessage.contains("exclusive"))
    val tn = newTable("graft_liquid_nocol")
    DeltaLite.commit(spark, tn, Seq((1L, "a")).toDF("k", "s"))
    intercept[IllegalArgumentException](
      DeltaLite.clusterBy(spark, tn, Seq("nope")))
    intercept[IllegalArgumentException](DeltaLite.clusterByNone(spark, tn))
  }
}
