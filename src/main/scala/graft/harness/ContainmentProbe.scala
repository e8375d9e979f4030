package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-level wall breakdown for dedup_containment (C42) at one SF dir —
  * the same measure-don't-guess tooling as [[SimhashSweep]]. Times each
  * prefix of the pipeline in isolation (posting materialization, df
  * aggregate, candidate pairs, intersection counts, full query) so a
  * decade-scaling diagnosis points at a stage instead of a query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.harness.ContainmentProbe
  */
object ContainmentProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val maxDf = 5
    for (round <- 1 to math.max(1, sys.env.get("SPARK_GRAFT_RUNS").fold(2)(_.toInt))) {
      println(s"[probe] --- round $round @ $dir")
      spark.catalog.clearCache()
      val docs = Tables.documents(spark, dir)
      val posting0 = docs.select(col("doc_id"),
        explode(graft.functions.Sketch.shingle_hashes(col("text"), 3)).as("h"))
      val posting = time("posting.checkpoint") {
        posting0.localCheckpoint(true)
      }
      println(s"[probe]   posting rows = ${posting.count()}")
      time("sizes.agg")(posting.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        .write.format("noop").mode("overwrite").save())
      val rare = posting.groupBy("h").agg(count(lit(1)).as("__df"))
        .filter(col("__df").between(2, maxDf)).select("h")
      time("rare.agg")(rare.write.format("noop").mode("overwrite").save())
      println(s"[probe]   rare shingles = ${rare.count()}")
      val pairs = posting.join(rare, "h")
        .groupBy("h").agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .select(explode(expr(
          "flatten(transform(ds, (a, i) -> transform(slice(ds, i + 2, size(ds)), b -> struct(a AS doc_a, b AS doc_b))))"))
          .as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
      time("pairs")(pairs.write.format("noop").mode("overwrite").save())
      println(s"[probe]   pairs = ${pairs.count()}")
      // two intersection formulations, labeled: the superseded posting
      // self-join (two data-sized exchanges — the r17 decade wall) and the
      // shipped per-doc array_intersect over two broadcastable joins of the
      // count-sized pair list (Dedup.dedupContainment since r18) — so a
      // future decade diagnosis reads the production plan's stage, with the
      // old plan's number alongside for the delta.
      // SEMANTICS CAVEAT (r19 advice): the two stages time different
      // quantities, not just different plans — posting is NOT distinct per
      // (doc_id, h), so the self-join's n_inter sums shingle
      // MULTIPLICITIES (cnt_a*cnt_b per hash) while array_intersect yields
      // the DISTINCT-value intersection the shipped query uses. The old
      // number is kept as the faithful timing of the superseded r17 plan
      // (which had exactly this multiplicity behavior); read the old-vs-
      // shipped delta as plan cost + semantics, not plan cost alone.
      val interOld = pairs
        .join(posting.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
        .join(posting.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_inter"))
      time("inter.posting(old)")(interOld.write.format("noop").mode("overwrite").save())
      val docSets = docs.select(col("doc_id"),
        graft.functions.Sketch.shingle_hashes(col("text"), 3).as("hs"))
        .localCheckpoint(true)
      val interNew = pairs
        .join(docSets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
        .join(docSets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("hs_a"), col("hs_b"))).as("n_inter"))
      time("inter.array(shipped)")(interNew.write.format("noop").mode("overwrite").save())
      time("full.query")(graft.dedup.Dedup.dedupContainment(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
