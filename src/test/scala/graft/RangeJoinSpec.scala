package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The binned range-join kernel: exactness against the brute-force
  * definition, grid-width invariance (the bin is routing, not semantics),
  * and the half-open boundary contract.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairsWith(binWidth: Long): Set[(Long, Long)] = {
    val pts = Seq(0L, 5L, 17L, 23L, 99L, 100L, 101L, -7L, -1L)
      .toDF("p").withColumn("pid", col("p"))
    val ivl = Seq(
      (1L, 0L, 10L),    // covers 0,5      (10 excluded: half-open)
      (2L, 5L, 5L),     // empty — matches nothing
      (3L, 17L, 18L),   // exactly one point
      (4L, -10L, 1L),   // negative coords: covers -7,-1,0
      (5L, 90L, 101L),  // covers 99,100   (101 excluded)
      (6L, -1000L, 1000L)) // covers every point; 2000 cells at width 1
      .toDF("iid", "s", "e")
    RangeJoin.rangeJoinPairs(pts, col("p"), ivl, col("s"), col("e"), binWidth)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
  }

  test("kernel matches the brute-force definition, any bin width") {
    val expected: Set[(Long, Long)] = {
      val pts = Seq(0L, 5L, 17L, 23L, 99L, 100L, 101L, -7L, -1L)
      val ivl = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, 17L, 18L),
        (4L, -10L, 1L), (5L, 90L, 101L), (6L, -1000L, 1000L))
      for {
        p <- pts.toSet[Long]
        (id, s, e) <- ivl
        if p >= s && p < e
      } yield (p, id)
    }
    // widths straddling / dividing / dwarfing the interval lengths, and
    // one that forces multi-cell explosion of every interval
    for (w <- Seq(1L, 3L, 7L, 64L, 1000000L))
      assert(pairsWith(w) == expected, s"binWidth=$w diverged")
  }

  test("cell expansion is exactly the closed form — no silent cost bloat") {
    // a superfluous cell per interval would leave every RESULT identical
    // (the residual filter discards it) while inflating the join's
    // replicated volume — only this count can catch that class of bug
    val ivl = Seq((0L, 10L), (5L, 5L), (17L, 18L), (-10L, 1L),
      (90L, 101L), (-1000L, 1000L)).toDF("s", "e")
    for (w <- Seq(1L, 3L, 7L, 64L, 1000000L)) {
      val expected = Seq((0L, 10L), (17L, 18L), (-10L, 1L),
        (90L, 101L), (-1000L, 1000L)) // the empty interval contributes 0
        .map { case (s, e) =>
          Math.floorDiv(e - 1, w) - Math.floorDiv(s, w) + 1
        }.sum
      val got = RangeJoin.cellsOf(ivl, col("s"), col("e"), w).count()
      assert(got == expected, s"binWidth=$w exploded $got != $expected")
    }
  }

  test("q_range_join: per-day rollup equals the naive inequality join") {
    val got = SparkEntry.queries("q_range_join")(spark, sf)
    // same windows, joined by raw inequality (Spark plans this as a
    // nested loop — fine at sf0.001, the whole point of the kernel is
    // that this shape is what must NOT run at scale)
    val total = Tables.orders(spark, sf).count()
    val ivl = Tables.orders(spark, sf)
      .filter(graft.pipeline.Mix.uniformOf(col("o_orderkey"), "rjoin") <
        lit(1500.0 / total))
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("w_start"),
        (unix_micros(col("o_orderdate").cast("timestamp")) +
          ((col("o_orderkey") % 5) + 1) * 86400000000L).as("w_end"))
    val naive = Tables.lineitem(spark, sf)
      .select(col("l_shipdate"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("p_us"))
      .join(ivl, col("p_us") >= col("w_start") && col("p_us") < col("w_end"))
      .groupBy(col("l_shipdate").as("ship_ts"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_windows"),
        max(col("o_totalprice")).as("top_price"))
      .orderBy("ship_ts")
    assert(got.collect().toSeq == naive.collect().toSeq)
    assert(got.count() > 0, "sampled windows must cover at least one day")
  }
}
