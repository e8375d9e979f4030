package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.Tables
import graft.pipeline.Mix

/** SURVEY.md §2 A41 — keyless point-in-interval range join.
  *
  * The one join shape the as-of family (A16) does not cover: every point
  * matched against every interval CONTAINING it, with no equality key at
  * all. Spark's optimizer has nothing to hash on for a pure inequality
  * condition and plans BroadcastNestedLoopJoin (or a cartesian) — per-point
  * work ∝ |intervals|, the r7 interval-join quadratic all over again. The
  * classic fix (the grid/bucketing family of the inequality-join
  * literature, e.g. Khayyat et al.'s IEJoin paper) is binning: overlay a
  * fixed grid, explode each
  * interval to the grid cells it touches, hash-join points to cells, then
  * re-check exact containment as a residual predicate. Equi-join + bounded
  * explosion ⇒ shuffle ∝ data, per-point work ∝ intervals per cell.
  *
  * [[rangeJoinPairs]] is the reusable kernel (pure long arithmetic — the
  * caller picks the unit); [[qRangeJoin]] is the oracled query over it.
  */
object RangeJoin {

  /** Floor division for long coordinates as a Column. `pmod` makes the
    * numerator an exact multiple of `w` (correct for NEGATIVE coordinates
    * too, where truncating `div` would mis-bin); the division itself is
    * integral (`div` = Catalyst's IntegralDivide on longs), so the result
    * is exact over the FULL long range — a caller binning epoch-ns
    * (~2^60) coordinates gets correct cells, not silently-rounded ones.
    */
  private def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** All (point, interval) pairs with `start ≤ point < end`, as an
    * equi-join on grid cells of `binWidth`.
    *
    * `point`/`start`/`end` must be LONG columns in one shared unit.
    * Each interval explodes to `(len / binWidth) + 1` cells, so pick
    * `binWidth` ≳ the typical interval length — explosion stays ≤ 2× and
    * the residual filter discards only same-cell near-misses. The result
    * is binWidth-invariant (spec-pinned): the grid is a pure routing
    * artifact, never part of the semantics.
    *
    * Scale shape: cells shuffle like any equi-join key — points land in
    * the cell of their own coordinate, intervals in every cell they touch.
    * A pathological all-intervals-overlap-one-cell input degrades to the
    * output size (which is Ω(pairs) anyway — no algorithm beats its own
    * output); for the common sparse-overlap case work is ∝ n + m + pairs.
    * Broadcast of a small interval side is the caller's call (pass
    * `broadcast(intervals)`) — the hint rides the subtree through the
    * explode, turning the whole join into a map-side probe with zero
    * shuffle of the point side.
    *
    * Precondition: the two inputs must have DISJOINT column names (the
    * residual predicate's columns resolve by name against the joined
    * plan — a shared name is an ambiguous reference, refused here rather
    * than left to throw mid-plan), and neither side may already carry the
    * kernel's internal `__rj_cell` routing column.
    */
  def rangeJoinPairs(points: DataFrame, point: Column,
                     intervals: DataFrame, start: Column, end: Column,
                     binWidth: Long): DataFrame = {
    val shared = points.columns.toSet intersect intervals.columns.toSet
    require(shared.isEmpty,
      s"rangeJoinPairs: sides share column name(s) ${shared.mkString(", ")} " +
        "— rename one side; the residual predicate resolves by name")
    require(!(points.columns ++ intervals.columns).contains(CellCol),
      s"rangeJoinPairs: $CellCol is the kernel's internal routing column")
    val ivl = cellsOf(intervals, start, end, binWidth)
    val pts = points.withColumn(CellCol, floorDiv(point, binWidth))
    pts.join(ivl,
        pts(CellCol) === ivl(CellCol) && point >= start && point < end)
      .drop(CellCol)
  }

  /** Collision-resistant internal routing-column name. */
  private[graft] val CellCol = "__rj_cell"

  /** One row per (interval, touched grid cell) — the replication whose
    * volume IS the kernel's shuffle cost, so it is exposed for the spec
    * to pin: exactly `floor((end-1)/W) - floor(start/W) + 1` cells per
    * interval, no more (a superfluous cell would never change results —
    * the residual filter eats it — only silently inflate every join's
    * shuffle). `end` is exclusive: the last occupied cell is the one
    * holding `end-1`, and empty intervals (end ≤ start) vanish here
    * rather than exploding to a negative-length sequence.
    */
  private[graft] def cellsOf(intervals: DataFrame, start: Column,
                             end: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    intervals
      .filter(end > start)
      .withColumn(CellCol,
        explode(sequence(floorDiv(start, binWidth),
          floorDiv(end - 1, binWidth))))
  }

  /** Epoch micros of a timestamp column under the session zone (UTC,
    * pinned session-wide) — value-preserving for both TIMESTAMP and the
    * regenerated testdata's TIMESTAMP_NTZ (see Tables.events scaladoc).
    */
  private def usOf(c: Column): Column = unix_micros(c.cast(TimestampType))

  private val DayUs = 86400000000L
  /** Expected interval-sample size: fixed ABSOLUTE count, not a fixed
    * rate. Window-coverage density per day is what drives per-point match
    * counts; sampling a fixed fraction of orders would grow density ∝ SF
    * and the pair count ∝ SF² — the superlinear class run_scale3.sh
    * exists to catch. A count-derived rate (the C33/dedup_semantic
    * sizing pattern) keeps pairs ∝ points at every SF, which is also the
    * production shape: calendars of maintenance/promo windows grow far
    * slower than the event streams probed against them.
    */
  private val TargetWindows = 1500.0

  // ---------------------------------------------------------------- A41
  /** Promo-window coverage: a count-sized ~1500-order sample defines
    * half-open windows [o_orderdate, +1..5 days); every lineitem ship
    * timestamp joins to every window containing it — no key equality —
    * then rolls up per ship day. The sampled side is plan-time small by
    * construction, so it is broadcast: the fact table never shuffles, and
    * the executed plan must show BroadcastHashJoin (PlanSpec-pinned), not
    * the BroadcastNestedLoopJoin the raw inequality would plan.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val totalOrders = Tables.orders(s, dir).count() // footer-count scan
    val rate = TargetWindows / totalOrders
    val ivl = Tables.orders(s, dir)
      .filter(Mix.uniformOf(col("o_orderkey"), "rjoin") < lit(rate))
      .select(col("o_orderkey"), col("o_totalprice"),
        usOf(col("o_orderdate")).as("w_start"),
        (usOf(col("o_orderdate")) +
          ((col("o_orderkey") % 5) + 1) * DayUs).as("w_end"))
    val pts = Tables.lineitem(s, dir)
      .select(col("l_shipdate"), usOf(col("l_shipdate")).as("p_us"))
    rangeJoinPairs(pts, col("p_us"), broadcast(ivl),
        col("w_start"), col("w_end"), binWidth = 5 * DayUs)
      .groupBy(col("l_shipdate").as("ship_ts"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_windows"),
        max(col("o_totalprice")).as("top_price"))
      .orderBy("ship_ts")
  }

  val qRangeJoinOracle: String = {
    val u = Mix.uniformSql("CAST(o_orderkey AS VARCHAR)", "rjoin")
    s"""WITH ivl AS (
       |  SELECT o_orderkey, o_totalprice, o_orderdate AS w_start,
       |    o_orderdate + ((o_orderkey % 5) + 1) * INTERVAL 1 DAY AS w_end
       |  FROM orders
       |  WHERE $u < ${TargetWindows} / (SELECT count(*) FROM orders))
       |SELECT l.l_shipdate AS ship_ts, count(*) AS n_pairs,
       |  count(DISTINCT i.o_orderkey) AS n_windows,
       |  max(i.o_totalprice) AS top_price
       |FROM lineitem l JOIN ivl i
       |  ON l.l_shipdate >= i.w_start AND l.l_shipdate < i.w_end
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_range_join" -> (qRangeJoin _))
  val oracles: Map[String, String] =
    Map("q_range_join" -> qRangeJoinOracle)
}
