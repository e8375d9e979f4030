package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TpchTail

/** Semantics + scale posture of the TPC-H tail (Q2/Q8/Q9/Q11/Q12/Q13/Q16/
  * Q17/Q20/Q21 shapes). The DuckDB oracle hash-matches aggregate output;
  * these tests pin the edge rules the aggregate can't isolate (zero-count
  * customers, straggler ties) and the plan properties that decide 100 TB
  * behavior (dims broadcast, filters pushed to the scan, no cartesians).
  */
class TpchTailSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: String): Timestamp = Timestamp.valueOf(s"$d 00:00:00")

  // ------------------------------------------------------- Q13 semantics
  test("q13 core: zero-order customers land in the c_count=0 bucket") {
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val got = TpchTail.orderCountDistribution(customer, orders)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  // ------------------------------------------------------- Q21 semantics
  private def blame(lines: Seq[(Long, Long, Timestamp)],
                    orderKeys: Seq[Long]): Set[(Long, Long)] =
    TpchTail.stragglerBlame(
      lines.toDF("l_orderkey", "l_suppkey", "l_shipdate"),
      orderKeys.toDF("o_orderkey"))
      .as[(Long, Long)].collect().toSet

  test("q21 core: the strictly-last supplier in a multi-supplier order is blamed") {
    val got = blame(Seq(
      (1L, 100L, ts("1996-03-01")), (1L, 200L, ts("1996-01-01")),
      // supplier 100's max over its two lines decides
      (1L, 100L, ts("1996-02-01"))),
      orderKeys = Seq(1L))
    assert(got == Set((1L, 100L)))
  }

  test("q21 core: a tie at the order max blames nobody") {
    val got = blame(Seq(
      (1L, 100L, ts("1996-03-01")), (1L, 200L, ts("1996-03-01")),
      (1L, 300L, ts("1996-01-01"))),
      orderKeys = Seq(1L))
    assert(got.isEmpty)
  }

  test("q21 core: single-supplier orders and filtered-out orders never blame") {
    val got = blame(Seq(
      (1L, 100L, ts("1996-03-01")),                                // alone
      (2L, 100L, ts("1996-03-01")), (2L, 200L, ts("1996-01-01"))), // order excluded
      orderKeys = Seq(1L))
    assert(got.isEmpty)
  }

  // ------------------------------------------------------- scale posture
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("tpch tail: part-side filters are pushed into the part scan") {
    assert(plan("q9_product_profit").contains("StringContains(p_name,widget)"),
      "q9's widget filter must prune the part scan")
    assert(plan("q20_excess_shipper").contains("StringContains(p_name,bolt)"),
      "q20's bolt filter must prune the part scan")
    val q16 = plan("q16_supplier_cnt")
    assert(q16.contains("Not(EqualTo(p_brand,Brand#5))"),
      "q16's brand exclusion must prune the part scan")
  }

  test("tpch tail: date ranges reach the fact/orders scans") {
    assert(plan("q12_ship_delay").contains("GreaterThanOrEqual(l_shipdate,"),
      "q12's ship-date range must be pushed to the lineitem scan")
    assert(plan("q8_market_share").contains("GreaterThanOrEqual(o_orderdate,"),
      "q8's order-date range must be pushed to the orders scan")
    assert(plan("q20_excess_shipper").contains("GreaterThanOrEqual(l_shipdate,"),
      "q20's ship-date range must be pushed to the lineitem scan")
  }

  test("tpch tail: dimension joins broadcast; anti join broadcasts") {
    // q8 joins part/customer/supplier/nation dims — every one a broadcast
    // build side; the only sort-merge-eligible join is lineitem x orders
    val q8 = plan("q8_market_share")
    assert(q8.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 4,
      "q8's four dim joins must broadcast")
    val q16 = plan("q16_supplier_cnt")
    assert(q16.contains("BroadcastHashJoin") && q16.contains("LeftAnti"),
      "q16's complaints exclusion must be a broadcast anti join")
  }

  test("q16: broadcast part filter runs below the first shuffle") {
    // the one big exchange (the countDistinct partial) must carry only
    // pair tuples that survived the part filter — i.e. both broadcast
    // joins sit BELOW the first hash exchange, and there are at most the
    // two count-distinct exchanges (keys+suppkey partial, keys final)
    val p = plan("q16_supplier_cnt")
    // plans print root-first: a deeper node appears LATER in the string,
    // so "no shuffle below the join" = every PLANNED exchange
    // (ENSURE_REQUIREMENTS) prints before it. The scan fan-out exchange
    // (REPARTITION_BY_NUM — since r20 a deterministic hash on
    // l_orderkey, not a round-robin) legitimately sits below the join:
    // it is the single-row-group scan's parallelism rescue, carries the
    // same bytes wherever it sits, and vanishes on production layouts.
    val firstBhj = p.indexOf("BroadcastHashJoin")
    val planned = raw"Exchange hashpartitioning[^\n]*ENSURE_REQUIREMENTS".r
    val below = planned.findAllMatchIn(p).map(_.start).filter(_ > firstBhj)
    assert(firstBhj >= 0 && below.isEmpty,
      s"q16 must not plan a shuffle below the part filter join:\n$p")
    val shuffles = planned.findAllMatchIn(p).size
    assert(shuffles <= 2,
      s"q16 should need at most 2 planned hash exchanges " +
        s"(count-distinct phases); got $shuffles:\n$p")
  }

  test("q21: pair aggregate and both window passes share one order-key exchange") {
    // the explicit l_orderkey repartition satisfies the composite-key
    // aggregate AND the two chained Window nodes, so the only OTHER
    // shuffle exchange is the tiny s_name count (the testdata fan-out
    // round-robin is excluded — it's identity on production layouts)
    val p = plan("q21_waiting_supplier")
    val windows = p.sliding("Window ".length).count(_ == "Window ")
    assert(windows >= 2, s"expected chained window passes, got:\n$p")
    val shuffles = p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(shuffles <= 2,
      s"q21 should need 2 hash exchanges (order key, name agg); got $shuffles:\n$p")
  }
}
