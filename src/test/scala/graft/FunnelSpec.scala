package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Direct semantics of the ordered-funnel operator — the strictly-after
  * rules the DuckDB oracle exercises only in aggregate.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)],
                  stages: Seq[String] = Seq("view", "click", "purchase")) =
    Relational.funnel(rows.toDF("user_id", "event_type", "ts_ns"), stages)
      .as[(String, Long)].collect().toMap

  test("events must occur in stage order: out-of-order users don't convert") {
    val got = run(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 20L),  // buy first
      (3L, "click", 5L), (3L, "view", 10L),                          // click first
      (4L, "view", 10L)))                                            // view only
    assert(got == Map("01_view" -> 4L, "02_click" -> 2L, "03_purchase" -> 1L))
  }

  test("strictly after: a tie with the previous stage does not advance") {
    val got = run(Seq(
      (1L, "view", 10L), (1L, "click", 10L),  // tie — no conversion
      (2L, "view", 10L), (2L, "click", 11L))) // strictly after — converts
    assert(got == Map("01_view" -> 2L, "02_click" -> 1L, "03_purchase" -> 0L))
  }

  test("first qualifying event gates the next stage (min after previous)") {
    // user's first click is BEFORE the view; the later click (after view)
    // still counts, and the purchase must follow THAT click
    val got = run(Seq(
      (1L, "click", 5L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "purchase", 15L),  // before the qualifying click — no
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 20L),
      (2L, "purchase", 25L))) // after it — yes
    assert(got == Map("01_view" -> 2L, "02_click" -> 2L, "03_purchase" -> 1L))
  }

  test("arbitrary stage lists work (generic operator, not a 3-stage special)") {
    val got = run(
      Seq((1L, "signup", 1L), (1L, "view", 2L), (2L, "signup", 9L)),
      stages = Seq("signup", "view"))
    assert(got == Map("01_signup" -> 2L, "02_view" -> 1L))
  }
}
