package graft

import org.apache.spark.sql.functions._

import graft.harness.BenchHarness
import graft.sources.JdbcBridge

/** JDBC connectivity against an EMBEDDED Derby database (the driver
  * Spark ships for its metastore — a real JDBC endpoint in-JVM, so the
  * leg the reference's dbstress drives over Simba is exercised with
  * zero network): export → partitioned parallel import round trip, and
  * BenchHarness stressing a suite THROUGH the JDBC source with
  * repeats × parallel connections.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("export → range-partitioned import round-trips values, runs as " +
    "N concurrent range queries, and pushes filters into the source") {
    val src = (0L until 1000L).map(k => (k, k * 2.0, s"g${k % 4}"))
      .toDF("k", "v", "g")
    JdbcBridge.exportTable(src, url, "ROUNDTRIP")

    val back = JdbcBridge.importTable(spark, url, "ROUNDTRIP",
      range = Some(("k", 0L, 1000L, 4)))
    assert(back.rdd.getNumPartitions == 4,
      "range import must fan out to n concurrent connections")
    assert(back.count() == 1000L)
    assert(back.agg(sum("v")).head().getDouble(0) == (0L until 1000L)
      .map(_ * 2.0).sum)
    // filters reach the generated SQL (the JDBC relation prints its
    // pushed predicates in the plan tree)
    val filtered = back.filter(col("k") < 10L)
    assert(filtered.count() == 10L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"),
      s"filter must push into the JDBC scan:\n$plan")

    // single-cursor import (dimension pull): same values, one task
    val whole = JdbcBridge.importTable(spark, url, "ROUNDTRIP")
    assert(whole.count() == 1000L && whole.rdd.getNumPartitions == 1)
  }

  test("BenchHarness drives a suite THROUGH the JDBC source: repeats x " +
    "parallel connections, per-query latency stats (the dbstress shape)") {
    val src = (0L until 500L).map(k => (k, (k % 7).toDouble))
      .toDF("k", "v")
    JdbcBridge.exportTable(src, url, "STRESS")
    // Spark's JDBC writer quotes identifiers, so the lowercase source
    // columns must be quoted in endpoint-dialect SQL (Derby folds
    // unquoted names to uppercase) — the same care a dbstress suite
    // against any real endpoint takes
    val suite = JdbcBridge.jdbcSuite(spark, url, Map(
      "agg"  -> """SELECT COUNT(*) AS n, SUM("v") AS s FROM STRESS""",
      "topk" -> ("""SELECT "k", "v" FROM STRESS WHERE "v" > 3 """ +
        """ORDER BY "k" FETCH FIRST 25 ROWS ONLY""")))
    val timings = BenchHarness.run(spark, suite, repeats = 2,
      parallelism = 2)
    val stats = BenchHarness.stats(timings).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(7))).toMap
    assert(stats("agg") == ((4L, 1L)),
      s"2 conns x 2 repeats, 1 result row: ${stats("agg")}")
    assert(stats("topk")._1 == 4L && stats("topk")._2 == 25L)
  }
}
