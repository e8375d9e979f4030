package graft

import org.apache.spark.sql.functions._

import graft.harness.BenchHarness

class HarnessSpec extends SparkSpec {

  test("run executes suite × repeats × parallel conns and stats aggregate") {
    import spark.implicits._
    val suite = Map[String, () => org.apache.spark.sql.DataFrame](
      "tiny_agg" -> (() => spark.read.parquet(s"$sf/orders.parquet")
        .groupBy("o_orderstatus").count()),
      "tiny_filter" -> (() => spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_nationkey") < 10)))
    val timings = BenchHarness.run(spark, suite, repeats = 2, parallelism = 2)
    assert(timings.count() == 2L * 2 * 2) // queries × repeats × conns
    assert(timings.filter(col("seconds") <= 0).count() == 0)
    val st = BenchHarness.stats(timings)
    val byQ = st.collect().map(r =>
      r.getAs[String]("query") -> r.getAs[Long]("n_runs")).toMap
    assert(byQ == Map("tiny_agg" -> 4L, "tiny_filter" -> 4L))
    val rows = st.filter(col("query") === "tiny_filter")
      .select("rows").as[Long].first()
    assert(rows == spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_nationkey") < 10).count())
  }
}
