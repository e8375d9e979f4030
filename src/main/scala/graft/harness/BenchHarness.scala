package graft.harness

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbstress equivalent (evaluation_tools/dbstress__Current.py +
  * ETL_dbstress_results.py): run a named query suite with N parallel
  * "connections" × M repeats, land per-run timings, aggregate the latency
  * distribution per query.
  *
  * Parallel submissions share one SparkSession — exactly how concurrent BI
  * connections hit a warehouse — and Spark's FAIR-capable scheduler
  * interleaves the jobs. Timings land as a DataFrame so the stats step is
  * the same aggregation the engine already benchmarks.
  */
object BenchHarness {

  case class RunTiming(query: String, conn: Int, repeat: Int,
                       seconds: Double, rows: Long)

  /** Execute `suite` repeats×parallelism times; every (query, conn, repeat)
    * triple runs to completion against the noop sink — count() would let
    * Catalyst prune computed columns and under-measure (same rationale as
    * graft.Bench). Row counts are taken once per query, untimed, so the
    * stress timings measure only full-plan executions.
    */
  def run(spark: SparkSession,
          suite: Map[String, () => DataFrame],
          repeats: Int,
          parallelism: Int): DataFrame = {
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val rowCounts: Map[String, Long] =
        suite.map { case (name, mk) => name -> mk().count() }
      val futures = for {
        conn <- 0 until parallelism
        rep <- 0 until repeats
        (name, mk) <- suite.toSeq.sortBy(_._1)
      } yield Future {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        RunTiming(name, conn, rep, (System.nanoTime() - t0) / 1e9,
          rowCounts(name))
      }
      val timings = Await.result(Future.sequence(futures), Duration.Inf)
      import spark.implicits._
      timings.toDF()
    } finally pool.shutdown()
  }

  /** Per-query latency distribution — the reference's ETL_dbstress_results
    * aggregate (min/median/avg/p95/max over runs).
    */
  def stats(timings: DataFrame): DataFrame =
    timings.groupBy("query")
      .agg(
        count(lit(1)).as("n_runs"),
        min("seconds").as("min_s"),
        expr("percentile(seconds, 0.5)").as("p50_s"),
        avg("seconds").as("avg_s"),
        expr("percentile(seconds, 0.95)").as("p95_s"),
        max("seconds").as("max_s"),
        max("rows").as("rows"))
      .orderBy("query")
}
