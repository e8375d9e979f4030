package graft

import org.apache.spark.sql.functions._

import graft.sources.PaginatedIngest

class IngestSpec extends SparkSpec {

  /** Three pages with cursor chaining, like a query-history API. */
  private def pagedSource: Option[String] => (Seq[String], Option[String]) = {
    case None =>
      (Seq("""{"id": 1, "metrics": {"ms": 10}}""",
            """{"id": 2, "metrics": {"ms": 20}}"""), Some("p2"))
    case Some("p2") =>
      (Seq("""{"id": 3, "metrics": {"ms": 30}}"""), Some("p3"))
    case Some("p3") =>
      (Seq("""{"id": 2, "metrics": {"ms": 99}}"""), None)
    case other => fail(s"unexpected cursor $other")
  }

  test("drain follows the cursor chain to the last page") {
    val rows = PaginatedIngest.drain(pagedSource)
    assert(rows.length == 4)
    assert(rows.head.contains("\"id\": 1"))
  }

  test("drain maxPages bounds a cursor that never runs dry") {
    var calls = 0
    val endless: Option[String] => (Seq[Int], Option[String]) = { _ =>
      calls += 1
      (Seq(calls), Some(s"p$calls"))
    }
    val rows = PaginatedIngest.drain(endless, maxPages = 5)
    assert(rows == Seq(1, 2, 3, 4, 5))
    assert(calls == 5)
  }

  test("ingestJson parses pages into a queryable DataFrame") {
    val df = PaginatedIngest.ingestJson(spark, pagedSource)
    assert(df.count() == 4)
    assert(df.select(sum(col("metrics.ms"))).first().getLong(0) == 159L)
  }

  test("ingestAndMerge: flatten + latest-wins upsert into the target") {
    import spark.implicits._
    val target = Seq((1L, 5L), (9L, 90L)).toDF("id", "metrics_ms")
    val out = PaginatedIngest
      .ingestAndMerge(spark, target, pagedSource, Seq("id"),
        tiebreak = Seq(col("metrics_ms")))
      .orderBy("id")
    val got = out.as[(Long, Long)].collect().toSeq
    // id=2 appears twice in the feed → highest metrics_ms wins (99);
    // id=9 only in the target → survives; id=1 replaced by the feed row
    assert(got == Seq((1L, 10L), (2L, 99L), (3L, 30L), (9L, 90L)))
  }
}
