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

  test("ensureState: command fires once, polls until target, idempotent") {
    // fake endpoint: STOPPED until start() is called, RUNNING 3 polls later
    var started = false
    var polls = 0
    var slept = 0L
    def state(): String = {
      polls += 1
      if (started && polls >= 4) "RUNNING" else if (started) "STARTING"
      else "STOPPED"
    }
    var commands = 0
    val (st, n) = graft.sources.EndpointControl.ensureState(
      () => state(), () => { commands += 1; started = true },
      target = Set("RUNNING"),
      pollEveryMs = 10, timeoutMs = 10000,
      sleep = ms => slept += ms, now = () => slept)
    assert(st == "RUNNING" && commands == 1 && n >= 2)
    // already-running endpoint: no command, single poll
    val (st2, n2) = graft.sources.EndpointControl.ensureState(
      () => "RUNNING", () => fail("command on an already-running endpoint"),
      target = Set("RUNNING"))
    assert(st2 == "RUNNING" && n2 == 1)
  }

  test("awaitState: times out loudly instead of returning a wrong state") {
    var fakeNow = 0L
    intercept[java.util.concurrent.TimeoutException] {
      graft.sources.EndpointControl.awaitState(
        () => "STARTING", Set("RUNNING"),
        pollEveryMs = 100, timeoutMs = 1000,
        sleep = ms => fakeNow += ms, now = () => fakeNow)
    }
  }

  test("status snapshots accumulate with polled_timestamp, newest first") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_endp").toString
    val s1 = Seq(("e1", "STOPPED"), ("e2", "RUNNING")).toDF("endpoint", "state")
    val s2 = Seq(("e1", "RUNNING"), ("e2", "RUNNING")).toDF("endpoint", "state")
    graft.sources.EndpointControl.appendStatusSnapshot(spark, s1, dir, 1000L)
    graft.sources.EndpointControl.appendStatusSnapshot(spark, s2, dir, 2000L)
    val h = graft.sources.EndpointControl.statusHistory(spark, dir)
    assert(h.count() == 4)
    assert(h.first().getAs[java.sql.Timestamp]("polled_timestamp").getTime == 2000L)
    // the SCD2 shape: e1's state change is visible across the two polls
    val e1 = h.filter($"endpoint" === "e1").orderBy("polled_timestamp")
      .select("state").as[String].collect().toSeq
    assert(e1 == Seq("STOPPED", "RUNNING"))
  }
}
