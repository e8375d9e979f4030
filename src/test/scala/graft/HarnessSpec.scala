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

  test("bench epilogue prints the compact summary as the final stdout line even when cleanup throws") {
    // the driver's 2000-char tail parser reads the LAST stdout line; a
    // stop()-time or scratch-deletion failure must be swallowed (stderr),
    // not allowed to eat the summary — the r19 tail fix's remaining hole
    val compact = """{"metric":"total","value":1.0,"unit":"sec"}"""
    val out = new java.io.ByteArrayOutputStream()
    val err = new java.io.ByteArrayOutputStream()
    var secondRan = false
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      val errPs = new java.io.PrintStream(err, true, "UTF-8")
      val oldErr = System.err
      System.setErr(errPs)
      try Bench.printFinalLine(compact,
        () => throw new RuntimeException("scratch delete failed"),
        () => { secondRan = true })
      finally System.setErr(oldErr)
    }
    assert(secondRan, "a throwing cleanup must not skip later cleanups")
    val lines = out.toString("UTF-8").linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.nonEmpty && lines.last == compact)
    // the summary must also be parseable JSON (what the driver does)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(lines.last)
    assert(node.get("metric").asText == "total")
    assert(err.toString("UTF-8").contains("cleanup failed"))
  }

  test("host snapshot reads loadavg+steal and the degraded verdict uses only neighbor signals") {
    val snap = Bench.hostSnap()
    // on this Linux host the fields must be real (non-sentinel)
    assert(snap.load1 >= 0 && snap.totalTicks > 0 && snap.stealTicks >= 0)
    // quiet pre-run load + no steal growth => not degraded
    val quiet = Bench.HostSnap(0.2, 0.5, 1.0, 1, 100, 100000)
    val post = Bench.HostSnap(30.0, 10.0, 5.0, 40, 110, 200000)
    val (json1, deg1) = Bench.hostJson(quiet, None, post)
    assert(!deg1, "high MID/POST load is our own 32 threads, never degraded")
    assert(json1.contains("\"steal_pct\":") && json1.contains("\"pre\":"))
    // sbt's own startup leaves pre-run load1 ≈ 1.2 on an idle box (the
    // first r20 cycle measured exactly this) — must NOT read as degraded
    val (_, degSbt) = Bench.hostJson(quiet.copy(load1 = 1.19), None, post)
    assert(!degSbt, "sbt-startup self-load must not flag degraded")
    // external pre-run load flags degraded (the r19 evening signature:
    // 2.4-4.3 while idle)
    val (_, deg2) = Bench.hostJson(quiet.copy(load1 = 2.7), None, post)
    assert(deg2)
    // hypervisor steal over the window flags degraded
    val stolen = Bench.HostSnap(30.0, 10.0, 5.0, 40, 100 + 5000, 200000)
    val (_, deg3) = Bench.hostJson(quiet, None, stolen)
    assert(deg3)
  }
}
