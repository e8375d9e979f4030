package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.DeltaLite

/** The driver-side snapshot state ceiling (r13 verdict's #6): DeltaLite
  * replays every `add` action (path + stats JSON) into driver memory.
  * This spec MEASURES that cost on a forged 100k-file log — replay
  * touches only the log, never the data files, so the files need not
  * exist — and pins loose upper bounds so a regression in replay
  * complexity (accidental quadratic, per-add fs call) fails loudly.
  * The measured numbers live in SURVEY §5.
  */
class SnapshotScaleSpec extends SparkSpec {
  import spark.implicits._

  private val N = 100000

  test("100k-file log: JSON replay and checkpoint bootstrap stay " +
    "bounded; retained footprint is linear in file count") {
    val t = Files.createTempDirectory("graft_snapceil").toString + "/t"
    DeltaLite.commit(spark, t, Seq((1L, "seed")).toDF("k", "s")) // v0
    // one forged commit adding 100k stats-bearing files (the realistic
    // shape: a backfill); ~35 MB of NDJSON
    val sb = new StringBuilder(N * 300)
    sb.append("""{"commitInfo":{"operation":"BACKFILL","timestamp":0}}""")
      .append('\n')
    var i = 0
    while (i < N) {
      // forged key domain starts at 10^9 — disjoint from the probe range
      // below, so the pruned read only ever opens the REAL seed file
      sb.append("""{"add":{"path":"part-backfill-""").append(i)
        .append(""".parquet","size":1048576,"partitionValues":{},""")
        .append(""""modificationTime":0,"dataChange":true,"stats":""")
        .append(""""{\"numRecords\":1000,\"minValues\":{\"k\":""")
        .append(1000000000L + i)
        .append("""},\"maxValues\":{\"k\":""").append(1000000000L + i)
        .append("""},\"nullCount\":{\"k\":0}}"}}""").append('\n')
      i += 1
    }
    Files.write(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      sb.toString.getBytes(StandardCharsets.UTF_8))

    val t0 = System.nanoTime()
    val s = DeltaLite.snapshot(spark, t)
    val replayMs = (System.nanoTime() - t0) / 1000000
    assert(s.files.size == N + 1)
    assert(s.stats.size >= N, "stats must ride the replay")
    // retained driver footprint (UTF-16 string bytes of paths + stats)
    val retainedMb = (s.files.map(_.length * 2L).sum +
      s.stats.map { case (k, v) => (k.length + v.length) * 2L }.sum) >> 20
    info(s"JSON replay of ${N + 1} adds: $replayMs ms, " +
      s"~$retainedMb MB retained on the driver")
    assert(replayMs < 60000, s"replay took $replayMs ms — not linear?")
    assert(retainedMb < 200, s"footprint $retainedMb MB — stats blew up?")

    // bootstrap path: one checkpoint, then resolution reads the parquet
    // checkpoint (distributed scan, driver-side collect of the list)
    val cpT0 = System.nanoTime()
    DeltaLite.checkpoint(spark, t)
    val cpWriteMs = (System.nanoTime() - cpT0) / 1000000
    val t1 = System.nanoTime()
    val s2 = DeltaLite.snapshot(spark, t)
    val bootMs = (System.nanoTime() - t1) / 1000000
    assert(s2.files.size == N + 1 && s2.stats.size >= N)
    info(s"checkpoint write: $cpWriteMs ms; bootstrap resolution: $bootMs ms")
    assert(bootMs < 60000, s"bootstrap took $bootMs ms")

    // a pruned read still plans driver-side over the 100k add-stats
    // (statsIntersect over the in-memory map, no I/O): selectiveMerge's
    // planning half must stay interactive at this file count
    val t2 = System.nanoTime()
    val scan = DeltaLite.readWhere(spark, t, "k", 0L, 20L)
    val nSurvived = scan.df.count()
    val planMs = (System.nanoTime() - t2) / 1000000
    assert(scan.filesSkipped == N && nSurvived == 1L,
      s"stats pruning must drop every backfill file: $scan")
    info(s"readWhere plan+scan over ${N + 1} files: $planMs ms")
    assert(planMs < 30000, s"stats planning took $planMs ms")
  }
}
