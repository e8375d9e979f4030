package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sources.{DeltaLite, IcebergLite}
import graft.streaming.EventStreams

/** Streaming SOURCES over the two table formats (TableStreams) — the
  * r12 verdict's #2: EventStreams had six format writers and no way to
  * consume a table as a stream. Covers: initial snapshot + per-commit
  * micro-batches, EXACTLY-ONCE across a query restart (the offset rides
  * the query checkpoint — sinks are foreachBatch, the recovery-capable
  * kind), the append-only refusal with the remedy named, and CDF mode
  * emitting `_change_type` rows equal to DeltaLite.changes' batch
  * answer.
  */
class TableStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run `source` to a fresh collector through `cp` until drained. */
  private def drain(source: DataFrame, cp: String,
                    sel: Seq[String]): Seq[Seq[Any]] = {
    val got = new ConcurrentLinkedQueue[Seq[Any]]()
    val q = source.writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select(sel.map(col): _*).collect()
          .foreach(r => got.add(r.toSeq))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    got.asScala.toSeq
  }

  test("delta append stream: initial snapshot, live commits arrive as " +
    "batches, and a RESTART from the checkpoint re-delivers nothing") {
    val base = newDir("graft_dstream")
    val t = s"$base/t"
    val cp = s"$base/cp"
    DeltaLite.commit(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    DeltaLite.commit(spark, t, Seq((3L, "c")).toDF("k", "s"))

    val got1 = new ConcurrentLinkedQueue[Long]()
    val q1 = EventStreams.readDeltaStream(spark, t).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("k").collect().foreach(r => got1.add(r.getLong(0)))
        ()
      }
      .start()
    try {
      q1.processAllAvailable()
      assert(got1.asScala.toSet == Set(1L, 2L, 3L),
        "initial snapshot = full current state")
      // a commit while the query runs arrives as its own micro-batch
      DeltaLite.commit(spark, t, Seq((4L, "d")).toDF("k", "s"))
      q1.processAllAvailable()
      assert(got1.asScala.toSet == Set(1L, 2L, 3L, 4L))
    } finally q1.stop()

    // offline commit, then restart from the SAME checkpoint: only the
    // new version arrives — nothing already delivered is replayed
    DeltaLite.commit(spark, t, Seq((5L, "e")).toDF("k", "s"))
    val got2 = drain(EventStreams.readDeltaStream(spark, t), cp, Seq("k"))
    assert(got2.map(_.head) == Seq(5L),
      s"restart must deliver exactly the unseen version, got $got2")
  }

  test("delta append stream REFUSES a non-append range with the remedy " +
    "named (consume via changes)") {
    val base = newDir("graft_dstream_ow")
    val t = s"$base/t"
    val cp = s"$base/cp"
    DeltaLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s"))
    drain(EventStreams.readDeltaStream(spark, t), cp, Seq("k"))

    DeltaLite.commit(spark, t, Seq((9L, "z")).toDF("k", "s"),
      overwrite = true)
    val e = intercept[StreamingQueryException] {
      drain(EventStreams.readDeltaStream(spark, t), cp, Seq("k"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("changes")),
      s"refusal must name the remedy: ${messages(e)}")
  }

  test("delta CDF stream: row-level _change_type batches equal the " +
    "batch changes() answer") {
    val base = newDir("graft_dstream_cdf")
    val t = s"$base/t"
    val cp = s"$base/cp"
    DeltaLite.commit(spark, t,
      (0L until 5L).map(k => (k, "base")).toDF("k", "s"))

    val got = new ConcurrentLinkedQueue[(Long, String, String)]()
    val q = EventStreams.readDeltaStream(spark, t, cdf = true,
      keys = Seq("k")).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(r =>
          got.add((r.getLong(0), r.getString(1), r.getString(2))))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val initial = got.asScala.toSet
      assert(initial == (0L until 5L).map(k => (k, "base", "insert")).toSet,
        "initial snapshot arrives as insert rows")

      // a merge while the query runs → update_pre/postimage + insert rows
      DeltaLite.selectiveMerge(spark, t,
        Seq((2L, "upd"), (7L, "new")).toDF("k", "s"), Seq("k"))
      q.processAllAvailable()
      val expected = DeltaLite.changes(spark, t, 0L, 1L, Seq("k"))
        .as[(Long, String, String)].collect().toSet
      val streamed = got.asScala.toSet -- initial
      assert(streamed == expected,
        "the CDF micro-batch must equal the batch changes() feed")
    } finally q.stop()
  }

  test("delta stream options: startingVersion skips the initial " +
    "snapshot; maxVersionsPerTrigger drains a backlog in bounded batches") {
    val base = newDir("graft_dstream_opts")
    val t = s"$base/t"
    DeltaLite.commit(spark, t, Seq((0L, "seed")).toDF("k", "s")) // v0
    (1L to 6L).foreach(v =>
      DeltaLite.commit(spark, t, Seq((v, s"r$v")).toDF("k", "s"))) // v1..v6

    // startingVersion=4: versions 4..6 only, no initial snapshot
    val fromV4 = drain(EventStreams.readDeltaStream(spark, t,
      startingVersion = Some(4L)), s"$base/cp_sv", Seq("k"))
    assert(fromV4.map(_.head).toSet == Set(4L, 5L, 6L),
      s"startingVersion must skip earlier versions, got $fromV4")

    // maxVersionsPerTrigger=2 from v1: the 6-version backlog drains in
    // ceil(6/2)=3 micro-batches, each covering ≤2 versions
    val batchSizes = new ConcurrentLinkedQueue[Int]()
    val q = EventStreams.readDeltaStream(spark, t,
      startingVersion = Some(1L), maxVersionsPerTrigger = Some(2))
      .writeStream
      .option("checkpointLocation", s"$base/cp_cap")
      .foreachBatch { (b: DataFrame, _: Long) =>
        batchSizes.add(b.count().toInt); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
    assert(sizes.sum == 6, s"all 6 rows must arrive: $sizes")
    assert(sizes.forall(_ <= 2) && sizes.length >= 3,
      s"the cap must bound each micro-batch at 2 versions: $sizes")
  }

  test("iceberg stream options: startingSnapshot skips the initial " +
    "snapshot; maxSnapshotsPerTrigger drains a backlog in bounded " +
    "ordinal batches") {
    val base = newDir("graft_istream_opts")
    val t = s"$base/t"
    IcebergLite.commit(spark, t, Seq((0L, "seed")).toDF("k", "s")) // snap 0
    (1L to 6L).foreach(v =>
      IcebergLite.commit(spark, t, Seq((v, s"r$v")).toDF("k", "s"))) // 1..6

    // startingSnapshot=3: changes AFTER snapshot 3 only (4..6), no
    // initial snapshot
    val from4 = drain(EventStreams.readIcebergStream(spark, t,
      startingSnapshot = Some(3L)), s"$base/cp_ss", Seq("k"))
    assert(from4.map(_.head).toSet == Set(4L, 5L, 6L),
      s"startingSnapshot must deliver only later snapshots, got $from4")

    // maxSnapshotsPerTrigger=2 after snapshot 0: the 6-snapshot backlog
    // drains in ceil(6/2)=3 bounded micro-batches
    val batchSizes = new ConcurrentLinkedQueue[Int]()
    val q = EventStreams.readIcebergStream(spark, t,
      startingSnapshot = Some(0L), maxSnapshotsPerTrigger = Some(2))
      .writeStream
      .option("checkpointLocation", s"$base/cp_cap")
      .foreachBatch { (b: DataFrame, _: Long) =>
        batchSizes.add(b.count().toInt); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val sizes = batchSizes.asScala.toSeq.filter(_ > 0)
    assert(sizes.sum == 6, s"all 6 rows must arrive: $sizes")
    assert(sizes.forall(_ <= 2) && sizes.length >= 3,
      s"the cap must bound each micro-batch at 2 snapshots: $sizes")
  }

  test("iceberg startingSnapshot validates on FIRST start only: a bogus " +
    "anchor refuses fresh, but a checkpointed restart does not re-run " +
    "the anchor check (committed offsets supersede the option)") {
    val base = newDir("graft_istream_anchor")
    val t = s"$base/t"
    IcebergLite.commit(spark, t, Seq((0L, "seed")).toDF("k", "s")) // snap 0
    IcebergLite.commit(spark, t, Seq((1L, "r1")).toDF("k", "s"))   // snap 1

    // fresh start, unpublished anchor: option validation refuses loudly
    val e = intercept[StreamingQueryException] {
      drain(EventStreams.readIcebergStream(spark, t,
        startingSnapshot = Some(999L)), s"$base/cp_bad", Seq("k"))
    }
    def messages(th: Throwable): Seq[String] =
      if (th == null) Nil
      else Option(th.getMessage).toSeq ++ messages(th.getCause)
    assert(messages(e).exists(_.contains("published snapshot-log")),
      s"fresh-start anchor validation must refuse: ${messages(e)}")

    // legit run through a checkpoint, then RESTART after the anchor's
    // snapshot-log entry disappeared (trimmed by foreign maintenance):
    // committed offsets exist, so the anchor must not hard-fail the query
    val cp = s"$base/cp_ok"
    val got1 = drain(EventStreams.readIcebergStream(spark, t,
      startingSnapshot = Some(0L)), cp, Seq("k"))
    assert(got1.map(_.head).toSet == Set(1L))
    IcebergLite.commit(spark, t, Seq((2L, "r2")).toDF("k", "s"))   // snap 2
    // trim snapshot 0 from the log of the NEWEST metadata version
    val newest = java.nio.file.Paths.get(t, "metadata", "v3.metadata.json")
    assert(java.nio.file.Files.exists(newest), "fixture drift: metaV")
    val txt = new String(java.nio.file.Files.readAllBytes(newest))
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(txt).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val log = node.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
      "snapshot-log")
    val trimmed = node.putArray("snapshot-log-tmp")
    log.elements().asScala.filter(_.get("snapshot-id").asLong() != 0L)
      .foreach(trimmed.add)
    node.set[com.fasterxml.jackson.databind.node.ObjectNode](
      "snapshot-log", trimmed.deepCopy())
    node.remove("snapshot-log-tmp")
    java.nio.file.Files.write(newest, node.toPrettyString.getBytes)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(t, "metadata", ".v3.metadata.json.crc"))

    val got2 = drain(EventStreams.readIcebergStream(spark, t,
      startingSnapshot = Some(0L)), cp, Seq("k"))
    assert(got2.map(_.head).toSet == Set(2L),
      s"restart must deliver only the new snapshot, got $got2")
  }

  test("iceberg CDF stream delivers v3 deletion-vector deletes as " +
    "_change_type=delete events (the puffin-DV snapshot flows through " +
    "changes() like any other delete)") {
    val base = newDir("graft_istream_v3")
    val t = s"$base/t"
    IcebergLite.commit(spark, t,
      (0L until 20L).map(k => (k, s"r$k")).toDF("k", "s")
        .repartitionByRange(2, col("k")))
    val seed = IcebergLite.snapshot(spark, t).snapshotId
    IcebergLite.deleteRowsV3(spark, t, Seq(4L, 15L).toDF("k"), Seq("k"))
    val got = drain(EventStreams.readIcebergStream(spark, t, cdf = true,
      keys = Seq("k"), startingSnapshot = Some(seed)),
      s"$base/cp", Seq("k", "_change_type"))
    assert(got.map(r => (r.head, r(1))).toSet ==
      Set((4L, "delete"), (15L, "delete")),
      s"exactly the DV-masked rows must stream as deletes: $got")
  }

  test("cross-format replication: a Delta table's CDF stream lands in " +
    "an Iceberg table — merges, deletes, and live commits all mirror") {
    val base = newDir("graft_replicate")
    val src = s"$base/delta_src"
    val dst = s"$base/iceberg_dst"
    DeltaLite.commit(spark, src,
      (0L until 20L).map(k => (k, "base")).toDF("k", "s")
        .repartitionByRange(2, col("k")))
    DeltaLite.setTableProperty(spark, src, DeltaLite.CdfProperty, "true")

    val q = EventStreams.replicateDeltaToIceberg(spark, src, dst, Seq("k"))
      .option("checkpointLocation", s"$base/cp")
      .start()
    try {
      q.processAllAvailable()
      assert(IcebergLite.read(spark, dst).as[(Long, String)].collect().toSet
        == DeltaLite.read(spark, src).as[(Long, String)].collect().toSet,
        "initial snapshot must seed the destination")

      // live source changes: an update + an insert, then a delete
      DeltaLite.selectiveMerge(spark, src,
        Seq((3L, "upd"), (50L, "new")).toDF("k", "s"), Seq("k"))
      DeltaLite.selectiveDelete(spark, src, Seq(7L).toDF("k"), Seq("k"))
      q.processAllAvailable()
      val srcRows = DeltaLite.read(spark, src)
        .as[(Long, String)].collect().toSet
      val dstRows = IcebergLite.read(spark, dst)
        .as[(Long, String)].collect().toSet
      assert(dstRows == srcRows,
        s"replica diverged: missing=${srcRows -- dstRows} extra=${dstRows -- srcRows}")
      assert(dstRows.exists(_ == (3L, "upd")) && !dstRows.exists(_._1 == 7L))

    } finally q.stop()

    // the adversarial batch shapes, GUARANTEED in one micro-batch: the
    // query is stopped while the source takes insert-then-DELETE of a
    // new key (must end dead) and delete-then-REINSERT of an old key
    // (must end alive); the restart's single catch-up batch covers all
    // four commits — per-key last-event resolution by _commit_version
    // decides
    DeltaLite.selectiveMerge(spark, src, Seq((60L, "x")).toDF("k", "s"),
      Seq("k"))
    DeltaLite.selectiveDelete(spark, src, Seq(60L).toDF("k"), Seq("k"))
    DeltaLite.selectiveDelete(spark, src, Seq(2L).toDF("k"), Seq("k"))
    DeltaLite.selectiveMerge(spark, src, Seq((2L, "back")).toDF("k", "s"),
      Seq("k"))
    val q2 = EventStreams.replicateDeltaToIceberg(spark, src, dst, Seq("k"))
      .option("checkpointLocation", s"$base/cp")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val srcRows2 = DeltaLite.read(spark, src)
      .as[(Long, String)].collect().toSet
    val dstRows2 = IcebergLite.read(spark, dst)
      .as[(Long, String)].collect().toSet
    assert(dstRows2 == srcRows2,
      s"replica diverged after adversarial batch: " +
        s"missing=${srcRows2 -- dstRows2} extra=${dstRows2 -- srcRows2}")
    assert(!dstRows2.exists(_._1 == 60L), "insert-then-delete must die")
    assert(dstRows2.exists(_ == (2L, "back")),
      "delete-then-reinsert must live")
  }

  test("reverse replication: an Iceberg table's CDF stream lands in a " +
    "Delta table — merges, merge-on-read deletes, and catch-up mirror") {
    val base = newDir("graft_replicate_rev")
    val src = s"$base/iceberg_src"
    val dst = s"$base/delta_dst"
    IcebergLite.commit(spark, src,
      (0L until 20L).map(k => (k, "base")).toDF("k", "s")
        .repartitionByRange(2, col("k")))

    val q = EventStreams.replicateIcebergToDelta(spark, src, dst, Seq("k"))
      .option("checkpointLocation", s"$base/cp")
      .start()
    try {
      q.processAllAvailable()
      assert(DeltaLite.read(spark, dst).as[(Long, String)].collect().toSet
        == IcebergLite.read(spark, src).as[(Long, String)].collect().toSet,
        "initial snapshot must seed the destination")

      // live source changes: a merge (update + insert), then a
      // merge-on-read position delete — no source data file rewritten
      IcebergLite.selectiveMerge(spark, src,
        Seq((3L, "upd"), (50L, "new")).toDF("k", "s"), Seq("k"))
      IcebergLite.deleteRows(spark, src, Seq(7L).toDF("k"), Seq("k"))
      q.processAllAvailable()
      val srcRows = IcebergLite.read(spark, src)
        .as[(Long, String)].collect().toSet
      val dstRows = DeltaLite.read(spark, dst)
        .as[(Long, String)].collect().toSet
      assert(dstRows == srcRows,
        s"replica diverged: missing=${srcRows -- dstRows} extra=${dstRows -- srcRows}")
      assert(dstRows.exists(_ == (3L, "upd")) && !dstRows.exists(_._1 == 7L))
    } finally q.stop()

    // adversarial catch-up: insert-then-DELETE of a new key (must end
    // dead) and delete-then-REINSERT of an old key (must end alive),
    // resolved in ONE restart batch by the history-ordinal
    // _commit_version
    IcebergLite.selectiveMerge(spark, src, Seq((60L, "x")).toDF("k", "s"),
      Seq("k"))
    IcebergLite.deleteRows(spark, src, Seq(60L).toDF("k"), Seq("k"),
      equality = true)
    IcebergLite.deleteRows(spark, src, Seq(2L).toDF("k"), Seq("k"))
    IcebergLite.selectiveMerge(spark, src, Seq((2L, "back")).toDF("k", "s"),
      Seq("k"))
    val q2 = EventStreams.replicateIcebergToDelta(spark, src, dst, Seq("k"))
      .option("checkpointLocation", s"$base/cp")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val srcRows2 = IcebergLite.read(spark, src)
      .as[(Long, String)].collect().toSet
    val dstRows2 = DeltaLite.read(spark, dst)
      .as[(Long, String)].collect().toSet
    assert(dstRows2 == srcRows2,
      s"replica diverged after adversarial batch: " +
        s"missing=${srcRows2 -- dstRows2} extra=${dstRows2 -- srcRows2}")
    assert(!dstRows2.exists(_._1 == 60L), "insert-then-delete must die")
    assert(dstRows2.exists(_ == (2L, "back")),
      "delete-then-reinsert must live")
  }

  test("streamingEqDelete: a CDC delete feed lands as per-batch " +
    "equality delete files; replay changes nothing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = newDir("graft_eqdel_stream")
    val t = s"$base/t"
    IcebergLite.commit(spark, t,
      (0L until 30L).map(k => (k, s"r$k")).toDF("k", "s"))
    val mem = MemoryStream[Long]
    val q = EventStreams.streamingEqDelete(mem.toDF().toDF("k"), t, Seq("k"))
      .option("checkpointLocation", s"$base/cp")
      .start()
    try {
      mem.addData(2L, 5L)
      q.processAllAvailable()
      assert(IcebergLite.read(spark, t).select("k").as[Long].collect().toSet
        == (0L until 30L).toSet -- Set(2L, 5L))
      mem.addData(5L, 9L) // 5 replays at the value level
      q.processAllAvailable()
      assert(IcebergLite.read(spark, t).select("k").as[Long].collect().toSet
        == (0L until 30L).toSet -- Set(2L, 5L, 9L))
    } finally q.stop()
  }

  test("iceberg append stream: initial snapshot + incremental batches, " +
    "exactly-once across restart") {
    val base = newDir("graft_istream")
    val t = s"$base/t"
    val cp = s"$base/cp"
    IcebergLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s"))
    val got1 = new ConcurrentLinkedQueue[Long]()
    val q1 = EventStreams.readIcebergStream(spark, t).writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("k").collect().foreach(r => got1.add(r.getLong(0)))
        ()
      }
      .start()
    try {
      q1.processAllAvailable()
      IcebergLite.commit(spark, t, Seq((2L, "b"), (3L, "c")).toDF("k", "s"))
      q1.processAllAvailable()
      assert(got1.asScala.toSet == Set(1L, 2L, 3L))
    } finally q1.stop()

    IcebergLite.commit(spark, t, Seq((4L, "d")).toDF("k", "s"))
    val got2 = drain(EventStreams.readIcebergStream(spark, t), cp, Seq("k"))
    assert(got2.map(_.head) == Seq(4L),
      s"restart must deliver exactly the unseen snapshot, got $got2")
  }

  test("startingTimestamp: the Delta source resolves it ICT-aware to " +
    "the first version at or after the bound; the Iceberg source " +
    "anchors on the snapshot-log's timestamp-ms") {
    val base = newDir("graft_stream_ts")
    val t = s"$base/d"
    DeltaLite.commit(spark, t, Seq((0L, "seed")).toDF("k", "s")) // v0
    DeltaLite.enableInCommitTimestamps(spark, t)                 // v1
    (2L to 5L).foreach(v =>
      DeltaLite.commit(spark, t, Seq((v, s"r$v")).toDF("k", "s"))) // v2..v5
    val t4 = DeltaLite.history(spark, t)
      .filter(col("version") === 4L)
      .select("in_commit_timestamp").head().getLong(0)
    val got = drain(EventStreams.readDeltaStream(spark, t,
      startingTimestamp = Some(t4)), s"$base/cp_dts", Seq("k"))
    assert(got.map(_.head).toSet == Set(4L, 5L),
      s"startingTimestamp must deliver v4 on, got $got")
    // a bound past the tip delivers nothing (waits for future commits)
    val none = drain(EventStreams.readDeltaStream(spark, t,
      startingTimestamp = Some(System.currentTimeMillis() + 3600000L)),
      s"$base/cp_dts2", Seq("k"))
    assert(none.isEmpty, s"a future bound must wait, got $none")

    // Iceberg: forge real wall-clock stamps into the snapshot log (our
    // writer zeroes them for determinism; foreign logs carry them)
    val ti = s"$base/i"
    (0L to 4L).foreach(v =>
      IcebergLite.commit(spark, ti, Seq((v, s"r$v")).toDF("k", "s")))
    val vHint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ti, "metadata", "version-hint.text"))).trim
    val metaPath = java.nio.file.Paths.get(ti, "metadata",
      s"v$vHint.metadata.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.readTree(metaPath.toFile)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    Seq("snapshots", "snapshot-log").foreach { arr =>
      val it = meta.get(arr).elements()
      var ord = 0
      while (it.hasNext) {
        ord += 1
        it.next().asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .put("timestamp-ms", ord * 1000L)
      }
    }
    java.nio.file.Files.write(metaPath,
      om.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    // the local FS keeps a checksum sidecar for files IT wrote; this
    // rewrite went around it, so drop the stale CRC
    java.nio.file.Files.deleteIfExists(
      metaPath.resolveSibling(s".v$vHint.metadata.json.crc"))
    // snapshots now stamped 1000..5000 (snapshot-log entries share the
    // regex but anchoring uses the snapshots array; both get stamps).
    // Bound 3500: anchor = newest snapshot stamped < 3500 → deliver the
    // ones at/after
    val igot = drain(EventStreams.readIcebergStream(spark, ti,
      startingTimestamp = Some(3500L)), s"$base/cp_its", Seq("k"))
    assert(igot.map(_.head).toSet == Set(3L, 4L),
      s"startingTimestamp must anchor mid-log, got $igot")
  }

  test("WAP isolation: a staged branch commit never reaches a main " +
    "stream (even under maxSnapshotsPerTrigger); fastForward delivers " +
    "the staged rows at publish time") {
    val base = newDir("graft_wap_stream")
    val t = s"$base/t"
    IcebergLite.commit(spark, t, Seq((0L, "main0")).toDF("k", "s"))
    IcebergLite.createBranch(spark, t, "staging")
    IcebergLite.commitToBranch(spark, t, "staging",
      Seq((100L, "staged")).toDF("k", "s"))
    IcebergLite.commit(spark, t, Seq((1L, "main1")).toDF("k", "s"))
    // the per-trigger cap must count PUBLISHED states — a cap of 1 that
    // stepped through the shared snapshots array would stop on the
    // branch head and leak the staged row
    val got = drain(EventStreams.readIcebergStream(spark, t,
      maxSnapshotsPerTrigger = Some(1)), s"$base/cp_wap", Seq("k"))
    assert(got.map(_.head).toSet == Set(0L, 1L),
      s"staged rows must not reach the main stream, got $got")

    // publish leg on its own table (fastForward requires main not to
    // have diverged past the branch point)
    val t2 = s"$base/t2"
    IcebergLite.commit(spark, t2, Seq((0L, "main0")).toDF("k", "s"))
    IcebergLite.createBranch(spark, t2, "staging")
    IcebergLite.commitToBranch(spark, t2, "staging",
      Seq((100L, "staged")).toDF("k", "s"))
    val pre = drain(EventStreams.readIcebergStream(spark, t2),
      s"$base/cp_wap2", Seq("k"))
    assert(pre.map(_.head) == Seq(0L),
      s"before the publish only main rows flow, got $pre")
    IcebergLite.fastForward(spark, t2, "staging")
    val got2 = drain(EventStreams.readIcebergStream(spark, t2),
      s"$base/cp_wap2", Seq("k"))
    assert(got2.map(_.head) == Seq(100L),
      s"the publish must deliver exactly the staged rows, got $got2")
  }
}
