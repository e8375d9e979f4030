package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming semantics, exercised under BOTH state store providers: the
  * default in-memory HDFSBackedStateStoreProvider AND RocksDB — the
  * provider a 100 TB deployment actually runs (state no longer bounded by
  * executor heap). The provider is a session conf read at query START, so
  * each parametrized test sets it around `.start()`; every stateful test
  * body is provider-agnostic and must produce identical results on both.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val providers = Seq(
    "hashmap" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  case class Raw(ts: Timestamp, event_type: String, value: Double)

  for ((label, cls) <- providers) {

    test(s"[$label] streaming windowed agg over MemoryStream matches batch result") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[Raw]
        val hour = 3600L * 1000
        val rows = Seq(
          Raw(new Timestamp(0), "click", 1.0),
          Raw(new Timestamp(10 * 60 * 1000), "click", 2.0),
          Raw(new Timestamp(hour + 1000), "view", 5.0),
          Raw(new Timestamp(hour + 2000), "click", 3.0))
        val q = EventStreams.streamingWindowedAgg(mem.toDF())
          .writeStream.format("memory").queryName(s"win_agg_$label")
          .outputMode("update").start()
        try {
          mem.addData(rows: _*)
          q.processAllAvailable()
          val got = spark.table(s"win_agg_$label")
            .select("window_start", "event_type", "n_events", "sum_value")
            .as[(Timestamp, String, Long, Double)].collect()
            .map { case (w, t, n, s) => (w.getTime, t, n, s) }.toSet
          assert(got == Set(
            (0L, "click", 2L, 3.0),
            (hour, "view", 1L, 5.0),
            (hour, "click", 1L, 3.0)))
        } finally q.stop()
      }
    }

    test(s"[$label] streaming sessionize closes sessions on gap; state times out") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[EventStreams.Ev]
        val q = EventStreams.streamingSessionize(mem.toDS(), gapMs = 60 * 1000)
          .writeStream.format("memory").queryName(s"sessions_$label")
          .outputMode("append").start()
        try {
          // user 1: two events 10s apart (one session), then a 5-minute gap,
          // then another event → first session closes on the gap. Timestamps
          // sit well above epoch 0 so the initial watermark can't drop them.
          val base = 1_000_000_000_000L
          mem.addData(
            EventStreams.Ev(1L, base, 1.0),
            EventStreams.Ev(1L, base + 10_000L, 2.0))
          q.processAllAvailable()
          mem.addData(EventStreams.Ev(1L, base + 310_000L, 4.0))
          q.processAllAvailable()
          val got = spark.table(s"sessions_$label")
            .as[EventStreams.Session].collect().toSet
          assert(got.contains(EventStreams.Session(1L, base, base + 10_000L, 2L, 3.0)))
        } finally q.stop()
      }
    }

    test(s"[$label] streaming dedup: duplicate ids within the watermark are dropped") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Long, Timestamp, Double)]
        val q = EventStreams.streamingDedup(
            mem.toDF().toDF("event_id", "ts", "value"), "event_id")
          .writeStream.format("memory").queryName(s"deduped_$label")
          .outputMode("append").start()
        try {
          val base = 1_000_000_000_000L
          mem.addData(
            (1L, new Timestamp(base), 1.0),
            (1L, new Timestamp(base), 1.0), // in-batch dup
            (2L, new Timestamp(base + 1000), 2.0))
          q.processAllAvailable()
          // cross-batch dup id, re-stamped ts — must still drop (dedup is on
          // the id alone, within the watermark)
          mem.addData((1L, new Timestamp(base + 5000), 9.0))
          q.processAllAvailable()
          val ids = spark.table(s"deduped_$label").select("event_id")
            .as[Long].collect().toSeq.sorted
          assert(ids == Seq(1L, 2L))
        } finally q.stop()
      }
    }

    test(s"[$label] streaming dedup: hot replayed id — state rows ∝ distinct ids, not arrivals") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Long, Timestamp, Double)]
        val q = EventStreams.streamingDedup(
            mem.toDF().toDF("event_id", "ts", "value"), "event_id")
          .writeStream.format("memory").queryName(s"hot_dedup_$label")
          .outputMode("append").start()
        try {
          val base = 1_000_000_000_000L
          // id 1 replayed 2000× in one batch (the hot-key flood) + 50 cold
          val hot = (0 until 2000).map(i => (1L, new Timestamp(base + i), 1.0))
          val cold = (2L to 51L).map(k => (k, new Timestamp(base + k), k.toDouble))
          mem.addData(hot ++ cold: _*)
          q.processAllAvailable()
          // and replayed again across the batch boundary
          mem.addData((0 until 500).map(i =>
            (1L, new Timestamp(base + 10_000 + i), 9.0)): _*)
          q.processAllAvailable()
          val out = spark.table(s"hot_dedup_$label")
            .select("event_id").as[Long].collect()
          assert(out.length == 51 && out.toSet == (1L to 51L).toSet,
            "exactly one survivor per distinct id")
          // the hot id holds ONE state row: dedup state is keyed on the id,
          // so 2500 arrivals of id 1 cannot grow it — the property that
          // keeps a replay storm from ballooning a 100 TB deployment's
          // state store
          val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
          assert(state <= 51,
            s"state holds $state rows — must be ∝ distinct ids (51), not arrivals (2550)")
        } finally q.stop()
      }
    }

    test(s"[$label] streaming funnel matches the batch funnel on an ordered feed") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[EventStreams.FunnelEv]
        val stages = Seq("view", "click", "purchase")
        val q = EventStreams.streamingFunnel(mem.toDS(), stages)
          .writeStream.format("memory").queryName(s"funnel_$label")
          .outputMode("append").start()
        try {
          // user 1 converts fully across TWO batches; user 2 buys before
          // viewing (never passes click); user 3 ties view/click (strictly
          // -after blocks the click); user 4 views only
          mem.addData(
            EventStreams.FunnelEv(1L, "view", 10L),
            EventStreams.FunnelEv(2L, "purchase", 5L),
            EventStreams.FunnelEv(2L, "view", 10L),
            EventStreams.FunnelEv(3L, "view", 10L),
            EventStreams.FunnelEv(3L, "click", 10L),
            EventStreams.FunnelEv(4L, "view", 10L))
          q.processAllAvailable()
          mem.addData(
            EventStreams.FunnelEv(1L, "click", 20L),
            EventStreams.FunnelEv(1L, "purchase", 30L),
            EventStreams.FunnelEv(2L, "click", 20L))
          q.processAllAvailable()
          val hits = spark.table(s"funnel_$label")
            .as[EventStreams.FunnelHit].collect()
          // per-stage reach counts equal the batch operator on the union
          val batch = graft.operators.Relational.funnel(
            Seq((1L, "view", 10L), (2L, "purchase", 5L), (2L, "view", 10L),
              (3L, "view", 10L), (3L, "click", 10L), (4L, "view", 10L),
              (1L, "click", 20L), (1L, "purchase", 30L), (2L, "click", 20L))
              .toDF("user_id", "event_type", "ts_ns"), stages)
            .as[(String, Long)].collect().toMap
          val streamed = stages.zipWithIndex.map { case (s, i) =>
            f"${i + 1}%02d_$s" -> hits.count(_.stage == i + 1).toLong }.toMap
          assert(streamed == batch,
            s"streaming $streamed must equal batch $batch")
          // and the transitions themselves are the expected ones
          assert(hits.filter(_.user_id == 1L).map(h => (h.stage, h.ts_ns)).sorted
            .toSeq == Seq((1, 10L), (2, 20L), (3, 30L)))
          assert(!hits.exists(h => h.user_id == 3L && h.stage == 2),
            "tied click must not advance (strictly-after)")
        } finally q.stop()
      }
    }

    test(s"[$label] unordered streaming funnel matches the batch funnel on a SHUFFLED feed") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[EventStreams.FunnelEvT]
        val stages = Seq("view", "click", "purchase")
        val min = 60L * 1000
        def ev(u: Long, t: String, m: Long) =
          EventStreams.FunnelEvT(u, t, new Timestamp(m * min))
        // same scenario as the ordered test, deliberately scrambled:
        // user 1's purchase arrives FIRST, its view LAST — the ordered
        // funnel would strand user 1 at stage 0; retro-unlock must not
        val all = Seq(
          ev(1L, "view", 10), ev(1L, "click", 20), ev(1L, "purchase", 30),
          ev(2L, "purchase", 5), ev(2L, "view", 10), ev(2L, "click", 20),
          ev(3L, "view", 10), ev(3L, "click", 10), // tie: strictly-after blocks
          ev(4L, "view", 10))
        val q = EventStreams.streamingFunnelUnordered(mem.toDS(), stages)
          .writeStream.format("memory").queryName(s"funnel_un_$label")
          .outputMode("append").start()
        try {
          mem.addData(ev(1L, "purchase", 30), ev(3L, "click", 10), ev(2L, "click", 20))
          q.processAllAvailable()
          mem.addData(ev(1L, "click", 20), ev(2L, "purchase", 5),
            ev(3L, "view", 10), ev(4L, "view", 10))
          q.processAllAvailable()
          mem.addData(ev(1L, "view", 10), ev(2L, "view", 10))
          q.processAllAvailable()
          // nothing may finalize before the watermark passes the events
          assert(spark.table(s"funnel_un_$label").isEmpty,
            "hits must only be emitted once final (watermark-gated)")
          // sentinels push the watermark (2h lateness) past every event;
          // the second gives the timeout-triggered batch a chance to run
          mem.addData(ev(999L, "noise", 30 + 121))
          q.processAllAvailable()
          mem.addData(ev(999L, "noise", 30 + 122))
          q.processAllAvailable()
          val hits = spark.table(s"funnel_un_$label")
            .as[EventStreams.FunnelHitT].collect()
          val batch = graft.operators.Relational.funnel(
            all.map(e => (e.user_id, e.event_type, e.ts.getTime))
              .toDF("user_id", "event_type", "ts_ns"), stages)
            .as[(String, Long)].collect().toMap
          val streamed = stages.zipWithIndex.map { case (s, i) =>
            f"${i + 1}%02d_$s" -> hits.count(_.stage == i + 1).toLong }.toMap
          assert(streamed == batch,
            s"shuffled streaming $streamed must equal batch $batch")
          assert(hits.filter(_.user_id == 1L).map(h => (h.stage, h.ts_ms)).sorted
            .toSeq == Seq((1, 10 * min), (2, 20 * min), (3, 30 * min)),
            "late view must retro-unlock click and purchase")
          assert(hits.filter(_.user_id == 2L).map(_.stage).sorted.toSeq == Seq(1, 2),
            "pre-view purchase must not satisfy the purchase stage")
          assert(!hits.exists(h => h.user_id == 3L && h.stage == 2),
            "tied click must not advance (strictly-after)")
        } finally q.stop()
      }
    }

    test(s"[$label] stream-stream interval join matches the batch attribution window") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val clicks = MemoryStream[(Long, Long, Timestamp)]
        val purchases = MemoryStream[(Long, Long, Timestamp)]
        val base = 1_000_000_000_000L
        val q = EventStreams.streamingIntervalJoin(
            clicks.toDF().toDF("event_id", "user_id", "ts"),
            purchases.toDF().toDF("event_id", "user_id", "ts"))
          .writeStream.format("memory").queryName(s"attrib_$label")
          .outputMode("append").start()
        try {
          clicks.addData(
            (100L, 1L, new Timestamp(base)),            // 10 min before purchase
            (101L, 1L, new Timestamp(base - 3_600_000)), // 1h before: outside
            (102L, 2L, new Timestamp(base)))             // other user
          purchases.addData((200L, 1L, new Timestamp(base + 600_000)))
          q.processAllAvailable()
          val got = spark.table(s"attrib_$label")
            .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
          assert(got == Set((200L, 100L)))
        } finally q.stop()
      }
    }

    test(s"[$label] streaming distinct users: HLL sketch counts per sliding window") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Timestamp, String, Long)]
        val q = EventStreams.streamingDistinctUsers(
            mem.toDF().toDF("ts", "event_type", "user_id"))
          .writeStream.format("memory").queryName(s"reach_$label")
          .outputMode("update").start()
        try {
          val base = 1_000_000_000_000L  // well above epoch for the watermark
          mem.addData(
            (new Timestamp(base), "click", 1L),
            (new Timestamp(base + 60_000), "click", 1L),   // same user again
            (new Timestamp(base + 120_000), "click", 2L),
            (new Timestamp(base + 180_000), "view", 3L))
          q.processAllAvailable()
          val got = spark.table(s"reach_$label")
            .select("window_start", "event_type", "n_users_approx")
            .as[(Timestamp, String, Long)].collect()
            .map { case (w, t, n) => (w.getTime, t, n) }.toSet
          // each event falls in 2 sliding windows; 3 distinct users is far
          // below HLL error onset so approx == exact here
          val w0 = (base / 1_800_000) * 1_800_000        // 30-min aligned
          assert(got.contains((w0, "click", 2L)))
          assert(got.contains((w0 - 1_800_000, "click", 2L)))
          assert(got.contains((w0, "view", 1L)))
        } finally q.stop()
      }
    }

    test(s"[$label] streaming curate: gates fire on the stream, replayed text drops") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[(Long, Timestamp, String, String)]
        val base = 100L * 3600 * 1000 // well above epoch 0 for the watermark
        val good = (1 to 30).map(i => s"w$i").mkString(" ") +
          " the of and to in is it for on a"
        val q = graft.pipeline.Curate.streamingCurate(
            mem.toDF().toDF("doc_id", "ts", "text", "lang"))
          .writeStream.format("memory").queryName(s"stream_curate_$label")
          .outputMode("append").start()
        try {
          mem.addData(
            (1L, new Timestamp(base), good, "en"),
            (2L, new Timestamp(base + 1000), good, "en"),   // exact replay
            (3L, new Timestamp(base + 2000), "too short", "en"),
            // unique text (else the dedup state drops it), English stopwords,
            // mislabeled as German → lang_mismatch
            (4L, new Timestamp(base + 3000),
              (1 to 30).map(i => s"x$i").mkString(" ") +
                " the of and to in is it for on a", "de"))
          q.processAllAvailable()
          val got = spark.table(s"stream_curate_$label")
            .select("doc_id", "reason").as[(Long, String)].collect().toMap
          assert(got(1L) == "kept")
          assert(!got.contains(2L), "replayed content must drop in-state")
          assert(got(3L) == "short")
          assert(got(4L) == "lang_mismatch")
        } finally q.stop()
      }
    }

    test(s"[$label] streaming dedup keeps the first arrival per key; " +
      "in-horizon replays drop") {
      withConf(ProviderConf -> cls) {
        implicit val sqlCtx = spark.sqlContext
        val mem = MemoryStream[DupEv]
        val q = EventStreams.streamingDedup(mem.toDF(), "user_id",
            Seq("event_type"), lateness = "10 minutes")
          .writeStream.format("memory").queryName(s"dedup_$label")
          .outputMode("append").start()
        try {
          val base = 1_000_000_000_000L
          mem.addData(DupEv(new Timestamp(base), 1L, "click", 1.0))
          q.processAllAvailable()
          // same key replayed in a LATER batch inside the horizon (drops)
          // + a fresh key in that batch (emits)
          mem.addData(
            DupEv(new Timestamp(base + 60_000), 1L, "click", 9.0),
            DupEv(new Timestamp(base + 60_000), 2L, "view", 5.0))
          q.processAllAvailable()
          val got = spark.table(s"dedup_$label").as[DupEv].collect()
            .map(e => (e.user_id, e.event_type, e.value)).toSet
          assert(got == Set((1L, "click", 1.0), (2L, "view", 5.0)))
        } finally q.stop()
      }
    }
  }

  test("streaming enrich: stream-static broadcast join is stateless append") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EnrichEv]
    val dim = Seq((1L, 10), (2L, 20)).toDF("c_custkey", "c_nationkey")
    val q = EventStreams.streamingEnrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_static")
      .outputMode("append").start()
    try {
      mem.addData(EnrichEv(100L, 1L, "click", 1.5),
        EnrichEv(101L, 2L, "view", 2.5))
      q.processAllAvailable()
      // a later micro-batch joins the SAME static side again — no state
      mem.addData(EnrichEv(102L, 1L, "purchase", 9.0))
      q.processAllAvailable()
      val got = spark.table("enrich_static")
        .as[(Long, Long, Int, String, Double)].collect().toSet
      assert(got == Set((100L, 1L, 10, "click", 1.5),
        (101L, 2L, 20, "view", 2.5), (102L, 1L, 10, "purchase", 9.0)))
      // stateless: the running query reports zero state rows
      val progress = q.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streaming upsert: foreachBatch merge keeps latest row per key") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.streamingUpsert(
        mem.toDF().toDF("k", "v"), dir, Seq("k"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", dir + "_ckpt")
    mem.addData((1L, "a"), (2L, "b"))
    q.start().awaitTermination()
    mem.addData((2L, "B2"), (3L, "c"))
    q.start().awaitTermination()
    val got = EventStreams.latestSnapshot(spark, dir)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c")))
    // each micro-batch committed its own snapshot version
    assert(EventStreams.snapshotVersions(spark, dir).size == 2)
  }

  test("streaming upsert: hot CDC key flood — skew-safe merge, one winner per key " +
    "from the first batch on (rocksdb)") {
    withConf(ProviderConf -> providers.toMap.apply("rocksdb")) {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft_upsert_hot").toString + "/t"
      val mem = MemoryStream[(Long, Timestamp, String)]
      val q = EventStreams.streamingUpsert(
          mem.toDF().toDF("k", "ts", "v"), dir, Seq("k"), skewSafe = true)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", dir + "_ckpt")
      val base = 1_000_000_000_000L
      // batch 0: entity 1 re-emitted 2000× (the CDC pathology) + 50 cold keys
      val hot = (0 until 2000).map(i => (1L, new Timestamp(base + i), s"v$i"))
      val cold = (2L to 51L).map(k => (k, new Timestamp(base + k), s"k$k"))
      mem.addData(hot ++ cold: _*)
      q.start().awaitTermination()
      // the FIRST snapshot already holds one winner per key (no prior
      // version existed — the merge ran against an empty target)
      val v0 = spark.read.parquet(s"$dir/v=0")
      assert(v0.count() == 51)
      // batch 1: the hot entity updates again
      mem.addData((1L, new Timestamp(base + 999_999), "final"))
      q.start().awaitTermination()
      val got = EventStreams.latestSnapshot(spark, dir)
        .as[(Long, Timestamp, String)].collect()
        .map { case (k, _, v) => k -> v }.toMap
      assert(got.size == 51)
      assert(got(1L) == "final", "hot key carries its latest-ts winner")
      assert(got(2L) == "k2")
    }
  }

  test("batch sessionize: sessions respect the 30-min gap invariant") {
    val sess = EventStreams.streamSessionize(spark, sf)
    val byUser = sess.orderBy("user_id", "session_id")
      .select("user_id", "session_id", "start_ms", "end_ms")
      .collect().groupBy(_.getLong(0))
    byUser.values.foreach { rows =>
      rows.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts > 30min after previous ends
          assert(b.getLong(2) - a.getLong(3) > 30L * 60 * 1000)
        case _ =>
      }
    }
    // session ids are 1..n per user
    byUser.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
    }
  }

  test("batch interval join: the 2-bucket probe emits every boundary pair " +
    "exactly once (no pair passes both buckets)") {
    // PROPERTY, exhaustively over the boundary window: a click in
    // (p − gap, p] has home bucket c div gap ∈ {p div gap − 1, p div gap}
    // — the two DISTINCT buckets the purchase probes — so the equi-join
    // matches each in-window pair on exactly ONE bucket and no distinct
    // is needed. Sweep purchases across a bucket boundary and clicks
    // across the full window to hit every alignment class.
    val gap = EventStreams.sessionGapNs
    for (pOff <- Seq(0L, 1L, gap / 2, gap - 1);
         cDelta <- Seq(0L, 1L, gap / 2, gap - 1, gap, gap + 1)) {
      val p = 5L * gap + pOff
      val c = p - cDelta
      val inWindow = c > p - gap && c <= p
      val pBuckets = Seq(p / gap, p / gap - 1)
      val matchBuckets = pBuckets.filter(_ == c / gap)
      assert(pBuckets.distinct.size == 2, "probe buckets must be distinct")
      if (inWindow)
        assert(matchBuckets.size == 1,
          s"pOff=$pOff cDelta=$cDelta: in-window pair must match exactly " +
            s"one probe bucket, matched ${matchBuckets.size}")
      else
        assert(c > p || matchBuckets.isEmpty || c <= p - gap,
          s"pOff=$pOff cDelta=$cDelta: out-of-window click may share a " +
            "bucket but must then fail the containment filter")
    }

    // end to end on a boundary-crafted feed: no duplicate pairs, and the
    // result equals the naive user-join + window filter
    import spark.implicits._
    val gapMs = gap / 1000000L
    val ev = (0L until 400L).map { i =>
      val user = i % 7
      val tp = if (i % 2 == 0) "click" else "purchase"
      // cluster timestamps tightly around bucket boundaries
      val ns = (i / 14) * gap + (i % 14 - 7) * (gap / 10) + 3L * gap
      (i, user, tp, new java.sql.Timestamp(ns / 1000000L), ns, i * 0.5)
    }.toDF("event_id", "user_id", "event_type", "ts", "ts_ns", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivj").toString
    ev.write.parquet(s"$tmp/events.parquet")
    val out = EventStreams.streamIntervalJoin(spark, tmp)
      .select("purchase_id", "click_id").as[(Long, Long)].collect()
    assert(out.length == out.distinct.length,
      "duplicate (purchase, click) pairs emitted")
    val naive = ev.as("p").filter($"p.event_type" === "purchase")
      .join(ev.as("c").filter($"c.event_type" === "click"),
        $"p.user_id" === $"c.user_id" &&
          $"c.ts_ns" > $"p.ts_ns" - gap && $"c.ts_ns" <= $"p.ts_ns")
      .select($"p.event_id", $"c.event_id").as[(Long, Long)].collect()
    assert(out.sorted.toSeq == naive.sorted.toSeq,
      "bucketed join must equal the naive interval join")
  }
}

// Top-level so Spark can derive encoders without an outer-scope instance
// (inner case classes of a running suite trip the OuterScopes check in
// the dropDuplicatesWithinWatermark path).
case class DupEv(ts: java.sql.Timestamp, user_id: Long, event_type: String,
                 value: Double)
case class EnrichEv(event_id: Long, user_id: Long, event_type: String,
                    value: Double)
