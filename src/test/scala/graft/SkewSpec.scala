package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{LakehouseOps, Relational, Salting}
import graft.pipeline.Mix

/** Skewed-key behavior of the window-partitioned fact paths.
  *
  * `Window.partitionBy(key)` is the one shuffle shape AQE's skew splitting
  * cannot rescue: every row of a key lands in ONE task. These tests build
  * hot-key corpora (one key holding a large share of all rows — the shape
  * that stalls a 1000-executor stage at 100 TB), demonstrate the hazard is
  * real (max key-group ≥ 10× the median — a >10× straggler by
  * construction), and prove each skew-safe variant (a) bounds its shuffle
  * groups below the straggler threshold and (b) returns byte-identical
  * results to the naive window formulation.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1_700_000_000_000L // well above epoch; ~2023-11

  /** max/median group size of `df` grouped by `cols` — the straggler ratio
    * a window shuffle on those columns would see (a window partition's
    * task load IS its key-group size).
    */
  private def groupSkew(df: DataFrame, cols: String*): (Long, Double) = {
    val sizes = df.groupBy(cols.map(col): _*).count()
      .select("count").as[Long].collect().sorted
    val median = sizes(sizes.length / 2).toDouble
    (sizes.last, sizes.last / median)
  }

  // ------------------------------------------------------- as-of carry
  /** Union-shaped as-of input: user 1 is hot (`hotN` events, one every
    * `hotStepMin` minutes); 50 cold users with 20 events each. Every user
    * gets 30 order rows.
    */
  private def asofCorpusOf(hotN: Int, hotStepMin: Int,
                           partitions: Int): DataFrame = {
    val min = 60_000L
    val hot = (0 until hotN).map { i =>
      (1L, new Timestamp(base + i * hotStepMin * min), 1, 10_000L + i,
        None: Option[Long], None: Option[Timestamp])
    }
    val cold = for (u <- 2L to 51L; i <- 0 until 20) yield
      (u, new Timestamp(base + i * 14_400 * min + u * min), 1,
        20_000L + u * 100 + i, None: Option[Long], None: Option[Timestamp])
    val orders = for (u <- 1L to 51L; j <- 0 until 30) yield {
      val t = new Timestamp(base + j * 9_600 * min + u * 7 * min)
      (u, t, 0, -1L, Some(u * 1000 + j), Some(t))
    }
    (hot ++ cold ++ orders)
      .toDF("k", "t", "side", "event_id", "okey_in", "odate_in")
      // side=1 event rows carry null order columns, as in the real union
      .withColumn("okey_in", when(col("side") === 0, col("okey_in")))
      .withColumn("odate_in", when(col("side") === 0, col("odate_in")))
      .repartition(partitions)
  }

  private lazy val asofCorpus: DataFrame = asofCorpusOf(1000, 288, 4)

  test("as-of: hot key is a >10x straggler for the naive window; " +
    "day buckets bound it; results identical") {
    val (naiveMax, naiveRatio) = groupSkew(asofCorpus, "k")
    assert(naiveRatio >= 10.0,
      s"corpus must exhibit the hazard: max=$naiveMax ratio=$naiveRatio")
    val bucketed = asofCorpus.withColumn("__b", date_trunc("day", col("t")))
    val (bMax, bRatio) = groupSkew(bucketed, "k", "__b")
    assert(bRatio < 10.0, s"bucketed groups still skewed: ratio=$bRatio")
    assert(bMax * 10 <= naiveMax,
      s"bucketing should shrink the largest task ≥10x: $bMax vs $naiveMax")

    val w = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = asofCorpus
      .withColumn("ok", last("okey_in", ignoreNulls = true).over(w))
      .withColumn("od", last("odate_in", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("event_id", "ok", "od")
    val safe = Salting.carryLastOverBuckets(asofCorpus,
        keys = Seq("k"), time = col("t"), tiebreak = Seq(col("side")),
        valueCols = Seq("okey_in", "odate_in"),
        bucket = date_trunc("day", col("t")))
      .filter(col("side") === 1)
      .select(col("event_id"), col("okey_in").as("ok"), col("odate_in").as("od"))
    val n = naive.as[(Long, Option[Long], Option[Timestamp])].collect().toSet
    val s = safe.as[(Long, Option[Long], Option[Timestamp])].collect().toSet
    assert(n.nonEmpty && n == s)
  }

  test("as-of: task-level straggler evidence — naive window has a >10x " +
    "shuffle-read straggler, the carry variant stays bounded") {
    // records read per task, grouped by stage — the deterministic straggler
    // metric (task TIME is host noise; a window task's shuffle-read record
    // count IS its load)
    def taskRecords(body: => Unit): Map[Int, Seq[Long]] = {
      val buf = scala.collection.concurrent.TrieMap.empty[Long, (Int, Long)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            buf(e.taskInfo.taskId) = (e.stageId, m.shuffleReadMetrics.recordsRead)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // listener events are async — wait until the stream goes quiet
        var last = -1
        var same = 0
        while (same < 3) {
          Thread.sleep(200)
          if (buf.size == last) same += 1 else { same = 0; last = buf.size }
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      buf.values.groupBy(_._1).map { case (st, vs) => st -> vs.map(_._2).toSeq }
    }
    // worst max/median across stages with meaningful shuffle input (tiny
    // metadata stages would make the median meaningless)
    def worstRatio(stages: Map[Int, Seq[Long]]): Double =
      stages.values
        .filter(v => v.count(_ > 0) >= 4 && v.max >= 1000)
        .map { v =>
          val pos = v.filter(_ > 0).sorted
          v.max.toDouble / pos(pos.size / 2)
        }.foldLeft(0.0)(math.max)

    // hotter corpus than asofCorpus so the straggler is unambiguous even
    // after hash-bucketing keys into partitions: user 1 holds 4000 of
    // ~6500 rows
    val corpus = asofCorpusOf(4000, 72, 8)

    // 32 shuffle partitions (the bench config) and no AQE so partition
    // counts are deterministic and coalescing can't mask the skew
    withConf("spark.sql.shuffle.partitions" -> "32",
             "spark.sql.adaptive.enabled" -> "false") {
      val w = Window.partitionBy("k").orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = corpus
        .withColumn("ok", last("okey_in", ignoreNulls = true).over(w))
        .filter(col("side") === 1).select("event_id", "ok")
      val nRatio = worstRatio(taskRecords {
        naive.write.format("noop").mode("overwrite").save()
      })
      assert(nRatio >= 10.0,
        s"naive window should show a >10x straggler task, got $nRatio")

      val safe = Salting.carryLastOverBuckets(corpus,
          keys = Seq("k"), time = col("t"), tiebreak = Seq(col("side")),
          valueCols = Seq("okey_in", "odate_in"),
          bucket = date_trunc("day", col("t")))
        .filter(col("side") === 1).select("event_id", "okey_in")
      val sRatio = worstRatio(taskRecords {
        safe.write.format("noop").mode("overwrite").save()
      })
      assert(sRatio < 10.0,
        s"carry variant must have no >10x straggler task, got $sRatio")
    }
  }

  test("as-of: null keys and null times survive the carry (window parity " +
    "on dirty data)") {
    // a null key is its own group; a null time sorts first (ascending
    // nulls-first) — the bucketed carry must keep BOTH kinds of row where
    // a naive USING stitch join would silently drop them
    val dirty = Seq(
      (Some(1L), Some(new Timestamp(base)), 0, -1L, Some(10L), Some(new Timestamp(base))),
      (Some(1L), Some(new Timestamp(base + 86400000L)), 1, 100L, None: Option[Long], None: Option[Timestamp]),
      (Some(1L), None: Option[Timestamp], 1, 101L, None: Option[Long], None: Option[Timestamp]),
      (None: Option[Long], Some(new Timestamp(base)), 0, -1L, Some(20L), Some(new Timestamp(base))),
      (None: Option[Long], Some(new Timestamp(base + 86400000L)), 1, 102L, None: Option[Long], None: Option[Timestamp]))
      .toDF("k", "t", "side", "event_id", "okey_in", "odate_in")
    val w = Window.partitionBy("k").orderBy("t", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = dirty
      .withColumn("ok", last("okey_in", ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("event_id", "ok")
      .as[(Long, Option[Long])].collect().toSet
    val safe = Salting.carryLastOverBuckets(dirty,
        keys = Seq("k"), time = col("t"), tiebreak = Seq(col("side")),
        valueCols = Seq("okey_in", "odate_in"),
        bucket = date_trunc("day", col("t")))
      .filter(col("side") === 1)
      .select(col("event_id"), col("okey_in").as("ok"))
      .as[(Long, Option[Long])].collect().toSet
    assert(naive == Set((100L, Some(10L)), (101L, None), (102L, Some(20L))))
    assert(safe == naive, "dirty-data rows must not be dropped or diverge")
  }

  test("as-of: q_asof_skew matches q_asof_join on the real tables") {
    val a = Relational.qAsofJoin(spark, sf).collect().toSeq
    val df = Relational.qAsofJoinSkew(spark, sf)
    val b = df.collect().toSeq
    assert(a.nonEmpty && a == b)
    // the carry's bucket table derives from the windowed output and must
    // SHARE its exchange with the stitch side — without reuse the kernel
    // silently scans and shuffles the corpus twice
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage") ||
      p.contains("ShuffleQueryStage") && p.contains("reuses"),
      "q_asof_skew lost exchange reuse between the carry and stitch sides")
  }

  // ------------------------------------------------------- merge dedup
  test("merge: skewSafe dedup aggregates (no window, partial combine), " +
    "same winner per key as the window — hot-key CDC corpus") {
    // key 1 re-emitted 2000 times (the hot entity), keys 2..200 three
    // times each — tiebreak on ts, payload varies so the winner matters
    val src = ((0 until 2000).map(i => (1L, new Timestamp(base + i), s"v$i")) ++
      (for (k <- 2L to 200L; i <- 0 until 3) yield
        (k, new Timestamp(base + i * 1000), s"k${k}_$i")))
      .toDF("id", "ts", "payload").repartition(4)
    val (_, ratio) = groupSkew(src, "id")
    assert(ratio >= 10.0, s"corpus must exhibit the hazard: ratio=$ratio")
    val tgt = (1L to 300L).map(k => (k, new Timestamp(0), "old"))
      .toDF("id", "ts", "payload")

    val naive = LakehouseOps.mergeUpsert(tgt, src, Seq("id"),
      tiebreak = Seq(col("ts")))
    val safe = LakehouseOps.mergeUpsert(tgt, src, Seq("id"),
      tiebreak = Seq(col("ts")), skewSafe = true)
    val n = naive.as[(Long, Timestamp, String)].collect().toSet
    val s = safe.as[(Long, Timestamp, String)].collect().toSet
    assert(n.nonEmpty && n == s)

    // the mitigation's plan shape: no window anywhere (nothing serializes
    // a key into one task), and the max_by dedup aggregates — Spark plans
    // a partial pass before the exchange, so each task reduces its slice
    // of the hot key to one candidate row before any shuffle
    val plan = safe.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "skew-safe merge must not window")
    assert(plan.contains("max_by"), "skew-safe merge dedups via max_by")
    assert(plan.toLowerCase.contains("partial_max_by"),
      "max_by must have a map-side partial pass")
    assert(naive.queryExecution.executedPlan.toString.contains("Window"),
      "the naive path is the window formulation (sanity)")
  }

  test("merge: dba_merge_skew matches dba_merge_upsert on the real tables") {
    // neither variant globally sorts (a MERGE result is a table), so
    // compare on the unique key — row for row after a local sort
    val a = LakehouseOps.dbaMergeUpsert(spark, sf).collect().toSeq
      .sortBy(_.getLong(0))
    val b = LakehouseOps.dbaMergeUpsertSkew(spark, sf).collect().toSeq
      .sortBy(_.getLong(0))
    assert(a.nonEmpty && a == b)
  }

  test("merge: the r18 decade adjudication's configuration is pinned — " +
    "SortAggregate max_by dedup with a map-side partial pass, no window, " +
    "no checkpoint, and the anti-join side re-scans orders pruned to the " +
    "merge key") {
    // latestPerKeyAgg's scaladoc records the measurement band (8-run
    // isolated minima at sf0.1/sf1-equiv): max_by beats the window
    // ABSOLUTELY at both rungs, and both measured alternatives — a
    // checkpointed winner set and a salted two-level window — measured
    // WORSE at the decade. This asserts that exact plan shape so the
    // adjudicated configuration can't silently rot into one of the
    // rejected ones (a checkpoint would drop the keys-only rescan; a
    // window/salt would reintroduce Window nodes; losing the struct
    // buffer would drop the partial pass).
    val df = LakehouseOps.dbaMergeUpsertSkew(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortAggregate"),
      "max_by dedup must stay a (Sort)Aggregate")
    assert(plan.toLowerCase.contains("partial_max_by"),
      "the dedup must partial-combine map-side")
    assert(!plan.contains("Window"), "no window formulation may reappear")
    assert(!plan.contains("Checkpoint") && !plan.contains("ExistingRDD"),
      "the winner set must not be checkpointed (measured worse)")
    // the anti-join side's rescan prunes to the key + pushed date filter:
    // Catalyst drops the unreferenced max_by entirely there, so the scan
    // reads two columns, not the merge's five
    val keysOnly = plan.linesIterator.exists(l =>
      l.contains("ReadSchema: struct<o_orderkey:bigint,o_orderdate:") &&
        !l.contains("o_custkey"))
    assert(keysOnly, "anti-join side must re-scan keys-only:\n" + plan)
  }

  // ------------------------------------------------------- scd2 lag-carry
  test("scd2: bucketed lag-carry matches the naive window on a hot " +
    "monitoring feed; the second window rides compressed change points") {
    // endpoint 1 reports 5000 times (hot), endpoints 2..40 report 40
    // times each; statuses flip rarely, so change points compress
    val rnd = new scala.util.Random(7)
    val statuses = Array("RUNNING", "STOPPED", "STARTING")
    def feed(u: Long, n: Int, stepMs: Long) = {
      var st = 0
      (0 until n).map { i =>
        if (rnd.nextInt(20) == 0) st = rnd.nextInt(3)
        (u, (base + i * stepMs) * 1_000_000L, u * 100_000 + i, statuses(st))
      }
    }
    val snaps = (feed(1L, 5000, 60_000L) ++
      (2L to 40L).flatMap(u => feed(u, 40, 3_600_000L)))
      .toDF("user_id", "ts_ns", "event_id", "status").repartition(4)
    val (_, ratio) = groupSkew(snaps, "user_id")
    assert(ratio >= 10.0, s"corpus must exhibit the hazard: ratio=$ratio")

    def naiveScd2(in: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val changes = in
        .withColumn("__prev", lag("status", 1).over(w))
        .filter(col("__prev").isNull || col("status") =!= col("__prev"))
        .select(col("user_id"), col("event_id"), col("status"),
          expr("ts_ns div 1000000").as("valid_from_ms"))
      val w2 = Window.partitionBy("user_id").orderBy("valid_from_ms", "event_id")
      changes
        .withColumn("valid_to_ms", lead("valid_from_ms", 1).over(w2))
        .withColumn("is_current", col("valid_to_ms").isNull)
    }
    // same machinery as LakehouseOps.dbaScd2HistorySkew, driven on the
    // synthetic feed: local lag per (user, day) + carry of the previous
    // bucket's last status
    val bucketNs = 86_400_000_000_000L
    val in = snaps.withColumn("__bkt", expr(s"ts_ns div ${bucketNs}L"))
    val wLoc = Window.partitionBy("user_id", "__bkt").orderBy("ts_ns", "event_id")
    val localized = in.withColumn("__prev_loc", lag("status", 1).over(wLoc))
    val bktLast = localized.groupBy(col("user_id"), col("__bkt"))
      .agg(max_by(col("status"), struct(col("ts_ns"), col("event_id"))).as("__lastst"))
    val wCarry = Window.partitionBy("user_id").orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bktLast
      .withColumn("__carry", last("__lastst").over(wCarry))
      .select(col("user_id"), col("__bkt"), col("__carry"))
    val changes = localized.join(carry, Seq("user_id", "__bkt"))
      .withColumn("__prev", coalesce(col("__prev_loc"), col("__carry")))
      .filter(col("__prev").isNull || col("status") =!= col("__prev"))
      .select(col("user_id"), col("event_id"), col("status"),
        expr("ts_ns div 1000000").as("valid_from_ms"))
    val w2 = Window.partitionBy("user_id").orderBy("valid_from_ms", "event_id")
    val safe = changes
      .withColumn("valid_to_ms", lead("valid_from_ms", 1).over(w2))
      .withColumn("is_current", col("valid_to_ms").isNull)

    val n = naiveScd2(snaps)
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect().toSet
    val s = safe
      .as[(Long, Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(n.nonEmpty && n == s)
    // the hazard is gone from the big window: (user, day) groups are
    // bounded, and the second window's input is the compressed change
    // stream (~5% of snapshots at this flip rate)
    val (bMax, _) = groupSkew(in, "user_id", "__bkt")
    assert(bMax <= 5000 / 3, s"day buckets must bound the hot feed: $bMax")
    val nChanges = changes.count()
    assert(nChanges < snaps.count() / 5,
      s"change points must compress: $nChanges")
  }

  test("scd2: dba_scd2_skew matches dba_scd2_history on the real tables") {
    val a = LakehouseOps.dbaScd2History(spark, sf).collect().toSeq
    val b = LakehouseOps.dbaScd2HistorySkew(spark, sf).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  // -------------------------------------------------- randomized parity
  test("randomized parity: bucketed carry == window and agg-merge == " +
    "window-merge on seeded random corpora (nulls, ties, tiny buckets)") {
    val rnd = new scala.util.Random(42) // deterministic
    for (c <- 0 until 3) {
      // as-of shape: random keys (some null), times on a quarter-day grid
      // (cross-bucket AND in-bucket collisions), ~half the rows carriers;
      // event_id makes the ordering total so both formulations are
      // deterministic
      val n = 200 + rnd.nextInt(300)
      val nKeys = 1 + rnd.nextInt(6)
      val rows = (0 until n).map { i =>
        val k = if (rnd.nextInt(10) == 0) None
                else Some(rnd.nextInt(nKeys).toLong)
        val t = if (rnd.nextInt(15) == 0) None
                else Some(new Timestamp(base + rnd.nextInt(400) * 21_600_000L))
        val isCarrier = rnd.nextBoolean()
        val okey = if (isCarrier) Some(rnd.nextInt(50).toLong) else None
        (k, t, if (isCarrier) 0 else 1, i.toLong, okey,
          okey.map(o => new Timestamp(base + o * 1000)))
      }
      val df = rows
        .toDF("k", "t", "side", "event_id", "okey_in", "odate_in")
        .repartition(4)
      val w = Window.partitionBy("k").orderBy("t", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = df
        .withColumn("ok", last("okey_in", ignoreNulls = true).over(w))
        .withColumn("od", last("odate_in", ignoreNulls = true).over(w))
        .select("event_id", "ok", "od")
        .as[(Long, Option[Long], Option[Timestamp])].collect().toSet
      val safe = Salting.carryLastOverBuckets(df,
          keys = Seq("k"), time = col("t"),
          tiebreak = Seq(col("side"), col("event_id")),
          valueCols = Seq("okey_in", "odate_in"),
          bucket = date_trunc("day", col("t")))
        .select(col("event_id"), col("okey_in").as("ok"), col("odate_in").as("od"))
        .as[(Long, Option[Long], Option[Timestamp])].collect().toSet
      assert(safe == naive, s"carry parity broke on seeded case $c")

      // merge shape: duplicate keys, tied timestamps, random payloads —
      // the rest-columns-desc rule must pick the same winner both ways
      val src = (0 until 150 + rnd.nextInt(100)).map { _ =>
        (rnd.nextInt(30).toLong, new Timestamp(base + rnd.nextInt(5) * 1000),
          s"p${rnd.nextInt(8)}")
      }.toDF("id", "ts", "payload").repartition(4)
      val tgt = (0L to 40L).map(k => (k, new Timestamp(0), "old"))
        .toDF("id", "ts", "payload")
      val mN = LakehouseOps.mergeUpsert(tgt, src, Seq("id"), Seq(col("ts")))
        .as[(Long, Timestamp, String)].collect().toSet
      val mS = LakehouseOps.mergeUpsert(tgt, src, Seq("id"), Seq(col("ts")),
          skewSafe = true)
        .as[(Long, Timestamp, String)].collect().toSet
      assert(mS == mN, s"merge parity broke on seeded case $c")
    }
  }

  // ------------------------------------------------------- seq packing
  test("seq_pack_sharded: hot stream splits across all shards, each " +
    "sub-stream is a valid packing, every doc packed exactly once") {
    val docs = ((0 until 800).map(i => (i.toLong, "hot", i % 37 + 1)) ++
      (for (c <- 1 to 4; i <- 0 until 50) yield
        (1000L + c * 100 + i, s"cold$c", i % 23 + 1)))
      .toDF("doc_id", "source", "n_tokens").repartition(4)
    val (naiveMax, ratio) = groupSkew(docs, "source")
    assert(ratio >= 10.0, s"corpus must exhibit the hazard: ratio=$ratio")

    val cap = 64
    val packed = Mix.seqPackSharded(docs, cap, tokens = col("n_tokens"),
        streamCol = col("source"), orderCol = col("doc_id"),
        idCol = col("doc_id"), nShards = 8)
      .select("doc_id", "source", "shard", "n_tokens", "seq_id", "offset_in_seq")
      .as[(Long, String, Long, Long, Long, Long)].collect()

    assert(packed.length == docs.count().toInt, "every doc packed once")
    val hotShards = packed.filter(_._2 == "hot").groupBy(_._3)
    assert(hotShards.size == 8, s"hot stream must spread: ${hotShards.size}")
    assert(hotShards.values.map(_.length).max < 800 * 3 / 10,
      "no shard holds more than ~30% of the hot stream (md5 uniform)")
    // the window now shuffles on (source, shard). Max/median is the wrong
    // straggler metric here (cold streams fragment, dragging the median
    // down); what bounds the stage is the LARGEST task, and nShards is
    // its dial — 8 shards must shrink the hottest group several-fold
    val (sMax, _) = groupSkew(
      docs.withColumn("shard",
        floor(Mix.uniformOf(col("doc_id"), "shard") * 8)), "source", "shard")
    assert(sMax * 4 <= naiveMax,
      s"sharding should shrink the largest task ≥4x: $sMax vs $naiveMax")
    // per-sub-stream packing invariant: running start = cumsum − n_tokens,
    // seq_id = start div cap, offset = start mod cap — checked directly
    packed.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      var start = 0L
      rows.sortBy(_._1).foreach { case (id, _, _, nt, seqId, off) =>
        assert(seqId == start / cap && off == start % cap,
          s"doc $id: seq=$seqId off=$off, want start=$start")
        start += nt
      }
    }
  }

  // --------------------------------------------- stratified-draw pre-gate
  test("stratified: hot stratum is a straggler for the naive rank; " +
    "u-prefix gate bounds the window input; draws identical") {
    // one stratum holds 5000 of 5200 docs — the 10%+-of-corpus shape the
    // scaladoc warns about; 4 cold strata with 50 docs each
    val docs = ((0 until 5000).map(i => (i.toLong, "hot")) ++
      (for (c <- 1 to 4; i <- 0 until 50) yield
        (10_000L + c * 100 + i, s"cold$c")))
      .toDF("doc_id", "source").repartition(4)
    val (naiveMax, ratio) = groupSkew(docs, "source")
    assert(ratio >= 10.0, s"corpus must exhibit the hazard: ratio=$ratio")

    val quota = 10
    val margin = 0.02 // hot survivors E≈100 ≥ quota; cold E≈1 → fallback
    // the gate is what enters the window shuffle: survivors of supplied
    // strata + full rows of fallback strata (replicates the operator's
    // internal input to measure its task bound)
    val withU = docs.withColumn("__u", Mix.uniformOf(col("doc_id"), "strat"))
    val supplied = withU.filter(col("__u") < margin)
      .groupBy("source").count().filter(col("count") >= quota)
      .select(col("source").as("__s")).as[String].collect().toSet
    assert(supplied.contains("hot"), "margin must supply the hot stratum")
    val windowInput = withU.filter(
      !col("source").isin(supplied.toSeq: _*) || col("__u") < margin)
    val (gatedMax, _) = groupSkew(windowInput, "source")
    assert(gatedMax * 10 <= naiveMax,
      s"gate should shrink the hot window partition ≥10x: $gatedMax vs $naiveMax")

    val full = Mix.corpusStratified(docs, col("source"), quota, col("doc_id"))
      .select("doc_id", "source", "rn")
      .as[(Long, String, Int)].collect().toSet
    val gated = Mix.corpusStratified(docs, col("source"), quota, col("doc_id"),
        preGateMargin = Some(margin))
      .select("doc_id", "source", "rn")
      .as[(Long, String, Int)].collect().toSet
    assert(full.nonEmpty && gated == full,
      "pre-gated draw must be identical, ranks included")
    // cold strata (< quota survivors at this margin) fell back to the
    // full draw: all 4 present with full quotas
    assert((1 to 4).forall(c => gated.count(_._2 == s"cold$c") == quota))
  }
}
