package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SURVEY.md §2 block D — event-stream analytics, twice over:
  * batch formulations (the DuckDB-checkable oracle surface) and true
  * Structured Streaming variants (watermark + windowed agg;
  * flatMapGroupsWithState sessionization) exercised in StreamingSpec via
  * MemoryStream. In production the same transforms hang off `readStream`;
  * state scales per-key in the state store, not per-executor-heap.
  */
object EventStreams {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def asDouble(c: Column): Column = c.cast("double")

  val sessionGapNs: Long = 30L * 60 * 1000 * 1000 * 1000 // 30 min

  // --------------------------------------------------------------- D1
  /** Tumbling 1-hour windows per event type. */
  def streamWindowedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        asDouble(sum(dec(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val streamWindowedAggOracle: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming variant: same plan over an unbounded source, 2h watermark
    * bounds state; late data beyond it is dropped, on-time windows finalize.
    */
  def streamingWindowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        asDouble(sum(dec(col("value")))).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  // --------------------------------------------------------------- D2
  /** Gap-based sessionization, batch form: session boundary where the gap
    * to the previous event exceeds 30 min; session index = running count
    * of boundaries. Two windows over one hash-partition of user_id — a
    * single shuffle.
    */
  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    Tables.events(s, dir)
      .withColumn("__gap_ns", col("ts_ns") - lag("ts_ns", 1).over(w))
      .withColumn("__new", when(col("__gap_ns").isNull ||
        col("__gap_ns") > sessionGapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        expr("min(ts_ns) div 1000000").as("start_ms"),
        expr("max(ts_ns) div 1000000").as("end_ms"),
        count(lit(1)).as("n_events"),
        asDouble(sum(dec(col("value")))).as("sum_value"))
  }

  val streamSessionizeOracle: String =
    """WITH g AS (
      |  SELECT user_id, event_id, value, epoch_ns(ts) AS ns,
      |    epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ns
      |  FROM events),
      |m AS (
      |  SELECT user_id, value, ns,
    |    CAST(SUM(CASE WHEN gap_ns IS NULL OR gap_ns > 1800000000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ns, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, MIN(ns) // 1000000 AS start_ms,
      |  MAX(ns) // 1000000 AS end_ms, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM m GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  // --------------------------------------------------------------- D3
  /** Interval join — attribution: every click by the same user in the 30
    * minutes before a purchase.
    *
    * Binned range join, not equi-then-filter: joining on user_id alone
    * evaluates EVERY click×purchase pair of a user across all history
    * before the interval filter — quadratic in per-user history length,
    * the thing that turns years of events at 100 TB into an explosion.
    * Bucketing time by the interval width makes the join key
    * (user, bucket): a click in (p − gap, p] sits in the purchase's
    * bucket or the one before (integer-div floor), so each purchase
    * probes exactly 2 buckets and pairs evaluated ∝ matched-window
    * density, not history². Each click has ONE home bucket and the two
    * probe buckets are distinct, so no pair can appear twice.
    */
  def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ns").as("click_ns"),
        col("event_id").as("click_id"))
      .withColumn("__bkt", expr(s"click_ns div ${sessionGapNs}L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns").as("purchase_ns"),
        col("event_id").as("purchase_id"), col("value"))
      .withColumn("__bkt", explode(array(
        expr(s"purchase_ns div ${sessionGapNs}L"),
        expr(s"purchase_ns div ${sessionGapNs}L - 1"))))
    purchases.join(clicks, Seq("user_id", "__bkt"))
      .filter(col("click_ns") > col("purchase_ns") - lit(sessionGapNs) &&
        col("click_ns") <= col("purchase_ns"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        expr("(purchase_ns - click_ns) div 1000000").as("gap_ms"))
  }

  val streamIntervalJoinOracle: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.user_id, (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000 AS gap_ms
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND epoch_ns(c.ts) > epoch_ns(p.ts) - 1800000000000
      | AND epoch_ns(c.ts) <= epoch_ns(p.ts)
      |ORDER BY purchase_id, click_id""".stripMargin

  /** Streaming form: two watermarked streams, interval condition. State on
    * each side is bounded by watermark + interval — Spark evicts buffered
    * rows once they can no longer match.
    */
  def streamingIntervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.alias("c").withWatermark("ts", "1 hour")
      .join(
        purchases.alias("p").withWatermark("ts", "1 hour"),
        expr("c.user_id = p.user_id AND " +
          "c.ts > p.ts - INTERVAL 30 MINUTES AND c.ts <= p.ts"))
      .select(col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"), col("c.user_id"))

  // --------------------------------------------------------------- D4
  /** Sliding-window distinct users per event type (1 h window every 30 min)
    * — the audience-reach shape of event telemetry. Batch form is exact
    * (each event lands in 2 windows via Spark's window expansion; one
    * shuffle on (window, type)).
    */
  def streamDistinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_users"))
      .orderBy("window_start", "event_type")

  val streamDistinctUsersOracle: String =
    """SELECT window_start, event_type, COUNT(DISTINCT user_id) AS n_users
      |FROM (SELECT user_id, event_type,
      |        unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
      |          AS window_start
      |      FROM events) t
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming variant: exact distinct needs the full id set per open
    * window; the unbounded-state-safe form is HyperLogLog
    * (`approx_count_distinct`) — a fixed-size sketch per (window, type)
    * merged map-side, state bounded by open windows × sketch bytes.
    */
  def streamingDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_users_approx"))

  // --------------------------------------------------------------- D8
  /** First arrival per (user, event type) — the dedup every at-least-once
    * event ingest runs before anything downstream counts. Batch form is
    * ONE struct-min aggregate (fields compare in order, ts_ns then the
    * unique event_id, so the min IS the earliest row): map-side combined,
    * the shuffle carries ≤ keys × tasks rows, never the event volume —
    * the keep-latest A6b pattern flipped to keep-first, with the dup
    * count riding the same aggregate for free.
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type")
      .agg(min(struct(col("ts_ns"), col("event_id"), col("value"))).as("__f"),
        count(lit(1)).as("n_dups"))
      .select(col("user_id"), col("event_type"),
        expr("__f.ts_ns div 1000000").as("first_ms"),
        col("__f.event_id").as("first_event_id"),
        col("__f.value").as("first_value"),
        col("n_dups"))

  val streamDedupOracle: String =
    """SELECT user_id, event_type, ns // 1000000 AS first_ms,
      |  event_id AS first_event_id, value AS first_value, n_dups
      |FROM (SELECT user_id, event_type, epoch_ns(ts) AS ns, event_id, value,
      |        COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_dups,
      |        ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY ts, event_id) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // Streaming form: [[streamingDedup]] keyed on (user_id, event_type) —
  // keyed first-arrival with watermark-evicted state; replays inside the
  // horizon drop, and the horizon IS the dedup guarantee window (the
  // standard at-least-once→exactly-once contract).

  // --------------------------------------------------------------- D9
  /** Stream-static enrichment — the event feed joined to the customer
    * dimension (user_id = c_custkey) and rolled up to revenue per nation
    * and event type. Both dimension sides BROADCAST (hinted and
    * plan-pinned): the fact never shuffles for the joins; only the final
    * ≤ nations × types aggregate crosses the wire, so at 100 TB the event
    * scan is the whole cost. The streaming twin is the stream-static
    * join: the static side re-reads per micro-batch (picking up dimension
    * updates), and no join state accumulates.
    */
  def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
    Tables.events(s, dir)
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        asDouble(sum(dec(col("value")))).as("sum_value"))
      .orderBy("nation", "event_type")
  }

  val streamEnrichOracle: String =
    """SELECT n_name AS nation, event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Streaming twin: stateless stream-static broadcast join — append mode,
    * zero state-store usage; the dimension is read fresh each micro-batch.
    */
  def streamingEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_nationkey"),
        col("event_type"), col("value"))

  // ------------------------------------------------- streaming sessionize
  case class Ev(user_id: Long, ts_ms: Long, value: Double)
  case class SessionState(start_ms: Long, end_ms: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                     n_events: Long, sum_value: Double)

  /** Streaming gap sessionization: per-key state in the state store, closed
    * sessions emitted on gap or event-time timeout at the watermark. This
    * is the unbounded-state-safe formulation — memory ∝ open sessions.
    */
  def streamingSessionize(events: org.apache.spark.sql.Dataset[Ev],
                          gapMs: Long = 30L * 60 * 1000): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "2 hours")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st =>
              Session(userId, st.start_ms, st.end_ms, st.n, st.sum)).iterator
            state.remove()
            out
          } else {
            val evs = it.toSeq.sortBy(e => (e._2, e._3))
            var st = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            evs.foreach { case (_, _, value, ts) =>
              val ms = ts.getTime
              if (st == null) st = SessionState(ms, ms, 1, value)
              else if (ms > st.end_ms + gapMs) {
                // gap after the session: close it, start fresh
                closed += Session(userId, st.start_ms, st.end_ms, st.n, st.sum)
                st = SessionState(ms, ms, 1, value)
              } else if (ms < st.start_ms - gapMs) {
                // late arrival more than a gap BEFORE the open session:
                // it can only belong to an earlier, already-complete
                // session — emit it as its own closed session (best
                // effort: peers from even earlier batches are gone)
                closed += Session(userId, ms, ms, 1, value)
              } else st = SessionState(math.min(st.start_ms, ms),
                math.max(st.end_ms, ms), st.n + 1, st.sum + value)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.end_ms + gapMs)
            closed.result().iterator
          }
      }.toDF()
  }

  // ---------------------------------------------------- streaming funnel
  case class FunnelEv(user_id: Long, event_type: String, ts_ns: Long)
  case class FunnelProgress(stage: Int, last_ns: Long)
  case class FunnelHit(user_id: Long, stage: Int, stage_name: String, ts_ns: Long)

  /** Streaming ordered funnel: per-user stage progress as keyed state,
    * emitting a row each time a user advances a stage. Advancement rule
    * matches [[graft.operators.Relational.funnel]] exactly — the next
    * stage's event must land STRICTLY AFTER the time the previous stage
    * was reached, and the FIRST qualifying event wins — so on an
    * in-event-time-order feed the stage counts equal the batch funnel's
    * (spec-asserted). Events are sorted by time within each micro-batch;
    * cross-batch late events cannot retroactively advance a user — for
    * exactness under disorder use [[streamingFunnelUnordered]]. State per
    * user is two numbers, independent of event volume; per-BATCH work is
    * O(arrivals·log arrivals) per user (the in-batch sort materializes
    * that batch's arrivals — a hot-key flood costs task memory for the
    * batch, though never standing state).
    */
  def streamingFunnel(events: org.apache.spark.sql.Dataset[FunnelEv],
                      stages: Seq[String]): DataFrame = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[FunnelProgress]) =>
          var st = state.getOption.getOrElse(FunnelProgress(0, Long.MinValue))
          val hits = Seq.newBuilder[FunnelHit]
          it.toSeq.sortBy(e => (e.ts_ns, e.event_type)).foreach { e =>
            if (st.stage < stages.length && e.event_type == stages(st.stage) &&
                e.ts_ns > st.last_ns) {
              st = FunnelProgress(st.stage + 1, e.ts_ns)
              hits += FunnelHit(userId, st.stage, stages(st.stage - 1), e.ts_ns)
            }
          }
          state.update(st)
          hits.result().iterator
      }.toDF()
  }

  case class FunnelEvT(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  case class FunnelBuf(stage: Int, last_ms: Long, buf: List[(Int, Long)])
  case class FunnelHitT(user_id: Long, stage: Int, stage_name: String, ts_ms: Long)

  /** Out-of-order streaming funnel: EXACTLY the batch funnel's stage
    * times on ANY arrival order, as long as lateness stays within the
    * watermark (Spark drops older input before the stateful op — the
    * bound every watermarked operator shares).
    *
    * The sessionize pattern, applied to retro-unlocking: arrivals for
    * funnel stages are BUFFERED in state rather than judged immediately,
    * and a stage time is emitted only once it is FINAL — stage k's
    * candidate min `t` cannot be beaten when `t ≤ watermark`, because
    * every future arrival carries a later timestamp. So a late `view`
    * arriving after a `click` still unlocks the click: both sit in the
    * buffer until the watermark passes them, and the finalize loop then
    * advances through both in time order. Buffered entries at or below
    * the watermark can never qualify again after the loop (stage-k
    * qualification needs ts > the finalized stage-(k−1) time, and any
    * NOT-yet-final time exceeds the watermark), so they are pruned every
    * call: state per user is (stage, last) + only the in-flight
    * fingerprints younger than the watermark — bounded by arrival rate ×
    * lateness, never stream length. An event-time timeout at the oldest
    * buffered timestamp guarantees finalization fires even if the user
    * goes quiet.
    */
  def streamingFunnelUnordered(events: org.apache.spark.sql.Dataset[FunnelEvT],
                               stages: Seq[String],
                               lateness: String = "2 hours"): DataFrame = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    val stageIdx = stages.zipWithIndex.toMap
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelHitT](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[FunnelBuf]) =>
          val st = state.getOption.getOrElse(FunnelBuf(0, Long.MinValue, Nil))
          var buf = st.buf
          it.foreach { e =>
            stageIdx.get(e.event_type).foreach { si =>
              if (si >= st.stage) buf = (si, e.ts.getTime) :: buf
            }
          }
          val wm = state.getCurrentWatermarkMs()
          val hits = List.newBuilder[FunnelHitT]
          var stage = st.stage
          var last = st.last_ms
          var advanced = true
          while (advanced && stage < stages.length) {
            advanced = false
            var t = Long.MaxValue
            buf.foreach { case (si, ts) =>
              if (si == stage && ts > last && ts < t) t = ts
            }
            if (t != Long.MaxValue && t <= wm) {
              stage += 1; last = t; advanced = true
              hits += FunnelHitT(userId, stage, stages(stage - 1), t)
            }
          }
          buf = buf.filter(_._2 > wm)
          state.update(FunnelBuf(stage, last, buf))
          if (buf.nonEmpty) {
            // fire when the watermark passes the oldest buffered event
            state.setTimeoutTimestamp(buf.map(_._2).min)
          }
          hits.result().iterator
      }.toDF()
  }

  /** Streaming exact dedup: watermark-bounded dedup on the key columns
    * ALONE — a replayed event re-stamped with a different ts still drops
    * (plain `dropDuplicates(key, ts)` would let it through). The default
    * key is the event id (replay suppression); D8's first-touch form keys
    * on (user_id, event_type). State holds only keys younger than the
    * watermark, so memory is bounded by (arrival rate × watermark), not
    * stream length.
    */
  def streamingDedup(events: DataFrame, idCol: String = "event_id",
                     moreCols: Seq[String] = Nil,
                     lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(idCol +: moreCols)

  // ------------------------------------------------- streaming upsert sink
  /** The reference's streaming ingest pattern (Query History API feed →
    * MERGE per batch): `foreachBatch` + the same mergeUpsert used in batch.
    *
    * Crash safety via versioned snapshots (a minimal transaction log):
    * batch N merges the latest *complete* snapshot with version < N and
    * writes `targetDir/v=N` (complete = has the committer's _SUCCESS
    * marker). A crash mid-write leaves an incomplete v=N that readers
    * skip; the checkpoint replays batch N, which rebuilds v=N from the
    * same v<N base — idempotent. Read the table with [[latestSnapshot]].
    * Old versions are retention-swept like any other files.
    */
  def streamingUpsert(events: DataFrame, targetDir: String, keys: Seq[String],
                      skewSafe: Boolean = false): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // no prior snapshot still merges (against an empty target): the
        // first batch of a CDC feed can carry duplicate keys too, and
        // MERGE semantics owe it the same one-winner-per-key dedup
        val target = snapshotVersions(spark, targetDir)
          .filter(_ < batchId).sorted.lastOption match {
          case Some(v) => spark.read.parquet(s"$targetDir/v=$v")
          case None    => batch.limit(0)
        }
        graft.operators.LakehouseOps
          .mergeUpsert(target, batch, keys, skewSafe = skewSafe)
          .write.mode("overwrite").parquet(s"$targetDir/v=$batchId")
      }

  /** [[streamingUpsert]] landing in a real Delta-protocol table
    * (graft.sources.DeltaLite) instead of the v=N snapshot dirs — the
    * reference's exact production shape: CDC feed → MERGE → Delta table
    * (tasks/Query History API to Delta_withmetrics.py:196-300). Each
    * micro-batch merges against the table's latest snapshot and commits
    * one new version (operation MERGE), so DESCRIBE HISTORY shows the
    * batch trail and time travel replays any intermediate table state.
    * Replay-idempotent: a restarted batch N finds the table already at
    * ≥ N+1 commits and skips — exactly one commit per batch, ever.
    */
  def streamingDeltaUpsert(events: DataFrame, tablePath: String,
                           keys: Seq[String], skewSafe: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = graft.sources.DeltaLite.versions(spark, tablePath).size
        if (committed <= batchId) {
          val target =
            if (committed == 0) batch.limit(0)
            else graft.sources.DeltaLite.read(spark, tablePath)
          val merged = graft.operators.LakehouseOps
            .mergeUpsert(target, batch, keys, skewSafe = skewSafe)
          graft.sources.DeltaLite.commit(spark, tablePath, merged,
            overwrite = true, operation = "MERGE")
        }
        ()
      }

  /** [[streamingDeltaUpsert]] with per-batch cost ∝ the batch, not the
    * table: after batch 0 seeds the table, every micro-batch lands via
    * DeltaLite.selectiveMerge — add-stats data skipping reads and
    * rewrites ONLY the files whose key range the batch touches, so a
    * steady CDC trickle into a 100 TB table stops paying the
    * full-rewrite price [[streamingDeltaUpsert]] pays per batch. Same
    * replay-idempotence guard (one commit per batch, ever).
    */
  def streamingSelectiveUpsert(events: DataFrame, tablePath: String,
                               keys: Seq[String], skewSafe: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = graft.sources.DeltaLite.versions(spark, tablePath).size
        if (committed <= batchId) {
          if (committed == 0) {
            val seed = graft.operators.LakehouseOps
              .mergeUpsert(batch.limit(0), batch, keys, skewSafe = skewSafe)
            graft.sources.DeltaLite.commit(spark, tablePath, seed,
              operation = "MERGE")
          } else
            graft.sources.DeltaLite.selectiveMerge(spark, tablePath, batch,
              keys, skewSafe = skewSafe)
        }
        ()
      }

  /** Streaming CDC DELETE feed → merge-on-read deletion vectors: each
    * micro-batch of delete keys lands via DeltaLite.deleteVectors — no
    * data file is rewritten, the per-batch commit is kilobytes of
    * roaring-bitmap sidecar, and per-batch cost ∝ matching rows (the
    * scan is one pass with existing DVs masked). Replay-idempotence is
    * VALUE-level, stronger than the other writers' commit-count guard:
    * a replayed batch's victims are already masked by the existing DVs,
    * so it finds zero rows and commits NOTHING — the table state and
    * version history are unchanged under any replay. The table must
    * exist (deletes need something to delete from); a compliance
    * erasure still requires the copy-on-write path + vacuum, as
    * documented on deleteVectors.
    */
  def streamingDvDelete(deletes: DataFrame, tablePath: String,
                        keyCols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deletes.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.DeltaLite.deleteVectors(
          batch.sparkSession, tablePath, batch, keyCols)
        ()
      }

  /** [[streamingDeltaUpsert]]'s contract on the OTHER open table format
    * (graft.sources.IcebergLite): CDC feed → MERGE → Iceberg table, one
    * snapshot commit per micro-batch (summary operation `merge`), so the
    * snapshot log shows the batch trail and any intermediate table state
    * time-travels by snapshot id. Replay-idempotent through the same
    * commit-count guard — Iceberg writes one metadata version per commit,
    * so `versions.size` counts commits exactly as Delta's log does.
    */
  def streamingIcebergUpsert(events: DataFrame, tablePath: String,
                             keys: Seq[String], skewSafe: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = graft.sources.IcebergLite.versions(spark, tablePath).size
        if (committed <= batchId) {
          val target =
            if (committed == 0) batch.limit(0)
            else graft.sources.IcebergLite.read(spark, tablePath)
          val merged = graft.operators.LakehouseOps
            .mergeUpsert(target, batch, keys, skewSafe = skewSafe)
          graft.sources.IcebergLite.commit(spark, tablePath, merged,
            overwrite = true, operation = "merge")
        }
        ()
      }

  /** [[streamingDvDelete]]'s contract on the OTHER format: a streaming
    * CDC DELETE feed lands as per-micro-batch EQUALITY delete files —
    * the O(batch) channel (the delete file IS the batch's distinct
    * keys; no scan locates positions), so per-batch cost is independent
    * of table size. Replay idempotence is VALUE-level — a re-applied
    * key set masks exactly the same rows (a commit-COUNT guard would be
    * wrong here: empty batches commit nothing, so counts drift from
    * batch ids and a post-restart replay would be misjudged). Batches
    * arriving before the target table exists are skipped (nothing to
    * delete from).
    */
  def streamingEqDelete(deletes: DataFrame, tablePath: String,
                        keyCols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deletes.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        if (graft.sources.IcebergLite.versions(spark, tablePath).nonEmpty &&
            !batch.isEmpty)
          graft.sources.IcebergLite.deleteRows(spark, tablePath, batch,
            keyCols, equality = true)
        ()
      }

  /** CROSS-FORMAT STREAMING REPLICATION — the composition the r13
    * pieces exist for: consume a DeltaLite table's CDF stream
    * ([[readDeltaStream]], `_change_type`-tagged row events) and land it
    * in an IcebergLite table — inserts/postimages MERGE
    * (selectiveMerge: cost ∝ touched files after the seed), deletes
    * land as equality delete files (cost ∝ batch). The initial snapshot
    * arrives as insert rows and seeds the destination; exactly-once
    * across restarts rides the query checkpoint (set
    * `checkpointLocation` on the returned writer). A batch may span
    * MANY source commits, so each key's events are resolved to the
    * LATEST by `_commit_version` (the cdfVersions channel) before
    * applying — an upsert-then-delete of one key within a batch ends
    * deleted, a delete-then-reinsert ends alive, exactly like the
    * source. At 100 TB the shape holds: each batch moves only the
    * changed rows, never either table.
    */
  def replicateDeltaToIceberg(spark: org.apache.spark.sql.SparkSession,
                              srcTable: String, dstTable: String,
                              keys: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions.{col, row_number}
    readDeltaStream(spark, srcTable, cdf = true, keys = keys,
      cdfVersions = true).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // last event per key decides; preimages are bookkeeping only.
        // The window runs over BATCH-sized data (∝ changes, not tables).
        // Tie-break WITHIN a commit: a foreign MERGE may record a
        // delete+insert pair for one key at the same version — the row
        // exists afterwards, so non-delete events rank first
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(k => col(s"`$k`")): _*)
          .orderBy(col("_commit_version").desc,
            org.apache.spark.sql.functions
              .when(col("_change_type") === "delete", 0).otherwise(1).desc)
        val last = batch.filter(col("_change_type") =!= "update_preimage")
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val ups = last.filter(col("_change_type") =!= "delete")
          .drop("_change_type", "_commit_version")
        val dels = last.filter(col("_change_type") === "delete")
          .select(keys.map(k => col(s"`$k`")): _*)
        val exists = graft.sources.IcebergLite.versions(s, dstTable).nonEmpty
        if (!exists) {
          if (!ups.isEmpty)
            graft.sources.IcebergLite.commit(s, dstTable, ups)
        } else if (!ups.isEmpty)
          graft.sources.IcebergLite.selectiveMerge(s, dstTable, ups, keys)
        if (exists && !dels.isEmpty)
          graft.sources.IcebergLite.deleteRows(s, dstTable, dels, keys,
            equality = true)
        ()
      }
  }

  /** A DeltaLite table as a STREAMING SOURCE — the read half the six
    * format writers above were missing (see [[TableStreams]] for the
    * offset/batch mechanics and the 100 TB shape). Append mode delivers
    * the initial snapshot then per-commit deltas; `cdf = true` delivers
    * `_change_type`-tagged row-level changes (keys required for
    * classification). Exactly-once across restarts rides the query's
    * own checkpoint.
    */
  def readDeltaStream(spark: org.apache.spark.sql.SparkSession,
                      tablePath: String, cdf: Boolean = false,
                      keys: Seq[String] = Nil,
                      startingVersion: Option[Long] = None,
                      maxVersionsPerTrigger: Option[Int] = None,
                      cdfVersions: Boolean = false,
                      startingTimestamp: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(classOf[DeltaLiteStreamProvider].getName)
      .option("path", tablePath)
      .option("cdf", cdf.toString)
      .option("cdfVersions", cdfVersions.toString)
      .option("keys", keys.mkString(","))
    startingVersion.foreach(v => r.option("startingVersion", v.toString))
    startingTimestamp.foreach(t => r.option("startingTimestamp", t.toString))
    maxVersionsPerTrigger.foreach(n =>
      r.option("maxVersionsPerTrigger", n.toString))
    r.load()
  }

  /** [[readDeltaStream]]'s IcebergLite twin: append mode over the
    * format's incremental-scan contract, or `cdf = true` for
    * `_change_type`-tagged row-level changes ([[IcebergLite.changes]] —
    * merge-on-read deletes and rewrites flow as events; keys required).
    */
  def readIcebergStream(spark: org.apache.spark.sql.SparkSession,
                        tablePath: String, cdf: Boolean = false,
                        keys: Seq[String] = Nil,
                        cdfVersions: Boolean = false,
                        startingSnapshot: Option[Long] = None,
                        maxSnapshotsPerTrigger: Option[Int] = None,
                        startingTimestamp: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(classOf[IcebergLiteStreamProvider].getName)
      .option("path", tablePath)
      .option("cdf", cdf.toString)
      .option("cdfVersions", cdfVersions.toString)
      .option("keys", keys.mkString(","))
    startingSnapshot.foreach(s => r.option("startingSnapshot", s.toString))
    startingTimestamp.foreach(t => r.option("startingTimestamp", t.toString))
    maxSnapshotsPerTrigger.foreach(n =>
      r.option("maxSnapshotsPerTrigger", n.toString))
    r.load()
  }

  /** [[replicateDeltaToIceberg]]'s MIRROR — the reverse leg r13 couldn't
    * run (Iceberg had no row-level changelog): consume an IcebergLite
    * table's CDF stream ([[readIcebergStream]] with `cdf = true`, built
    * on [[IcebergLite.changes]]' visibility diff) and land it in a
    * DeltaLite table — inserts/postimages MERGE (selectiveMerge: cost ∝
    * touched files after the seed), deletes land as merge-on-read
    * DELETION VECTORS (cost ∝ matching rows; no data file rewrites). A
    * batch may span many source snapshots, so each key resolves to its
    * LATEST event by `_commit_version` — the snapshot's HISTORY ordinal,
    * because foreign snapshot ids are random — before applying.
    * Exactly-once rides the query checkpoint.
    */
  def replicateIcebergToDelta(spark: org.apache.spark.sql.SparkSession,
                              srcTable: String, dstTable: String,
                              keys: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions.{col, row_number}
    readIcebergStream(spark, srcTable, cdf = true, keys = keys,
      cdfVersions = true).writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // last event per key decides; preimages are bookkeeping only.
        // Tie-break WITHIN a snapshot: a merge may record a
        // delete+insert pair for one key — the row exists afterwards,
        // so non-delete events rank first
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(k => col(s"`$k`")): _*)
          .orderBy(col("_commit_version").desc,
            org.apache.spark.sql.functions
              .when(col("_change_type") === "delete", 0).otherwise(1).desc)
        val last = batch.filter(col("_change_type") =!= "update_preimage")
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val ups = last.filter(col("_change_type") =!= "delete")
          .drop("_change_type", "_commit_version")
        val dels = last.filter(col("_change_type") === "delete")
          .select(keys.map(k => col(s"`$k`")): _*)
        val exists = graft.sources.DeltaLite.versions(s, dstTable).nonEmpty
        if (!exists) {
          if (!ups.isEmpty)
            graft.sources.DeltaLite.commit(s, dstTable, ups)
        } else if (!ups.isEmpty)
          graft.sources.DeltaLite.selectiveMerge(s, dstTable, ups, keys)
        if (exists && !dels.isEmpty)
          graft.sources.DeltaLite.deleteVectors(s, dstTable, dels, keys)
        ()
      }
  }

  /** Complete (committed) snapshot versions under a streamingUpsert target. */
  def snapshotVersions(spark: org.apache.spark.sql.SparkSession,
                       targetDir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(targetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      // tolerate stray v= names (v=1.bak etc.) like TableMaintenance
      // .allVersions — a non-numeric dir must not brick every read
      .flatMap(st => st.getPath.getName.stripPrefix("v=").toLongOption)
  }

  /** The current table state produced by [[streamingUpsert]]. */
  def latestSnapshot(spark: org.apache.spark.sql.SparkSession,
                     targetDir: String): DataFrame = {
    val vs = snapshotVersions(spark, targetDir)
    require(vs.nonEmpty, s"no committed snapshot under $targetDir")
    spark.read.parquet(s"$targetDir/v=${vs.max}")
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_windowed_agg"   -> ((s: SparkSession, d: String) => streamWindowedAgg(s, d)),
    "stream_sessionize"     -> ((s: SparkSession, d: String) => streamSessionize(s, d)),
    "stream_interval_join"  -> ((s: SparkSession, d: String) => streamIntervalJoin(s, d)),
    "stream_distinct_users" -> ((s: SparkSession, d: String) => streamDistinctUsers(s, d)),
    "stream_dedup"          -> ((s: SparkSession, d: String) => streamDedup(s, d)),
    "stream_enrich"         -> ((s: SparkSession, d: String) => streamEnrich(s, d)))

  val oracles: Map[String, String] = Map(
    "stream_windowed_agg"   -> streamWindowedAggOracle,
    "stream_sessionize"     -> streamSessionizeOracle,
    "stream_interval_join"  -> streamIntervalJoinOracle,
    "stream_distinct_users" -> streamDistinctUsersOracle,
    "stream_dedup"          -> streamDedupOracle,
    "stream_enrich"         -> streamEnrichOracle)
}
