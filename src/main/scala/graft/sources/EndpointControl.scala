package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Endpoint lifecycle glue — the reference's Endpoint_Starter/Stopper
  * notebooks and the status half of Endpoint_History_Status_ETL.py: issue a
  * start/stop command, poll the endpoint's state until it reaches the
  * target (retry-until-state), and append timestamped status snapshots to
  * a history table (`polled_timestamp`,
  * Endpoint_History_Status_ETL.py:99,158).
  *
  * Deliberately driver-side: this is control-plane I/O against a REST
  * surface, not data processing — there is nothing to distribute. The
  * clock and sleep are injectable so the retry logic is spec-testable
  * without wall-clock waits; the HTTP calls themselves are the caller's
  * lambdas (this library has no network dependency).
  */
object EndpointControl {

  /** Poll `getState` until it returns one of `target`, up to `timeoutMs`.
    * Returns (finalState, nPolls). Throws on timeout — silent
    * wrong-state success is how start scripts corrupt downstream runs.
    */
  def awaitState(getState: () => String, target: Set[String],
                 pollEveryMs: Long = 5000, timeoutMs: Long = 600000,
                 sleep: Long => Unit = Thread.sleep,
                 now: () => Long = () => System.currentTimeMillis()): (String, Int) = {
    val deadline = now() + timeoutMs
    var polls = 0
    var state = { polls += 1; getState() }
    while (!target(state)) {
      if (now() >= deadline)
        throw new java.util.concurrent.TimeoutException(
          s"endpoint still '$state' after $polls polls (${timeoutMs}ms); " +
            s"wanted one of ${target.mkString("/")}")
      sleep(pollEveryMs)
      polls += 1
      state = getState()
    }
    (state, polls)
  }

  /** The Starter/Stopper shape: if the endpoint is not already in
    * `target`, issue `command` ONCE, then await the transition. Idempotent
    * against already-started/already-stopped endpoints — the command is
    * skipped when the state is already right (the reference's scripts get
    * this from the API's own idempotency; here it is explicit).
    */
  def ensureState(getState: () => String, command: () => Unit,
                  target: Set[String],
                  pollEveryMs: Long = 5000, timeoutMs: Long = 600000,
                  sleep: Long => Unit = Thread.sleep,
                  now: () => Long = () => System.currentTimeMillis()): (String, Int) = {
    val first = getState()
    if (target(first)) (first, 1)
    else {
      command()
      val (state, polls) =
        awaitState(getState, target, pollEveryMs, timeoutMs, sleep, now)
      // + the probe above, so the count means "state reads" in both branches
      (state, polls + 1)
    }
  }

  /** Status-history append: stamp the polled endpoint rows with
    * `polled_timestamp` and append them under `historyDir` — the
    * reference's `select *, current_timestamp() polled_timestamp`
    * insert. Each poll appends; history accumulates for SCD2-style
    * queries (dba_scd2_history consumes exactly this shape).
    */
  def appendStatusSnapshot(spark: SparkSession, statuses: DataFrame,
                           historyDir: String,
                           polledAtMs: Long = System.currentTimeMillis()): Unit =
    statuses
      .withColumn("polled_timestamp", timestamp_millis(lit(polledAtMs)))
      .write.mode("append").parquet(historyDir)

  /** Read the accumulated status history, newest poll first. */
  def statusHistory(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.parquet(historyDir).orderBy(col("polled_timestamp").desc)
}
