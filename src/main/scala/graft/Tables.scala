package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Plain parquet reads: Spark's DataSource v2 parquet scan gives predicate
  * pushdown, column pruning and vectorized decode for free — every operator
  * in this library builds a declarative plan on top of these.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  =
    fanOut(s, load(s, d, "lineitem"))

  /** Fan an under-split scan out to the session's parallelism.
    *
    * Parquet splits only at row-group boundaries, so a single-row-group
    * file (the shape of the driver-generated testdata) scans as ONE task —
    * and every per-row sketch/aggregation stage fused above it runs
    * single-threaded no matter how many cores the session has. When the
    * scan already has enough splits (the 100 TB case: thousands of files),
    * this is the identity — no shuffle is ever added at scale; the
    * round-robin repartition only fires for degenerate low-split inputs,
    * and filters/projections still push through it into the scan.
    *
    * HAZARD: scan-stage metadata functions do not survive the fan-out
    * shuffle — `input_file_name()` evaluates to "" above a repartition.
    * Any file-inventory consumer must read via [[load]] raw, never
    * through a fanned-out table (see dbaDescribeDetail).
    *
    * The split decision reads the scan's file listing (`inputFiles`, a
    * FileIndex lookup) rather than `df.rdd.getNumPartitions`, which would
    * build the full physical plan + RDD lineage per table load just to
    * count splits. File count under-estimates splits for multi-row-group
    * files — the only consequence is a redundant (cheap) repartition on a
    * single-file multi-row-group input, a degenerate layout at scale.
    */
  private def fanOut(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.inputFiles.length >= math.min(4, target)) df
    else df.repartition(target)
  }
  /** `events.ts` has shipped in three physical parquet encodings across
    * testdata generations; normalize all of them to one invariant schema —
    * `ts_ns` LONG (nanos since epoch, for bit-stable cross-engine
    * order/compare) + `ts` TIMESTAMP (session-zoned, for time arithmetic):
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; sessions
    *    set `spark.sql.legacy.parquet.nanosAsLong` so it arrives as a
    *    nanos-since-epoch LONG. `ts` is the µs truncation.
    *  - TIMESTAMP(MICROS, adjustedToUTC=true): loads as TIMESTAMP;
    *    `unix_micros` is exact.
    *  - TIMESTAMP(MICROS, adjustedToUTC=false): loads as TIMESTAMP_NTZ —
    *    a wall-clock datetime with no zone, which `unix_micros` rejects.
    *    Sessions pin `spark.sql.session.timeZone=UTC`, so the cast to
    *    session-zoned TIMESTAMP is value-preserving and the resulting
    *    `ts_ns` is identical to what the same instants yield under the
    *    other two encodings (oracle parity: DuckDB's `epoch_ns(ts)` on µs
    *    data = `unix_micros*1000`).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }
  /** History of the fan-out decision: round 1 measured a blanket
    * repartition of these tables as SLOWER for the cheap projection-only
    * queries (shuffle round-trip > parallelism gain). That held until the
    * heavy aggregation stages landed: minhash signatures (64 hash-min aggs
    * over ~10² shingles/doc) and decimal pricing aggs run *inside the scan
    * stage*, so a 1-split scan serializes them on one core — re-measured in
    * round 2 at sf0.1, fanning out cut dedup_minhash from ~8 s to ~2 s and
    * q1 from ~8.7 s to ~2 s. `fanOut` is the compromise: identity whenever
    * the scan has real splits (any production layout), round-robin only for
    * degenerate single-split inputs.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    fanOut(s, load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    fanOut(s, load(s, d, "embeddings"))
}
