package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * so it arrives as a nanos-since-epoch LONG. We keep the exact nanos in
    * `ts_ns` (for order/compare parity with ns-capable engines) and expose
    * `ts` as a µs-truncated proper timestamp for time arithmetic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType.typeName == "long")
      raw.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
  }
  /** Note: the test parquet is single-row-group (unsplittable), so scans
    * here are single-task. Rebalancing the small tables to more partitions
    * was measured and REJECTED: after the native-expression rewrite the
    * per-row sketch work is cheap enough that the extra shuffle round-trip
    * costs more than the parallelism gains at these sizes; at real scale
    * the file count provides the splits.
    */
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
