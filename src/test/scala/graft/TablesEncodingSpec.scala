package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver testdata has shipped `events.ts` in three physical encodings
  * across generations (TIMESTAMP(NANOS) read as LONG via nanosAsLong,
  * TIMESTAMP µs, and TIMESTAMP_NTZ µs). [[Tables.events]] must normalize
  * all of them to one invariant schema with identical values, so data
  * regeneration can never silently break the 17 events-based queries again.
  */
class TablesEncodingSpec extends SparkSpec {

  // Three distinct instants (ns since epoch), µs-aligned so every encoding
  // can represent them exactly.
  private val instantsNs = Seq(1700000000123456000L, 1700000111222333000L, 1700086400000001000L)

  private def writeDir(): String =
    Files.createTempDirectory("graft-events-enc").toString

  /** Write a tiny events table whose `ts` arrives from parquet with the
    * given Spark type, then load it back through Tables.events.
    */
  private def roundTrip(encoding: String): DataFrame = {
    val dir = writeDir()
    val rows = instantsNs.zipWithIndex.map { case (ns, i) =>
      Row(i.toLong, ns, 42L + i, "click", 1.0 * i, "{}")
    }
    val base = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val longDf = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), base)
    val df = encoding match {
      case "long" => longDf // the shape nanosAsLong produces from TIMESTAMP(NANOS)
      case "timestamp" =>
        longDf.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case "ntz" =>
        longDf.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    }
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("events normalizes all three ts encodings to identical ts_ns + TIMESTAMP ts") {
    val results = Seq("long", "timestamp", "ntz").map { enc =>
      val out = roundTrip(enc)
      // invariant output schema
      assert(out.schema("ts_ns").dataType === LongType, s"$enc: ts_ns type")
      assert(out.schema("ts").dataType === TimestampType, s"$enc: ts type")
      enc -> out.select("event_id", "ts_ns", "ts").orderBy("event_id").collect().toSeq
    }.toMap

    assert(results("long").map(_.getLong(1)) === instantsNs)
    assert(results("timestamp") === results("long"), "TIMESTAMP encoding drifted from long/nanos")
    assert(results("ntz") === results("long"), "TIMESTAMP_NTZ encoding drifted from long/nanos")
  }

  test("fanOut repartitions a SMALL multi-row-group single file — splits, " +
    "not row groups, bound the scan") {
    // The r16 trap: 10 row groups inside a few-MB file pass a
    // row-group-only check, but openCostInBytes floors Spark's split
    // size at 4 MB, so the scan really runs ~1-way and every heavy
    // per-row stage above it serializes. fanOut must see the true
    // effective parallelism (min of byte-range splits and row groups)
    // and still fan out.
    val dir = Files.createTempDirectory("graft_fanout").toString
    spark.range(20000)
      .select(col("id").as("doc_id"),
        concat(lit("word "), col("id")).as("text"),
        lit("en").as("lang"), lit("s0").as("source"),
        lit(7L).as("n_chars"))
      .coalesce(1)
      .write.option("parquet.block.size", 16 * 1024)
      .parquet(dir + "/documents.parquet")
    // sanity: the trap shape really holds — ONE file, many row groups
    val files = Tables.load(spark, dir, "documents").inputFiles
    assert(files.length == 1, s"expected one part file, got ${files.length}")
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head),
        spark.sparkContext.hadoopConfiguration))
    val groups = try reader.getFooter.getBlocks.size finally reader.close()
    assert(groups >= 4, s"fixture must be multi-row-group, got $groups")
    // the loader must deliver real parallelism anyway
    val parts = Tables.documents(spark, dir).rdd.getNumPartitions
    assert(parts >= math.min(4, spark.sparkContext.defaultParallelism),
      s"fanOut left a $groups-row-group small file at $parts partitions")
  }

  test("real testdata events loads with invariant schema and sane range") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts_ns").dataType === LongType)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(min("ts_ns"), max("ts_ns"), count(lit(1))).head()
    assert(r.getLong(2) > 0)
    // plausible epoch-ns bounds (year 2000..2100) — catches unit mistakes
    assert(r.getLong(0) > 946684800L * 1000000000L)
    assert(r.getLong(1) < 4102444800L * 1000000000L)
  }
}
