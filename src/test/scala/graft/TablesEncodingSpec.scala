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
