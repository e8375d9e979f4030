package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition-transform math (spec "Partition Transforms"):
  * `identity`, `bucket[N]`, `truncate[W]`, `year`, `month`, `day`,
  * `hour`, `void` — the functions that turn a source column value into
  * its partition value, implemented twice on one definition:
  *
  *  - COLUMN-side ([[transformColumn]]) for the write path: time
  *    transforms compose built-ins (codegen'd), bucket is a native
  *    expression ([[IcebergBucket]]) whose codegen calls the static
  *    murmur3 kernel — partition-value derivation stays inside
  *    whole-stage codegen even at 100 TB write volume.
  *  - DRIVER-side ([[timeValue]]/[[bucketOf]]/[[truncateOf]]) for scan
  *    planning: pruning decides per FILE from manifest partition values,
  *    so this path runs O(files) on the driver, never per row.
  *
  * Bucket hashing is the spec's murmur3_x86_32 (seed 0) over the spec's
  * byte layouts — int/long/date/timestamp promote to an 8-byte
  * little-endian long, strings hash their UTF-8 bytes — so bucket
  * numbers match what real Iceberg writers produce and pruning is valid
  * on FOREIGN bucket-partitioned tables, not just our own.
  *
  * Time transforms are UTC-anchored per the spec; the engine session
  * pins `spark.sql.session.timeZone=UTC`, keeping the column-side
  * `year()`/`month()` composition aligned with the driver-side
  * `LocalDate` math.
  */
object IcebergTransforms {

  /** One partition-spec field: `transform` is the spec string
    * (`identity`, `bucket[16]`, `truncate[4]`, `year`, `month`, `day`,
    * `hour`, `void`), `sourceId` the schema field id it reads.
    */
  final case class PartField(name: String, transform: String, sourceId: Int)

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe  = """truncate\[(\d+)\]""".r

  /** N of a `bucket[N]` spec string, None for other transforms. */
  def bucketN(transform: String): Option[Int] = transform match {
    case BucketRe(n) => Some(n.toInt)
    case _           => None
  }

  /** W of a `truncate[W]` spec string, None for other transforms. */
  def truncW(transform: String): Option[Int] = transform match {
    case TruncRe(w) => Some(w.toInt)
    case _          => None
  }

  /** Is this one of the four time transforms? */
  def isTimeTransform(transform: String): Boolean =
    transform == "year" || transform == "month" ||
      transform == "day" || transform == "hour"

  // ------------------------------------------------- murmur3_x86_32
  /** MurmurHash3 x86_32, seed 0 — Austin Appleby's public-domain
    * algorithm, the hash the Iceberg spec fixes for bucket transforms.
    */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n = data.length
    var i = 0
    while (i + 4 <= n) {
      var k = (data(i) & 0xFF) | ((data(i + 1) & 0xFF) << 8) |
        ((data(i + 2) & 0xFF) << 16) | ((data(i + 3) & 0xFF) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val rem = n & 3
    if (rem == 3) k ^= (data(i + 2) & 0xFF) << 16
    if (rem >= 2) k ^= (data(i + 1) & 0xFF) << 8
    if (rem >= 1) {
      k ^= data(i) & 0xFF
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k
    }
    h ^= n
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Spec bucket hash for integral sources: the value as an 8-byte
    * little-endian long (int/date/timestamp promote), murmur3'd, sign
    * bit cleared, mod N.
    */
  def bucketLong(v: Long, n: Int): Int = {
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
    (murmur3(b) & Int.MaxValue) % n
  }

  /** Spec bucket hash for strings: UTF-8 bytes. */
  def bucketString(s: String, n: Int): Int =
    (murmur3(s.getBytes(StandardCharsets.UTF_8)) & Int.MaxValue) % n

  /** [[bucketString]] on Spark's internal string type — what
    * [[IcebergBucket]]'s codegen calls (no copy to java.lang.String).
    */
  def bucketUtf8(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Int.MaxValue) % n

  // ------------------------------------------------- driver-side values
  /** Query bound → epoch micros (timestamp sources). Strings accept
    * `yyyy-MM-dd` or `yyyy-MM-dd'T'HH:mm:ss`, read as UTC.
    */
  def toMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => java.time.Instant.ofEpochMilli(t.getTime)
      .getEpochSecond * 1000000L + t.getNanos / 1000L
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: Long => l
    case s: String =>
      val ld = if (s.contains("T")) java.time.LocalDateTime.parse(s)
        else java.time.LocalDate.parse(s).atStartOfDay()
      ld.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        ld.getNano / 1000L
    case other => sys.error(s"cannot read $other as a timestamp bound")
  }

  /** Query bound → epoch days (date sources). */
  def toEpochDay(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case i: Int => i.toLong
    case l: Long => l
    case s: String => java.time.LocalDate.parse(s).toEpochDay
    case other => sys.error(s"cannot read $other as a date bound")
  }

  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  /** The time-transform value of a source value: `day`/`hour` are floor
    * divisions of the epoch quantity, `month`/`year` count from 1970 —
    * the spec's integer result domains.
    */
  def timeValue(transform: String, icebergType: String, v: Any): Long = {
    val epochDay = icebergType match {
      case "date" => toEpochDay(v)
      case _      => floorDiv(toMicros(v), 86400000000L)
    }
    transform match {
      case "day"  => epochDay
      case "hour" =>
        require(icebergType != "date", "hour transform needs a timestamp")
        floorDiv(toMicros(v), 3600000000L)
      case "month" =>
        val ld = java.time.LocalDate.ofEpochDay(epochDay)
        (ld.getYear - 1970) * 12L + (ld.getMonthValue - 1)
      case "year" =>
        java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970L
      case other => sys.error(s"not a time transform: $other")
    }
  }

  /** Driver-side bucket of a query key, spec byte layouts per type. */
  def bucketOf(icebergType: String, v: Any, n: Int): Int = icebergType match {
    case "int" | "long"  => bucketLong(v.toString.toLong, n)
    case "string"        => bucketString(v.toString, n)
    case "date"          => bucketLong(toEpochDay(v), n)
    case "timestamp" | "timestamptz" => bucketLong(toMicros(v), n)
    case other => sys.error(s"bucket transform unsupported for $other")
  }

  /** Driver-side truncate: numeric floors to a multiple of W (negative
    * values floor DOWN, the spec's `v - (((v % W) + W) % W)`); strings
    * keep their first W characters (order-preserving prefix).
    */
  def truncateOf(icebergType: String, v: Any, w: Int): Any = icebergType match {
    case "int" | "long" =>
      val x = v.toString.toLong
      x - (((x % w) + w) % w)
    case "string" =>
      val s = v.toString
      if (s.length <= w) s else s.substring(0, w)
    case other => sys.error(s"truncate transform unsupported for $other")
  }

  // ------------------------------------------------- column-side (write)
  /** The partition-value Column for one transform over a source column —
    * what the writer derives and `partitionBy`s on. Time transforms and
    * numeric truncate compose codegen'd built-ins; bucket is the native
    * [[IcebergBucket]]; the session must run UTC for the
    * `year()`/`month()` composition to match the spec's UTC anchoring.
    */
  def transformColumn(transform: String, src: Column, dt: DataType): Column = {
    def micros = unix_micros(src)
    def flrDiv(c: Column, d: Long): Column =
      ((c - pmod(c, lit(d))) / lit(d)).cast(IntegerType)
    transform match {
      case "identity" => src
      case "void"     => lit(null).cast(IntegerType)
      case "year"     => (year(src) - lit(1970)).cast(IntegerType)
      case "month"    =>
        ((year(src) - lit(1970)) * lit(12) + month(src) - lit(1))
          .cast(IntegerType)
      case "day" => dt match {
        case DateType => datediff(src, to_date(lit("1970-01-01")))
          .cast(IntegerType)
        case _        => flrDiv(micros, 86400000000L)
      }
      case "hour" => flrDiv(micros, 3600000000L)
      case BucketRe(n) =>
        GraftColumnBridge.column(
          IcebergBucket(GraftColumnBridge.expression(src), n.toInt))
      case TruncRe(w) => dt match {
        case StringType => substring(src, 1, w.toInt)
        case _          => (src - pmod(src, lit(w.toLong))).cast(dt)
      }
      case other => sys.error(s"unknown partition transform: $other")
    }
  }

  /** Spark type of a transform's partition value (what the manifest
    * partition record stores and the hive dir value parses back as).
    */
  def resultType(transform: String, sourceType: DataType): DataType =
    transform match {
      case "identity"             => sourceType
      case "year" | "month" | "day" | "hour" | "void" => IntegerType
      case BucketRe(_)            => IntegerType
      case TruncRe(_)             => sourceType
      case other => sys.error(s"unknown partition transform: $other")
    }
}

/** Spec bucket transform as a Catalyst expression: murmur3_x86_32 over
  * the spec byte layout of the child, `& Int.MaxValue % n`. Codegen
  * calls the static kernel directly, so bucketed writes stay in
  * whole-stage codegen.
  */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"bucket count must be positive: $n")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | DateType | TimestampType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket: unsupported input type $other")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType =>
      IcebergTransforms.bucketUtf8(input.asInstanceOf[UTF8String], n)
    case IntegerType | DateType =>
      IcebergTransforms.bucketLong(input.asInstanceOf[Int].toLong, n)
    case _ =>
      IcebergTransforms.bucketLong(input.asInstanceOf[Long], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = "graft.sources.IcebergTransforms"
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = $kernel.bucketUtf8($c, $n);"
      case IntegerType | DateType =>
        s"${ev.value} = $kernel.bucketLong((long) $c, $n);"
      case _ =>
        s"${ev.value} = $kernel.bucketLong($c, $n);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
