package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave key, the clustering basis of the reference's
  * `OPTIMIZE ... ZORDER BY` (resources/TPC-datagen-notebook.scala:1979-2029).
  *
  * Built purely from codegen'd arithmetic (`shiftright`/`&`/`shiftleft`/`+`)
  * so it stays inside whole-stage codegen — no UDF. At 100 TB the key is
  * computed streaming in the scan stage; `repartitionByRange(zkey)` then
  * gives each output file a tight rectangle in key space, which is exactly
  * what makes min/max file skipping effective on later multi-column filters.
  */
object ZOrder {

  /** Interleaved z-value of `xs` using the low `bits` bits of each (columns
    * are masked, so any non-negative integral input is safe). Bit b of input
    * j lands at output position `b * xs.size + j`.
    */
  def zvalue(xs: Seq[Column], bits: Int): Column = {
    require(xs.nonEmpty && bits * xs.size <= 63, "z-value must fit in a long")
    val mask = (1L << bits) - 1
    val terms = for {
      b <- 0 until bits
      (x, j) <- xs.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(x.cast("long").bitwiseAND(lit(mask)), b).bitwiseAND(lit(1L)),
      b * xs.size + j)
    terms.reduce(_ + _)
  }

  /** The same computation as ANSI SQL (for oracle parity checks). */
  def zvalueSql(xs: Seq[String], bits: Int): String = {
    val mask = (1L << bits) - 1
    val terms = for {
      b <- 0 until bits
      (x, j) <- xs.zipWithIndex
    } yield s"(((CAST($x AS BIGINT) & $mask) >> $b) & 1) << ${b * xs.size + j}"
    terms.map(t => s"($t)").mkString(" + ")
  }

  /** Data-sized Z-ORDER clustering rewrite — the shared kernel under both
    * table formats' `optimizeZorder` verbs: probe each column's max with
    * one cheap agg, size the per-column bit budget so values NEVER wrap
    * (a value past 2^bits masked low would shred the locality the rewrite
    * exists to create — over-wide columns right-shift to keep their HIGH
    * bits: coarser rectangles, never wrapped ones), then one range
    * shuffle + in-partition sort on the interleave. `bits > 0` overrides
    * the per-column budget, with the same shift protection. Returns the
    * clustered frame with the original schema — each written partition
    * covers a tight rectangle in key space, which is what makes min/max
    * file skipping selective on every clustered column at once.
    */
  def clusterByZ(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
                 targetFiles: Int, bits: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty && targetFiles >= 1, "need z-cols and >=1 file")
    require(bits * cols.size <= 63, s"bits=$bits × ${cols.size} cols > 63")
    val maxima: Seq[Long] = {
      val row = df.agg(max(col(cols.head)),
        cols.tail.map(c => max(col(c))): _*).head()
      cols.indices.map(i => if (row.isNullAt(i)) 0L
        else math.max(0L, row.get(i) match {
          case n: Number => n.longValue()
          case _ => 0L
        }))
    }
    def widthOf(m: Long): Int =
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(m, 1L)))
    val perCol = if (bits > 0) bits
      else math.min(63 / cols.size, maxima.map(widthOf).max)
    val zCols = cols.zip(maxima).map { case (c, m) =>
      val drop = math.max(0, widthOf(m) - perCol)
      if (drop == 0) col(c) else shiftrightunsigned(col(c).cast("long"), drop)
    }
    df.withColumn("__zkey", zvalue(zCols, perCol))
      .repartitionByRange(targetFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
