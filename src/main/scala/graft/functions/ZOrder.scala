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
}
