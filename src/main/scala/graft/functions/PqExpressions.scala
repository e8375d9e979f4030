package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Product-quantization codec as native expressions.
  *
  * A trained PQ model (coarse centroids + per-subspace codebooks, a few KB
  * of floats) rides INSIDE the expression the way CosineLshBucket carries
  * its hyperplanes: encode/decode are one compiled loop per row, and the
  * encoded table holds `m` small ints per vector instead of `dim` floats —
  * the representation that makes billion-vector ANN shippable.
  */
object Pq {

  /** codes[m]: per subspace, the codebook entry nearest (L2) to the
    * residual v − centroids(cell).
    */
  def encode(v: Column, cell: Column,
             centroids: Array[Array[Float]],
             codebooks: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(cell),
      centroids, codebooks))

  /** Reconstructed vector: centroids(cell) + concat of the coded codebook
    * entries. `dot(query, decode(codes))` is the classic ADC
    * approximation of `dot(query, v)`.
    */
  def decode(codes: Column, cell: Column,
             centroids: Array[Array[Float]],
             codebooks: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqDecode(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(cell),
      centroids, codebooks))
}

case class PqEncode(left: Expression, right: Expression,
                    centroids: Array[Array[Float]],
                    codebooks: Array[Array[Array[Float]]])
  extends BinaryExpression {
  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"Pq.encode requires (ARRAY<FLOAT>, BIGINT), got ${l.sql}, ${r.sql}")
    }

  def encodeOf(v: ArrayData, cell: Long): ArrayData = {
    // loud failure beats silent garbage: UnsafeArrayData does no bounds
    // checks, so a wrong-dimension vector or out-of-model cell id would
    // otherwise read arbitrary bytes into the index
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"Pq.encode: vector has ${v.numElements()} dims, model expects ${m * subDim}")
    if (cell < 0 || cell >= centroids.length)
      throw new IllegalArgumentException(
        s"Pq.encode: cell $cell outside [0, ${centroids.length})")
    val cent = centroids(cell.toInt)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      val cb = codebooks(mi)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.length) {
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          // promote every operand to double BEFORE the subtractions (same
          // rule as VecDot): float→double is exact, so a SQL oracle doing
          // the identical DOUBLE arithmetic reproduces d2 bit-for-bit —
          // float-rounded intermediate subtractions would not be portable
          val r = (v.getFloat(off + d).toDouble - cent(off + d).toDouble) -
            cb(j)(d).toDouble
          d2 += r * r
          d += 1
        }
        // ties break toward the lower code — first strict improvement wins
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any, cell: Any): Any =
    encodeOf(v.asInstanceOf[ArrayData], cell.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEnc", this)
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $ref.encodeOf($v, $c);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}

case class PqDecode(left: Expression, right: Expression,
                    centroids: Array[Array[Float]],
                    codebooks: Array[Array[Array[Float]]])
  extends BinaryExpression {
  private val m = codebooks.length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"Pq.decode requires (ARRAY<INT>, BIGINT), got ${l.sql}, ${r.sql}")
    }

  def decodeOf(codes: ArrayData, cell: Long): ArrayData = {
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"Pq.decode: ${codes.numElements()} codes, model expects $m")
    if (cell < 0 || cell >= centroids.length)
      throw new IllegalArgumentException(
        s"Pq.decode: cell $cell outside [0, ${centroids.length})")
    val cent = centroids(cell.toInt)
    val out = new Array[Float](m * subDim)
    var mi = 0
    while (mi < m) {
      val code = codes.getInt(mi)
      if (code < 0 || code >= codebooks(mi).length)
        throw new IllegalArgumentException(
          s"Pq.decode: code $code outside [0, ${codebooks(mi).length})")
      val cb = codebooks(mi)(code)
      val off = mi * subDim
      var d = 0
      while (d < subDim) { out(off + d) = cent(off + d) + cb(d); d += 1 }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(codes: Any, cell: Any): Any =
    decodeOf(codes.asInstanceOf[ArrayData], cell.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDec", this)
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $ref.decodeOf($v, $c);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqDecode =
    copy(left = l, right = r)
}
