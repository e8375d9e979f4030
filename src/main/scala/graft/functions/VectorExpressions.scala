package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

private[functions] object VecTypeCheck {
  /** array<float> in, everything else is an analysis-time error — without
    * this, `getFloat` on an array<double> input would silently read half
    * of each 8-byte value and return garbage scores.
    */
  def check(what: String, types: DataType*): TypeCheckResult =
    if (types.forall { case ArrayType(FloatType, _) => true; case _ => false })
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$what requires ARRAY<FLOAT> input, got ${types.map(_.sql).mkString(", ")}")
}

/** Native vector expressions for the embedding column (`array<float>`).
  *
  * The unrolled-Column alternative (64 GetArrayItem×cast×multiply terms,
  * or 16×64 for the LSH bucket) generates thousands of Janino AST nodes
  * per operator — compile time swamps runtime at these plan sizes. Each of
  * these is instead one compiled loop per row, invoked as a single codegen
  * call, so plans stay small and the loop JITs to vector-friendly code.
  */
object Vec {

  /** score = a · b accumulated left-to-right in double (each float is
    * promoted before the multiply — bit-identical to engines that compute
    * on DOUBLE[], e.g. DuckDB's list_dot_product on cast lists).
    */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Random-hyperplane LSH bucket: bit p = sign(planes(p)·v); planes from
    * a fixed seeded gaussian (java.util.Random's algorithm is specified,
    * so buckets are stable across runs/versions).
    */
  def cosineLshBucket(v: Column, bits: Int, dim: Int = 64, seed: Long = 42L): Column =
    GraftColumnBridge.column(
      CosineLshBucket(GraftColumnBridge.expression(v), bits, dim, seed))

  /** The same bucket computation as ANSI SQL over a FLOAT[] column (for
    * oracle parity checks, like ZOrder.zvalueSql): the seeded plane
    * constants are emitted as DOUBLE[] literals via Double.toString, which
    * round-trips exactly, and `list_dot_product(DOUBLE[], DOUBLE[])`
    * accumulates in the same sequential order as `CosineLshBucket.bucketOf`
    * — proven bit-identical by the ann_bruteforce oracle.
    */
  def cosineLshBucketSql(v: String, bits: Int, dim: Int = 64, seed: Long = 42L): String = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    planes.zipWithIndex.map { case (w, p) =>
      val lst = w.map(_.toString).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($lst, CAST($v AS DOUBLE[])) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }
}

case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.check("graft_vec_dot", left.dataType, right.dataType)

  def dotOf(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dotOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDot", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.dotOf($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

case class CosineLshBucket(child: Expression, bits: Int, dim: Int, seed: Long)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.check("graft_cosine_lsh_bucket", child.dataType)

  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  def bucketOf(v: ArrayData): Long = {
    val n = math.min(v.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val w = planes(p)
      var s = 0.0
      var d = 0
      while (d < n) { s += w(d) * v.getFloat(d); d += 1 }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def nullSafeEval(input: Any): Any =
    bucketOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lsh", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucketOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineLshBucket =
    copy(child = newChild)
}
