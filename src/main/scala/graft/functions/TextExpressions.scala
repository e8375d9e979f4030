package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenizer + stopword-profile counter.
  *
  * `TokenProfileCounts(text, profiles)` returns
  * `[n_tokens, hits(profile 0), …, hits(profile p-1)]` from a SINGLE scan
  * of the row's bytes. The higher-order-function formulation
  * (`size(filter(split(text), t -> t.isin(...)))` per profile) evaluates
  * its lambda interpreted per element, and CollapseProject re-inlines the
  * `split()` into every reference — so a 5-profile langid scored each
  * document's token array ≥5 interpreted times. Here the split happens
  * once, compiled, and every profile's membership is resolved from one
  * shared token→profile-indices hash map probe per token.
  *
  * `n_tokens` counts split-on-single-space segments exactly like
  * `size(split(text, " "))` (empty segments included), so it doubles as
  * the word count — callers get tokenization + scoring for one pass.
  */
object Text {

  /** Column API: `[n_tokens, hits_0, …, hits_{p-1}]` for a string column. */
  def tokenProfileCounts(text: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      TokenProfileCounts(GraftColumnBridge.expression(text), profiles))
}

case class TokenProfileCounts(child: Expression, profiles: Seq[Seq[String]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_token_profile_counts requires STRING input, got ${child.dataType.sql}")
    else if (profiles.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "graft_token_profile_counts requires at least one profile")
    else TypeCheckResult.TypeCheckSuccess

  /** token → indices of the profiles containing it (a token may appear in
    * several profiles — e.g. "de"/"fr" share "des"-like forms).
    */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, scala.collection.mutable.ArrayBuffer[Int]]()
    profiles.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        m.computeIfAbsent(UTF8String.fromString(w),
          _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += i
      }
    }
    val out = new java.util.HashMap[UTF8String, Array[Int]](m.size * 2)
    m.forEach((k, v) => out.put(k, v.toArray))
    out
  }

  def countsOf(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Int](profiles.length + 1)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        counts(0) += 1
        val hit = lookup.get(UTF8String.fromBytes(bytes, start, i - start))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j) + 1) += 1; j += 1 }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokProfiles", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenProfileCounts =
    copy(child = newChild)
}
