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

  /** Column API: `[n_punct, n_upper]` for a string column — one compiled
    * byte pass replacing two whole-string `regexp_replace` scans.
    */
  def charClassCounts(text: Column): Column =
    GraftColumnBridge.column(
      CharClassCounts(GraftColumnBridge.expression(text)))

  /** Column API: BPE-ish subword count — the match count of
    * `[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\s]` without the regex engine.
    */
  def bpeEstCount(text: Column): Column =
    GraftColumnBridge.column(
      BpeEstCount(GraftColumnBridge.expression(text)))
}

/** One-pass character-class profile: `[n_punct, n_upper]` where
  * n_punct = characters outside `[a-zA-Z0-9 ]` (exactly
  * `length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))` — multi-byte
  * characters count once, like `length`) and n_upper = ASCII `[A-Z]`
  * count. The regexp formulation walks the string through java.util.regex
  * twice and materializes two stripped copies; this is one branch-light
  * loop over the UTF-8 bytes, no allocation.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_char_class_counts requires STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  def countsOf(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    var chars = 0; var kept = 0; var upper = 0
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      if ((v & 0xC0) != 0x80) chars += 1 // UTF-8 lead byte = one character
      if (v == ' ' || (v >= '0' && v <= '9') || (v >= 'a' && v <= 'z') ||
          (v >= 'A' && v <= 'Z')) {
        kept += 1
        if (v >= 'A' && v <= 'Z') upper += 1
      }
      i += 1
    }
    new GenericArrayData(Array(chars - kept, upper))
  }

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charClasses", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countsOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

/** Match count of the BPE-estimate alternation
  * `[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\s]` as one compiled byte pass: a
  * greedy regex scan makes a run of L letters yield ⌈L/4⌉ matches, each
  * ASCII digit one, and every other non-whitespace CHARACTER one
  * (multi-byte counts once; `\s` is the ASCII whitespace class, matching
  * java.util.regex's default). Equals `regexp_count` over the pattern —
  * minus the regex engine walking every alternative per position.
  */
case class BpeEstCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_est_count requires STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  def countOf(s: UTF8String): Int = {
    val b = s.getBytes
    var n = 0
    var run = 0 // current ASCII-letter run length
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      val isLetter = (v >= 'a' && v <= 'z') || (v >= 'A' && v <= 'Z')
      if (isLetter) run += 1
      else {
        n += (run + 3) / 4; run = 0
        if (v >= '0' && v <= '9') n += 1
        else if (v == ' ' || v == '\t' || v == '\n' || v == 0x0B || v == '\f' || v == '\r') ()
        else if ((v & 0xC0) != 0x80) n += 1 // any other character, once
      }
      i += 1
    }
    n + (run + 3) / 4
  }

  override def nullSafeEval(input: Any): Any =
    countOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEst", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEstCount =
    copy(child = newChild)
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
