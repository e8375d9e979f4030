package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

private[functions] object SketchTypeCheck {
  /** String input + positive size parameters, rejected at analysis time —
    * these are reachable straight from SQL via GraftExtensions, so a bad
    * `n`/`k`/`w` must fail the query, not corrupt byte-range arithmetic.
    */
  def check(what: String, t: DataType, params: (String, Int)*): TypeCheckResult =
    if (t != StringType)
      TypeCheckResult.TypeCheckFailure(s"$what requires STRING input, got ${t.sql}")
    else params.find(_._2 < 1) match {
      case Some((name, v)) => TypeCheckResult.TypeCheckFailure(
        s"$what requires $name >= 1, got $v")
      case None => TypeCheckResult.TypeCheckSuccess
    }
}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-document sketch loops.
  *
  * Why expressions and not `transform`/`aggregate` lambdas: Spark evaluates
  * higher-order-function lambdas interpreted, per element, and
  * CollapseProject happily inlines a `split()` alias into every lambda
  * reference — re-tokenizing the document once per shingle. A sketch is one
  * tight loop over the row's bytes; writing it as a single Expression makes
  * it one JIT-compiled call per row. Codegen emits a single static-method
  * call (the loop itself is already compiled Scala — there is nothing for
  * Janino to improve), so the expression stays inside whole-stage codegen
  * spans rather than breaking them the way a Scala UDF's
  * serialize/deserialize boundary would.
  *
  * Hashing is splitmix64 over UTF-8 bytes — fixed public constants,
  * engine-independent, no allocation per token.
  */
object Sketch {

  /** splitmix64 finalizer — the standard public mixing constants. */
  @inline private[functions] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a over a byte range, finished with mix64 (good avalanche). */
  private[functions] def hashBytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    mix64(h)
  }

  /** Distinct hashes of the word n-shingles of `s` (split on single
    * spaces); whole-text hash when fewer than n tokens.
    */
  def shingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.getBytes
    // token boundary scan — no string allocation
    var tokenHashes = new Array[Long](8)
    var nTok = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (nTok == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        }
        tokenHashes(nTok) = hashBytes(bytes, start, i)
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    if (nTok < n) return Array(hashBytes(bytes, 0, bytes.length))
    val out = new java.util.HashSet[java.lang.Long](nTok * 2)
    val res = new Array[Long](nTok - n + 1)
    var k = 0
    var j = 0
    while (j <= nTok - n) {
      var h = 0L
      var d = 0
      while (d < n) { h = mix64(h ^ tokenHashes(j + d)); d += 1 }
      if (out.add(h)) { res(k) = h; k += 1 }
      j += 1
    }
    if (k == res.length) res else java.util.Arrays.copyOf(res, k)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    * every character k-gram, take the min of each w-window (rightmost min
    * on ties — the robust-winnowing rule), emit distinct mins in
    * first-seen order. Single pass, O(len·w) worst case.
    *
    * Gram i hashes the UTF-8 bytes of code points [i, i+k) with
    * [[PortableHash.md5Long]] — exactly DuckDB's `md5(substr(text, i+1,
    * k))`, which makes the whole fingerprint pipeline oracle-checkable
    * (query `text_fingerprint`).
    */
  def winnowFingerprints(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    // code-point start offsets (UTF-8 continuation bytes are 10xxxxxx),
    // with an end sentinel so gram slicing never branches
    val starts = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(n) = i; n += 1 }
      i += 1
    }
    starts(n) = bytes.length
    val nGrams = math.max(n - k + 1, 1)
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      grams(g) = PortableHash.md5Long(bytes, starts(g), starts(math.min(g + k, n)))
      g += 1
    }
    val nWin = math.max(nGrams - w + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val res = new Array[Long](nWin)
    var nRes = 0
    var j = 0
    while (j < nWin) {
      var m = grams(j)
      var d = 1
      while (d < w && j + d < nGrams) {
        if (grams(j + d) <= m) m = grams(j + d)
        d += 1
      }
      if (seen.add(m)) { res(nRes) = m; nRes += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(res, nRes)
  }

  /** Start offsets of single-space-delimited tokens (`split(' ')` /
    * `string_split` parity — empty tokens included): token t spans
    * `[starts(t), t+1 < nTok ? starts(t+1)-1 : bytes.length)`. The ONE
    * tokenizer shared by every fused sketch (wordNgrams, minhash
    * signature, simhash) so boundary semantics can never diverge.
    */
  private[functions] def tokenStarts(bytes: Array[Byte]): (Array[Int], Int) = {
    var starts = new Array[Int](8)
    var nTok = 0
    var i = 0
    var tokStart = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (nTok == starts.length) starts = java.util.Arrays.copyOf(starts, nTok * 2)
        starts(nTok) = tokStart
        nTok += 1
        tokStart = i + 1
      }
      i += 1
    }
    (starts, nTok)
  }

  /** Word n-grams as strings (split on single spaces), one pass over the
    * bytes: each n-gram is a byte-range slice, no per-token allocation.
    */
  def wordNgrams(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val (starts, nTok) = tokenStarts(bytes)
    if (nTok < n) return Array.empty
    val out = new Array[UTF8String](nTok - n + 1)
    var j = 0
    while (j <= nTok - n) {
      val from = starts(j)
      val until = if (j + n < nTok) starts(j + n) - 1 else bytes.length
      out(j) = UTF8String.fromBytes(bytes, from, until - from)
      j += 1
    }
    out
  }

  /** Column API: distinct word-n-shingle hashes of a string column. */
  def shingle_hashes(text: Column, n: Int = 3): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(text), n))

  /** Column API: winnowing fingerprints of a string column. */
  def winnow_fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftColumnBridge.column(WinnowFingerprints(GraftColumnBridge.expression(text), k, w))

  /** Column API: word n-grams of a string column (as strings). */
  def word_ngrams(text: Column, n: Int = 2): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(text), n))
}

case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_shingle_hashes", child.dataType, "n" -> n)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketch.shingleHashes(input.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.Sketch.shingleHashes($c, $n));")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_word_ngrams", child.dataType, "n" -> n)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Sketch.wordNgrams(input.asInstanceOf[UTF8String], n).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${classOf[GenericArrayData].getName}(" +
        s"(Object[]) graft.functions.Sketch.wordNgrams($c, $n));")
  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_winnow_fingerprints", child.dataType,
      "k" -> k, "w" -> w)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Sketch.winnowFingerprints(input.asInstanceOf[UTF8String], k, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.Sketch.winnowFingerprints($c, $k, $w));")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
