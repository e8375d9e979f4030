package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
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

  /** Column API: `struct(scrubbed, n_email, n_phone, n_ip)` — the fused
    * PII pass replacing six whole-string regex scans (3 regexp_count +
    * 3 regexp_replace) with byte-level scanners. See [[PiiScrub]].
    */
  def piiScrub(text: Column): Column =
    GraftColumnBridge.column(
      PiiScrub(GraftColumnBridge.expression(text)))
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

/** Fused PII scrub: `struct(scrubbed, n_email, n_phone, n_ip)` in byte
  * passes, replacing TextFuncs.piiScrub's six whole-string regex scans
  * (three `regexp_count` + three sequential `regexp_replace`, each with
  * its own UTF8String↔String round trip) — the r18 verdict's
  * text_pii_scrub decade watch item.
  *
  * Semantics are EXACTLY the regex formulation's (pinned pattern-vs-
  * scanner by the PiiScrubSpec property sweep):
  *  - counts are non-overlapping leftmost matches on the ORIGINAL text
  *    for all three patterns (`regexp_count` semantics);
  *  - replacements apply sequentially — emails first, then phones on the
  *    email-scrubbed text, then IPs on that — so a digit run inside a
  *    replaced span can never double-redact.
  *
  * The scanners replicate java.util.regex leftmost-greedy matching for
  * the three (deliberately backreference/lookaround-free) patterns:
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: the local
  *    part is a maximal LOCAL-class run (backtracking it can never
  *    expose the required '@', so all starts inside a failed run fail
  *    identically); the domain backtracks to the LAST '.' in the domain
  *    run followed by ≥2 letters, and the TLD is the maximal letter run
  *    after it — the greedy/backtrack order replayed directly.
  *  - phone `\+?[0-9][0-9-]{7,}[0-9]`: first digit, then the maximal
  *    `[0-9-]` run; the final digit is the LAST digit at offset ≥ 8
  *    into the run (greedy middle backtracking); a run with none fails
  *    for every start inside it.
  *  - ip `([0-9]{1,3})\.){3}[0-9]{1,3}`: each leading octet must consume
  *    an ENTIRE digit run of length 1–3 followed by '.' (a shorter
  *    greedy backtrack would put a digit where the '.' must be), the
  *    final octet takes min(3, run) digits.
  *
  * All pattern characters are ASCII, and UTF-8 continuation bytes
  * (≥ 0x80) never match an ASCII class, so byte-level runs equal char
  * runs and every match boundary is a valid UTF-8 cut point.
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_pii_scrub requires STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private def isDigit(v: Int): Boolean = v >= '0' && v <= '9'
  private def isAlpha(v: Int): Boolean =
    (v >= 'a' && v <= 'z') || (v >= 'A' && v <= 'Z')
  private def isLocal(v: Int): Boolean =
    isAlpha(v) || isDigit(v) || v == '.' || v == '_' || v == '%' ||
      v == '+' || v == '-'
  private def isDomain(v: Int): Boolean =
    isAlpha(v) || isDigit(v) || v == '.' || v == '-'
  private def isPhoneMid(v: Int): Boolean = isDigit(v) || v == '-'

  /** Flat (start, end) span pairs; `m` = used ints. */
  private final class Spans {
    var a = new Array[Int](16)
    var m = 0
    def add(s: Int, e: Int): Unit = {
      if (m == a.length) a = java.util.Arrays.copyOf(a, m * 2)
      a(m) = s; a(m + 1) = e; m += 2
    }
    def count: Int = m / 2
  }

  private def findEmails(b: Array[Byte]): Spans = {
    val out = new Spans
    val n = b.length
    var i = 0
    while (i < n) {
      if (isLocal(b(i) & 0xFF)) {
        var L = i + 1
        while (L < n && isLocal(b(L) & 0xFF)) L += 1
        var next = L // b(L) is not LOCAL (or end): no start before L can match
        if (L < n && b(L) == '@') {
          var D = L + 1
          while (D < n && isDomain(b(D) & 0xFF)) D += 1
          var p = D - 3
          var dot = -1
          while (p >= L + 2 && dot < 0) {
            if (b(p) == '.' && isAlpha(b(p + 1) & 0xFF) &&
              isAlpha(b(p + 2) & 0xFF)) dot = p
            p -= 1
          }
          if (dot >= 0) {
            var e = dot + 3
            while (e < n && isAlpha(b(e) & 0xFF)) e += 1
            out.add(i, e)
            next = e
          } else next = L + 1 // '@' can't start a match; retry inside domain
        }
        i = next
      } else i += 1
    }
    out
  }

  private def findPhones(b: Array[Byte]): Spans = {
    val out = new Spans
    val n = b.length
    var i = 0
    while (i < n) {
      val v = b(i) & 0xFF
      var j = -1
      if (v == '+' && i + 1 < n && isDigit(b(i + 1) & 0xFF)) j = i + 1
      else if (isDigit(v)) j = i
      if (j < 0) i += 1
      else {
        var r = j + 1
        while (r < n && isPhoneMid(b(r) & 0xFF)) r += 1
        var q = r - 1
        var last = -1
        while (q >= j + 8 && last < 0) {
          if (isDigit(b(q) & 0xFF)) last = q
          q -= 1
        }
        if (last >= 0) { out.add(i, last + 1); i = last + 1 }
        else i = r // any later start inside the run has even less room
      }
    }
    out
  }

  /** Match end of an IP at start `i` (b(i) is a digit), or -1. */
  private def ipEndAt(b: Array[Byte], i: Int): Int = {
    val n = b.length
    var p = i
    var k = 0
    while (k < 3) {
      var r = p
      while (r < n && isDigit(b(r) & 0xFF)) r += 1
      val len = r - p
      if (len < 1 || len > 3 || r >= n || b(r) != '.') return -1
      p = r + 1
      k += 1
    }
    var r = p
    while (r < n && isDigit(b(r) & 0xFF) && r - p < 3) r += 1
    if (r == p) -1 else r
  }

  private def findIps(b: Array[Byte]): Spans = {
    val out = new Spans
    var i = 0
    while (i < b.length) {
      if (isDigit(b(i) & 0xFF)) {
        val e = ipEndAt(b, i)
        if (e > 0) { out.add(i, e); i = e } else i += 1
      } else i += 1
    }
    out
  }

  private def splice(b: Array[Byte], spans: Spans,
                     token: Array[Byte]): Array[Byte] = {
    var cut = 0
    var k = 0
    while (k < spans.m) { cut += spans.a(k + 1) - spans.a(k); k += 2 }
    val out = new Array[Byte](b.length - cut + spans.count * token.length)
    var src = 0
    var dst = 0
    k = 0
    while (k < spans.m) {
      val s = spans.a(k); val e = spans.a(k + 1)
      System.arraycopy(b, src, out, dst, s - src); dst += s - src
      System.arraycopy(token, 0, out, dst, token.length); dst += token.length
      src = e
      k += 2
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    out
  }

  def scrubOf(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val em = findEmails(b)
    val t1 = if (em.m == 0) b else splice(b, em, PiiScrub.EmailToken)
    val ph0 = findPhones(b)
    val ph1 = if (t1 eq b) ph0 else findPhones(t1)
    val t2 = if (ph1.m == 0) t1 else splice(t1, ph1, PiiScrub.PhoneToken)
    val ip0 = findIps(b)
    val ip2 = if (t2 eq b) ip0 else findIps(t2)
    val t3 = if (ip2.m == 0) t2 else splice(t2, ip2, PiiScrub.IpToken)
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(t3), em.count, ph0.count, ip0.count))
  }

  override def nullSafeEval(input: Any): Any =
    scrubOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("piiScrub", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scrubOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiScrub {
  private val EmailToken = "<EMAIL>".getBytes("UTF-8")
  private val PhoneToken = "<PHONE>".getBytes("UTF-8")
  private val IpToken = "<IP>".getBytes("UTF-8")
}
