package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable hashing for sketches that need an exact DuckDB oracle.
  *
  * The FNV/splitmix hashes in [[Sketch]] are JVM-local — fine for an
  * engine-internal sketch, unverifiable by an independent engine. Every
  * hash here derives from MD5, the one digest both Spark and DuckDB
  * compute identically, so a sketch pipeline built on it (minhash
  * signatures, winnowing fingerprints) can be re-expressed in the oracle's
  * SQL and hash-compared end to end. [[sqlInt64]] emits the matching
  * DuckDB arithmetic so both sides are generated from one definition.
  */
object PortableHash {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  // Reused per-thread digest output: these hashes run once per SHINGLE in
  // scan-stage loops (millions per task), where a fresh 16-byte array +
  // ByteBuffer per call is pure GC churn. digest(buf, 0, 16) writes in
  // place and resets the digest; callers read the buffer before the next
  // digest call on the same thread.
  private val bufLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))

  private def digestInto(bytes: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val md = mdLocal.get()
    md.reset()
    md.update(bytes, from, until - from)
    val out = bufLocal.get()
    md.digest(out, 0, 16)
    out
  }

  /** Big-endian signed long from 8 digest bytes at `o`. */
  private def longAt(d: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(o + i) & 0xFFL); i += 1 }
    v
  }

  /** First 8 md5-digest bytes of `bytes[from, until)`, big-endian, as a
    * signed long — exactly the value [[sqlInt64]] reconstructs from
    * DuckDB's md5 hex string.
    */
  def md5Long(bytes: Array[Byte], from: Int, until: Int): Long =
    longAt(digestInto(bytes, from, until), 0)

  /** Kirsch–Mitzenmacher double-hashing family over the two 64-bit halves
    * (a, b) of md5(s): perm_i = a + i·b (mod 2^64). Wrapping long
    * arithmetic here; the oracle reproduces the same mod-2^64 value with
    * 32-bit-word arithmetic that never overflows a BIGINT (verified
    * bit-identical). One digest per input serves all k permutations.
    */
  def md5Perms(s: UTF8String, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val d = digestInto(bytes, 0, bytes.length)
    val a = longAt(d, 0)
    val b = longAt(d, 8)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = a + i * b; i += 1 }
    out
  }

  /** Column API: the k md5-KM permutation hashes of a string column. */
  def md5_minhash_perms(text: Column, k: Int): Column =
    GraftColumnBridge.column(Md5MinhashPerms(GraftColumnBridge.expression(text), k))

  /** Complete k-permutation minhash signature of a document in ONE
    * compiled pass: tokenize on single spaces, slide word n-shingles
    * (whole text when fewer than n tokens — including the empty string
    * for empty text), digest each shingle's bytes once, fold the k
    * Kirsch–Mitzenmacher values into running minima. Exactly
    * min-over-shingles of [[md5Perms]] — the fused form never
    * materializes shingle strings OR the (shingle × k) permutation
    * matrix, so signature computation is pure scan-stage work with no
    * explode and no aggregation.
    */
  def md5MinhashSig(s: UTF8String, n: Int, k: Int): Array[Long] = {
    val bytes = s.getBytes
    val (starts, nTok) = Sketch.tokenStarts(bytes)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val md = mdLocal.get()
    val buf = bufLocal.get()
    def fold(from: Int, until: Int): Unit = {
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(buf, 0, 16)
      val a = longAt(buf, 0)
      val b = longAt(buf, 8)
      var j = 0
      while (j < k) {
        val v = a + j * b
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    if (nTok < n) fold(0, bytes.length)
    else {
      var g = 0
      while (g <= nTok - n) {
        val until = if (g + n < nTok) starts(g + n) - 1 else bytes.length
        fold(starts(g), until)
        g += 1
      }
    }
    sig
  }

  /** Column API: the full per-row minhash signature. */
  def md5_minhash_sig(text: Column, n: Int, k: Int): Column =
    GraftColumnBridge.column(Md5MinhashSig(GraftColumnBridge.expression(text), n, k))

  /** 64-bit SimHash of a document in ONE compiled pass: tokenize on
    * single spaces (empty tokens included — `split` parity), token hash =
    * first 8 md5-digest bytes (the engine-portable hash), per-bit ±1
    * sums, positive sums set bits. Exactly the explode + 64-bit-sum
    * aggregate formulation, without the explode or the aggregate.
    */
  def md5Simhash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val (starts, nTok) = Sketch.tokenStarts(bytes)
    val counts = new Array[Int](64)
    var t = 0
    while (t < nTok) {
      val until = if (t + 1 < nTok) starts(t + 1) - 1 else bytes.length
      val h = md5Long(bytes, starts(t), until)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sim |= 1L << j
      j += 1
    }
    sim
  }

  /** Column API: the per-row 64-bit simhash. */
  def md5_simhash(text: Column): Column =
    GraftColumnBridge.column(Md5Simhash(GraftColumnBridge.expression(text)))

  /** Portable-HLL register code of a value's string form: one md5 digest,
    * then pure bit arithmetic — `(bucket << 6) | rho` with bucket = the
    * top 12 bits of the digest (md5 hex chars 1-3) and rho = leading-zero
    * BITS of the next 52 (hex chars 4-16) + 1, clamped at 50.
    *
    * Bit-identical to the r18 SQL formulation it replaces
    * (md5 → hex substring → TRIM-LEADING-zero → CASE over the first
    * nonzero nibble, see LakehouseOps.hllRhoSql): each leading '0' hex
    * char is 4 zero bits and the first nonzero char contributes 3/2/1/0
    * more for '1'/'2'-'3'/'4'-'7'/'8'-'f' — exactly
    * `numberOfLeadingZeros` of the 52-bit tail. The all-zero tail maps to
    * 52 + 1 → clamp 50, like the SQL's z = 13 branch. The DuckDB oracle
    * keeps computing the hex-string form; both sides land in the same
    * register with the same rho by construction (HllKernelSpec sweeps the
    * equivalence). Replacing the five-step string pipeline with one
    * digest + bit ops cut the register pass of dba_table_stats_approx
    * from ~58 to ~6 CPU-seconds at sf0.1 (r20 measurement).
    */
  def hllCode(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = digestInto(bytes, 0, bytes.length)
    val a = longAt(d, 0)
    val bkt = ((a >>> 52) & 0xFFFL).toInt
    val tail = a & ((1L << 52) - 1)
    val zbits =
      if (tail == 0L) 52 else java.lang.Long.numberOfLeadingZeros(tail) - 12
    val rho = math.min(zbits + 1, 50)
    (bkt << 6) | rho
  }

  /** Column API: the packed HLL (bucket, rho) register code. */
  def md5_hll_code(v: Column): Column =
    GraftColumnBridge.column(Md5HllCode(GraftColumnBridge.expression(v)))

  // ------------------------------------------------- DuckDB-side generator

  /** DuckDB SQL reconstructing the signed 64-bit value of 16 hex digits of
    * `hexVar` starting at 1-based `at`: two 32-bit words combined in two's
    * complement — every intermediate stays inside BIGINT range.
    */
  def sqlInt64(hexVar: String, at: Int = 1): String = {
    val hi = s"('0x' || substr($hexVar, $at, 8))::BIGINT"
    val lo = s"('0x' || substr($hexVar, ${at + 8}, 8))::BIGINT"
    s"(CASE WHEN $hi >= 2147483648 THEN ($hi - 4294967296)*4294967296 + $lo" +
      s" ELSE $hi*4294967296 + $lo END)"
  }
}

/** `array<long>` of length k: the fused minhash signature (min over word
  * n-shingles of the md5-KM permutation values) — see
  * [[PortableHash.md5MinhashSig]].
  */
case class Md5MinhashSig(child: Expression, n: Int, k: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_minhash_sig", child.dataType,
      "n" -> n, "k" -> k)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      PortableHash.md5MinhashSig(input.asInstanceOf[UTF8String], n, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.PortableHash.md5MinhashSig($c, $n, $k));")
  override protected def withNewChildInternal(newChild: Expression): Md5MinhashSig =
    copy(child = newChild)
}

/** 64-bit per-row simhash — see [[PortableHash.md5Simhash]]. */
case class Md5Simhash(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_simhash", child.dataType)
  override def nullSafeEval(input: Any): Any =
    PortableHash.md5Simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableHash.md5Simhash($c);")
  override protected def withNewChildInternal(newChild: Expression): Md5Simhash =
    copy(child = newChild)
}

/** `array<long>` of the k Kirsch–Mitzenmacher md5 permutation hashes of a
  * string — the portable per-shingle primitive (one digest, k derived
  * values, engine-reproducible).
  */
case class Md5MinhashPerms(child: Expression, k: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_minhash_perms", child.dataType, "k" -> k)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(PortableHash.md5Perms(input.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new ${classOf[GenericArrayData].getName}(" +
        s"graft.functions.PortableHash.md5Perms($c, $k));")
  override protected def withNewChildInternal(newChild: Expression): Md5MinhashPerms =
    copy(child = newChild)
}

/** INT `(bucket << 6) | rho` HLL register code of a value's string form —
  * see [[PortableHash.hllCode]]. Null-safe: a null value carries no
  * register (callers park null rows in an out-of-range sentinel bucket).
  */
case class Md5HllCode(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    SketchTypeCheck.check("graft_hll_code", child.dataType)
  override def nullSafeEval(input: Any): Any =
    PortableHash.hllCode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PortableHash.hllCode($c);")
  override protected def withNewChildInternal(newChild: Expression): Md5HllCode =
    copy(child = newChild)
}
