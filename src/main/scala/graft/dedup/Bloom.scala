package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bloom-filter membership against a historical corpus — the sketch that
  * makes CROSS-RUN dedup affordable at 100 TB: instead of joining today's
  * batch against every key the pipeline has ever ingested (a shuffle of
  * the full history), the history compresses into m bits (~2 bytes/key at
  * the 16·n sizing) that ship to every executor once; each new document
  * then answers "maybe seen / definitely new" with k cheap hash probes
  * and NO shuffle at all. One-sided error, stated: false positives at a
  * sized-for rate (a few ‰ here — those fall through to the exact
  * [[Dedup.dedupIncremental]] path or are accepted as over-dropping),
  * false negatives never.
  *
  * Engine-portable by construction: positions derive from the SAME
  * md5-uniform primitive the Mix samplers use
  * (graft.pipeline.Mix.uniformOf / uniformSql), so DuckDB replays the
  * probe arithmetic exactly, and membership-in-bitmap ≡ membership in the
  * distinct SET of history positions — which is how the oracle checks the
  * filter bit for bit without building one.
  *
  * Scale shape: the build is per-partition bitmaps OR-folded (executor
  * and driver state = m/8 bytes, shuffle = nPartitions × m/8 — never the
  * keys). Two probe paths, same arithmetic:
  *  - [[contains]] embeds the bitmap as a plan LITERAL — fine to the
  *    2^26-bit clamp (~10⁷ history keys) where codegen'd literals stay
  *    cheap to compile;
  *  - [[containsBroadcast]] ships the SAME words as a broadcast variable
  *    probed by a native expression ([[BitsetAllSet]]) — the bitmap
  *    crosses the wire once per executor, never enters the plan text,
  *    and the ceiling moves to executor memory: 2^30 bits = 128 MB
  *    serves ~10⁸ history keys at the 16·n sizing, ~10⁹ at load 2
  *    (k=4 → ~6 % false positives — still usable as a pre-filter).
  * [[dedupBloom]] (C45) rides the broadcast path, so the production
  * probe is the oracle-gated one.
  */
object Bloom {

  private[graft] val BloomK = 4
  private[graft] val MinBloomBits = 16
  private[graft] val MaxBloomBits = 26
  /** The broadcast-probe clamp: per-executor bitmap memory = 2^b/8
    * bytes (128 MB at 30) — the build's per-task OR-fold state is the
    * same size, which is the real bound at 1000-executor scale.
    */
  private[graft] val MaxBroadcastBloomBits = 30

  /** Smallest power-of-two m with m ≥ 16·n (load kn/m ≤ 0.25 at k=4 →
    * ~0.2 % false positives), clamped to [2^min, 2^max] like
    * [[Dedup.lshBitsFor]].
    */
  private[graft] def bloomBitsFor(n: Long, minBits: Int = MinBloomBits,
                                  maxBits: Int = MaxBloomBits): Int = {
    var b = minBits
    while (b < maxBits && n > (1L << (b - 4))) b += 1
    b
  }

  /** [[bloomBitsFor]] as a SQL CASE chain over a count expression —
    * integer-for-integer the Scala sizing, so the oracle sizes the same
    * filter from its own COUNT(*).
    */
  private[graft] def bloomBitsSqlCase(cnt: String,
                                      minBits: Int = MinBloomBits,
                                      maxBits: Int = MaxBloomBits): String = {
    val whens = (minBits until maxBits)
      .map(b => s"WHEN $cnt <= ${1L << (b - 4)} THEN $b").mkString(" ")
    s"(CASE $whens ELSE $maxBits END)"
  }

  /** The k probe positions of `key` in an m-bit filter: k independent
    * md5-uniform draws scaled to [0, m). Exact under IEEE doubles (u is
    * x·2^-52 with integer x, m a power of two — the product is a pure
    * exponent shift), so Spark and DuckDB floor identically.
    */
  private[graft] def positions(key: Column, mBits: Int, k: Int,
                               salt: String): Seq[Column] =
    (0 until k).map(i =>
      floor(graft.pipeline.Mix.uniformOf(key, s"$salt:$i") * mBits)
        .cast("long"))

  /** Distributed filter build: per-partition bitmaps (one pass, local
    * bit-sets), OR-folded to the driver. No distinct, no shuffle of
    * positions — each task's state is exactly m/8 bytes.
    */
  def build(keys: DataFrame, key: Column, mBits: Int,
            k: Int = BloomK, salt: String = "bloom"): Array[Long] = {
    import keys.sparkSession.implicits._
    requireM(mBits)
    val nWords = mBits >>> 6
    val posDs = keys
      .select(explode(array(positions(key, mBits, k, salt): _*)).as("p"))
      .as[Long]
    def orInto(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    posDs.rdd
      .mapPartitions { it =>
        val words = new Array[Long](nWords)
        it.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63))
        Iterator.single(words)
      }
      .fold(new Array[Long](nWords))(orInto)
  }

  /** Membership probe as pure Column arithmetic against the plan-literal
    * bitmap: k word-lookups + dynamic shifts, AND-folded. Codegen'd end
    * to end — no UDF, no shuffle.
    */
  def contains(words: Array[Long], key: Column, mBits: Int,
               k: Int = BloomK, salt: String = "bloom"): Column = {
    requireM(mBits)
    require(words.length == (mBits >>> 6),
      s"bitmap has ${words.length} words, expected ${mBits >>> 6}")
    val w = typedLit(words.toSeq)
    val hit = positions(key, mBits, k, salt).map { p =>
      val word = element_at(w, shiftrightunsigned(p, 6).cast("int") + 1)
      call_function("shiftrightunsigned", word,
        p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    // a null key hashes to null probes; report "not seen", never null —
    // matching the oracle's join replay (0 matches ≠ k) and keeping both
    // filter(maybe) and filter(!maybe) total
    coalesce(hit, lit(false))
  }

  /** [[contains]] with the bitmap as a BROADCAST VARIABLE instead of a
    * plan literal — the probe path past the literal clamp: positions stay
    * the identical codegen'd md5-uniform Columns (so the DuckDB oracle
    * replays unchanged), and the word lookups happen inside
    * [[BitsetAllSet]], a native expression that resolves the broadcast
    * once per task. Null keys read "not seen", matching [[contains]].
    */
  def containsBroadcast(words: Array[Long], key: Column, mBits: Int,
                        k: Int = BloomK, salt: String = "bloom")
                       (implicit spark: SparkSession): Column = {
    require(mBits >= 64 && Integer.bitCount(mBits) == 1 &&
      mBits <= (1 << MaxBroadcastBloomBits),
      s"mBits must be a power of two in [64, 2^$MaxBroadcastBloomBits], got $mBits")
    require(words.length == (mBits >>> 6),
      s"bitmap has ${words.length} words, expected ${mBits >>> 6}")
    val bc = spark.sparkContext.broadcast(words)
    org.apache.spark.sql.GraftColumnBridge.column(BitsetAllSet(
      org.apache.spark.sql.GraftColumnBridge.expression(
        array(positions(key, mBits, k, salt): _*)), bc))
  }

  /** positions()' exactness argument (power-of-two scaling) and the
    * word indexing both require m = 2^b with at least one word.
    */
  private def requireM(mBits: Int): Unit =
    require(mBits >= 64 && Integer.bitCount(mBits) == 1,
      s"mBits must be a power of two >= 64, got $mBits")

  /** C45: cross-run membership dedup — history (even doc ids) compressed
    * into a count-sized Bloom filter, the new batch (odd ids) probed
    * against it with zero shuffle. `maybe_seen` is the filter's verdict;
    * `seen_exact` (one broadcast-side join on the text, present here to
    * keep the false-positive accounting honest and oracle-checked) is
    * what the sketch approximates. The oracle replays sizing, probes, and
    * set-membership in DuckDB — false positives and all.
    */
  def dedupBloom(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    val docs = Tables.documents(s, dir)
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    // sized under the BROADCAST clamp (the production path since r12 —
    // the plan-literal clamp only governs [[contains]] callers)
    val mBits = 1 << bloomBitsFor(hist.count(),
      maxBits = MaxBroadcastBloomBits)
    val words = build(hist, col("text"), mBits)
    val histTexts = hist.select("text").distinct()
      .withColumn("__seen", lit(1))
    batch
      .join(broadcast(histTexts), Seq("text"), "left")
      .select(col("doc_id"),
        containsBroadcast(words, col("text"), mBits).as("maybe_seen"),
        col("__seen").isNotNull.as("seen_exact"))
  }

  val dedupBloomOracle: String = {
    import graft.pipeline.Mix.uniformSql
    val bits = bloomBitsSqlCase("(SELECT COUNT(*) FROM hist)",
      maxBits = MaxBroadcastBloomBits)
    def posSelects(src: String, cols: String): String =
      (0 until BloomK).map { i =>
        val u = uniformSql("text", s"bloom:$i")
        s"SELECT $cols, $i AS i, CAST(floor($u * (SELECT m FROM mm)) AS BIGINT) AS pos FROM $src"
      }.mkString(" UNION ALL ")
    s"""WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
       |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
       |mm AS (SELECT CAST(1 AS BIGINT) << $bits AS m),
       |hp AS (SELECT DISTINCT pos FROM (${posSelects("hist", "doc_id")}) t),
       |bp AS (${posSelects("batch", "doc_id")}),
       |hits AS (
       |  SELECT bp.doc_id, COUNT(hp.pos) AS nhit
       |  FROM bp LEFT JOIN hp USING (pos)
       |  GROUP BY bp.doc_id)
       |SELECT b.doc_id, h.nhit = $BloomK AS maybe_seen,
       |  EXISTS (SELECT 1 FROM hist WHERE hist.text = b.text) AS seen_exact
       |FROM batch b JOIN hits h USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}

/** Native expression behind [[Bloom.containsBroadcast]]: true iff EVERY
  * position in the child long-array is a set bit of the broadcast
  * bitmap. The words array resolves from the broadcast once per task (a
  * reference-object call inside the whole-stage span — the BpeTokenCount
  * pattern), so the bitmap never appears in the plan text and compiles
  * in O(1) regardless of filter size. A null array or null element (a
  * null key's probes) reads "not seen" (false), matching the literal
  * path's `coalesce(hit, false)`.
  */
case class BitsetAllSet(child: org.apache.spark.sql.catalyst.expressions.Expression,
                        bits: org.apache.spark.broadcast.Broadcast[Array[Long]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false

  def allSet(arr: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val words = bits.value
    val m = words.length.toLong << 6
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return false
      val p = arr.getLong(i)
      if (p < 0 || p >= m) return false
      if ((words((p >>> 6).toInt) >>> (p & 63) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) false
    else allSet(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitset", this)
    val c = child.genCode(ctx)
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
             |${c.code}
             |boolean ${ev.value} = false;
             |if (!${c.isNull}) {
             |  ${ev.value} = $ref.allSet(${c.value});
             |}
             |""".stripMargin)).code(),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BitsetAllSet =
    copy(child = newChild)
}
