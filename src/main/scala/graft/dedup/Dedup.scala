package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 C1–C5 — the dedup family for training-data curation.
  *
  * Scale shape (the whole point): every sketch (md5 / minhash signature /
  * simhash / winnowed shingles) is computed per-row inside the scan stage
  * (codegen'd built-ins, no UDFs), so the only shuffles are groupBys on
  * sketch keys. LSH banding turns the O(n²) candidate problem into
  * groupBy(band_key): shuffle volume ∝ data, pairs generated only inside
  * buckets. That is the formulation that survives 100 TB.
  */
object Dedup {

  // --------------------------------------------------------------- common
  /** Word 3-shingles (distinct). Docs shorter than 3 tokens fall back to
    * the whole text as one shingle.
    */
  private def shingles3(text: Column): Column = {
    val t = split(text, " ")
    array_distinct(
      when(size(t) >= 3, expr(
        "transform(sequence(1, size(split(text, ' ')) - 2), " +
          "i -> concat_ws(' ', split(text, ' ')[i-1], split(text, ' ')[i], split(text, ' ')[i+1]))"))
        .otherwise(array(text)))
  }

  /** One 64-bit base hash per shingle; the k minhash permutations then
    * re-hash that single 8-byte value (`xxhash64(h, i)`) — k× fewer
    * *string* hashes than hashing each shingle k times, and overflow-free
    * under ANSI mode (a multiplicative mix would trap on wraparound).
    */
  private def baseHashes(sh: Column): Column = transform(sh, x => xxhash64(x))

  /** MinHash signature: sig(i) = min over shingles of xxhash64(h, i). */
  def minhashSignature(hs: Column, k: Int): Column =
    array((0 until k).map { i =>
      aggregate(hs, lit(Long.MaxValue),
        (acc, h) => least(acc, xxhash64(h, lit(i))))
    }: _*)

  // --------------------------------------------------------------- C1
  /** Exact dedup: content-hash groupBy, keep lowest doc_id. One shuffle on
    * the 128-bit hash; at 100 TB this is the cheapest possible dedup and
    * the hash shuffle is uniformly distributed by construction.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("content_hash").orderBy("doc_id")
    Tables.documents(s, dir)
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("doc_id", "content_hash", "n_chars")
      .orderBy("doc_id")
  }

  val dedupExactOracle: String =
    """SELECT doc_id, content_hash, n_chars FROM (
      |  SELECT doc_id, md5(text) AS content_hash, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- C2
  /** MinHash + LSH: k=64 permutations, 16 bands × 4 rows. A doc's cluster
    * id is the smallest doc_id it shares any band bucket with (single-hop
    * union — the standard one-pass approximation; iterate to a fixpoint
    * for full connected components).
    */
  def dedupMinhash(s: SparkSession, dir: String,
                   k: Int = 64, bands: Int = 16): DataFrame = {
    val rows = k / bands
    val sig = Tables.documents(s, dir)
      .withColumn("__hs", baseHashes(shingles3(col("text"))))
      .withColumn("sig", minhashSignature(col("__hs"), k))
      .select("doc_id", "sig")
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((col("sig")(b * rows) +: (1 until rows)
            .map(r => col("sig")(b * rows + r))) :+ lit(b): _*).as("bhash"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bhash"))
    val wBucket = Window.partitionBy("band", "bhash")
    banded
      .withColumn("bucket_min", min("doc_id").over(wBucket))
      .groupBy("doc_id")
      .agg(min("bucket_min").as("cluster_id"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- C3
  /** 64-bit SimHash: explode tokens, one groupBy(doc) with 64 partial-agg
    * sums (±1 per bit), recombine to the fingerprint. Map-side combine
    * keeps the shuffle at one row per (doc × 64 longs). `bucket` is the
    * top-16-bit prefix — the blocking key for hamming-distance search.
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"__b$j")
    }
    val sim = (0 until 64).map { j =>
      shiftleft(when(col(s"__b$j") > 0, 1L).otherwise(0L), j)
    }.reduce(_ + _)
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", sim)
      .select(col("doc_id"), col("simhash"),
        shiftrightunsigned(col("simhash"), 48).as("bucket"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- C4
  /** N-gram Jaccard over candidate pairs from a shingle inverted index:
    * explode distinct shingles, drop shingles with document frequency >
    * maxDf (ubiquitous shingles generate quadratic candidates and carry no
    * signal — the standard prefix-filter trick), pair within posting
    * lists, then exact Jaccard on the full shingle sets. Shuffle is
    * bounded by Σ df² over rare shingles, not n².
    */
  def dedupNgramJaccard(s: SparkSession, dir: String,
                        maxDf: Int = 10, minJaccard: Double = 0.03): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
    val posting = docs
      .select(col("doc_id"), explode(col("sh")).as("sg"))
    val rare = posting
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sg")))
      .filter(col("df") <= maxDf)
    val pairs = rare.as("a")
      .join(rare.as("b"),
        col("a.sg") === col("b.sg") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    withSets
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // --------------------------------------------------------------- C5
  /** Embedding-cosine near-dup: block vectors by a random-hyperplane LSH
    * bucket, take each vector's best cosine neighbor within its bucket,
    * flag pairs above threshold. Bucket bits trade recall vs cost:
    * candidates ∝ n²/2^bits; at 100 TB raise bits so buckets stay
    * ~10³–10⁴ rows (and multi-probe for recall). Vectors here are unit
    * norm, so cosine = dot.
    */
  def dedupEmbedding(s: SparkSession, dir: String,
                     bits: Int = 4, threshold: Double = 0.95): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", graft.ann.Ann.hyperplaneBucket(col("embedding"), bits))
    val a = e.select(col("vec_id"), col("embedding"), col("bucket"))
    val b = e.select(col("vec_id").as("nn_id"),
      col("embedding").as("nn_emb"), col("bucket"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine").desc, col("nn_id"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cosine", graft.ann.Ann.dot(col("embedding"), col("nn_emb")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("nn_id"), col("cosine"),
        (col("cosine") >= threshold).as("is_dup"))
      .orderBy("vec_id")
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> ((s: SparkSession, d: String) => dedupExact(s, d)),
    "dedup_minhash"       -> ((s: SparkSession, d: String) => dedupMinhash(s, d)),
    "dedup_simhash"       -> ((s: SparkSession, d: String) => dedupSimhash(s, d)),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => dedupNgramJaccard(s, d)),
    "dedup_embedding"     -> ((s: SparkSession, d: String) => dedupEmbedding(s, d)))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactOracle)
}
