package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data mixing for training-corpus assembly: stratified sampling by
  * source weight, and concat-and-chunk sequence packing — the two
  * pure-plumbing steps between a curated corpus and a training run.
  *
  * Both are scan-shaped: sampling is a per-row filter on a deterministic
  * hash (no shuffle at all); packing is one window shuffle on the
  * concatenation key. Nothing here collects, and nothing depends on
  * partition count or execution order — rerunning on 1000 executors
  * yields byte-identical output, which is what makes a 100 TB corpus
  * rebuild reproducible.
  */
object Mix {

  // ------------------------------------------------------------- sampling
  /** Deterministic per-row uniform in [0, 1): the top 52 bits of
    * md5("salt:doc_id") over 2^52. Engine-portable (the oracle
    * reconstructs the same 13 hex nibbles) and exactly representable in a
    * double, so keep decisions are bit-stable across engines and reruns —
    * no RNG, no seed plumbing, no sampling drift between pipeline runs.
    */
  def uniformOf(docId: Column, salt: String): Column =
    shiftrightunsigned(
      element_at(graft.functions.PortableHash.md5_minhash_perms(
        concat(lit(salt + ":"), docId.cast("string")), 1), 1), 12)
      .cast("double") / lit(4503599627370496.0) // 2^52

  /** Matching DuckDB arithmetic for [[uniformOf]]. Quotes in the salt are
    * SQL-escaped so an arbitrary salt can't break (or inject into) the
    * generated oracle while the Spark side sails on unescaped.
    */
  def uniformSql(docIdExpr: String, salt: String): String = {
    val esc = salt.replace("'", "''")
    s"(('0x' || substr(md5('$esc:' || $docIdExpr), 1, 13))::BIGINT" +
      " / 4503599627370496.0)"
  }

  /** Stratified corpus sampling: keep each document with its source's
    * target rate. `rates` maps source → keep probability (missing sources
    * use `defaultRate`). The keep decision is [[uniformOf]] < rate — a
    * per-row projection+filter with NO shuffle: at 100 TB this is a
    * scan-stage gate that composes under whatever else the pipeline does.
    */
  def corpusMix(docs: DataFrame, rates: Map[String, Double],
                defaultRate: Double = 1.0,
                salt: String = "mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    docs
      .withColumn("u", uniformOf(col("doc_id"), salt))
      .withColumn("rate", rate)
      .filter(col("u") < col("rate"))
  }

  /** Demo mixture shared by the C20 and C24 queries: src0..src19 →
    * 0.25/0.5/0.75/1.0 by source id mod 4 — self-contained on the test
    * corpus; real callers pass measured weights to [[corpusMix]].
    */
  val demoRates: Map[String, Double] =
    (0 until 20).map(n => s"src$n" -> (0.25 + 0.75 * (n % 4) / 3.0)).toMap

  /** The matching DuckDB arithmetic over a `source` column. */
  val demoRateSql: String =
    "0.25 + 0.75 * (CAST(substr(source, 4) AS BIGINT) % 4) / 3.0"

  /** C20 query. */
  def corpusMixQuery(s: SparkSession, dir: String): DataFrame =
    corpusMix(Tables.documents(s, dir), demoRates)
      .select("doc_id", "source", "u", "rate")

  val corpusMixOracle: String = {
    val u = uniformSql("doc_id", "mix")
    s"""SELECT doc_id, source, $u AS u, $demoRateSql AS rate
       |FROM documents
       |WHERE $u < $demoRateSql
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------- packing
  /** Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    * documents of one `streamCol` group are concatenated in `orderCol`
    * order and chunked into fixed `capacity`-token training sequences;
    * each document reports the sequence its first token lands in and its
    * offset there. Pure window arithmetic — a running token sum per
    * stream, then integer div/mod — so the packing is deterministic and
    * the only data movement is the window's hash shuffle on the stream
    * key. At 100 TB you shard each source into many streams (e.g.
    * hash(doc_id) % nShards) so no single window serializes a whole
    * source; the per-stream running sum is the one inherent sequential
    * dependency of concat packing.
    *
    * `orderCol` must TOTALLY order each stream (tie-break a non-unique
    * key yourself, e.g. `struct(ts, doc_id)`): the frame is ROWS-based so
    * ties don't collapse into one running-sum value, but tied rows would
    * still pack in a run-dependent order, losing reproducibility.
    */
  def seqPack(docs: DataFrame, capacity: Int,
              tokens: Column, streamCol: Column,
              orderCol: Column): DataFrame = {
    // explicit ROWS frame: the default RANGE frame would give orderCol
    // ties the same cumulative sum → overlapping sequence offsets
    val w = Window.partitionBy(streamCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__start",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      // integer `div`, not floor(double /): past 2^53 cumulative tokens a
      // double quotient loses ulps and seq boundaries would drift from the
      // oracle's exact integer semantics — this column exists for corpora
      // where 2^53 tokens per stream is not hypothetical
      .withColumn("seq_id", expr(s"__start div $capacity"))
      .withColumn("offset_in_seq", col("__start") % capacity)
      .drop("__start")
  }

  /** The training-sequence capacity the registered queries AND their
    * oracles share — the oracles hardcode this value, so a non-default
    * `capacity` argument must not be compared against them.
    */
  val PackCapacity: Int = 512

  /** Shared packing SQL tail: chunk a (doc_id, source, n_tokens) relation
    * `from` into [[PackCapacity]]-token sequences — the one rendering of
    * the div/mod arithmetic, used by both packing oracles.
    */
  private[graft] def packSql(from: String,
                             orderSql: String = "doc_id"): String =
    s"""SELECT doc_id, source, n_tokens,
       |  CAST((cum - n_tokens) // $PackCapacity AS BIGINT) AS seq_id,
       |  CAST((cum - n_tokens) % $PackCapacity AS BIGINT) AS offset_in_seq
       |FROM (
       |  SELECT doc_id, source, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY $orderSql
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM $from) packed
       |ORDER BY doc_id""".stripMargin

  /** C21 query: whitespace token counts, one stream per source. */
  def seqPackQuery(s: SparkSession, dir: String,
                   capacity: Int = PackCapacity): DataFrame =
    seqPack(Tables.documents(s, dir), capacity,
      tokens = size(split(col("text"), " ")),
      streamCol = col("source"), orderCol = col("doc_id"))
      .select("doc_id", "source", "n_tokens", "seq_id", "offset_in_seq")

  val seqPackOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |""".stripMargin + packSql("toks")

  /** C21b — packing for HOT streams. [[seqPack]]'s window serializes each
    * stream into one task (AQE cannot split a window partition); a source
    * holding 10% of a 100 TB corpus stalls the stage. This variant splits
    * every stream into `nShards` deterministic sub-streams — shard =
    * ⌊uniform(idCol) · nShards⌋, the same engine-portable md5 uniform the
    * mixer uses — and packs each (stream, shard) independently. Packing
    * invariants (contiguous offsets, capacity chunking) hold per
    * sub-stream; sequences are identified by (stream, shard, seq_id).
    * This IS the scaladoc'd 100 TB posture of [[seqPack]] ("shard each
    * source into many streams"), as an operator instead of advice.
    *
    * `nShards` must be a power of two: uniform is k/2^52 with k integer,
    * so the product is exact in a double and the shard split is bit-stable
    * across engines (the oracle reproduces it in SQL).
    */
  def seqPackSharded(docs: DataFrame, capacity: Int, tokens: Column,
                     streamCol: Column, orderCol: Column, idCol: Column,
                     nShards: Int = 8): DataFrame = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two for an exact double split, got $nShards")
    val sharded = docs.withColumn("shard",
      floor(uniformOf(idCol, "shard") * nShards).cast("bigint"))
    seqPack(sharded, capacity, tokens,
      struct(streamCol, col("shard")), orderCol)
  }

  /** C21b query: same corpus as seq_pack, 8 shards per source. */
  def seqPackShardedQuery(s: SparkSession, dir: String,
                          capacity: Int = PackCapacity): DataFrame =
    seqPackSharded(Tables.documents(s, dir), capacity,
      tokens = size(split(col("text"), " ")),
      streamCol = col("source"), orderCol = col("doc_id"),
      idCol = col("doc_id"), nShards = 8)
      .select("doc_id", "source", "shard", "n_tokens", "seq_id", "offset_in_seq")

  val seqPackShardedOracle: String = {
    val u = uniformSql("doc_id", "shard")
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(floor($u * 8) AS BIGINT) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, source, shard, n_tokens,
       |  CAST((cum - n_tokens) // $PackCapacity AS BIGINT) AS seq_id,
       |  CAST((cum - n_tokens) % $PackCapacity AS BIGINT) AS offset_in_seq
       |FROM (
       |  SELECT doc_id, source, shard, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM toks) packed
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- exact-count stratification
  /** C27 — exact-count stratified sampling: exactly min(quota, |stratum|)
    * documents per stratum, chosen by the engine-portable md5 uniform (so
    * the sample is deterministic across reruns and engines — rerunning a
    * 100 TB eval-holdout draw yields the identical set). [[corpusMix]] is
    * the RATE-based sampler (binomial counts); this is its exact-count
    * complement for quotas ("200k eval docs per source", k-shot probe
    * sets). One window shuffle on the stratum key.
    *
    * Hot-stratum path: a stratum holding 10% of the corpus serializes its
    * rank scan into one task (a window partition is one task — the shape
    * AQE cannot split). With `preGateMargin = Some(m)`, rows only enter
    * the window when `u < m` — the uniform IS the rank key, so when a
    * stratum has ≥ quota survivors under the gate, the quota winners are
    * all survivors and the gated rank is EXACTLY the full rank. Strata
    * with < quota survivors (small strata, or an under-sized margin)
    * fall back to ranking in full, so the output is identical for ANY
    * margin — the margin only tunes how much the hot stratum's window
    * partition shrinks (expected m × |stratum|). Cost: one extra
    * scan-stage survivor count (map-side-combined, shuffles n_strata
    * rows) + a broadcast of the well-supplied stratum keys.
    */
  def corpusStratified(docs: DataFrame, strata: Column, quota: Int,
                       idCol: Column, salt: String = "strat",
                       preGateMargin: Option[Double] = None): DataFrame = {
    val withU = docs.withColumn("__u", uniformOf(idCol, salt))
    val input = preGateMargin match {
      case Some(m) =>
        require(m > 0 && m <= 1, s"preGateMargin must be in (0, 1], got $m")
        val supplied = withU.filter(col("__u") < m)
          .groupBy(strata.as("__s")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") >= quota)
          .select("__s")
        withU.join(broadcast(supplied), strata === col("__s"), "left")
          .filter(col("__s").isNull || col("__u") < m)
          .drop("__s")
      case None => withU
    }
    val w = Window.partitionBy(strata).orderBy(col("__u"), idCol)
    input
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quota)
      .drop("__u")
  }

  /** C27 query: 10 docs per source. */
  def corpusStratifiedQuery(s: SparkSession, dir: String): DataFrame =
    corpusStratified(Tables.documents(s, dir), col("source"), 10, col("doc_id"))
      .select("doc_id", "source", "rn")

  /** C27b query: the same draw through the hot-stratum pre-gate (margin
    * 0.5 — some strata gate, undersupplied ones fall back). Same oracle
    * as C27: the gate is output-invariant by construction.
    */
  def corpusStratifiedGatedQuery(s: SparkSession, dir: String): DataFrame =
    corpusStratified(Tables.documents(s, dir), col("source"), 10, col("doc_id"),
        preGateMargin = Some(0.5))
      .select("doc_id", "source", "rn")

  val corpusStratifiedOracle: String = {
    val u = uniformSql("doc_id", "strat")
    s"""SELECT doc_id, source, rn FROM (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY $u, doc_id) AS rn
       |  FROM documents) t
       |WHERE rn <= 10 ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ shuffling
  /** C31 — deterministic corpus shuffle: the training-order randomization
    * every corpus build runs between curation and packing (neighboring
    * source documents must not land in neighboring training sequences).
    * Two-level so no global sort exists: shard = ⌊u_shard · nShards⌋
    * distributes docs across output shards; pos = md5-uniform rank within
    * the shard. Reading shards in (shard, pos) order IS the shuffled
    * corpus; both levels derive from the doc id, so the order is
    * bit-stable across engines, reruns, and partitionings — a 100 TB
    * shuffle that reproduces exactly. One window shuffle on the shard key
    * (nShards is the parallelism dial; hot shards cannot exist — the
    * uniform splits uniformly regardless of data skew, unlike key-derived
    * stream shards).
    *
    * `nShards` must be a power of two (exact double split — same
    * contract as [[seqPackSharded]]).
    */
  def corpusShuffle(docs: DataFrame, idCol: Column,
                    nShards: Int = 8, salt: String = "shuffle"): DataFrame = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two for an exact double split, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__u"), idCol)
    docs
      .withColumn("shard",
        floor(uniformOf(idCol, salt + ":shard") * nShards).cast("bigint"))
      .withColumn("__u", uniformOf(idCol, salt + ":pos"))
      .withColumn("pos", row_number().over(w).cast("bigint") - 1)
      .drop("__u")
  }

  /** C31 query: 8-shard shuffle of the documents table. */
  def corpusShuffleQuery(s: SparkSession, dir: String): DataFrame =
    corpusShuffle(Tables.documents(s, dir), col("doc_id"))
      .select("doc_id", "source", "shard", "pos")

  val corpusShuffleOracle: String = {
    val uShard = uniformSql("doc_id", "shuffle:shard")
    val uPos = uniformSql("doc_id", "shuffle:pos")
    s"""SELECT doc_id, source, shard,
       |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY $uPos, doc_id) - 1
       |    AS pos
       |FROM (SELECT doc_id, source,
       |        CAST(floor($uShard * 8) AS BIGINT) AS shard
       |      FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------- chunking
  /** C28 — overlapping token-window chunking, the SPLIT counterpart to
    * [[seqPack]]'s concat: each document yields chunks of `chunkTokens`
    * whitespace tokens starting every `stride` tokens (stride < chunk ⇒
    * overlap, the RAG-embedding layout; stride = chunk ⇒ disjoint splits
    * for context-length capping). Start positions run 0, stride, … up to
    * the FIRST start whose chunk reaches the document's end, so every
    * token lands in ≥1 chunk, the tail chunk is short rather than
    * dropped, and no chunk is wholly contained in its predecessor (when
    * stride < chunk a naive "every stride up to the last token" emits
    * tail starts that add zero new tokens — pure duplicate content in a
    * RAG index). Pure per-row array arithmetic (`sequence` → explode →
    * `slice`): zero shuffle, scan-shaped, output bytes ∝ input ×
    * (chunk/stride) overlap factor.
    */
  def docChunk(docs: DataFrame, textCol: Column,
               chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens and stride must be positive, got $chunkTokens/$stride")
    docs
      .withColumn("__t", split(textCol, " "))
      .withColumn("n_tokens", size(col("__t")))
      // last start = smallest stride multiple whose chunk reaches the end:
      // bound = min(n-1, max(n-chunk, 0) + stride-1). The min-with-(n-1)
      // keeps stride > chunk (gapped sampling) at one-chunk-per-stride;
      // the max-with-0 keeps short docs (n ≤ chunk) at a single chunk.
      .withColumn("start_tok",
        explode(sequence(lit(0),
          least(col("n_tokens") - 1,
            greatest(col("n_tokens") - chunkTokens, lit(0)) + (stride - 1)),
          lit(stride))))
      .withColumn("chunk_id", expr(s"CAST(start_tok div $stride AS BIGINT)"))
      .withColumn("chunk_tokens",
        least(lit(chunkTokens), col("n_tokens") - col("start_tok")).cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("__t"), col("start_tok") + 1, lit(chunkTokens)), " "))
      .withColumn("start_tok", col("start_tok").cast("long"))
      .drop("__t")
  }

  /** The (chunk, stride) the C28 query and its oracle share. */
  val ChunkTokens: Int = 32
  val ChunkStride: Int = 24

  /** C28 query: 32-token chunks every 24 tokens (25% overlap). */
  def docChunkQuery(s: SparkSession, dir: String): DataFrame =
    docChunk(Tables.documents(s, dir), col("text"), ChunkTokens, ChunkStride)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_tokens",
        "chunk_text")

  val docChunkOracle: String =
    s"""SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_id,
       |  CAST(s AS BIGINT) AS start_tok,
       |  CAST(n AS INT) AS n_tokens,
       |  CAST(least($ChunkTokens, n - s) AS BIGINT) AS chunk_tokens,
       |  array_to_string(t[CAST(s + 1 AS INT) : CAST(s + $ChunkTokens AS INT)], ' ')
       |    AS chunk_text
       |FROM (SELECT doc_id, string_split(text, ' ') AS t,
       |        len(string_split(text, ' ')) AS n,
       |        unnest(range(0, least(len(string_split(text, ' ')) - 1,
       |          greatest(len(string_split(text, ' ')) - $ChunkTokens, 0)
       |            + ${ChunkStride - 1}) + 1, $ChunkStride)) AS s
       |      FROM documents) d
       |ORDER BY doc_id, chunk_id""".stripMargin

  // --------------------------------------------------------- composition
  /** C24 — the whole corpus build in one query: curation gates → keep the
    * survivors → stratified mixing → sequence packing. This is the
    * production job the individual operators exist for, composed exactly
    * as a user would compose them; every stage's semantics are the ones
    * already verified in isolation, and the chained DuckDB oracle checks
    * the composition end to end. Data cost: curate's content-hash
    * shuffle, the (free) mixing filter, and the packing window — three
    * shuffles corpus-wide, text read once.
    */
  def corpusBuildQuery(s: SparkSession, dir: String,
                       capacity: Int = PackCapacity): DataFrame = {
    val docs = Tables.documents(s, dir)
    // `source` rides through the gates as a pass-through column — no
    // join back to the corpus to recover it
    val kept = Curate.curate(docs, extraCols = Seq("source"))
      .filter(col("kept"))
      .select("doc_id", "n_words", "source")
    val mixed = corpusMix(kept, demoRates)
    seqPack(mixed, capacity, tokens = col("n_words"),
        streamCol = col("source"), orderCol = col("doc_id"))
      .select("doc_id", "source", "n_tokens", "seq_id", "offset_in_seq")
  }

  val corpusBuildOracle: String = {
    val u = uniformSql("doc_id", "mix")
    s"""WITH ${Curate.curateSqlCtes(None)},
       |kept AS (
       |  SELECT r.doc_id, r.n_words, d.source
       |  FROM r JOIN documents d USING (doc_id)
       |  WHERE reason = 'kept'),
       |mixed AS (
       |  SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_tokens
       |  FROM kept
       |  WHERE $u < $demoRateSql)
       |""".stripMargin + packSql("mixed")
  }

  /** C24b — the production chain WITH training-order randomization: the
    * same gates and mixing as [[corpusBuildQuery]], but documents pack in
    * md5-shuffled order within each stream instead of id order (id-order
    * packing puts neighboring source docs in the same training sequence —
    * exactly the correlation a shuffle exists to break). The order key is
    * (uniform(doc_id), doc_id) — still total, still bit-stable, so the
    * randomized layout reproduces exactly; the plan is unchanged except
    * the window's sort key. Same three shuffles, text read once.
    */
  def corpusBuildShuffledQuery(s: SparkSession, dir: String,
                               capacity: Int = PackCapacity): DataFrame = {
    val docs = Tables.documents(s, dir)
    val kept = Curate.curate(docs, extraCols = Seq("source"))
      .filter(col("kept"))
      .select("doc_id", "n_words", "source")
    val mixed = corpusMix(kept, demoRates)
    seqPack(mixed, capacity, tokens = col("n_words"),
        streamCol = col("source"),
        orderCol = struct(uniformOf(col("doc_id"), "order"), col("doc_id")))
      .select("doc_id", "source", "n_tokens", "seq_id", "offset_in_seq")
  }

  val corpusBuildShuffledOracle: String = {
    val u = uniformSql("doc_id", "mix")
    val uOrd = uniformSql("doc_id", "order")
    s"""WITH ${Curate.curateSqlCtes(None)},
       |kept AS (
       |  SELECT r.doc_id, r.n_words, d.source
       |  FROM r JOIN documents d USING (doc_id)
       |  WHERE reason = 'kept'),
       |mixed AS (
       |  SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_tokens
       |  FROM kept
       |  WHERE $u < $demoRateSql)
       |""".stripMargin + packSql("mixed", s"$uOrd, doc_id")
  }

  /** Deterministic train/validation/test split keyed on CONTENT, not
    * doc id: the assignment hash is [[uniformOf]] over the document text,
    * so byte-identical duplicates land in the SAME split no matter how
    * many copies exist or which shard they arrive on — the basic
    * eval-decontamination guarantee a random or id-keyed split cannot
    * give (an id-keyed split puts two copies of one document on both
    * sides of the train/test fence; near-dup leakage is contam_check's
    * job downstream). Thresholding one uniform draw keeps the three
    * splits exactly complementary: train `[0, trainFrac)`, validation
    * `[trainFrac, trainFrac+valFrac)`, test the rest.
    *
    * Scale shape: a pure scan-stage projection — no shuffle, no state,
    * no dependence on any other row — so membership is stable under
    * corpus growth/reordering and the split composes under whatever else
    * the pipeline does at 100 TB.
    */
  def corpusSplit(docs: DataFrame, trainFrac: Double = 0.96,
                  valFrac: Double = 0.02, salt: String = "split",
                  byCol: Column = col("text")): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1,
      s"fractions must leave room for test: train=$trainFrac val=$valFrac")
    docs
      .withColumn("__u", uniformOf(byCol, salt))
      .withColumn("split",
        when(col("__u") < trainFrac, "train")
          .when(col("__u") < trainFrac + valFrac, "validation")
          .otherwise("test"))
      .drop("__u")
  }

  def corpusSplitQuery(s: SparkSession, dir: String): DataFrame =
    corpusSplit(Tables.documents(s, dir))
      .select("doc_id", "source", "split")

  val corpusSplitOracle: String = {
    val u = uniformSql("text", "split")
    s"""SELECT doc_id, source,
       |  CASE WHEN $u < 0.96 THEN 'train'
       |       WHEN $u < 0.98 THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_split" -> ((s: SparkSession, d: String) => corpusSplitQuery(s, d)),
    "corpus_mix"   -> ((s: SparkSession, d: String) => corpusMixQuery(s, d)),
    "seq_pack"     -> ((s: SparkSession, d: String) => seqPackQuery(s, d)),
    "seq_pack_sharded" -> ((s: SparkSession, d: String) => seqPackShardedQuery(s, d)),
    "corpus_build" -> ((s: SparkSession, d: String) => corpusBuildQuery(s, d)),
    "corpus_build_shuffled" -> ((s: SparkSession, d: String) => corpusBuildShuffledQuery(s, d)),
    "corpus_stratified" -> ((s: SparkSession, d: String) => corpusStratifiedQuery(s, d)),
    "corpus_stratified_gated" -> ((s: SparkSession, d: String) => corpusStratifiedGatedQuery(s, d)),
    "corpus_shuffle" -> ((s: SparkSession, d: String) => corpusShuffleQuery(s, d)),
    "doc_chunk"    -> ((s: SparkSession, d: String) => docChunkQuery(s, d)))

  val oracles: Map[String, String] = Map(
    "corpus_split" -> corpusSplitOracle,
    "corpus_mix"   -> corpusMixOracle,
    "seq_pack"     -> seqPackOracle,
    "seq_pack_sharded" -> seqPackShardedOracle,
    "corpus_build" -> corpusBuildOracle,
    "corpus_build_shuffled" -> corpusBuildShuffledOracle,
    "corpus_stratified" -> corpusStratifiedOracle,
    "corpus_stratified_gated" -> corpusStratifiedOracle,
    "corpus_shuffle" -> corpusShuffleOracle,
    "doc_chunk"    -> docChunkOracle)
}
