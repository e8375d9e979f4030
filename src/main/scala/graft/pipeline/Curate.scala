package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFuncs

/** The end-to-end curation job a training-data pipeline actually runs:
  * exact-dedup, length gate, language gate, quality gate — composed into
  * ONE pass with a reason code per document. Everything is a projection
  * except the dedup window (one hash shuffle on the content hash), so the
  * pipeline's data cost is one corpus shuffle; everything else is
  * scan-stage. The output is a TABLE (doc-sized), not a report, so there
  * is deliberately no tail sort — a global orderBy on a corpus-sized
  * result costs a range-sampling pass that re-executes the plan plus a
  * full exchange+sort (measured at ~2/3 of wall on the merge operator);
  * a caller wanting order sorts the written table.
  *
  * Gate precedence (first failure wins): dup > short > lang_mismatch >
  * low_quality > kept. Thresholds are parameters; the defaults split the
  * synthetic corpus into a realistic keep/drop mix.
  *
  * The quality gate is language-agnostic: it scores stopword density
  * against the PREDICTED language's own profile (= the argmax score), so
  * a genuine German document is judged by German stopwords — an
  * English-only ratio would silently drop every non-English doc.
  */
object Curate {

  /** Adds the shared scoring columns: ONE native tokenize+score pass per
    * row ([n_tokens, score_en, …] materialized as `__sc` — non-cheap, so
    * CollapseProject keeps the alias), with `n_words` / `pred_lang`
    * derived as plain array indexes over it. Batch and streaming curation
    * both start here; the previous HOF formulation re-split and re-scored
    * the text ≥3× per row, interpreted, on the single most-run pipeline
    * in the workload.
    */
  private def withScores(docs: DataFrame): DataFrame =
    docs
      .withColumn("__sc", TextFuncs.langScores(col("text")))
      .withColumn("n_words", col("__sc").getItem(0))
      .withColumn("pred_lang", TextFuncs.langPred(col("__sc")))

  /** The stateless gate verdict (short > lang_mismatch > low_quality >
    * kept) over [[withScores]] columns — the ONE definition of these
    * gates; batch prepends its dup/near_dup arms, streaming uses it
    * as-is (its dup gate is dedup state, not a verdict).
    */
  private def statelessReason(minWords: Int,
                              minStopwordRatio: Double): Column = {
    val swRatio =
      TextFuncs.langBest(col("__sc")).cast("double") / col("n_words")
    when(col("n_words") < minWords, "short")
      .when(col("pred_lang") =!= col("lang"), "lang_mismatch")
      .when(swRatio < minStopwordRatio, "low_quality")
      .otherwise("kept")
  }

  /** The one batch curation builder both query variants share — a gate
    * change here (or in [[statelessReason]]) is a gate change everywhere.
    * `nearDupIds`: docs to drop as `near_dup` (precedence right after the
    * exact gate); None = gate off.
    */
  private def curateWith(docs: DataFrame, nearDupIds: Option[DataFrame],
                         minWords: Int, minStopwordRatio: Double,
                         extraCols: Seq[String] = Nil): DataFrame = {
    val wDup = Window.partitionBy(md5(col("text").cast("binary")))
      .orderBy("doc_id")
    val base = withScores(docs)
      .withColumn("__rn", row_number().over(wDup))
    val gated = nearDupIds match {
      case Some(nd) =>
        base.join(nd.withColumn("__nd", lit(true)), Seq("doc_id"), "left")
      case None => base.withColumn("__nd", lit(false)) // folds away below
    }
    val outCols =
      Seq("doc_id", "n_words", "pred_lang", "reason", "kept") ++ extraCols
    gated
      .withColumn("reason",
        when(col("__rn") =!= 1, "dup")
          .when(coalesce(col("__nd"), lit(false)), "near_dup")
          .otherwise(statelessReason(minWords, minStopwordRatio)))
      .withColumn("kept", col("reason") === "kept")
      .select(outCols.map(col): _*)
  }

  /** `extraCols`: input columns to carry through to the output unchanged
    * (a composing pipeline keeps e.g. `source` without a join back).
    */
  def curate(docs: DataFrame, minWords: Int = 25,
             minStopwordRatio: Double = 0.02,
             extraCols: Seq[String] = Nil): DataFrame =
    curateWith(docs, None, minWords, minStopwordRatio, extraCols)

  def pipelineCurate(s: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(s, dir))

  /** Shared oracle generator, built from the langid SQL generators
    * (TextFuncs.lang*Sql) so the gates can never drift from the Spark
    * side OR from textLangidOracle — and the two curate variants differ
    * only by the nd CTE chain and one CASE arm, mirroring [[curateWith]].
    */
  /** The curate CTE chain up to `r` (doc_id, n_words, pred_lang, reason)
    * — the reusable half of the oracle, also the front of the composed
    * corpus-build oracle.
    */
  private[pipeline] def curateSqlCtes(ndCtes: Option[String]): String = {
    val prefix = ndCtes.map(c => s"$c,\n").getOrElse("")
    val isNd = if (ndCtes.isDefined) "nd.doc_id IS NOT NULL" else "FALSE"
    val pFrom =
      if (ndCtes.isDefined) "FROM g LEFT JOIN nd USING (doc_id)" else "FROM g"
    s"""${prefix}f AS (
       |  SELECT doc_id, lang, len(t) AS n_words,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
       |    ${TextFuncs.langScoreSqlExprs("t").mkString(",\n    ")}
       |  FROM (SELECT *, string_split(text, ' ') AS t FROM documents) raw),
       |g AS (SELECT *, ${TextFuncs.langBestSql} AS best,
       |        CAST(${TextFuncs.langBestSql} AS DOUBLE) / n_words AS swr
       |      FROM f),
       |p AS (SELECT g.*, ${TextFuncs.langPredSql} AS pred_lang, $isNd AS is_nd
       |      $pFrom),
       |r AS (
       |  SELECT doc_id, n_words, pred_lang,
       |    CASE WHEN rn <> 1 THEN 'dup'
       |         WHEN is_nd THEN 'near_dup'
       |         WHEN n_words < 25 THEN 'short'
       |         WHEN pred_lang <> lang THEN 'lang_mismatch'
       |         WHEN swr < 0.02 THEN 'low_quality'
       |         ELSE 'kept' END AS reason
       |  FROM p)""".stripMargin
  }

  private def curateOracleSql(ndCtes: Option[String]): String =
    s"""WITH ${curateSqlCtes(ndCtes)}
       |SELECT doc_id, n_words, pred_lang, reason, reason = 'kept' AS kept
       |FROM r ORDER BY doc_id""".stripMargin

  val pipelineCurateOracle: String = curateOracleSql(None)

  /** [[curate]] plus a NEAR-dup gate: after exact dedup, a document whose
    * simhash sits within `maxHamming` bits of an EARLIER document drops
    * with reason `near_dup` (keep-first, matching the exact gate's
    * lowest-id-wins). Precedence: dup > near_dup > short > lang_mismatch >
    * low_quality > kept. Adds the Manku block join's cost (4 shuffled
    * rows/doc, hot-block-capped) on top of curate's one content-hash
    * shuffle — the full production shape: exact + near dedup + quality in
    * one composed pass.
    */
  def curateNearDup(docs: DataFrame, minWords: Int = 25,
                    minStopwordRatio: Double = 0.02,
                    maxHamming: Int = 3): DataFrame =
    curateWith(docs,
      Some(graft.dedup.Dedup.simhashNearDupIds(docs, maxHamming)),
      minWords, minStopwordRatio)

  def pipelineCurateNearDup(s: SparkSession, dir: String): DataFrame =
    curateNearDup(Tables.documents(s, dir))

  /** Curate oracle + the simhash near-dup CTE chain (shared with the
    * dedup_simhash_nn oracle via Dedup.simhashNearDupSqlCtes).
    */
  val pipelineCurateNearDupOracle: String =
    curateOracleSql(Some(graft.dedup.Dedup.simhashNearDupSqlCtes()))

  /** Benchmark decontamination — the standard pre-training pass: flag
    * `corpus` documents (doc_id, text) whose word n-grams overlap the
    * n-gram set of `bench` (any DataFrame with a `text` column — the
    * held-out evaluation set) too heavily: the GPT-3/PaLM-style n-gram
    * collision check.
    *
    * Scale shape: n-grams come from the native WordNgrams expression
    * (per-row, scan-stage); the benchmark's DISTINCT n-gram set is tiny
    * relative to a 100 TB corpus (eval sets are fixed-size), so it
    * BROADCASTS and the corpus side is never shuffled for the membership
    * probe — the only corpus-wide shuffle is the per-doc groupBy that
    * counts hits, which carries (doc_id, counts) not text.
    */
  def contamCheck(corpus: DataFrame, bench: DataFrame, n: Int,
                  threshold: Double): DataFrame = {
    val ngrams = (c: Column) =>
      explode(array_distinct(graft.functions.Sketch.word_ngrams(c, n)))
    val corpGrams = corpus.select(col("doc_id"), ngrams(col("text")).as("g"))
    val benchGrams = bench.select(ngrams(col("text")).as("g")).distinct()
    val agg = corpGrams
      .join(broadcast(benchGrams.withColumn("__hit", lit(1))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_hits"))
    // docs shorter than n words have no n-grams — they still report, clean
    val overlap = when(coalesce(col("n_grams"), lit(0L)) > 0,
      col("n_hits").cast("double") / col("n_grams")).otherwise(lit(0.0))
    corpus.select("doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        overlap.as("overlap"),
        (overlap >= threshold).as("contaminated"))
  }

  /** Query entry: self-contained on the documents table — the "benchmark"
    * is a deterministic held-out slice (doc_id % benchMod == 0), the
    * corpus is everything else. Real callers pass their own eval set to
    * [[contamCheck]].
    */
  def contamCheck(s: SparkSession, dir: String, n: Int = 3,
                  threshold: Double = 0.5, benchMod: Int = 10): DataFrame = {
    val docs = Tables.documents(s, dir)
    contamCheck(
      docs.filter(col("doc_id") % benchMod =!= 0),
      docs.filter(col("doc_id") % benchMod === 0),
      n, threshold)
  }

  val contamCheckOracle: String =
    """WITH grams AS (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id,
      |      unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |              for i in range(1, len(t) - 1)]) AS g
      |    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d
      |    WHERE len(t) >= 3) u),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
      |corp AS (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 0),
      |agg AS (
      |  SELECT c.doc_id, COUNT(*) AS n_grams, COUNT(b.g) AS n_hits
      |  FROM corp c LEFT JOIN bench b USING (g)
      |  GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(n_grams, 0) AS n_grams,
      |  COALESCE(n_hits, 0) AS n_hits,
      |  CASE WHEN COALESCE(n_grams, 0) > 0
      |       THEN CAST(n_hits AS DOUBLE) / n_grams ELSE 0.0 END AS overlap,
      |  CASE WHEN COALESCE(n_grams, 0) > 0
      |       THEN CAST(n_hits AS DOUBLE) / n_grams ELSE 0.0 END >= 0.5
      |    AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
      |LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ streaming
  /** Streaming curation — the gates on an unbounded document feed. The
    * stateless gates (short / lang_mismatch / low_quality) are the same
    * scan-stage projections as batch; the exact-dup gate becomes
    * watermark-bounded state keyed on the content hash
    * (`dropDuplicatesWithinWatermark`, like [[graft.streaming.EventStreams
    * .streamingDedup]]): the first arrival wins, a replay within the
    * watermark drops — state is bounded by (ingest rate × watermark), not
    * stream length. Dropped duplicates simply never appear downstream (a
    * stream can't retract), so the output is every surviving doc with its
    * gate verdict; `docs` needs a `ts` event-time column.
    */
  def streamingCurate(docs: DataFrame, watermark: String = "2 hours",
                      minWords: Int = 25,
                      minStopwordRatio: Double = 0.02): DataFrame =
    withScores(docs
      .withWatermark("ts", watermark)
      .withColumn("__h", md5(col("text").cast("binary")))
      .dropDuplicatesWithinWatermark("__h"))
      .withColumn("reason", statelessReason(minWords, minStopwordRatio))
      .withColumn("kept", col("reason") === "kept")
      .select("doc_id", "ts", "n_words", "pred_lang", "reason", "kept")

  // --------------------------------------------------------------- C22
  /** Budgeted quality selection: rank each group's documents by a quality
    * score and keep the best until the group's token budget is spent —
    * how a data mixture actually hits a per-source token target instead
    * of a rate guess. One window shuffle on the group key; every group
    * selects independently, so the op parallelizes across sources and a
    * single source never bottlenecks others.
    *
    * `quality` ordering must be engine-stable for exact reruns: a score
    * that is one arithmetic expression of the row (like a ratio of
    * counts) is bit-deterministic; tie-break on a unique key.
    */
  def qualityBudget(docs: DataFrame, quality: Column, tokens: Column,
                    budget: Long, group: Column): DataFrame = {
    val w = Window.partitionBy(group)
      .orderBy(quality.desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("quality", quality)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("kept", col("cum_tokens") <= budget)
  }

  /** Query entry: stopword-ratio quality, whitespace tokens, 3000-token
    * budget per source.
    */
  def qualityBudgetQuery(s: SparkSession, dir: String,
                         budget: Long = 3000L): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("__c", graft.functions.Text.tokenProfileCounts(
        col("text"), Seq(graft.functions.TextFuncs.stopwordsEn)))
    val nWords = col("__c").getItem(0)
    qualityBudget(d,
      quality = col("__c").getItem(1).cast("double") / nWords,
      tokens = nWords, budget = budget, group = col("source"))
      .select("doc_id", "source", "n_tokens", "quality", "cum_tokens", "kept")
  }

  val qualityBudgetOracle: String = {
    val inList = graft.functions.TextFuncs.stopwordsEnSqlList
    s"""SELECT doc_id, source, n_tokens, quality, cum_tokens,
       |  cum_tokens <= 3000 AS kept
       |FROM (
       |  SELECT doc_id, source, n_tokens, quality,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_tokens
       |  FROM (
       |    SELECT doc_id, source,
       |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |      CAST(len(list_filter(string_split(text, ' '),
       |        t -> t IN ($inList))) AS DOUBLE)
       |        / len(string_split(text, ' ')) AS quality
       |    FROM documents) b) t
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- C41
  /** Per-source corpus quality report — the DBA-dashboard composition over
    * the curation pipeline: document/token volumes, every curation-gate
    * outcome count, and the mean unigram-LM token log-prob, one row per
    * source. The reference's ETL lands per-run metric AGGREGATES the same
    * way (ETL_dbstress_results.py: per-query latency rollups); this is
    * that reporting verb over the LLM-pipeline signals.
    *
    * Exactness: reason counts ride the same gate chain as
    * pipeline_curate; the LM mean divides two exact integer sums ONCE per
    * source (micro-unit log-probs — the text_lm_score trick), so every
    * column is hash-exact. Shuffle shape: the gate chain's one hash
    * shuffle + a per-source aggregate of 5 longs — text never shuffles.
    */
  def corpusQualityReport(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UnigramLm
    val docs = Tables.documents(s, dir)
    val scored = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).as("n_toks"),
      UnigramLm.lp_sum(col("text")).as("lp"))
    def reasonCount(r: String) =
      sum(when(col("reason") === r, 1L).otherwise(0L)).as(s"n_$r")
    scored.join(curate(docs).select("doc_id", "reason"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks").cast("long")).as("n_tokens"),
        reasonCount("kept"), reasonCount("dup"), reasonCount("short"),
        reasonCount("lang_mismatch"), reasonCount("low_quality"),
        (sum("lp").cast("double") /
          (sum(col("n_toks").cast("long")).cast("double") * 1e6)).as("mean_lm"))
      .orderBy("source")
  }

  val corpusQualityReportOracle: String = {
    import graft.functions.UnigramLm
    val vocabRows = UnigramLm.DefaultVocab
      .map { case (t, lp) => s"('${t.replace("'", "''")}', ${lp}::BIGINT)" }
      .mkString(",\n    ")
    def rc(r: String) =
      s"CAST(SUM(CASE WHEN reason = '$r' THEN 1 ELSE 0 END) AS BIGINT) AS n_$r"
    s"""WITH ${curateSqlCtes(None)},
       |v(tok, lp) AS (VALUES
       |    $vocabRows),
       |w AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
       |      FROM documents),
       |lm AS (SELECT doc_id, source, COUNT(*) AS n_toks,
       |         SUM(COALESCE(l.lp, ${UnigramLm.OovLogpMicro}::BIGINT)) AS lp
       |       FROM w LEFT JOIN v l USING (tok) GROUP BY doc_id, source)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  ${rc("kept")}, ${rc("dup")}, ${rc("short")},
       |  ${rc("lang_mismatch")}, ${rc("low_quality")},
       |  CAST(SUM(lp) AS DOUBLE) / (CAST(SUM(n_toks) AS DOUBLE) * 1000000.0)
       |    AS mean_lm
       |FROM lm JOIN r USING (doc_id)
       |GROUP BY source ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------- C49
  /** Domain-frequency cap — the curation step that stops any one domain
    * from dominating the corpus (the CommonCrawl-pipeline idiom: a few
    * hosts contribute millions of near-identical pages; capping
    * per-domain volume is cheaper and safer than trusting near-dup to
    * catch them all). Keeps the top `cap` documents per source, longest
    * text first (the zero-cost quality proxy; any scoring column slots
    * into the same window). `rnk ≤ cap` compiles to a partial
    * WindowGroupLimit: every map task emits at most `cap` rows per source
    * BEFORE the exchange, so the shuffle carries ≤ sources × cap × tasks
    * rows — at 100 TB the capped output crosses the wire, never the
    * corpus (plan-pinned alongside the other rank filters).
    */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= cap)
  }

  /** The per-source cap the C49 query AND its oracle share — the oracle
    * interpolates this value, so query and oracle cannot desync when it
    * changes (same idiom as [[Mix.PackCapacity]]).
    */
  val DomainCap: Int = 10

  def docDomainCap(s: SparkSession, dir: String,
                   cap: Int = DomainCap): DataFrame =
    domainCap(Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        cap)
      .select("source", "rnk", "doc_id", "n_chars")
      .orderBy("source", "rnk")

  val docDomainCapOracle: String =
    s"""SELECT source, rnk, doc_id, n_chars FROM (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY n_chars DESC, doc_id) AS rnk
       |  FROM documents) t
       |WHERE rnk <= $DomainCap ORDER BY source, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_quality_report"   -> ((s: SparkSession, d: String) => corpusQualityReport(s, d)),
    "pipeline_curate"         -> (pipelineCurate _),
    "pipeline_curate_neardup" -> (pipelineCurateNearDup _),
    "contam_check"            -> ((s: SparkSession, d: String) => contamCheck(s, d)),
    "quality_budget"          -> ((s: SparkSession, d: String) => qualityBudgetQuery(s, d)),
    "doc_domain_cap"          -> ((s: SparkSession, d: String) => docDomainCap(s, d)))

  val oracles: Map[String, String] = Map(
    "corpus_quality_report"   -> corpusQualityReportOracle,
    "pipeline_curate"         -> pipelineCurateOracle,
    "pipeline_curate_neardup" -> pipelineCurateNearDupOracle,
    "contam_check"            -> contamCheckOracle,
    "quality_budget"          -> qualityBudgetOracle,
    "doc_domain_cap"          -> docDomainCapOracle)
}
