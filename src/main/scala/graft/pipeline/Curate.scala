package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFuncs

/** The end-to-end curation job a training-data pipeline actually runs:
  * exact-dedup, length gate, language gate, quality gate — composed into
  * ONE pass with a reason code per document. Everything is a projection
  * except the dedup window (one hash shuffle on the content hash) and the
  * presentation-only output sort (a range exchange a caller that doesn't
  * need global order would drop), so the pipeline's data cost is one
  * corpus shuffle; everything else is scan-stage.
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

  def curate(docs: DataFrame, minWords: Int = 25,
             minStopwordRatio: Double = 0.02): DataFrame = {
    // ONE native tokenize+score pass per row ([n_tokens, score_en, …],
    // materialized as __sc — non-cheap, so CollapseProject keeps the
    // alias); word count, language gate, and quality gate are all plain
    // array indexes over it. The previous HOF formulation re-split and
    // re-scored the text ≥3× per row, interpreted — on the single
    // most-run pipeline in the workload.
    val wDup = Window.partitionBy(md5(col("text").cast("binary")))
      .orderBy("doc_id")
    val swRatio =
      TextFuncs.langBest(col("__sc")).cast("double") / col("n_words")
    docs
      .withColumn("__sc", TextFuncs.langScores(col("text")))
      .withColumn("__rn", row_number().over(wDup))
      .withColumn("n_words", col("__sc").getItem(0))
      .withColumn("pred_lang", TextFuncs.langPred(col("__sc")))
      .withColumn("reason",
        when(col("__rn") =!= 1, "dup")
          .when(col("n_words") < minWords, "short")
          .when(col("pred_lang") =!= col("lang"), "lang_mismatch")
          .when(swRatio < minStopwordRatio, "low_quality")
          .otherwise("kept"))
      .withColumn("kept", col("reason") === "kept")
      .select("doc_id", "n_words", "pred_lang", "reason", "kept")
      .orderBy("doc_id")
  }

  def pipelineCurate(s: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(s, dir))

  /** Generated via the shared langid SQL generators (TextFuncs.lang*Sql)
    * so the gates can never drift from the Spark side OR from
    * textLangidOracle.
    */
  val pipelineCurateOracle: String = {
    s"""WITH f AS (
       |  SELECT doc_id, lang, len(t) AS n_words,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
       |    ${TextFuncs.langScoreSqlExprs("t").mkString(",\n    ")}
       |  FROM (SELECT *, string_split(text, ' ') AS t FROM documents) raw),
       |g AS (SELECT *, ${TextFuncs.langBestSql} AS best,
       |        CAST(${TextFuncs.langBestSql} AS DOUBLE) / n_words AS swr
       |      FROM f),
       |p AS (SELECT *, ${TextFuncs.langPredSql} AS pred_lang FROM g),
       |r AS (
       |  SELECT doc_id, n_words, pred_lang,
       |    CASE WHEN rn <> 1 THEN 'dup'
       |         WHEN n_words < 25 THEN 'short'
       |         WHEN pred_lang <> lang THEN 'lang_mismatch'
       |         WHEN swr < 0.02 THEN 'low_quality'
       |         ELSE 'kept' END AS reason
       |  FROM p)
       |SELECT doc_id, n_words, pred_lang, reason, reason = 'kept' AS kept
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (pipelineCurate _))

  val oracles: Map[String, String] = Map(
    "pipeline_curate" -> pipelineCurateOracle)
}
