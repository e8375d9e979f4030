package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFuncs

/** The end-to-end curation job a training-data pipeline actually runs:
  * exact-dedup, length gate, language gate, quality gate — composed into
  * ONE pass with a reason code per document. Everything is a projection
  * except the dedup window (one hash shuffle on the content hash), so the
  * whole pipeline scales exactly like its weakest member: one shuffle over
  * the corpus, everything else scan-stage.
  *
  * Gate precedence (first failure wins): dup > short > lang_mismatch >
  * low_quality > kept. Thresholds are parameters; the defaults split the
  * synthetic corpus into a realistic keep/drop mix.
  */
object Curate {

  def curate(docs: DataFrame, minWords: Int = 25,
             minStopwordRatio: Double = 0.02): DataFrame = {
    val nWords = size(split(col("text"), " "))
    val swRatio = TextFuncs.stopwordHits(col("text"), TextFuncs.stopwordsEn)
      .cast("double") / nWords
    val wDup = Window.partitionBy(md5(col("text").cast("binary")))
      .orderBy("doc_id")
    docs
      .withColumn("__rn", row_number().over(wDup))
      .withColumn("n_words", nWords)
      .withColumn("pred_lang", TextFuncs.predLang(col("text")))
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

  /** Generated from the same stopword profiles/lists as the Spark side so
    * gates can never drift.
    */
  val pipelineCurateOracle: String = {
    val langs = TextFuncs.stopwordProfiles.map(_._1)
    val scoreExprs = TextFuncs.stopwordProfiles.map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(t, x -> x IN ($inList))) AS score_$l"
    }.mkString(",\n    ")
    val best = langs.map(l => s"score_$l").mkString("greatest(0, ", ", ", ")")
    val pred = langs.map(l =>
      s"WHEN score_$l = best AND best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    val enList = TextFuncs.stopwordsEn.map(w => s"'$w'").mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id, lang, len(t) AS n_words,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
       |    CAST(len(list_filter(t, x -> x IN ($enList))) AS DOUBLE) / len(t) AS swr,
       |    $scoreExprs
       |  FROM (SELECT *, string_split(text, ' ') AS t FROM documents) raw),
       |g AS (SELECT *, $best AS best FROM f),
       |p AS (SELECT *, $pred AS pred_lang FROM g),
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
