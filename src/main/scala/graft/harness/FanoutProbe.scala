package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the fan-out exchange variants on the real sf inputs — the
  * measurement behind Tables.fanOut's partitioning choice (guide §2.5:
  * a keyless round-robin pays a local sort of its input for retry
  * determinism; a deterministic hash key skips the sort but charges the
  * scan the key columns when the query didn't need them).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32 \
  *          runMain graft.harness.FanoutProbe [runs]
  * Prints min/median wall seconds per (table, variant, consumer-width).
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(mk: => DataFrame): Unit = {
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-46s min=${secs.head}%6.3f med=${secs(secs.length / 2)}%6.3f")
    }

    def li = spark.read.parquet(s"$dir/lineitem.parquet")
    def docs = spark.read.parquet(s"$dir/documents.parquet")

    // narrow consumer: 1-column aggregate; wide consumer: every column
    def narrowLi(d: DataFrame) =
      d.groupBy(col("l_returnflag")).agg(sum("l_quantity"))
    def wideLi(d: DataFrame) = {
      val cs = li.columns.filterNot(_ == "l_returnflag")
        .map(c => count(col(c)).as(c))
      d.groupBy(col("l_returnflag")).agg(cs.head, cs.tail.toSeq: _*)
    }
    def narrowDocs(d: DataFrame) =
      d.agg(sum(length(col("text"))))
    def wideDocs(d: DataFrame) = {
      val cs = docs.columns.map(c => count(col(c)).as(c))
      d.groupBy(substring(col("doc_id").cast("string"), 1, 2))
        .agg(cs.head, cs.tail.toSeq: _*)
    }
    // r21: the two consumers the r20 A/B missed. (1) A (doc_id, gram)
    // aggregation — the dominant TEXT-family shape (textRepetition,
    // dupSpan, tfidf, contamCheck all group on (doc_id, …)): a
    // doc_id-keyed fan-out exchange SATISFIES that grouping's
    // ClusteredDistribution (partition keys ⊆ grouping keys), so the
    // pair-sized exchange disappears; round-robin cannot be reused.
    def pairGroupDocs(d: DataFrame) =
      d.select(col("doc_id"),
          explode(graft.functions.Sketch.word_ngrams(col("text"), 2)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_grams"), count(lit(1)).as("n_distinct"))
        .agg(sum("n_grams"), sum("n_distinct"))
    // (2) A heavy PER-ROW kernel whose stage wall is max-per-partition
    // work (the codec/decade-canary shape): measures what a hash key's
    // statistical balance costs vs round-robin's exact balance.
    def heavyRowDocs(d: DataFrame) =
      d.select(graft.functions.PortableHash
          .md5_minhash_sig(col("text"), 3, 64).as("sig"))
        .select(sum(element_at(col("sig"), 1).cast("double")))

    val n = cpus.toInt
    for (w <- 1 to 2) {
      println(s"--- pass $w ---")
      t("li rr      narrow") { narrowLi(li.repartition(n)) }
      t("li hashkey narrow") { narrowLi(li.repartition(n, col("l_orderkey"), col("l_linenumber"))) }
      t("li none    narrow") { narrowLi(li) }
      t("li rr      wide") { wideLi(li.repartition(n)) }
      t("li hashkey wide") { wideLi(li.repartition(n, col("l_orderkey"), col("l_linenumber"))) }
      t("li none    wide") { wideLi(li) }
      t("docs rr      narrow") { narrowDocs(docs.repartition(n)) }
      t("docs hashkey narrow") { narrowDocs(docs.repartition(n, col("doc_id"))) }
      t("docs none    narrow") { narrowDocs(docs) }
      t("docs rr      wide") { wideDocs(docs.repartition(n)) }
      t("docs hashkey wide") { wideDocs(docs.repartition(n, col("doc_id"))) }
      t("docs none    wide") { wideDocs(docs) }
      t("docs rr      pairgroup") { pairGroupDocs(docs.repartition(n)) }
      t("docs hashkey pairgroup") { pairGroupDocs(docs.repartition(n, col("doc_id"))) }
      t("docs none    pairgroup") { pairGroupDocs(docs) }
      t("docs rr      heavyrow") { heavyRowDocs(docs.repartition(n)) }
      t("docs hashkey heavyrow") { heavyRowDocs(docs.repartition(n, col("doc_id"))) }
      t("docs none    heavyrow") { heavyRowDocs(docs) }
    }
    spark.stop()
  }
}
