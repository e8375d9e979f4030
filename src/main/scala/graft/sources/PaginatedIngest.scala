package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

import graft.operators.LakehouseOps

/** Paginated-API ingestion — the reference's Query History fetch loop
  * (tasks/Query History API to Delta_withmetrics.py:158-195): request a
  * page, append its rows, follow `next_page_token` while `has_next_page`.
  *
  * The cursor walk is inherently driver-side sequential I/O (each token
  * comes from the previous response — no parallelism to be had), exactly as
  * in the reference; everything after the fetch is distributed: the raw
  * JSON rows are parallelized and parsed by Spark's JSON reader, then flow
  * into the library's flatten → dedup → merge operators. Driver memory is
  * bounded by the API's result set, the same bound the reference accepts.
  */
object PaginatedIngest {

  /** Drain a paginated source. `fetch(cursor)` returns the page's rows and
    * the next cursor (`None` = last page); the first call gets
    * `cursor = None`. `maxPages` guards a source whose cursor never runs
    * dry (the reference trusts `has_next_page`; a bound is cheap
    * insurance).
    */
  def drain[A](fetch: Option[String] => (Seq[A], Option[String]),
               maxPages: Int = 100000): Seq[A] =
    Iterator.unfold(Option(Option.empty[String])) {
      case Some(cursor) =>
        val (rows, next) = fetch(cursor)
        Some((rows, next.map(t => Option(t))))
      case None => None
    }.take(maxPages).flatten.toSeq

  /** Drain a JSON-rows source and parse distributed: one string per record
    * (the reference's `res` entries), schema inferred or supplied via
    * `spark.read.schema(...)` by the caller downstream.
    */
  def ingestJson(spark: SparkSession,
                 fetch: Option[String] => (Seq[String], Option[String]),
                 maxPages: Int = 100000): DataFrame = {
    import spark.implicits._
    val raw: Dataset[String] = spark.createDataset(drain(fetch, maxPages))
    spark.read.json(raw)
  }

  /** The reference job end-to-end: drain pages → parse → flatten nested
    * structs → SCD1 merge into `target` on `keys` (highest `tiebreak`
    * wins), i.e. "Query History API to Delta" minus the vendor transport.
    */
  def ingestAndMerge(spark: SparkSession, target: DataFrame,
                     fetch: Option[String] => (Seq[String], Option[String]),
                     keys: Seq[String],
                     tiebreak: Seq[Column] = Seq.empty): DataFrame =
    LakehouseOps.mergeUpsert(
      target,
      LakehouseOps.flattenStructs(ingestJson(spark, fetch)),
      keys, tiebreak)
}
