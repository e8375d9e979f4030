package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{LakehouseOps, RangeJoin, Relational, StarSchema, TpchTail}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3ShippingPriority(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TpchTail.queries ++ RangeJoin.queries ++
      StarSchema.queries ++ LakehouseOps.queries ++
      graft.dedup.Dedup.queries ++ graft.ann.Ann.queries ++
      graft.functions.TextFuncs.queries ++ graft.functions.Bpe.queries ++
      graft.functions.UnigramLm.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.streaming.EventStreams.queries ++ graft.pipeline.Curate.queries ++
      graft.pipeline.Mix.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * then records a weaker rows-only check; ScalaTest covers those). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TpchTail.oracles ++ RangeJoin.oracles ++
      StarSchema.oracles ++ LakehouseOps.oracles ++
      graft.dedup.Dedup.oracles ++ graft.ann.Ann.oracles ++
      graft.functions.TextFuncs.oracles ++ graft.functions.Bpe.oracles ++
      graft.functions.UnigramLm.oracles ++
      graft.streaming.EventStreams.oracles ++
      graft.pipeline.Curate.oracles ++ graft.multimodal.Multimodal.oracles ++
      graft.pipeline.Mix.oracles

  /** Data-dependent oracles that inline a deterministically-trained model
    * (IVF centroids, PQ codebooks) as SQL literals — they need the live
    * session + sf dir, so Verify merges them into oracle_sql.json at dump
    * time rather than this map being static. `wanted` gates generation so
    * a subset run trains no model it doesn't need.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String,
                       wanted: String => Boolean = _ => true): Map[String, String] =
    graft.ann.Ann.dynamicOracles(spark, sfDir, wanted) ++
      graft.dedup.Dedup.dynamicOracles(spark, sfDir, wanted) ++
      LakehouseOps.dynamicOracles(spark, sfDir, wanted)

  /** The SPARK_GRAFT_QUERIES subset contract shared by Bench and Verify:
    * comma-separated names; unset or empty (a stray exported var) = full
    * suite (None).
    */
  def querySubset: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
}
