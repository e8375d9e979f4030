package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** TPC-DS-shaped star-schema leg — the second benchmark family the
  * reference's datagen notebook generates (resources/
  * TPC-datagen-notebook.scala:9 `"benchmarks": "TPCDS, TPCH"`; table
  * names :383, schemas :1494). The driver testdata is TPC-H-shaped, so
  * the star schema is DERIVED deterministically from it — date_dim from
  * the order-date domain, item from part, store_sales as the fact — and
  * the DuckDB oracles perform the identical derivation in SQL, making
  * every query hash-checkable end to end.
  *
  * Scale shape: the dimensions are small by construction (dates ≈ years
  * ×365, items = |part|) and join BROADCAST below the fact scan — the
  * canonical star-join plan at 100 TB: one pass over the fact, zero
  * fact-sized shuffles before the (tiny) aggregate. The fact derivation
  * itself is one lineitem⋈orders equi-join — at production scale that
  * is the ETL step that materializes store_sales, not the reporting
  * query, so its cost is paid once and amortized.
  */
object StarSchema {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def asDouble(c: Column): Column = c.cast("double")

  /** date_dim derived from the order-date domain: surrogate key
    * yyyymmdd, year and month-of-year attributes.
    */
  private[graft] def dateDim(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_orderdate").as("d_date")).distinct()
      .select(
        (year(col("d_date")).cast("long") * 10000L +
          month(col("d_date")).cast("long") * 100L +
          dayofmonth(col("d_date")).cast("long")).as("d_date_sk"),
        year(col("d_date")).cast("long").as("d_year"),
        month(col("d_date")).cast("long").as("d_moy"))

  /** item derived from part: brand carries, category = the first word
    * of p_type (6 values — the TPC-DS category cardinality class).
    */
  private[graft] def item(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
      col("p_partkey").as("i_item_sk"),
      col("p_brand").as("i_brand"),
      substring_index(col("p_type"), " ", 1).as("i_category"))

  /** store_sales derived from lineitem⋈orders: date/item/customer
    * surrogate keys + quantity + extended sales price (decimal-exact),
    * with a deterministic store/web channel split on the line number.
    */
  private[graft] def storeSales(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        (year(col("o_orderdate")).cast("long") * 10000L +
          month(col("o_orderdate")).cast("long") * 100L +
          dayofmonth(col("o_orderdate")).cast("long")).as("ss_sold_date_sk"),
        col("l_partkey").as("ss_item_sk"),
        col("o_custkey").as("ss_customer_sk"),
        col("l_quantity").as("ss_quantity"),
        (dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
          .as("ss_ext_sales_price"),
        when(col("l_linenumber") % 2 === 1, lit("store"))
          .otherwise(lit("web")).as("ss_channel"))

  /** The shared oracle-side derivation (DuckDB WITH-clauses) — must stay
    * expression-for-expression equal to the builders above.
    */
  private val DeriveSql: String =
    """WITH date_dim AS (
      |  SELECT DISTINCT
      |    CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
      |      + day(o_orderdate) AS BIGINT) AS d_date_sk,
      |    CAST(year(o_orderdate) AS BIGINT) AS d_year,
      |    CAST(month(o_orderdate) AS BIGINT) AS d_moy
      |  FROM orders),
      |item AS (
      |  SELECT p_partkey AS i_item_sk, p_brand AS i_brand,
      |    split_part(p_type, ' ', 1) AS i_category
      |  FROM part),
      |store_sales AS (
      |  SELECT
      |    CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
      |      + day(o_orderdate) AS BIGINT) AS ss_sold_date_sk,
      |    l_partkey AS ss_item_sk, o_custkey AS ss_customer_sk,
      |    l_quantity AS ss_quantity,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * CAST(1.0 - l_discount AS DECIMAL(18,2)) AS ss_ext_sales_price,
      |    CASE WHEN l_linenumber % 2 = 1 THEN 'store' ELSE 'web' END
      |      AS ss_channel
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |""".stripMargin

  // ---------------------------------------------------------------- DS1
  /** TPC-DS Q3 shape — the canonical star join: fact ⋈ date_dim (month
    * filter) ⋈ item (category filter), December brand revenue by year.
    * Both dims broadcast; the fact is scanned once and only (d_year,
    * i_brand, price) survive the exchange into the final aggregate.
    */
  def dsQ3BrandRevenue(s: SparkSession, dir: String): DataFrame = {
    val dd = dateDim(s, dir).filter(col("d_moy") === 12L)
    val it = item(s, dir).filter(col("i_category") === "STANDARD")
    storeSales(s, dir)
      .join(broadcast(dd), col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(it), col("ss_item_sk") === col("i_item_sk"))
      .groupBy("d_year", "i_brand")
      .agg(asDouble(sum(col("ss_ext_sales_price"))).as("sum_agg"))
      .orderBy(col("d_year"), col("sum_agg").desc, col("i_brand"))
      .limit(100)
  }

  val dsQ3Oracle: String = DeriveSql +
    """SELECT d_year, i_brand,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sum_agg
      |FROM store_sales
      |JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |JOIN item ON ss_item_sk = i_item_sk
      |WHERE d_moy = 12 AND i_category = 'STANDARD'
      |GROUP BY d_year, i_brand
      |ORDER BY d_year, sum_agg DESC, i_brand
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- DS2
  /** TPC-DS reporting-rollup shape (Q27/Q67 class): quantity and sales
    * rolled up over (d_year, i_category) with subtotal and grand-total
    * rows. Partial-reaggregation pattern: the star join feeds ONE
    * per-(year, category) aggregate (the only fact-sized stage); the
    * rollup re-aggregates the tiny result, so Expand never multiplies
    * fact rows (and Spark 4.1's ambiguous-self-join false positive on
    * rollup-after-join never fires).
    */
  /** The one fact-sized stage of [[dsGrouping]]: star join + the
    * (year, category) aggregate — exposed so PlanSpec can pin its
    * broadcast-dims/no-Expand shape, which the checkpoint in
    * [[dsGrouping]] otherwise hides inside a LogicalRDD.
    */
  private[graft] def dsGroupingBase(s: SparkSession, dir: String): DataFrame =
    storeSales(s, dir)
      .join(broadcast(dateDim(s, dir)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(item(s, dir)), col("ss_item_sk") === col("i_item_sk"))
      .groupBy("d_year", "i_category")
      .agg(count(lit(1)).as("n_sales"),
        sum(dec(col("ss_quantity"))).cast(DecimalType(38, 2)).as("qty"),
        sum(col("ss_ext_sales_price")).cast(DecimalType(38, 4)).as("sales"))

  def dsGrouping(s: SparkSession, dir: String): DataFrame = {
    // The (year, category) aggregate is referenced by all three rollup
    // levels; as three plan subtrees Catalyst compiled three SEPARATE
    // fact-sized star-join passes (the r20 before-plan shows the
    // lineitem⋈orders derivation + both broadcasts + first aggregate
    // THREE times — guide §2.4 "remove shuffles outright"). A lazy
    // localCheckpoint collapses them: the ~(years × 6 categories)-row
    // aggregate is materialized once by the first action and the union's
    // other two levels re-read the blocks, so the plan carries ONE fact
    // pass (plans/r20/ds_grouping_{before,after}.txt; same single-RDD
    // idiom as annRecall's scored-set checkpoints, ContextCleaner
    // reclaims the blocks).
    val base = dsGroupingBase(s, dir)
      .localCheckpoint(false)
    val l1 = base.groupBy("d_year")
      .agg(sum("n_sales").as("n_sales"),
        sum("qty").cast(DecimalType(38, 2)).as("qty"),
        sum("sales").cast(DecimalType(38, 4)).as("sales"))
      .withColumn("i_category", lit(null).cast("string"))
    val l0 = base
      .agg(sum("n_sales").as("n_sales"),
        sum("qty").cast(DecimalType(38, 2)).as("qty"),
        sum("sales").cast(DecimalType(38, 4)).as("sales"))
      .withColumn("d_year", lit(null).cast("long"))
      .withColumn("i_category", lit(null).cast("string"))
    base.unionByName(l1).unionByName(l0)
      .select(col("d_year"), col("i_category"), col("n_sales"),
        asDouble(col("qty")).as("sum_qty"),
        asDouble(col("sales")).as("sum_sales"))
      .orderBy(asc_nulls_first("d_year"), asc_nulls_first("i_category"))
  }

  val dsGroupingOracle: String = DeriveSql +
    """SELECT d_year, i_category, COUNT(*) AS n_sales,
      |  CAST(SUM(CAST(ss_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sum_sales
      |FROM store_sales
      |JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |JOIN item ON ss_item_sk = i_item_sk
      |GROUP BY ROLLUP (d_year, i_category)
      |ORDER BY d_year ASC NULLS FIRST, i_category ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- DS3
  /** TPC-DS Q5 channel-union shape: per-channel yearly sales summaries
    * in one report. Real Q5 unions DISTINCT fact tables; here the
    * channel is a COLUMN of the one derived fact, so the union of
    * channel-filtered legs collapses to a single
    * `groupBy(channel, year)` pass — every row belongs to exactly one
    * channel, so one grouped aggregate produces the identical rows at
    * HALF the fact I/O of the two-leg plan (the difference is a full
    * extra fact scan at any scale). The oracle keeps the literal
    * UNION-of-legs SQL as the semantic witness.
    */
  def dsChannelUnion(s: SparkSession, dir: String): DataFrame =
    storeSales(s, dir)
      .join(broadcast(dateDim(s, dir)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .groupBy(col("ss_channel").as("channel"), col("d_year"))
      .agg(count(lit(1)).as("n_sales"),
        asDouble(sum(col("ss_ext_sales_price"))).as("sales"))
      .select("channel", "d_year", "n_sales", "sales")
      .orderBy("channel", "d_year")

  val dsChannelUnionOracle: String = DeriveSql +
    """SELECT channel, d_year, n_sales, sales FROM (
      |  SELECT 'store' AS channel, d_year, COUNT(*) AS n_sales,
      |    CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sales
      |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |  WHERE ss_channel = 'store' GROUP BY d_year
      |  UNION ALL
      |  SELECT 'web' AS channel, d_year, COUNT(*) AS n_sales,
      |    CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sales
      |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |  WHERE ss_channel = 'web' GROUP BY d_year) t
      |ORDER BY channel, d_year""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_q3_brand_revenue" -> (dsQ3BrandRevenue _),
    "ds_grouping"         -> (dsGrouping _),
    "ds_channel_union"    -> (dsChannelUnion _))

  val oracles: Map[String, String] = Map(
    "ds_q3_brand_revenue" -> dsQ3Oracle,
    "ds_grouping"         -> dsGroupingOracle,
    "ds_channel_union"    -> dsChannelUnionOracle)
}
