package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SURVEY.md §2 block A, part 3 — the remaining TPC-H query shapes
  * (Q2, Q8, Q9, Q11, Q12, Q13, Q16, Q17, Q20, Q21), completing the 22-query
  * suite the reference's stress driver executes
  * (evaluation_tools/dbstress__Current.py:1-120 runs TPC-H-style workloads;
  * resources/TPC-datagen-notebook.scala:1-60 generates the full schema).
  *
  * The driver-generated testdata is a REDUCED TPC-H schema: no `partsupp`
  * table, no l_commitdate / l_receiptdate / l_shipmode / p_container /
  * p_mfgr columns. Queries that need them are adapted, preserving the
  * original's plan shape (the part Catalyst has to get right):
  *
  *  - `partsupp` is DERIVED from lineitem: availqty := Σ l_quantity,
  *    supplycost := min(l_extendedprice / l_quantity) per (part, supp).
  *    One map-side-combined aggregate, shuffle ∝ distinct pairs — at 100 TB
  *    this is the same cardinality partsupp itself would have.
  *  - Q12's ship modes become ship-DELAY buckets (days from order to ship);
  *    Q13's comment filter becomes an order-priority filter; Q16's
  *    "customer complaints" exclusion becomes negative-acctbal suppliers;
  *    Q17's container becomes p_type; Q21's "failed delivery commitment"
  *    becomes "shipped strictly last in a multi-supplier order".
  *
  * All money aggregates run through DECIMAL(18,2/4) so sums are exact and
  * order-independent in both engines (the q1 pattern, Relational.scala).
  * l_quantity is integral-valued in this dataset, so double quantity sums
  * are exact too; they still go through DECIMAL for uniformity.
  */
object TpchTail {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def asDouble(c: Column): Column = c.cast("double")

  /** Derived partsupp (see scaladoc above). Two cost flavors:
    *  - `ps_supplycost`: per-unit MIN of doubles — exact and
    *    order-independent (IEEE min/div are engine-identical), used where
    *    the query only COMPARES costs (Q2). Never cast it to DECIMAL: a
    *    computed double quantized to decimal can round a final ulp
    *    differently across engines.
    *  - `ps_lotcost`: MIN of the raw price as DECIMAL(18,2) — exact at
    *    source, safe to multiply/sum in decimal arithmetic (Q9, Q11).
    */
  def derivedPartsupp(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(
        sum(dec(col("l_quantity"))).as("ps_availqty"),
        min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"),
        min(dec(col("l_extendedprice"))).as("ps_lotcost"))

  private val psOracleCte: String =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ps_availqty,
      |    MIN(l_extendedprice / l_quantity) AS ps_supplycost,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_lotcost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- A31
  /** TPC-H Q2 shape — minimum-cost supplier: for each qualifying part,
    * the European supplier(s) offering the minimum derived supply cost.
    * Plan: the part filter (size + type, ~1/300 selective) broadcasts into
    * the derived-partsupp stream; the region-restricted supplier dim
    * broadcasts (suppliers × nation × region is a dim-side join tree);
    * the per-part MIN is a window over the already-filtered candidate set
    * (tiny), so the only full-data shuffle is the partsupp derivation.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val eur = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val pt = Tables.part(s, dir)
      .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
      .select("p_partkey", "p_name")
    // Both dimension filters land on the partsupp GROUPING KEYS, so they
    // commute with the aggregate: semi-filter the fact by the qualifying
    // part and supplier keys BEFORE the (part, supp) groupBy — the
    // derivation's exchange then carries the ~1/300 part slice × the
    // 1/5-region supplier slice instead of every lineitem pair (guide
    // §2.3, the r20 q17/q20 idiom; only the MIN the query compares is
    // computed). The name/acctbal decoration re-joins the same broadcast
    // dims above the aggregate, where the stream is candidate-sized.
    val cand = Tables.lineitem(s, dir)
      .join(broadcast(pt.select("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(eur.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      .join(broadcast(pt), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(eur), col("ps_suppkey") === col("s_suppkey"))
    cand
      .withColumn("__min", min(col("ps_supplycost"))
        .over(Window.partitionBy(col("p_partkey"))))
      .filter(col("ps_supplycost") === col("__min"))
      .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost")
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
  }

  val q2Oracle: String =
    s"""WITH $psOracleCte,
       |eur AS (
       |  SELECT s_suppkey, s_name, s_acctbal, n_name
       |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
       |cand AS (
       |  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost,
       |    MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS mincost
       |  FROM ps JOIN part ON ps_partkey = p_partkey
       |  JOIN eur ON ps_suppkey = s_suppkey
       |  WHERE p_size <= 15 AND p_type = 'LARGE')
       |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
       |FROM cand WHERE ps_supplycost = mincost
       |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  // ---------------------------------------------------------------- A32
  /** TPC-H Q8 shape — national market share: the NATION_8-supplied share
    * of ECONOMY-part revenue delivered to ASIA customers, per order year.
    * The fact-side joins (orders, then part/customer/supplier key maps,
    * then the 25-row nations) all broadcast their build sides; the order
    * date range is pushed to the orders scan before the fact join. The
    * one shuffle is the final 1-key aggregate. Numerator and denominator
    * are exact DECIMAL sums, divided once in double at the end.
    */
  def q8MarketShare(s: SparkSession, dir: String,
                    nation: String = "NATION_8", region: String = "ASIA",
                    ptype: String = "ECONOMY"): DataFrame = {
    val vol = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
    val cusRegion = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .join(Tables.region(s, dir).filter(col("r_name") === region),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__cn"))), col("c_nationkey") === col("__cn"))
      .select("c_custkey")
    val supNation = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("__sn"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("__sn"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === ptype)
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(broadcast(cusRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === nation, vol).otherwise(dec(lit(0)))).as("__num"),
        sum(vol).as("__den"))
      .select(col("o_year"),
        (asDouble(col("__num")) / asDouble(col("__den"))).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8Oracle: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CASE WHEN sn.n_name = 'NATION_8'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
      |    AS mkt_share
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- A33
  /** TPC-H Q9 shape — product-type profit: revenue minus derived supply
    * cost for '%widget%' parts, by supplier nation and order year. The
    * cost side uses the LOT cost (min observed DECIMAL price per pair, see
    * [[derivedPartsupp]]) so every term in the profit sum is exact decimal
    * arithmetic — no computed double is ever quantized. The widget part
    * filter broadcasts into BOTH the fact scan and the partsupp derivation
    * (filtering by the grouping key before the group is
    * semantics-preserving), so the (part, supp) re-join shuffles only the
    * widget slice of the fact — not all of lineitem.
    */
  def q9ProductProfit(s: SparkSession, dir: String,
                      namePattern: String = "%widget%"): DataFrame = {
    val pt = Tables.part(s, dir).filter(col("p_name").like(namePattern))
      .select("p_partkey")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
    // Per-pair lot cost as a WINDOW over the widget slice, not a
    // groupBy + self-join: the r20 job probe showed the self-join form
    // executing the scan + fan-out subtree TWICE (~1 s serialized apiece
    // at sf0.1) and paying a SortMergeJoin to reunite them. min() OVER
    // (PARTITION BY pair) attaches the identical group minimum to every
    // row from ONE pass — lineitem's pair keys are non-null, so the
    // inner-join-vs-window row sets coincide — and the window's
    // (part, supp) hash exchange replaces the join's, so the plan drops
    // one whole scan, one Exchange + HashAggregate pair, and the SMJ
    // (plans/r20/q9_product_profit_{before,after}.txt).
    val profit = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")) -
      col("ps_lotcost") * dec(col("l_quantity"))
    li.withColumn("ps_lotcost", min(dec(col("l_extendedprice")))
        .over(Window.partitionBy(col("l_partkey"), col("l_suppkey"))))
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("nation", "o_year")
      .agg(asDouble(sum(profit)).as("profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  val q9Oracle: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_lotcost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT n_name AS nation,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))
      |    - ps_lotcost * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ---------------------------------------------------------------- A34
  /** TPC-H Q11 shape — important stock: per-part derived inventory value
    * held by suppliers of two nations, keeping parts above a fraction of
    * the total. The grand total is a one-row aggregate broadcast back
    * over the per-part values (never a single-partition window). Value =
    * lot cost × quantity is a product of source-exact DECIMALs (see
    * [[derivedPartsupp]]) — order-independent, engine-portable; the
    * fraction threshold compares in double on both sides.
    */
  def q11ImportantStock(s: SparkSession, dir: String,
                        nations: Seq[String] = Seq("NATION_3", "NATION_7"),
                        fraction: Double = 0.001): DataFrame = {
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name").isin(nations: _*)).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    // The supplier filter lands on a partsupp GROUPING KEY, so it commutes
    // with the aggregate: semi-filter the fact by the two nations'
    // supplier keys BEFORE the (part, supp) groupBy — the derivation's
    // exchange carries the ~2/25-nation slice instead of every lineitem
    // pair (guide §2.3; same pushdown as q2), and only the two aggregates
    // the value formula needs are computed.
    val perPart = Tables.lineitem(s, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("ps_availqty"),
        min(dec(col("l_extendedprice"))).as("ps_lotcost"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_lotcost") * col("ps_availqty")).as("__v"))
    val total = perPart.agg(sum(col("__v")).as("__total"))
    perPart.join(broadcast(total))
      .filter(asDouble(col("__v")) > asDouble(col("__total")) * lit(fraction))
      .select(col("ps_partkey"), asDouble(col("__v")).as("value"))
      .orderBy(desc("value"), col("ps_partkey"))
  }

  val q11Oracle: String =
    s"""WITH $psOracleCte,
       |v AS (
       |  SELECT ps_partkey, SUM(ps_lotcost * ps_availqty) AS value
       |  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name IN ('NATION_3', 'NATION_7') GROUP BY 1)
       |SELECT ps_partkey, CAST(value AS DOUBLE) AS value FROM v
       |WHERE CAST(value AS DOUBLE) >
       |  (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM v)
       |ORDER BY value DESC, ps_partkey""".stripMargin

  // ---------------------------------------------------------------- A35
  /** TPC-H Q12 shape, delay-bucket adaptation (no l_shipmode /
    * l_receiptdate in this schema): order-to-ship latency buckets vs
    * order priority. The ship-date year filter is pushed to the lineitem
    * scan; the orders join carries only (key, date, priority); one 1-key
    * aggregate shuffle with map-side combine.
    */
  def q12ShipDelay(s: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_bucket",
        when(days < 30, "fast").when(days < 60, "medium").otherwise("slow"))
      .groupBy("delay_bucket")
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("delay_bucket")
  }

  val q12Oracle: String =
    """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
      |         WHEN date_diff('day', o_orderdate, l_shipdate) < 60 THEN 'medium'
      |         ELSE 'slow' END AS delay_bucket,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- A36
  /** TPC-H Q13 shape — customer order-count distribution, including
    * zero-order customers (the LEFT join is the point of Q13). The
    * priority filter stands in for the original comment anti-pattern and
    * is applied to orders BEFORE the join (equivalent to the ON-clause
    * form since it touches only the right side). Two aggregate shuffles:
    * orders→custkey (map-combined), then the tiny count-of-counts.
    */
  /** Library core of Q13: distribution of per-customer order counts,
    * zero-order customers included. `customer` needs `c_custkey`; `orders`
    * needs `o_orderkey`, `o_custkey` (pre-filter it for any predicate —
    * equivalent to the ON-clause form since predicates touch only orders).
    *
    * Orders aggregate BEFORE the join (r17): the old left-join-then-count
    * shuffled every orders row on custkey just to count it on the other
    * side; counting first is map-side combined, so the join's orders leg
    * carries one row per customer with orders — at 100 TB the exchange
    * drops from the order volume to the customer cardinality. Zero-order
    * customers arrive as the left join's nulls → coalesce 0, exactly the
    * count(o_orderkey)=0 the join form produced.
    */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"))
    customer.select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  def q13CustDistribution(s: SparkSession, dir: String): DataFrame =
    orderCountDistribution(
      Tables.customer(s, dir),
      Tables.orders(s, dir).filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"))

  val q13Oracle: String =
    """WITH c_orders AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY 1)
      |SELECT c_count, COUNT(*) AS custdist FROM c_orders
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- A37
  /** TPC-H Q16 shape — supplier count by part descriptor over the derived
    * part-supplier relationship (DISTINCT pairs from lineitem), excluding
    * negative-balance suppliers (the complaints stand-in) via a broadcast
    * anti join. The broadcast filter joins run BEFORE any shuffle — a
    * pre-join pair-distinct would force Catalyst to keep the full
    * unfiltered pair set on the wire (a join can't push below an
    * Aggregate), carrying 3–6× more data than survives the part filter.
    * countDistinct's partial aggregation dedupes map-side, so the ONE
    * shuffle carries only filtered (brand,type,size,suppkey) tuples.
    */
  def q16SupplierCnt(s: SparkSession, dir: String,
                     sizes: Seq[Int] = Seq(1, 4, 9, 14, 19, 23, 36, 45)): DataFrame = {
    val pairs = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey")
    val pt = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    pairs
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Oracle: String =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM pairs JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------- A38
  /** TPC-H Q17 shape — small-quantity-order revenue: lines under half the
    * part's average quantity, for one brand+type slice. The per-part
    * average is computed over ALL lineitem rows of the qualifying parts
    * (the correlated subquery's semantics), as an exact DECIMAL sum /
    * count; the brand filter broadcasts into both the fact scan and the
    * average, so nothing unfiltered ever shuffles.
    */
  def q17SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select("p_partkey")
    val li = Tables.lineitem(s, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("__pk"))
      .agg((asDouble(sum(dec(col("l_quantity")))) / count(lit(1))).as("__avg"))
    // avgQty has one row per QUALIFYING part (~1/300 of part after the
    // brand+type slice) — broadcast it explicitly rather than trusting
    // stats: at 100× a size misestimate would otherwise plan this
    // fact-side join as a full shuffle of the filtered lineitem.
    li.join(broadcast(avgQty), col("l_partkey") === col("__pk"))
      .filter(col("l_quantity") < lit(0.5) * col("__avg"))
      .agg((asDouble(sum(dec(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
  }

  val q17Oracle: String =
    """WITH pp AS (
      |  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
      |pa AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS aq
      |  FROM lineitem JOIN pp ON l_partkey = p_partkey GROUP BY 1)
      |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN pp ON lineitem.l_partkey = p_partkey
      |JOIN pa ON pa.l_partkey = lineitem.l_partkey
      |WHERE l_quantity < 0.5 * aq""".stripMargin

  // ---------------------------------------------------------------- A39
  /** TPC-H Q20 shape — dominant shippers: suppliers who shipped more than
    * half of a '%bolt%' part's total 1996 volume, reported with their
    * nation. The nested aggregate (per-pair quantity, then the per-part
    * window total over the filtered slice) never touches unfiltered data;
    * the surviving supplier keys broadcast into a semi join against the
    * supplier dim. Quantity sums are integral-exact doubles.
    */
  def q20ExcessShipper(s: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(s, dir).filter(col("p_name").like("%bolt%"))
      .select("p_partkey")
    val shipped = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(asDouble(sum(dec(col("l_quantity")))).as("qty"))
    val dom = shipped
      .withColumn("__total", sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty") > lit(0.5) * col("__total"))
      .select("l_suppkey").distinct()
    Tables.supplier(s, dir)
      .join(broadcast(dom), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "n_name")
      .orderBy("s_name")
  }

  val q20Oracle: String =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      |  GROUP BY 1, 2),
      |dom AS (
      |  SELECT DISTINCT l_suppkey FROM (
      |    SELECT l_suppkey, qty, SUM(qty) OVER (PARTITION BY l_partkey) AS total
      |    FROM shipped) t
      |  WHERE qty > 0.5 * total)
      |SELECT s_name, n_name FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
      |ORDER BY s_name""".stripMargin

  // ---------------------------------------------------------------- A40
  /** TPC-H Q21 shape — the straggler supplier (no l_commitdate in this
    * schema, so "kept the order waiting" becomes: in a finished order
    * involving ≥2 suppliers, THIS supplier's last ship date is strictly
    * later than every other supplier's — the original's exists /
    * not-exists pair re-expressed). Plan: one (order, supp) aggregate
    * shuffle, then two chained window passes over the SAME order-key
    * partitioning (Catalyst plans one exchange for both), then a
    * broadcast join to supplier names and a tiny top-k.
    */
  /** Library core of Q21: per qualifying order, the supplier whose last
    * ship date is STRICTLY later than every other supplier's (≥2 suppliers
    * involved; a tie at the max blames nobody). Returns one
    * (l_orderkey, l_suppkey) row per blamed supplier.
    */
  def stragglerBlame(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    // ONE order-key shuffle feeds the whole pipeline: hash-partitioning on
    // l_orderkey satisfies the (l_orderkey, l_suppkey) aggregate's
    // clustering requirement AND both window passes', so Catalyst plans no
    // further exchange. The alternative (agg on the composite key, then
    // re-shuffle the pairs for the windows) moves ~2x the bytes.
    val sl = lineitem
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate")).as("smax"))
    val w = Window.partitionBy(col("l_orderkey"))
    sl.withColumn("omax", max(col("smax")).over(w))
      .withColumn("nsupp", count(lit(1)).over(w))
      .withColumn("at_max", sum(when(col("smax") === col("omax"), 1L).otherwise(0L)).over(w))
      .filter(col("smax") === col("omax") && col("nsupp") >= 2 && col("at_max") === 1)
      .select("l_orderkey", "l_suppkey")
  }

  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame =
    stragglerBlame(
      Tables.lineitem(s, dir),
      Tables.orders(s, dir).filter(col("o_orderstatus") === "F"))
      .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(100)

  val q21Oracle: String =
    """WITH sl AS (
      |  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY 1, 2),
      |om AS (
      |  SELECT l_orderkey, MAX(smax) AS omax, COUNT(*) AS nsupp,
      |    COUNT(*) FILTER (WHERE smax = omax2) AS at_max
      |  FROM (SELECT *, MAX(smax) OVER (PARTITION BY l_orderkey) AS omax2 FROM sl) t
      |  GROUP BY 1),
      |blame AS (
      |  SELECT sl.l_suppkey
      |  FROM sl JOIN om USING (l_orderkey)
      |  WHERE sl.smax = om.omax AND om.nsupp >= 2 AND om.at_max = 1)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM blame JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost_supplier"  -> (q2MinCostSupplier _),
    "q8_market_share"       -> ((s: SparkSession, d: String) => q8MarketShare(s, d)),
    "q9_product_profit"     -> ((s: SparkSession, d: String) => q9ProductProfit(s, d)),
    "q11_important_stock"   -> ((s: SparkSession, d: String) => q11ImportantStock(s, d)),
    "q12_ship_delay"        -> (q12ShipDelay _),
    "q13_cust_distribution" -> (q13CustDistribution _),
    "q16_supplier_cnt"      -> ((s: SparkSession, d: String) => q16SupplierCnt(s, d)),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q20_excess_shipper"    -> (q20ExcessShipper _),
    "q21_waiting_supplier"  -> (q21WaitingSupplier _))

  val oracles: Map[String, String] = Map(
    "q2_min_cost_supplier"  -> q2Oracle,
    "q8_market_share"       -> q8Oracle,
    "q9_product_profit"     -> q9Oracle,
    "q11_important_stock"   -> q11Oracle,
    "q12_ship_delay"        -> q12Oracle,
    "q13_cust_distribution" -> q13Oracle,
    "q16_supplier_cnt"      -> q16Oracle,
    "q17_small_qty_revenue" -> q17Oracle,
    "q20_excess_shipper"    -> q20Oracle,
    "q21_waiting_supplier"  -> q21Oracle)
}
