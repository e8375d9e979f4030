package graft

import org.apache.spark.sql.functions._

import graft.operators.LakehouseOps

/** Pins the native Md5HllCode register kernel bit-equal to the r18
  * hex-string SQL chain it replaced in tableStatsApprox's register pass
  * (the DuckDB oracle still evaluates that chain, so this equivalence IS
  * the oracle-parity argument for the fused expression).
  */
class HllKernelSpec extends SparkSpec {

  test("Md5HllCode == the hex-substring/TRIM/CASE SQL chain, value sweep") {
    // the audited value domain: plain-decimal doubles (the operator's
    // portability caveat), plus exact decades, negatives, and the
    // all-leading-zero-prone dense small-int band
    val vals = spark.range(20000).selectExpr(
        "CAST(id AS DOUBLE) / 16.0 - 200.0 AS v")
      .unionAll(spark.range(200).selectExpr("CAST(id AS DOUBLE) AS v"))
      .unionAll(spark.sql("SELECT CAST(0.001 AS DOUBLE) AS v " +
        "UNION ALL SELECT 9999999.0 UNION ALL SELECT 0.0"))
    val both = vals
      .withColumn("code",
        graft.functions.PortableHash.md5_hll_code(col("v").cast("string")))
      .withColumn("h", md5(col("v").cast("string").cast("binary")))
      .withColumn("bkt_old", expr("conv(substring(h, 1, 3), 16, 10)").cast("int"))
      .withColumn("tail", expr("substring(h, 4, 13)"))
      .withColumn("z", expr("13 - length(TRIM(LEADING '0' FROM tail))"))
      .withColumn("d", expr("substring(TRIM(LEADING '0' FROM tail), 1, 1)"))
      .withColumn("rho_old", expr(LakehouseOps.hllRhoSql))
    val bad = both.filter(
      expr("(code >> 6) <> bkt_old OR (code & 63) <> rho_old"))
    assert(bad.isEmpty,
      s"kernel mismatch on: ${bad.limit(5).collect().mkString(", ")}")
    // null propagates (callers coalesce into the 4096 sentinel bucket)
    val n = spark.sql("SELECT CAST(NULL AS DOUBLE) AS v")
      .select(graft.functions.PortableHash.md5_hll_code(col("v").cast("string"))
        .as("code")).collect()(0)
    assert(n.isNullAt(0))
  }
}
