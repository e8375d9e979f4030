package graft.harness
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object TmpStatsProbe extends App {
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def time[A](l: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
    println(f"[p] $l%-14s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r }
  val dir = "/root/testdata/sf0.1"
  val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  for (round <- 1 to 2) {
    println(s"[p] --- round $round")
    val df = graft.Tables.lineitem(spark, dir)
    val melt = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val melted = df.select(expr(s"stack(${cols.size}, $melt) AS (column_name, v)"))
    time("melt.count")(melted.count())
    val freq0 = melted.groupBy("column_name", "v").agg(count(lit(1)).as("freq"))
    time("freq.noop")(freq0.write.format("noop").mode("overwrite").save())
    val freq = time("freq.ckpt")(freq0.localCheckpoint(true))
    time("stats")(freq.groupBy("column_name").agg(min("v"), max("v"),
      sum(when(col("v").isNull, col("freq")).otherwise(lit(0L))))
      .write.format("noop").mode("overwrite").save())
    val wCum = Window.partitionBy("column_name").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p50 = freq.filter(col("v").isNotNull)
      .withColumn("cum", sum("freq").over(wCum))
      .withColumn("n", sum("freq").over(Window.partitionBy("column_name")))
      .withColumn("h", (col("n") - 1L).cast("double") * lit(0.5))
      .groupBy("column_name").agg(
        (min(when(col("cum") >= expr("CAST(FLOOR(h) AS BIGINT) + 1"), col("v"))) +
          (max(col("h")) - expr("FLOOR(MAX(h))")) *
          (min(when(col("cum") >= expr("CAST(CEILING(h) AS BIGINT) + 1"), col("v"))) -
            min(when(col("cum") >= expr("CAST(FLOOR(h) AS BIGINT) + 1"), col("v"))))).as("p50_val"))
    time("p50")(p50.write.format("noop").mode("overwrite").save())
    import graft.operators.LakehouseOps
    val ndv = freq.filter(col("v").isNotNull)
      .withColumn("h", md5(col("v").cast("string").cast("binary")))
      .withColumn("bkt", expr("substring(h, 1, 3)"))
      .withColumn("tail", expr("substring(h, 4, 13)"))
      .withColumn("z", expr("CAST(length(regexp_extract(tail, '^0*', 0)) AS INT)"))
      .withColumn("d", expr("substring(tail, z + 1, 1)"))
      .withColumn("rho", expr(LakehouseOps.hllRhoSql))
      .groupBy("column_name", "bkt").agg(max("rho").as("rmax"))
    time("ndv.regs")(ndv.write.format("noop").mode("overwrite").save())
    time("full")(LakehouseOps.dbaTableStatsApprox(spark, dir)
      .write.format("noop").mode("overwrite").save())
  }
  spark.stop()
}
