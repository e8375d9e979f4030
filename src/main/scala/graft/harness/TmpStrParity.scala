package graft.harness
object TmpStrParity extends App {
  val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
    .config("spark.sql.shuffle.partitions", 16)
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  for (sf <- Seq("sf0.01", "sf0.1")) {
    val li = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")) {
      li.selectExpr(s"CAST($c AS STRING) AS s").distinct()
        .coalesce(1).write.mode("overwrite").parquet(s"/tmp/strparity/$sf/$c")
    }
  }
  spark.stop()
}
