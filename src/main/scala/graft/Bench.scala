package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Each query is executed `SPARK_GRAFT_RUNS` times (default 3) and the
  * reported per-query number is the MEDIAN of those runs (per-query minima
  * are emitted alongside under "queries_min"). Single-shot timings on a
  * shared 32-core box swing ±3× on host noise — round 2's driver run
  * recorded 197 s for a suite that re-ran at 69 s. Medians make the bench
  * self-adjudicating: an outlier run cannot dominate the headline number.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) 0.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).filter(_ > 0).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: absorb session/codegen/parquet-footer startup so the first
    // measured query isn't charged for it.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // Optional subset for local iteration (SparkEntry owns the contract).
    val only = SparkEntry.querySubset
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Interleave whole-suite passes (run 1 of everything, then run 2, ...)
    // rather than back-to-back repeats of one query: a transient host stall
    // then lands in at most one sample of each query instead of all three
    // samples of whichever query was running.
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val failures = scala.collection.mutable.Map.empty[String, Int]
    for (_ <- 1 to runs; (name, fn) <- names) {
      val t0 = System.nanoTime()
      // noop sink: every operator/projection actually executes (count()
      // would let Catalyst prune the computed columns away).
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failures(name) = failures.getOrElse(name, 0) + 1
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // A failed run's fast-abort elapsed is NOT a sample — recording it
      // would let a broken query masquerade as a fast one in the medians.
      if (ok) samples(name) = samples.getOrElse(name, Nil) :+ dt
      // release operator-owned persists (e.g. the jaccard posting list)
      // between queries: keeps repeated runs measuring the cold path
      // instead of a cache hit, and stops evictable InMemoryRelations
      // accumulating across the suite
      spark.catalog.clearCache()
    }
    val measured = names.filter { case (n, _) => samples.contains(n) }
    val med = measured.map { case (n, _) => n -> median(samples(n)) }
    val mins = measured.map { case (n, _) => n -> samples(n).min }
    def toJson(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = failures.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = med.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":${toJson(med)},"queries_min":${toJson(mins)},"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
