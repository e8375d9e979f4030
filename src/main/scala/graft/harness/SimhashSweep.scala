package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the simhash banding cutovers
  * ([[graft.dedup.Dedup.HammingWideThreshold]] and the near-dup gate's
  * [[graft.dedup.Dedup.GateWideThreshold]]): times the op under BOTH
  * banding schemes across a sweep of corpus sizes, so each narrow→wide
  * switch point is a measured crossover, not a guess.
  * `SPARK_GRAFT_SWEEP_OP=nn` (default) sweeps `simhashNn`; `gate` sweeps
  * `simhashNearDupIds` — the two have different crossovers because the
  * gate filters candidates to hamming ≤ 3 before a distinct (narrow's
  * extra collisions die in a cheap filter) while the NN report
  * aggregates the full candidate volume.
  *
  * Corpora are synthetic replicas of the sf0.1 documents table (shifted
  * ids, per-replica near-dup suffix — the same weak-scaling recipe as
  * tools/gen_scale.py), written to scratch parquet so scan shape is
  * honest. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.harness.SimhashSweep"
  * Prints one line per (size, scheme) with the min-of-runs seconds.
  */
object SimhashSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(3)
    val factors = sys.env.getOrElse("SPARK_GRAFT_SWEEP_FACTORS", "1,4,10,20,40")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    val n0 = base.count()
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L

    def replica(factor: Int): DataFrame =
      (0 until factor).map { r =>
        if (r == 0) base
        else base.select(
          (col("doc_id") + lit(r * stride)).as("doc_id"),
          concat(col("text"), lit(s" r$r")).as("text"))
      }.reduce(_ unionByName _)

    for (f <- factors) {
      val dir = java.nio.file.Files.createTempDirectory(s"simhash_sweep_$f")
        .toString + "/docs"
      replica(f).repartition(math.max(4, f)).write.parquet(dir)
      val docs = spark.read.parquet(dir)
      val n = n0 * f
      val op = sys.env.getOrElse("SPARK_GRAFT_SWEEP_OP", "nn")
      for ((label, thr) <- Seq("narrow" -> Long.MaxValue, "wide" -> 0L)) {
        val ts = (1 to runs).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          (op match {
            case "gate" =>
              graft.dedup.Dedup.simhashNearDupIds(docs, wideThreshold = thr)
            case _ => graft.dedup.Dedup.simhashNn(docs, wideThreshold = thr)
          }).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"SWEEP op=$op docs=$n%-8d scheme=$label%-6s min=${ts.min}%.2fs " +
          s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
