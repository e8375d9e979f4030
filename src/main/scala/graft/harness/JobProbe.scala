package graft.harness

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall breakdown for one or more `SparkEntry.queries` entries —
  * the measurement the optimization loop needs for multi-action operators
  * (the dba_* lifecycle family runs a table build + merge + delete +
  * read-back as SEPARATE Spark jobs, so a single end-to-end number says
  * nothing about WHICH step is worth optimizing).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_QUERIES=a,b \
  *          SPARK_GRAFT_CPUS=32 runMain graft.harness.JobProbe [runs]
  *
  * Prints, per query, each Spark job's wall seconds, task count and the
  * first line of its call site, plus the DataFrame-construction time
  * (lifecycle side effects run at construction) vs the noop-sink
  * execution time. Jobs are attributed by registration order; timings are
  * minima over `runs` repeats (default 2) to damp host noise.
  */
object JobProbe {
  private final case class JobRow(desc: String, site: String, ms: Long,
                                  tasks: Int, stages: Int, cpuMs: Long)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.flatMap(_.toIntOption).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobStart = mutable.Map.empty[Int, (Long, String, String)]
    val taskCount = mutable.Map.empty[Int, Int]
    val cpuMs = mutable.Map.empty[Int, Long]
    val stageToJob = mutable.Map.empty[Int, Int]
    val rows = mutable.ArrayBuffer.empty[JobRow]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobStart(js.jobId) = (System.nanoTime(), desc, site)
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrElse(sc.stageInfo.stageId, -1)
        taskCount(jid) = taskCount.getOrElse(jid, 0) + sc.stageInfo.numTasks
        cpuMs(jid) = cpuMs.getOrElse(jid, 0L) +
          sc.stageInfo.taskMetrics.executorRunTime
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, desc, site) =>
          rows += JobRow(desc, site, (System.nanoTime() - t0) / 1000000,
            taskCount.getOrElse(je.jobId, 0),
            stageToJob.count(_._2 == je.jobId),
            cpuMs.getOrElse(je.jobId, 0L))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warmup: absorb session/codegen startup like Bench does
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val wanted = graft.SparkEntry.querySubset
      .getOrElse(sys.error("set SPARK_GRAFT_QUERIES"))
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
           if wanted(name)) {
      var best: (Double, Double, Seq[JobRow]) = (Double.MaxValue, 0.0, Nil)
      for (_ <- 1 to runs) {
        spark.catalog.clearCache(); System.gc()
        rows.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        df.write.format("noop").mode("overwrite").save()
        val tTotal = (System.nanoTime() - t0) / 1e9
        if (tTotal < best._1) best = (tTotal, tBuild, rows.toSeq)
      }
      println(f"===== $name  total=${best._1}%.3f s (construct=${best._2}%.3f s, execute=${best._1 - best._2}%.3f s)")
      best._3.zipWithIndex.foreach { case (r, i) =>
        val label = if (r.desc.nonEmpty) r.desc else r.site
        println(f"  job $i%2d ${r.ms}%6d ms wall  ${r.cpuMs}%6d ms cpu  ${r.tasks}%4d tasks  $label")
      }
    }
    spark.stop()
  }
}
