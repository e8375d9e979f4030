package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.maintenance.TableMaintenance

class MaintenanceSpec extends SparkSpec {

  test("listFiles inventories data files, skipping _SUCCESS/hidden") {
    val files = TableMaintenance.listFiles(spark, sf)
    val names = files.select("file").collect().map(_.getString(0)).toSet
    assert(names.exists(_.startsWith("lineitem")))
    assert(!names.exists(_.startsWith("_")))
    assert(files.filter(col("bytes") <= 0).count() == 0)
  }

  test("compact rewrites to the derived file count; data survives") {
    val out = Files.createTempDirectory("graft_compact").toString
    TableMaintenance.compact(spark, s"$sf/lineitem.parquet", out,
      targetBytes = 64L * 1024)
    val before = spark.read.parquet(s"$sf/lineitem.parquet")
    val after = TableMaintenance.readTable(spark, out)
    assert(after.count() == before.count())
    assert(TableMaintenance.listFiles(spark, out)
      .filter(col("file").endsWith(".parquet")).count() >= 2)
  }

  test("zorderWrite clusters: each file covers a tight z-range") {
    val out = Files.createTempDirectory("graft_zorder").toString
    val part = spark.read.parquet(s"$sf/part.parquet")
    TableMaintenance.zorderWrite(part, Seq("p_partkey", "p_size"), out, 4)
    val reread = TableMaintenance.readTable(spark, out)
    assert(reread.count() == part.count())
    assert(reread.columns.toSet == part.columns.toSet) // __zkey dropped
    // range-partitioned on zkey → per-file zkey ranges are disjoint
    val zf = reread
      .withColumn("z", graft.functions.ZOrder.zvalue(
        Seq(col("p_partkey"), col("p_size")), 16))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect()
    zf.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"))
      case _ =>
    }
  }

  test("versioned OPTIMIZE: crash-safe, time-travelable, history per version") {
    val dir = Files.createTempDirectory("graft_ver").toString
    // seed a bare (never-versioned) table
    val seed = spark.range(1000).selectExpr("id", "id * 2 AS x")
    seed.write.mode("overwrite").parquet(dir)
    // v0: compaction of the bare dir — pre-OPTIMIZE data must stay put
    val v0 = TableMaintenance.compactVersioned(spark, dir, targetBytes = 8L * 1024)
    assert(v0 == 0L)
    assert(TableMaintenance.readTable(spark, dir).count() == 1000)
    // kill-mid-rewrite simulation: a version dir WITHOUT _SUCCESS
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    seed.limit(10).write.mode("overwrite").parquet(s"$dir/v=1")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=1/_SUCCESS"), false)
    // readers skip the uncommitted version: previous snapshot still serves
    assert(TableMaintenance.currentSnapshotDir(spark, dir).endsWith("v=0"))
    assert(TableMaintenance.readTable(spark, dir).count() == 1000)
    // the retried rewrite claims the NEXT slot, never the crashed one
    val v2 = TableMaintenance.zorderVersioned(spark, dir, Seq("id", "x"), 2)
    assert(v2 == 2L)
    assert(TableMaintenance.readTable(spark, dir).count() == 1000)
    // time travel: v0 still readable; history carries both rewrites
    assert(TableMaintenance.readVersion(spark, dir, 0L).count() == 1000)
    val hist = TableMaintenance.history(spark, dir).collect()
    assert(hist.map(_.getAs[String]("op")).toSeq ==
      Seq("OPTIMIZE ZORDER", "OPTIMIZE"))
    // vacuum: keeps the newest committed version, sweeps v0 + the leftover
    val swept = TableMaintenance.vacuumVersions(spark, dir)
    assert(swept == 2L)
    assert(TableMaintenance.committedVersions(spark, dir) == Seq(2L))
    assert(TableMaintenance.readTable(spark, dir).count() == 1000)
    // the unreachable pre-versioning bare-root files are reclaimed too —
    // only protocol dirs (v=*) and metadata (_graft_history) survive
    val rootLeft = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("v=") || n.startsWith("_") || n.startsWith("."))
    assert(rootLeft.isEmpty, s"bare files leaked: ${rootLeft.mkString(",")}")
    intercept[IllegalArgumentException] {
      TableMaintenance.readVersion(spark, dir, 0L)
    }
  }

  test("compact reads through crash-leftover v= dirs; vacuum spares parked files") {
    val dir = Files.createTempDirectory("graft_leftover").toString
    spark.range(500).selectExpr("id", "id * 3 AS y")
      .write.mode("overwrite").parquet(dir)
    // crashed first compaction: v=0 exists but was never committed
    spark.range(10).toDF("id").write.mode("overwrite").parquet(s"$dir/v=0")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v=0/_SUCCESS"), false)
    // a file the operator parked next to the table — not ours to touch
    val parked = new org.apache.hadoop.fs.Path(s"$dir/backup.parquet")
    fs.create(parked, true).close()
    // the retry must read ONLY the bare snapshot (partition discovery
    // would reject the mixed layout) and claim the next version slot
    val v = TableMaintenance.compactVersioned(spark, dir, targetBytes = 8L * 1024)
    assert(v == 1L)
    assert(TableMaintenance.readTable(spark, dir).count() == 500)
    TableMaintenance.vacuumVersions(spark, dir)
    assert(fs.exists(parked), "vacuum deleted a caller-parked file")
    assert(TableMaintenance.readTable(spark, dir).count() == 500)
  }

  test("logOp/history: DESCRIBE HISTORY equivalent round-trips, newest first") {
    val dir = Files.createTempDirectory("graft_hist").toString
    TableMaintenance.logOp(spark, dir, "WRITE", Map("rows" -> "100"))
    TableMaintenance.logOp(spark, dir, "OPTIMIZE", Map("files" -> "3"))
    TableMaintenance.logOp(spark, dir, "VACUUM")
    val h = TableMaintenance.history(spark, dir).collect()
    assert(h.length == 3)
    assert(h.map(_.getAs[String]("op")).toSeq == Seq("VACUUM", "OPTIMIZE", "WRITE"))
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(2L, 1L, 0L))
  }

  test("partitionedWrite: filters prune at the partition-directory level") {
    val out = Files.createTempDirectory("graft_part").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
    TableMaintenance.partitionedWrite(ev, Seq("event_type"), out)
    val df = spark.read.parquet(out).filter(col("event_type") === "click")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("event_type"))
    // only the matching partition's rows come back
    assert(df.count() ==
      ev.filter(col("event_type") === "click").count())
    // and the scan reports exactly one partition directory worth of files
    val files = df.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("event_type=click")))
  }

  test("compact and zorderWrite land in the history log; listFiles skips it") {
    val out = Files.createTempDirectory("graft_compact_hist").toString
    TableMaintenance.compact(spark, s"$sf/part.parquet", out,
      targetBytes = 64L * 1024)
    val h = TableMaintenance.history(spark, out).collect()
    assert(h.head.getAs[String]("op") == "OPTIMIZE")
    // the history JSONs must not show up as data files (or a re-compaction
    // would count them toward the table's bytes)
    assert(TableMaintenance.listFiles(spark, out)
      .filter(col("file").endsWith(".json")).count() == 0)
    val out2 = Files.createTempDirectory("graft_zorder_hist").toString
    TableMaintenance.zorderWrite(spark.read.parquet(s"$sf/part.parquet"),
      Seq("p_partkey", "p_size"), out2, 2)
    val h2 = TableMaintenance.history(spark, out2).collect()
    assert(h2.head.getAs[String]("op") == "OPTIMIZE ZORDER")
    assert(h2.head.getAs[String]("zorder_by") == "p_partkey,p_size")
  }

  test("analyzePersist: the optimizer sees persisted catalog stats") {
    val rows = spark.read.parquet(s"$sf/part.parquet").count()
    TableMaintenance.analyzePersist(spark, "graft_part_stats",
      s"$sf/part.parquet", Seq("p_partkey", "p_size"))
    withConf("spark.sql.cbo.enabled" -> "true") {
      val stats = spark.table("graft_part_stats")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(rows)),
        s"catalog rowCount not visible to the optimizer: $stats")
      assert(stats.attributeStats.nonEmpty, "column stats missing")
    }
  }

  test("history survives a second rewrite of the same target directory") {
    val out = Files.createTempDirectory("graft_hist_keep").toString
    TableMaintenance.compact(spark, s"$sf/part.parquet", out,
      targetBytes = 64L * 1024)
    TableMaintenance.zorderWrite(spark.read.parquet(s"$sf/part.parquet"),
      Seq("p_partkey", "p_size"), out, 2)
    val ops = TableMaintenance.history(spark, out).collect()
      .map(_.getAs[String]("op")).toSeq
    // rewrites commit as new versions, never overwriting the root — the
    // log accumulates without any byte-copy workaround
    assert(ops == Seq("OPTIMIZE ZORDER", "OPTIMIZE"))
  }

  test("listFiles works for a table living in an underscore directory") {
    val root = Files.createTempDirectory("graft_root").toString
    val hidden = new java.io.File(root, "_staging")
    hidden.mkdirs()
    Files.write(new java.io.File(hidden, "data.parquet").toPath, Array[Byte](1, 2))
    val files = TableMaintenance.listFiles(spark, hidden.toString)
    // only components BELOW the listed root are hidden-filtered
    assert(files.count() == 1)
  }

  test("dbaDescribeDetail inventories real file names (not post-shuffle blanks)") {
    val det = graft.operators.LakehouseOps.dbaDescribeDetail(spark, sf).collect()
    assert(det.nonEmpty)
    assert(det.forall(_.getAs[String]("file").endsWith(".parquet")))
    assert(det.forall(_.getAs[Long]("n_rows") > 0))
  }

  test("bucketed tables join and merge with zero exchanges") {
    import graft.operators.LakehouseOps
    TableMaintenance.bucketedWrite(
      spark.read.parquet(s"$sf/orders.parquet"), Seq("o_orderkey"), 4,
      "graft_orders_b")
    TableMaintenance.bucketedWrite(
      spark.read.parquet(s"$sf/lineitem.parquet"), Seq("l_orderkey"), 4,
      "graft_lineitem_b")
    // disable broadcast: at this test scale AQE would broadcast either
    // way, and a broadcast join has no key exchange regardless of
    // bucketing — only a SortMergeJoin makes the assertion meaningful
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("graft_lineitem_b")
        .join(spark.table("graft_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // co-located: the join itself introduces no shuffle on either side
      // (the only exchange is the tiny post-join groupBy)
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$plan")
      // (partition-local Sorts remain: Spark only trusts write-time sort
      // order with exactly one file per bucket — the exchange elimination
      // above is the scale win, a local sort is cheap)
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    }
    // and the same co-location carries the MERGE: upserting bucketed
    // source into bucketed target shuffles neither input
    val merged = LakehouseOps.mergeUpsert(
      spark.table("graft_orders_b"), spark.table("graft_orders_b"),
      Seq("o_orderkey"))
    assert(merged.count() == spark.table("graft_orders_b").count())
  }

  test("retentionPlan selects only files older than the watermark") {
    import spark.implicits._
    val files = Seq(("old", 10L, 1000L), ("new", 10L, 5000L))
      .toDF("file", "bytes", "mtime_ms")
    val plan = TableMaintenance.retentionPlan(files, 2000L)
    assert(plan.select("file").as[String].collect().toSeq == Seq("old"))
  }

  test("applyRetention deletes expired files, keeps the rest, logs the op") {
    val dir = Files.createTempDirectory("graft_vacuum").toString
    val oldF = new java.io.File(dir, "part-old.parquet")
    val newF = new java.io.File(dir, "part-new.parquet")
    Files.write(oldF.toPath, Array[Byte](1)); oldF.setLastModified(1000L)
    Files.write(newF.toPath, Array[Byte](2)); newF.setLastModified(System.currentTimeMillis())
    val deleted = TableMaintenance.applyRetention(spark, dir,
      keepAfterMtimeMs = System.currentTimeMillis() - 60_000)
    assert(deleted == 1)
    assert(!oldF.exists() && newF.exists())
    val hist = TableMaintenance.history(spark, dir).collect()
    assert(hist.head.getAs[String]("op") == "VACUUM")
  }
}
