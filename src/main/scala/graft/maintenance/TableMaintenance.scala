package graft.maintenance

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.operators.LakehouseOps

/** The maintenance sweep the reference schedules nightly
  * (resources/TPC-datagen-notebook.scala:1979-2354): OPTIMIZE (compaction +
  * ZORDER clustering), VACUUM (retention sweep), DESCRIBE DETAIL (file
  * inventory) — rebuilt Spark-native over plain parquet directories.
  *
  * File *metadata* is inherently small (one row per file, even a 100 TB
  * table is ~1e5 files at 1 GB each), so inventory/planning DFs are tiny;
  * the heavy work — the clustered rewrite itself — is fully distributed.
  */
object TableMaintenance {

  /** DESCRIBE DETAIL, filesystem half: (file, bytes, mtime_ms) for every
    * data file under `dir`. Driver-side Hadoop FS listing — metadata only.
    */
  def listFiles(spark: SparkSession, dir: String): DataFrame =
    listFiles(spark, dir, _ => false)

  /** Recursive DATA-file listing under `dir` as (relative path, bytes,
    * mtime): the ONE definition of "table data file" — hidden files AND
    * files inside hidden path components (e.g. the `_graft_history`
    * log) are metadata, not data; only components BELOW the table root
    * count, so a table that itself lives in `_staging/` still lists.
    * Shared by [[listFiles]] and MSCK partition discovery
    * ([[graft.GraftMsckRepairCommand]]) so hidden-path semantics can't
    * drift between them. Driver-side Hadoop FS listing — metadata only.
    */
  private[graft] def relDataFiles(spark: SparkSession,
                                  dir: String): Seq[(String, Long, Long)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(path).toUri
    val it = fs.listFiles(path, true)
    Iterator.continually(it)
      .takeWhile(_.hasNext)
      .map(_.next())
      .flatMap { st =>
        val rel = root.relativize(st.getPath.toUri).getPath
        val comps = rel.split("/")
        if (comps.forall(c => !c.startsWith("_") && !c.startsWith(".")))
          Some((rel, st.getLen, st.getModificationTime))
        else None
      }
      .toSeq
  }

  /** As above, additionally pruning files whose top-level path component
    * (relative to `dir`) matches `dropTopLevel` — e.g. `v=` snapshot dirs
    * when sizing a bare-root rewrite.
    */
  def listFiles(spark: SparkSession, dir: String,
                dropTopLevel: String => Boolean): DataFrame = {
    val rows = relDataFiles(spark, dir)
      .filter { case (rel, _, _) => !dropTopLevel(rel.split("/").head) }
      .map { case (rel, len, mtime) =>
        (rel.substring(rel.lastIndexOf('/') + 1), len, mtime)
      }
    import spark.implicits._
    rows.toDF("file", "bytes", "mtime_ms")
  }

  /** OPTIMIZE, compaction half: rewrite `inDir`'s data as ~targetBytes
    * files, committed as the NEXT snapshot version of `outDir` (v=N +
    * `_SUCCESS`). There is deliberately no in-place variant: a rewrite
    * that overwrites its own input can't be crash-safe, and overwrite
    * would delete the `_graft_history` log with the directory — versioned
    * commits make both problems structurally impossible. Output file
    * count derives from the real on-disk byte total, so the same call is
    * right at sf0.001 and at 100 TB (where you'd target ~1 GB files).
    * Returns the committed version id; read via [[readTable]].
    *
    * `inDir` must be a DATA directory (a bare snapshot or one v=N dir —
    * [[compactVersioned]] resolves that for a versioned table) and must
    * be non-empty: an empty table has nothing to lay out, so this throws
    * rather than committing a contentless version (callers wanting no-op
    * semantics check first).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    // Crash-leftover v=* dirs under a bare-root source must not inflate
    // the byte total the rewrite is sized from (listFiles already drops
    // _*/.* metadata such as the history log) — and Spark's partition
    // discovery would reject the mixed root-files + v=subdir layout
    // outright, so when leftovers are present the scan reads the root's
    // own data files explicitly instead of the directory.
    val totalRow = listFiles(spark, inDir, _.startsWith("v="))
      .agg(sum("bytes")).first()
    require(!totalRow.isNullAt(0), s"no data files under $inDir")
    val nFiles = math.max(1,
      math.ceil(totalRow.getLong(0).toDouble / targetBytes).toInt)
    val v = allVersions(spark, outDir).maxOption.map(_ + 1).getOrElse(0L)
    readDataDir(spark, inDir).repartition(nFiles)
      .write.mode("overwrite").parquet(s"$outDir/v=$v")
    logOp(spark, outDir, "OPTIMIZE", Map(
      "snapshot_version" -> v.toString,
      "source" -> inDir,
      "target_bytes" -> targetBytes.toString,
      "n_files" -> nFiles.toString))
    v
  }

  /** OPTIMIZE ZORDER BY, clustering half: compute the interleave key,
    * range-partition on it (each output file covers a tight key-space
    * rectangle → effective min/max skipping on later multi-column
    * filters), sort within partitions, drop the key, commit as the NEXT
    * snapshot version of `outDir`. Returns the committed version id.
    */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  nFiles: Int, bits: Int = 16): Long = {
    val spark = df.sparkSession
    val v = allVersions(spark, outDir).maxOption.map(_ + 1).getOrElse(0L)
    df.withColumn("__zkey", ZOrder.zvalue(cols.map(col), bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(s"$outDir/v=$v")
    logOp(spark, outDir, "OPTIMIZE ZORDER", Map(
      "snapshot_version" -> v.toString,
      "zorder_by" -> cols.mkString(","),
      "n_files" -> nFiles.toString,
      "bits" -> bits.toString))
    v
  }

  // ------------------------------------------------- versioned maintenance
  /** Batch rewrites share streamingUpsert's snapshot protocol (v=N subdir +
    * the committer's _SUCCESS marker): OPTIMIZE writes the NEXT version
    * instead of overwriting in place, so
    *  - a crash mid-rewrite leaves an uncommitted v=N that readers skip —
    *    the previous version stays readable (OPTIMIZE is crash-safe);
    *  - the pre-OPTIMIZE table remains addressable ([[readVersion]]) until
    *    [[vacuumVersions]] sweeps it — Delta's time travel, which the
    *    reference leans on (TPC-datagen-notebook.scala:2168's history
    *    browsing);
    *  - `_graft_history` survives trivially because the table root is
    *    never overwritten.
    */

  /** Every v=N subdir, committed or not — claiming max+1 ensures a new
    * rewrite never lands inside a half-written crash leftover.
    */
  private def allVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      // non-numeric v= dirs (operator copies like v=1.bak) are not protocol
      // snapshots — ignore them rather than bricking every versioned op on
      // the table with a NumberFormatException
      .flatMap(st => st.getPath.getName.stripPrefix("v=").toLongOption)
  }

  /** Committed versions only (delegates to the streaming protocol). */
  def committedVersions(spark: SparkSession, dir: String): Seq[Long] =
    graft.streaming.EventStreams.snapshotVersions(spark, dir)

  /** The directory holding the table's CURRENT data: the latest committed
    * v=N, or the bare table dir for a never-versioned table (whose own
    * data files remain the valid snapshot even when a crashed rewrite
    * left uncommitted v=N dirs behind — [[readDataDir]] reads around
    * them). Loud failure when only incomplete versions exist and the root
    * holds no data — then there is genuinely nothing safe to read.
    */
  def currentSnapshotDir(spark: SparkSession, dir: String): String = {
    val committed = committedVersions(spark, dir)
    if (committed.nonEmpty) s"$dir/v=${committed.max}"
    else {
      val path = new Path(dir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasBareData = fs.exists(path) && fs.listStatus(path).exists(st =>
        st.isFile && st.getPath.getName.startsWith("part-"))
      require(hasBareData || allVersions(spark, dir).isEmpty,
        s"only uncommitted versions under $dir — nothing safe to read")
      dir
    }
  }

  /** Read the data files of one snapshot directory. A bare root that
    * carries crash-leftover v= subdirs can't go through plain
    * `spark.read.parquet(dir)` — partition discovery rejects the mixed
    * layout (and must never ingest the leftovers' half-written files) —
    * so in that case the root's own data files are enumerated explicitly.
    */
  def readDataDir(spark: SparkSession, d: String): DataFrame = {
    val path = new Path(d)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = fs.listStatus(path)
    if (top.exists(st => st.isDirectory && st.getPath.getName.startsWith("v=")))
      // Spark-written snapshot files are always part-*; anything else in
      // the root (caller-parked files) is not snapshot data
      spark.read.parquet(top.filter(st => st.isFile &&
        st.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString).toIndexedSeq: _*)
    else spark.read.parquet(d)
  }

  /** Current table state (latest committed version or bare dir). */
  def readTable(spark: SparkSession, dir: String): DataFrame =
    readDataDir(spark, currentSnapshotDir(spark, dir))

  /** Time travel: read an older committed version explicitly. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    require(committedVersions(spark, dir).contains(version),
      s"version $version is not a committed snapshot under $dir")
    spark.read.parquet(s"$dir/v=$version")
  }

  /** OPTIMIZE, versioned: compact the current snapshot into ~targetBytes
    * files written as the next version. Returns the new version id.
    */
  def compactVersioned(spark: SparkSession, dir: String,
                       targetBytes: Long = 128L * 1024 * 1024): Long =
    compact(spark, currentSnapshotDir(spark, dir), dir, targetBytes)

  /** OPTIMIZE ZORDER BY, versioned: cluster the current snapshot on the
    * interleave key and write it as the next version. Returns the id.
    */
  def zorderVersioned(spark: SparkSession, dir: String, cols: Seq[String],
                      nFiles: Int, bits: Int = 16): Long =
    // readDataDir, not plain read: a never-versioned root carrying
    // crash-leftover v= dirs is a mixed layout partition discovery rejects
    zorderWrite(readDataDir(spark, currentSnapshotDir(spark, dir)),
      cols, dir, nFiles, bits)

  /** VACUUM for versions: drop committed versions beyond the newest
    * `keepLast`, plus crash-leftover uncommitted versions older than the
    * newest committed one. Returns the number of version dirs removed.
    */
  def vacuumVersions(spark: SparkSession, dir: String,
                     keepLast: Int = 1): Long = {
    require(keepLast >= 1, "must keep at least the current version")
    val committed = committedVersions(spark, dir).sorted
    if (committed.isEmpty) return 0L
    val latest = committed.max
    val doomedCommitted = committed.dropRight(keepLast)
    val doomedLeftovers = allVersions(spark, dir)
      .filterNot(committed.contains).filter(_ < latest)
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = (doomedCommitted ++ doomedLeftovers).distinct
    doomed.foreach(v => fs.delete(new Path(s"$dir/v=$v"), true))
    // The pre-versioning bare-root files are the oldest snapshot of all:
    // once a committed version exists they are unreachable (readers always
    // resolve v=N), so a vacuum that keeps only versioned snapshots must
    // reclaim them too or the table leaks its original bytes forever.
    // Only entries that look like that superseded parquet snapshot are
    // swept (part-* files and key=value partition dirs); anything else a
    // caller parked in the table root is not ours to delete.
    var bareSwept = 0L
    fs.listStatus(path).foreach { st =>
      val n = st.getPath.getName
      // Spark-written snapshots are always part-* files (plus key=value
      // partition dirs); a caller-parked foo.parquet is NOT ours to touch
      val isSnapshotData =
        (st.isFile && n.startsWith("part-")) ||
          (st.isDirectory && !n.startsWith("v=") && n.contains("="))
      if (isSnapshotData && !n.startsWith("_") && !n.startsWith(".")) {
        fs.delete(st.getPath, true)
        bareSwept += 1
      }
    }
    logOp(spark, dir, "VACUUM VERSIONS", Map(
      "deleted_versions" -> doomed.sorted.mkString(","),
      "deleted_bare_entries" -> bareSwept.toString,
      "keep_last" -> keepLast.toString))
    doomed.length.toLong
  }

  /** VACUUM planning half: which files fall outside the retention window.
    * Returns the delete plan as a DF (file, bytes, mtime_ms) — the actual
    * delete is the caller's (irreversible) decision, mirroring VACUUM's
    * dry-run.
    */
  def retentionPlan(files: DataFrame, keepAfterMtimeMs: Long): DataFrame =
    files.filter(col("mtime_ms") < keepAfterMtimeMs)

  /** VACUUM, execute half: delete the planned files under `dir`. Deliberate
    * two-step API — callers hold the plan (and can log/inspect it) before
    * the irreversible delete; the op lands in the history log.
    */
  def applyRetention(spark: SparkSession, dir: String,
                     keepAfterMtimeMs: Long): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val doomed = retentionPlan(listFiles(spark, dir), keepAfterMtimeMs)
      .select("file").collect().map(_.getString(0)).toSet
    var deleted = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val st = it.next()
      if (doomed(st.getPath.getName)) {
        fs.delete(st.getPath, false)
        deleted += 1
      }
    }
    logOp(spark, dir, "VACUUM", Map(
      "deleted_files" -> deleted.toString,
      "keep_after_mtime_ms" -> keepAfterMtimeMs.toString))
    deleted
  }

  /** OPTIMIZE planning half — see LakehouseOps.compactionPlan. */
  def compactionPlan(files: DataFrame, targetBytes: Long): DataFrame =
    LakehouseOps.compactionPlan(files, targetBytes)

  /** ANALYZE TABLE ... FOR ALL COLUMNS — see LakehouseOps.tableStats. */
  def analyze(df: DataFrame, cols: Seq[String]): DataFrame =
    LakehouseOps.tableStats(df, cols)

  /** ANALYZE with PERSISTED stats (the reference's post-load
    * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`, resources/
    * TPC-datagen-notebook.scala:2065-2067): registers `dir` as a catalog
    * table and runs the real ANALYZE, so row counts / column NDVs /
    * min-max land in the catalog where Catalyst's cost-based optimizer
    * (join reorder, broadcast decisions) reads them. `tableStats` answers
    * "show me the stats"; this one makes the *optimizer* see them.
    * Re-runnable: re-analyzing refreshes the stats in place.
    */
  def analyzePersist(spark: SparkSession, table: String, dir: String,
                     cols: Seq[String]): Unit = {
    // re-register if the name is bound to a DIFFERENT location — silently
    // analyzing the old location would hand the CBO another table's stats.
    // Only an EXTERNAL table is safe to drop (DROP leaves its data alone);
    // a MANAGED table owning the name means DROP would delete real data —
    // fail loudly and let the caller pick another name.
    if (spark.catalog.tableExists(table)) {
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
        .filter(col("col_name").isin("Location", "Type"))
        .select("col_name", "data_type").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val want = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .makeQualified(new Path(dir)).toString
      if (!desc.get("Location").contains(want)) {
        require(desc.get("Type").exists(_.equalsIgnoreCase("EXTERNAL")),
          s"table $table is ${desc.getOrElse("Type", "?")} and bound to " +
            s"${desc.getOrElse("Location", "?")} — dropping it would delete " +
            "its data; refusing to re-register the name")
        spark.sql(s"DROP TABLE $table")
      }
    }
    if (!spark.catalog.tableExists(table))
      spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$dir'")
    val forCols =
      if (cols.isEmpty) "FOR ALL COLUMNS"
      else s"FOR COLUMNS ${cols.mkString(", ")}"
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS $forCols")
  }

  /** Bucketed write — the co-location story behind every repeated
    * fact-fact join at 100 TB: both sides hash-bucketed (and sorted) on
    * the join key at write time, so later joins and MERGEs read
    * co-partitioned buckets with NO exchange on either side (and no sort
    * for sort-merge). One shuffle paid once at load time replaces one per
    * downstream join. Bucket metadata lives in the session catalog, so
    * this writes a managed table (`saveAsTable`) rather than a bare path.
    */
  def bucketedWrite(df: DataFrame, keys: Seq[String], nBuckets: Int,
                    table: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // After the drop, a directory still sitting at the managed location is
    // an orphan from a previous session (an in-memory catalog forgets its
    // tables but not their files) — clear it or saveAsTable refuses with
    // LOCATION_ALREADY_EXISTS. The location comes from the catalog's own
    // resolution (current database, qualified names, case normalization),
    // not a hand-built <warehouse>/<name> guess.
    val loc = new Path(
      org.apache.spark.sql.GraftColumnBridge.managedTableLocation(spark, table))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) {
      // only delete a verifiable orphan: if any OTHER catalog table still
      // resolves to this directory (e.g. an external table registered at
      // the default path), deleting it would destroy live data
      val locStr = fs.makeQualified(loc).toString
      val owner = spark.catalog.listTables().collect()
        .map(t => if (t.database != null && t.database.nonEmpty)
          s"${t.database}.${t.name}" else t.name)
        .find { name =>
          try spark.sql(s"DESCRIBE TABLE EXTENDED $name")
            .filter(col("col_name") === "Location")
            .select("data_type").collect()
            .headOption.exists(_.getString(0) == locStr)
          catch { case _: Exception => false }
        }
      require(owner.isEmpty,
        s"refusing to delete $locStr — catalog table ${owner.get} still " +
          "resolves to it")
      fs.delete(loc, true)
    }
    df.write
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Hive-style partitioned write — the reference's partitioned TPC tables
    * (resources/TPC-datagen-notebook.scala, partitioned/clustered writes).
    * Reads that filter on `partCols` then prune at the *directory* level
    * (PartitionFilters in the scan), before any file is opened.
    */
  def partitionedWrite(df: DataFrame, partCols: Seq[String], outDir: String): Unit =
    df.write.partitionBy(partCols: _*).mode("overwrite").parquet(outDir)

  // ------------------------------------------------------- DESCRIBE HISTORY
  /** Operation log, the DESCRIBE HISTORY equivalent (reference:
    * resources/TPC-datagen-notebook.scala:2168): maintenance verbs append
    * one JSON line per operation under `_graft_history/`; `history` reads
    * it back newest-first. The log is metadata-sized and append-only —
    * concurrent writers each create their own file, so no coordination.
    */
  def logOp(spark: SparkSession, dir: String, op: String,
            details: Map[String, String] = Map.empty): Unit = {
    val path = new Path(s"$dir/_graft_history")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path)
    val ts = System.currentTimeMillis()
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val kv = (Map("op" -> op) ++ details)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString(",")
    // optimistic version claim: create(overwrite=false) is atomic on
    // HDFS/local, so a concurrent writer that claimed the same version
    // makes this create throw — re-list and retry with the next slot
    // (Delta's log-commit protocol in miniature)
    var attempts = 0
    var done = false
    while (!done) {
      val version = fs.listStatus(path).length
      try {
        val out = fs.create(new Path(path, f"$version%08d.json"), false)
        out.write(s"""{"version":$version,"ts_ms":$ts,$kv}\n""".getBytes("UTF-8"))
        out.close()
        done = true
      } catch {
        case e: java.io.IOException =>
          attempts += 1
          if (attempts > 100) throw e
      }
    }
  }

  def history(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(s"$dir/_graft_history/*.json")
      .orderBy(org.apache.spark.sql.functions.col("version").desc)
}
