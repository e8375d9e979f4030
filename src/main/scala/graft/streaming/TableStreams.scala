package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}

import graft.sources.{DeltaLite, IcebergLite}

/** STREAMING SOURCES for the two table formats — the missing half of
  * EventStreams' six format *writers*: consume a DeltaLite/IcebergLite
  * table as a Structured Streaming source by tailing its commit log in
  * micro-batches. This is the reference's poll-and-append ETL loop
  * (tasks/Endpoint_History_Status_ETL.py:1-204) as Structured Streaming
  * writes it today: `spark.readStream.format(...).load()` instead of a
  * hand-rolled poller.
  *
  * Mechanics (the V1 `Source` contract, the same API Spark's own file
  * stream source is built on): the OFFSET is the table version (Delta) /
  * snapshot id (Iceberg); `getOffset` is a driver-side log listing
  * (metadata-only, no data I/O); `getBatch(start, end]` plans a normal
  * batch DataFrame over ONLY the files those commits added — cost ∝
  * appended data, never table size — re-tagged streaming via the same
  * internalCreateDataFrame seam the built-in sources use. Exactly-once
  * across restarts comes from Structured Streaming's own offset log in
  * the checkpoint: a restarted query re-enters at the last committed
  * version, and an already-processed version is never re-delivered.
  *
  * Modes (Delta): APPEND (default) — the first batch is the full
  * current snapshot (the initial-snapshot semantic of the real Delta
  * source), later batches are [[DeltaLite.appended]] deltas, and a
  * range that removed files/changed DVs REFUSES loudly; CDF — batches
  * are [[DeltaLite.changes]] rows carrying `_change_type`
  * (insert/delete/update_pre/postimage; the initial snapshot arrives as
  * `insert` rows), so merge-on-read deletes and rewrites flow as
  * row-level events. Iceberg: APPEND mode over
  * [[IcebergLite.incrementalRead]] (which itself refuses non-append
  * ranges).
  *
  * At 100 TB the shape holds: each micro-batch reads only new files,
  * planning is O(log listing) on the driver, and the initial snapshot is
  * one ordinary distributed scan.
  */
object TableStreams {

  private[streaming] def offsetValue(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  /** `startingTimestamp` accepts epoch millis or `yyyy-MM-dd HH:mm:ss`
    * (JDBC timestamp syntax, session-default zone).
    */
  private[streaming] def parseTs(s: String): Long =
    scala.util.Try(s.trim.toLong)
      .getOrElse(java.sql.Timestamp.valueOf(s.trim).getTime)

  private[streaming] def offsetValue(o: Option[V1Offset]): Option[Long] =
    o.map(offsetValue)

  /** Whether this query already committed offsets — i.e. createSource is
    * running on a checkpointed RESTART, not a first start. The V1 API
    * never hands the source its committed offset at construction, but
    * the source's `metadataPath` is `<checkpoint>/sources/<id>`, and the
    * engine's own offset log lives at `<checkpoint>/offsets/` — a
    * non-empty entry there means at least one batch was planned.
    */
  private[streaming] def hasCommittedOffsets(spark: SparkSession,
                                             metadataPath: String): Boolean =
    try {
      val src = new org.apache.hadoop.fs.Path(metadataPath)
      val offsets = new org.apache.hadoop.fs.Path(
        src.getParent.getParent, "offsets")
      val f = offsets.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.exists(offsets) && f.listStatus(offsets)
        .exists(st => !st.getPath.getName.startsWith("."))
    } catch { case scala.util.control.NonFatal(_) => false }
}

/** `spark.readStream.format(classOf[DeltaLiteStreamProvider].getName)`
  * options: `path` (table root, required); `cdf` (default false);
  * `keys` (comma-separated merge keys, required in cdf mode — the
  * classification keys [[DeltaLite.changes]] needs); `startingVersion`
  * (skip the initial snapshot and deliver appends from this version on
  * — the real source's option); `startingTimestamp` (epoch millis or
  * `yyyy-MM-dd HH:mm:ss` — resolves once, ICT-aware, to the first
  * version stamped at or after the bound; mutually exclusive with
  * `startingVersion`); `maxVersionsPerTrigger` (cap each
  * micro-batch at N table versions, so a deep backlog drains in bounded
  * batches instead of one giant catch-up scan; best-effort — the first
  * batch after a RESTART covers the full gap, later batches are
  * capped).
  */
class DeltaLiteStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-delta-stream"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-delta-stream: option 'path' (table root) is required"))

  private def schemaFor(spark: SparkSession,
                        parameters: Map[String, String]): StructType = {
    val base = DeltaLite.read(spark, tableOf(parameters)).schema
    val cdf = parameters.get("cdf").exists(_.toBoolean)
    val versions = parameters.get("cdfVersions").exists(_.toBoolean)
    if (cdf) {
      val c = base.add("_change_type", StringType, nullable = false)
      if (versions) c.add("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)
      else c
    } else base
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schemaFor(sqlContext.sparkSession, parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val cdf = parameters.get("cdf").exists(_.toBoolean)
    val keys = parameters.get("keys").map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(!cdf || keys.nonEmpty,
      "graft-delta-stream: cdf mode needs option 'keys' " +
        "(comma-separated merge keys for change classification)")
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graft-delta-stream: startingVersion and startingTimestamp are " +
        "mutually exclusive")
    val table = tableOf(parameters)
    // startingTimestamp resolves ONCE here to the first version stamped
    // at or after the bound (ICT-aware); a bound past the tip means
    // "only future commits" — anchor one past the tip and wait
    val startingVersion = parameters.get("startingVersion").map(_.toLong)
      .orElse(parameters.get("startingTimestamp").map { s =>
        val ts = TableStreams.parseTs(s)
        // a zero-stamp log can't answer "changes since T" — refusing
        // beats silently skipping the whole backlog (every realistic T
        // would anchor past the tip there)
        require(DeltaLite.versions(spark, table).isEmpty ||
            DeltaLite.hasWallClockStamps(spark, table),
          "graft-delta-stream: startingTimestamp needs wall-clock " +
            "commit stamps (enable in-commit timestamps, or use " +
            "startingVersion)")
        DeltaLite.firstVersionAtOrAfter(spark, table, ts).getOrElse(
          DeltaLite.versions(spark, table).lastOption.fold(0L)(_ + 1L))
      })
    new DeltaLiteTailSource(spark, table, cdf, keys,
      startingVersion,
      parameters.get("maxVersionsPerTrigger").map(_.toInt),
      parameters.get("cdfVersions").exists(_.toBoolean),
      schemaFor(spark, parameters))
  }
}

private class DeltaLiteTailSource(spark: SparkSession, table: String,
                                  cdf: Boolean, keys: Seq[String],
                                  startingVersion: Option[Long],
                                  maxVersionsPerTrigger: Option[Int],
                                  cdfVersions: Boolean,
                                  val schema: StructType) extends Source {
  import TableStreams.offsetValue

  // highest version this run has served — the base the per-trigger cap
  // counts from. None before the first batch (a fresh run caps against
  // startingVersion; a restarted run serves its first catch-up batch
  // uncapped, then caps — the engine never tells a V1 source the
  // committed offset outside getBatch).
  @volatile private var lastServed: Option[Long] = None

  override def getOffset: Option[V1Offset] = {
    val vs = DeltaLite.versions(spark, table)
    if (vs.isEmpty) return None
    val latest = vs.last
    val capBase: Option[Long] =
      lastServed.orElse(startingVersion.map(_ - 1))
    val capped = (maxVersionsPerTrigger, capBase) match {
      case (Some(n), Some(base)) => math.min(latest, base + n)
      case _                     => latest
    }
    if (startingVersion.exists(sv => capped < sv - 1)) None
    else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = offsetValue(end)
    lastServed = Some(math.max(endV, lastServed.getOrElse(Long.MinValue)))
    val startV: Option[Long] =
      offsetValue(start).orElse(startingVersion.map(_ - 1).filter(_ >= 0))
    val batch = startV match {
      case None =>
        // initial snapshot: every row visible at endV (CDF tags inserts)
        val full = DeltaLite.read(spark, table, Some(endV))
        if (cdf) {
          val tagged = full.withColumn("_change_type", lit("insert"))
          if (cdfVersions) tagged.withColumn("_commit_version", lit(endV))
          else tagged
        } else full
      case Some(sv) if sv >= endV =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(sv) =>
        if (cdf) DeltaLite.changes(spark, table, sv, endV, keys,
          withVersion = cdfVersions)
        else DeltaLite.appended(spark, table, sv, endV)
    }
    GraftColumnBridge.asStreamingFrame(batch)
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format(classOf[IcebergLiteStreamProvider].getName)`
  * options: `path` (table root, required); `cdf` (default false —
  * batches become [[IcebergLite.changes]] rows carrying `_change_type`,
  * so merge-on-read deletes and rewrites flow as row-level events);
  * `keys` (comma-separated merge keys, required in cdf mode);
  * `cdfVersions` (adds `_commit_version` = the snapshot's HISTORY
  * ordinal — foreign snapshot ids are random, the ordinal is what
  * ordering-sensitive consumers sort on); `startingSnapshot` (skip the
  * initial snapshot and deliver changes AFTER this id);
  * `startingTimestamp` (epoch millis or `yyyy-MM-dd HH:mm:ss` — anchors
  * on the snapshot-log's `timestamp-ms`; mutually exclusive with
  * `startingSnapshot`); and
  * `maxSnapshotsPerTrigger` (cap each micro-batch at N snapshots in
  * history-ordinal space, so a deep backlog drains in bounded batches —
  * the Delta twin's catch-up control). Append mode keeps the format's
  * incremental-scan contract (overwrites in range refuse).
  */
class IcebergLiteStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg-stream"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("graft-iceberg-stream: option 'path' (table root) is required"))

  private def schemaFor(spark: SparkSession,
                        parameters: Map[String, String]): StructType = {
    val base = IcebergLite.read(spark, tableOf(parameters)).schema
    if (parameters.get("cdf").exists(_.toBoolean)) {
      val c = base.add("_change_type", StringType, nullable = false)
      if (parameters.get("cdfVersions").exists(_.toBoolean))
        c.add("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)
      else c
    } else base
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schemaFor(sqlContext.sparkSession, parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val cdf = parameters.get("cdf").exists(_.toBoolean)
    val keys = parameters.get("keys").map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Nil)
    require(!cdf || keys.nonEmpty,
      "graft-iceberg-stream: cdf mode needs option 'keys' " +
        "(comma-separated merge keys for change classification)")
    require(!(parameters.contains("startingSnapshot") &&
        parameters.contains("startingTimestamp")),
      "graft-iceberg-stream: startingSnapshot and startingTimestamp are " +
        "mutually exclusive")
    val table = tableOf(parameters)
    // startingTimestamp anchors on the newest snapshot BEFORE the bound
    // (the source delivers strictly after its anchor); all-snapshots-at-
    // or-after means no anchor — deliver from the beginning
    val startingSnapshot = parameters.get("startingSnapshot").map(_.toLong)
      .orElse(parameters.get("startingTimestamp").flatMap { s =>
        // same zero-stamp refusal as the Delta twin: our own writer
        // zeroes timestamp-ms; foreign logs carry real stamps
        require(IcebergLite.hasWallClockStamps(spark, table),
          "graft-iceberg-stream: startingTimestamp needs wall-clock " +
            "snapshot timestamps (foreign logs carry them; use " +
            "startingSnapshot on zero-stamp tables)")
        IcebergLite.lastSnapshotBefore(spark, table,
          TableStreams.parseTs(s))
      })
    // an anchor outside the PUBLISHED lineage (a branch/staged snapshot
    // id, a typo) must fail HERE as option validation — silently
    // disabling the wait/cap logic surfaces later as an
    // unresolvable-range error from changes()/incrementalRead. But ONLY
    // on FIRST start: a checkpointed RESTART has committed offsets that
    // long since superseded the anchor, and a long-running stream whose
    // anchor's snapshot-log entry was trimmed by foreign maintenance
    // must not hard-fail on restart over an option it no longer uses.
    startingSnapshot.filter(_ => !TableStreams.hasCommittedOffsets(
        spark, metadataPath)).foreach { s =>
      val published = Option(IcebergLite.metadata(spark, table)
        .get("snapshot-log"))
        .map(_.elements().asScala.toSeq.map(_.get("snapshot-id").asLong()))
        .getOrElse(Seq.empty)
      require(published.contains(s),
        s"graft-iceberg-stream: startingSnapshot $s is not in the " +
          s"published snapshot-log of $table (branch/staged snapshots " +
          "cannot anchor the stream); published ids: " +
          published.mkString(", "))
    }
    new IcebergLiteTailSource(spark, table, cdf, keys,
      parameters.get("cdfVersions").exists(_.toBoolean),
      startingSnapshot,
      parameters.get("maxSnapshotsPerTrigger").map(_.toInt),
      schemaFor(spark, parameters))
  }
}

private class IcebergLiteTailSource(spark: SparkSession, table: String,
                                    cdf: Boolean, keys: Seq[String],
                                    cdfVersions: Boolean,
                                    startingSnapshot: Option[Long],
                                    maxSnapshotsPerTrigger: Option[Int],
                                    val schema: StructType) extends Source {
  import TableStreams.offsetValue

  def this(spark: SparkSession, table: String, schema: StructType) =
    this(spark, table, false, Nil, false, None, None, schema)

  // highest HISTORY ORDINAL this run has served — the per-trigger cap
  // counts ordinals (foreign snapshot ids are random; arithmetic on them
  // is meaningless). Same best-effort contract as the Delta twin: the
  // first batch after a RESTART covers the full gap, later ones cap.
  @volatile private var lastServedOrd: Option[Int] = None

  private def historyIds(): Seq[Long] = {
    // the PUBLISHED lineage (snapshot-log tracks current-snapshot-id
    // changes), NOT the shared snapshots array: branch commits add
    // array entries without moving main, and an offset capped onto a
    // branch head would leak un-published staged rows into this stream.
    // A fastForward publish adds its own log entry, so staged rows
    // arrive exactly when WAP publishes them.
    val meta = IcebergLite.metadata(spark, table)
    Option(meta.get("snapshot-log"))
      .map(_.elements().asScala.toSeq.map(_.get("snapshot-id").asLong()))
      .getOrElse(Seq.empty)
  }

  override def getOffset: Option[V1Offset] = {
    val meta = IcebergLite.metadata(spark, table)
    // current-snapshot-id = -1 is the Iceberg convention for "no snapshot
    // yet" (a foreign writer created the table but hasn't committed data)
    // — report no offset and wait, as the Delta twin does for an empty log
    val current = Option(meta.get("current-snapshot-id")).map(_.asLong())
      .filter(_ >= 0)
    current.flatMap { cur =>
      val ids = historyIds()
      val curOrd = ids.indexOf(cur)
      if (curOrd < 0) Some(LongOffset(cur)) // odd foreign state: serve it
      else {
        val capBase: Option[Int] = lastServedOrd
          .orElse(startingSnapshot.map(ids.indexOf(_)).filter(_ >= 0))
        val capped = (maxSnapshotsPerTrigger, capBase) match {
          case (Some(n), Some(base)) => math.min(curOrd, base + n)
          case _                     => curOrd
        }
        // nothing newer than the starting point yet → wait
        if (startingSnapshot.exists(s => ids.indexOf(s) >= capped)) None
        else Some(LongOffset(ids(capped)))
      }
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endId = offsetValue(end)
    val ids = historyIds()
    val endOrd = ids.indexOf(endId)
    if (endOrd >= 0)
      lastServedOrd = Some(math.max(endOrd, lastServedOrd.getOrElse(-1)))
    val startId: Option[Long] = offsetValue(start).orElse(startingSnapshot)
    val batch = startId match {
      case None =>
        val full = IcebergLite.read(spark, table, Some(endId))
        if (cdf) {
          val tagged = full.withColumn("_change_type", lit("insert"))
          if (cdfVersions) tagged.withColumn("_commit_version",
            lit(IcebergLite.historyOrdinal(spark, table, endId)))
          else tagged
        } else full
      case Some(sId) if sId == endId =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(sId) =>
        if (cdf) IcebergLite.changes(spark, table, sId, Some(endId),
          keys, withVersion = cdfVersions)
        else IcebergLite.incrementalRead(spark, table, sId, Some(endId))
    }
    GraftColumnBridge.asStreamingFrame(batch)
  }

  override def stop(): Unit = ()
}
