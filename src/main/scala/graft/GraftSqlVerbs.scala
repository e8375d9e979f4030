package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.sources.{DeltaLite, IcebergLite}

/** The reference's SQL idiom for table maintenance
  * (TPC-datagen-notebook.scala:1979-2086 drives everything through
  * `OPTIMIZE` / `VACUUM` / `ANALYZE`-style SQL strings) over
  * DeltaLite/IcebergLite paths — a delegating [[ParserInterface]]
  * injected via [[GraftExtensions]], so these verbs work from plain
  * `spark.sql(...)`:
  *
  * {{{
  *   OPTIMIZE '<table path>' [ZORDER BY (c1, c2)] [FILES n]
  *   VACUUM '<table path>' [RETAIN n VERSIONS|HOURS]
  *   DESCRIBE HISTORY '<table path>'
  *   DESCRIBE DETAIL '<table path>'
  *   SHOW TBLPROPERTIES '<table path>'
  *   RESTORE '<table path>' VERSION AS OF n
  * }}}
  *
  * Every verb takes EITHER a quoted path OR a dotted `db.table` name —
  * the reference's own addressing idiom (`OPTIMIZE
  * {DATABASE_NAME}.{QUERIES_TABLE_NAME}`, tasks/Query History API to
  * Delta_withmetrics.py:256) — resolved through [[GraftCatalog]]:
  * explicit `REGISTER TABLE db.t '<path>'` bindings first, then Spark
  * catalog table locations, then `<database location>/<table>` (so
  * `CREATE DATABASE IF NOT EXISTS dbadb LOCATION '...'` +
  * `OPTIMIZE dbadb.query_history` works with no registration at all).
  *
  * The path's format is DETECTED (`_delta_log/` vs
  * `metadata/version-hint.text`) and each verb dispatches to the same
  * programmatic API the library exposes — the SQL layer adds zero new
  * semantics, so effects are spec-pinned equal to the API calls. Every
  * other statement delegates untouched to Spark's own parser. Verbs
  * execute as [[LeafRunnableCommand]]s — driver-side metadata work plus
  * the same distributed rewrites the APIs run; the returned rows are
  * bounded (history length / file names / one detail row), never data.
  */
class GraftVerbParser(delegate: ParserInterface,
                      session: Option[SparkSession] = None)
    extends ParserInterface {

  import GraftSqlVerbs._

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlVerbs.parseVerb(sqlText)
      .filter(p => GraftSqlVerbs.shouldIntercept(session, p))
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlVerbs {

  // Target of every verb: a single-quoted path literal (quotes KEPT in
  // the capture so run()-time resolution can tell the two apart), or a
  // DOTTED catalog name `db.table` — the reference's own addressing
  // idiom (`OPTIMIZE {DATABASE_NAME}.{QUERIES_TABLE_NAME}`, tasks/Query
  // History API to Delta_withmetrics.py:256), resolved via
  // [[GraftCatalog]]. Dotted-only on purpose: single-part identifiers
  // stay with Spark's parser, so native statements that share a keyword
  // (ANALYZE TABLE t / SHOW PARTITIONS t / ALTER TABLE t ...) are never
  // shadowed for ordinary catalog tables.
  private val Tgt = """('[^']+'|(?:[A-Za-z_]\w*\.)+[A-Za-z_]\w*)"""
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+""" + Tgt + """(?:\s+ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\))?(?:\s+FILES\s+(\d+))?\s*;?\s*""").r
  private val VacuumRe =
    ("""(?is)\s*VACUUM\s+""" + Tgt + """(?:\s+RETAIN\s+(\d+)\s+(VERSIONS|HOURS))?\s*;?\s*""").r
  private val ShowPropertiesRe =
    ("""(?is)\s*SHOW\s+TBLPROPERTIES\s+""" + Tgt + """\s*;?\s*""").r
  private val HistoryRe =
    ("""(?is)\s*DESCRIBE\s+HISTORY\s+""" + Tgt + """\s*;?\s*""").r
  private val DetailRe =
    ("""(?is)\s*DESCRIBE\s+DETAIL\s+""" + Tgt + """\s*;?\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+(?:TABLE\s+)?""" + Tgt + """\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val AnalyzeRe =
    ("""(?is)\s*ANALYZE\s+(?:TABLE\s+)?""" + Tgt + """(?:\s+COMPUTE\s+STATISTICS)?(?:\s+FOR\s+ALL\s+COLUMNS)?\s*;?\s*""").r
  private val ShowFilesRe =
    ("""(?is)\s*SHOW\s+FILES\s+(?:IN\s+)?""" + Tgt + """\s*;?\s*""").r
  private val ShowPartitionsRe =
    ("""(?is)\s*SHOW\s+PARTITIONS\s+(?:IN\s+)?""" + Tgt + """\s*;?\s*""").r
  // SHOW TABLES twin: no LIKE-pattern form (that stays native), optional
  // IN/FROM db. Intercepts only when the session has graft registrations
  // (see shouldIntercept) and always REPRODUCES the native listing plus
  // the registry rows, so behavior is a strict superset of native.
  private val ShowTablesRe =
    """(?is)\s*SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+([A-Za-z_]\w*))?\s*;?\s*""".r
  // DESCRIBE EXTENDED <table> <col> twin — the per-column-stats form the
  // reference's maintenance sweep reads (TPC-datagen-notebook.scala:2131).
  // The column group is REQUIRED: the table-level DESCRIBE EXTENDED form
  // stays native. Dotted names intercept via registry-only probe.
  private val DescribeColumnRe =
    ("""(?is)\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?EXTENDED\s+""" + Tgt +
      """\s+([A-Za-z_]\w*)\s*;?\s*""").r
  private val AddConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraintRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""").r
  private val CreateRefRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+CREATE\s+(BRANCH|TAG)\s+(\w+)(?:\s+AT\s+(\d+))?\s*;?\s*""").r
  private val DropRefRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+DROP\s+(BRANCH|TAG)\s+(\w+)\s*;?\s*""").r
  private val FastForwardRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+FAST[\s-]*FORWARD\s+(\w+)\s*;?\s*""").r
  private val ClusterByRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+CLUSTER\s+BY\s+(?:\(\s*([\w\s,]+?)\s*\)|NONE)\s*;?\s*""").r
  private val AlterColumnTypeRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+)\s*;?\s*""").r
  private val AddPartFieldRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""").r
  private val DropPartFieldRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + Tgt + """\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*""").r
  private val OrphanRe =
    ("""(?is)\s*REMOVE\s+ORPHAN\s+FILES\s+(?:FROM\s+)?""" + Tgt + """\s*;?\s*""").r
  private val MsckRe =
    ("""(?is)\s*MSCK\s+REPAIR\s+TABLE\s+""" + Tgt + """\s*;?\s*""").r
  private val CleanupRe =
    ("""(?is)\s*CLEANUP\s+(LOGS|METADATA)\s+""" + Tgt + """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""").r
  // name↔path registry maintenance — graft-only keywords, no collision
  private val RegisterRe =
    ("""(?is)\s*REGISTER\s+TABLE\s+((?:[A-Za-z_]\w*\.)+[A-Za-z_]\w*)\s+(?:AT\s+)?'([^']+)'\s*;?\s*""").r
  private val UnregisterRe =
    ("""(?is)\s*UNREGISTER\s+TABLE\s+((?:[A-Za-z_]\w*\.)+[A-Za-z_]\w*)\s*;?\s*""").r

  /** A verb target at run() time: quoted literals are paths verbatim,
    * dotted bare identifiers resolve through [[GraftCatalog]].
    */
  private[graft] def resolveTarget(spark: SparkSession, target: String): String =
    if (target.startsWith("'")) target.stripPrefix("'").stripSuffix("'")
    else GraftCatalog.resolve(spark, target)

  /** Six verb shapes are ALSO native Spark grammar on dotted names
    * (ANALYZE TABLE / SHOW TBLPROPERTIES / SHOW PARTITIONS / ALTER
    * COLUMN TYPE / ADD-DROP CONSTRAINT / CLUSTER BY — the last two are
    * native DDL as of Spark 4). Those intercept a dotted name ONLY when it actually
    * resolves to a graft-format table root — an ordinary catalog
    * table's statement falls through to Spark's parser untouched, so
    * installing the extension never changes native behavior. Decided
    * at parse time (the injected session is in hand): one resolve plus
    * two fs existence probes, only for these four shapes on bare
    * names. Graft-only keywords (OPTIMIZE, VACUUM, DESCRIBE HISTORY,
    * CLEANUP, ...) intercept unconditionally — Spark has no grammar
    * for them, so nothing can be shadowed.
    */
  private[graft] def shouldIntercept(session: Option[SparkSession],
                                     plan: LogicalPlan): Boolean = {
    plan match {
      // MSCK collides with native grammar AND its target is typically a
      // RAW hive-layout dir (not a graft-format table), so the formatOf
      // probe below doesn't apply: only quoted paths and explicitly
      // graft-REGISTERED names intercept — an ordinary catalog table's
      // native MSCK is never shadowed
      case GraftMsckRepairCommand(t) =>
        return t.startsWith("'") ||
          session.forall(s => GraftCatalog.registered(s, t).isDefined)
      // SHOW TABLES is native grammar: intercept ONLY when this session
      // has graft registrations to add, and the command reproduces the
      // native listing verbatim before appending them — a session that
      // never registered a graft table sees native SHOW TABLES untouched
      case GraftShowTablesCommand(_) =>
        return session.forall(s => GraftCatalog.listTables(s).nonEmpty)
      // DESCRIBE EXTENDED <t> <col> is native grammar and its dotted
      // target is usually an ordinary catalog table — registry-only
      // probe, same contract as MSCK: only quoted paths and explicitly
      // graft-REGISTERED names intercept
      case GraftDescribeColumnCommand(t, _) =>
        return t.startsWith("'") ||
          session.forall(s => GraftCatalog.registered(s, t).isDefined)
      case _ => ()
    }
    val collidingTarget: Option[String] = plan match {
      case GraftAnalyzeCommand(t)            => Some(t)
      case GraftShowPropertiesCommand(t)     => Some(t)
      case GraftShowPartitionsCommand(t)     => Some(t)
      case GraftWidenColumnCommand(t, _, _)  => Some(t)
      // Spark 4.1's own grammar covers these two as well (ADD/DROP
      // CONSTRAINT and ALTER TABLE ... CLUSTER BY are native DDL now)
      case GraftConstraintCommand(t, _, _)   => Some(t)
      case GraftClusterByCommand(t, _)       => Some(t)
      case _                                 => None
    }
    collidingTarget match {
      case Some(t) if !t.startsWith("'") =>
        session.forall { s =>
          try {
            formatOf(s, GraftCatalog.resolve(s, t)); true
          } catch {
            // "does not resolve / is not a graft table" (the sys.error
            // raised by resolve/formatOf) falls through to Spark's
            // parser; an unexpected I/O error must PROPAGATE — a
            // transient filesystem fault silently rerouting an intended
            // graft statement to native semantics is wrong-answer class
            case _: RuntimeException => false
          }
        }
      case _ => true
    }
  }

  private[graft] def parseVerb(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case OptimizeRe(path, cols, files) =>
        Some(GraftOptimizeCommand(path,
          Option(cols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Nil),
          Option(files).map(_.toInt)))
      case VacuumRe(path, retain, unit) =>
        Some(GraftVacuumCommand(path, Option(retain).map(_.toInt).getOrElse(1),
          hours = Option(unit).exists(_.equalsIgnoreCase("HOURS"))))
      case ShowPropertiesRe(path) =>
        Some(GraftShowPropertiesCommand(path))
      case HistoryRe(path) => Some(GraftDescribeHistoryCommand(path))
      case DetailRe(path)  => Some(GraftDescribeDetailCommand(path))
      case RestoreRe(path, v) => Some(GraftRestoreCommand(path, v.toLong))
      case AnalyzeRe(path) => Some(GraftAnalyzeCommand(path))
      case ShowFilesRe(path) => Some(GraftShowFilesCommand(path))
      case ShowPartitionsRe(path) => Some(GraftShowPartitionsCommand(path))
      case ShowTablesRe(db) => Some(GraftShowTablesCommand(Option(db)))
      case DescribeColumnRe(path, column) =>
        Some(GraftDescribeColumnCommand(path, column))
      case AddConstraintRe(path, name, expr) =>
        Some(GraftConstraintCommand(path, name, Some(expr.trim)))
      case DropConstraintRe(path, name) =>
        Some(GraftConstraintCommand(path, name, None))
      case CreateRefRe(path, kind, name, at) =>
        Some(GraftRefCommand(path, kind.toLowerCase, name,
          create = true, Option(at).map(_.toLong)))
      case DropRefRe(path, kind, name) =>
        Some(GraftRefCommand(path, kind.toLowerCase, name,
          create = false, None))
      case FastForwardRe(path, branch) =>
        Some(GraftFastForwardCommand(path, branch))
      case ClusterByRe(path, cols) =>
        Some(GraftClusterByCommand(path,
          Option(cols).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Nil)))
      case AlterColumnTypeRe(path, colName, tpe) =>
        Some(GraftWidenColumnCommand(path, colName, tpe.toLowerCase))
      case AddPartFieldRe(path, decl) =>
        Some(GraftPartitionFieldCommand(path, decl.trim, add = true))
      case DropPartFieldRe(path, decl) =>
        Some(GraftPartitionFieldCommand(path, decl.trim, add = false))
      case OrphanRe(path) => Some(GraftRemoveOrphansCommand(path))
      case MsckRe(path) => Some(GraftMsckRepairCommand(path))
      case CleanupRe(kind, path, retain) =>
        Some(GraftCleanupCommand(path,
          Option(retain).map(_.toInt).getOrElse(1),
          kind.toUpperCase))
      case RegisterRe(name, path) =>
        Some(GraftRegisterTableCommand(name, Some(path)))
      case UnregisterRe(name) =>
        Some(GraftRegisterTableCommand(name, None))
      case _ => None
    }

  private[graft] sealed trait TableFormat
  private[graft] case object DeltaFormat extends TableFormat
  private[graft] case object IcebergFormat extends TableFormat

  private[graft] def formatOf(spark: SparkSession, path: String): TableFormat = {
    val p = new Path(path)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(new Path(p, "_delta_log"))) DeltaFormat
    else if (f.exists(new Path(p, "metadata/version-hint.text"))) IcebergFormat
    else sys.error(s"$path: neither a DeltaLite table (_delta_log/) nor an " +
      "IcebergLite table (metadata/version-hint.text)")
  }

  private def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt, nullable = true)()
}

/** `OPTIMIZE '<path>' [ZORDER BY (cols)] [FILES n]` — bin-packing
  * compaction, or Z-ORDER re-cluster when columns are given; same
  * distributed rewrite as the programmatic verbs.
  */
case class GraftOptimizeCommand(path: String, zorderCols: Seq[String],
                                targetFiles: Option[Int])
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    val files = targetFiles.getOrElse(if (zorderCols.isEmpty) 1 else 8)
    val (v, op) = formatOf(spark, path) match {
      case DeltaFormat =>
        if (zorderCols.isEmpty)
          (DeltaLite.optimizeCompact(spark, path, files), "OPTIMIZE")
        else (DeltaLite.optimizeZorder(spark, path, zorderCols, files),
          s"OPTIMIZE ZORDER BY (${zorderCols.mkString(", ")})")
      case IcebergFormat =>
        if (zorderCols.isEmpty)
          (IcebergLite.optimizeCompact(spark, path, files), "OPTIMIZE")
        else (IcebergLite.optimizeZorder(spark, path, zorderCols, files),
          s"OPTIMIZE ZORDER BY (${zorderCols.mkString(", ")})")
    }
    Seq(Row(v, op))
  }
}

/** `VACUUM '<path>' [RETAIN n VERSIONS|HOURS]` — reap files referenced
  * by no retained version/snapshot; returns the reaped names. The HOURS
  * flavor (the real verb's shape) resolves retention over commit
  * timestamps — `inCommitTimestamp` first on Delta, the snapshot-log's
  * `timestamp-ms` on Iceberg.
  */
case class GraftVacuumCommand(path: String, retain: Int,
                              hours: Boolean = false)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("deleted_file", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    val deleted = formatOf(spark, path) match {
      case DeltaFormat =>
        if (hours) DeltaLite.vacuumRetainHours(spark, path, retain.toDouble)
        else DeltaLite.vacuum(spark, path, retain)
      case IcebergFormat =>
        if (hours) IcebergLite.expireSnapshotsOlderThan(spark, path,
          System.currentTimeMillis() - retain.toLong * 3600 * 1000)
        else IcebergLite.expireSnapshots(spark, path, retain)
    }
    deleted.map(Row(_))
  }
}

/** `SHOW TBLPROPERTIES '<path>'` — the table's configuration as
  * key/value rows (Delta metaData configuration / Iceberg metadata
  * properties), metadata-only on both formats.
  */
case class GraftShowPropertiesCommand(path: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    val props: Map[String, String] = formatOf(spark, path) match {
      case DeltaFormat   => DeltaLite.snapshot(spark, path).configuration
      case IcebergFormat => IcebergLite.tableProperties(spark, path)
    }
    props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
  }
}

/** `DESCRIBE HISTORY '<path>'` — the commit/snapshot trail, normalized
  * to the columns both formats share.
  */
case class GraftDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    val rows = formatOf(spark, path) match {
      case DeltaFormat =>
        DeltaLite.history(spark, path).select("version", "operation").collect()
      case IcebergFormat =>
        IcebergLite.history(spark, path)
          .selectExpr("snapshot_id AS version", "operation").collect()
    }
    rows.toSeq.map(r => Row(r.getLong(0), r.getString(1)))
  }
}

/** `DESCRIBE DETAIL '<path>'` — one row of table facts (format, current
  * version/snapshot, live files, bytes), all from metadata.
  */
case class GraftDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case DeltaFormat =>
        val s = DeltaLite.snapshot(spark, path)
        val f = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val bytes = s.files
          .map(p => f.getFileStatus(new Path(path, p)).getLen).sum
        Seq(Row("delta", s.version, s.files.size.toLong, bytes))
      case IcebergFormat =>
        val s = IcebergLite.snapshot(spark, path)
        // sizes come from the MANIFESTS — no file-system stat calls
        Seq(Row("iceberg", s.snapshotId, s.detail.size.toLong,
          s.detail.map(_.sizeBytes).sum))
    }
  }
}

/** `ANALYZE ['TABLE'] '<path>' [COMPUTE STATISTICS]` — per-column
  * min/max/null-count/approx-ndv over the table's current state, ONE
  * distributed aggregation pass (every column's stats partial-aggregate
  * map-side; the shuffle carries one row). The reference's ANALYZE
  * idiom over a path table.
  */
case class GraftAnalyzeCommand(path: String) extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("min", StringType, nullable = true)(),
    AttributeReference("max", StringType, nullable = true)(),
    AttributeReference("n_nulls", LongType, nullable = false)(),
    AttributeReference("approx_ndv", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    import org.apache.spark.sql.functions._
    val df = formatOf(spark, path) match {
      case DeltaFormat   => DeltaLite.read(spark, path)
      case IcebergFormat => IcebergLite.read(spark, path)
    }
    val cols = df.schema.fieldNames.toSeq
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(min(col(s"`$c`")).cast(StringType).as(s"__min_$c"),
        max(col(s"`$c`")).cast(StringType).as(s"__max_$c"),
        count(col(s"`$c`")).as(s"__cnt_$c"),
        approx_count_distinct(col(s"`$c`")).as(s"__ndv_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect().head
    val total = r.getAs[Long]("__n")
    cols.map { c =>
      Row(c, r.getAs[String](s"__min_$c"), r.getAs[String](s"__max_$c"),
        total - r.getAs[Long](s"__cnt_$c"), r.getAs[Long](s"__ndv_$c"))
    }
  }
}

/** `RESTORE '<path>' VERSION AS OF n` — metadata-only rollback; history
  * keeps moving forward on both formats.
  */
case class GraftRestoreCommand(path: String, version: Long)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    val newV: Long = formatOf(spark, path) match {
      case DeltaFormat   => DeltaLite.restore(spark, path, version)
      case IcebergFormat => IcebergLite.rollbackTo(spark, path, version).toLong
    }
    Seq(Row(version, newV))
  }
}

/** `SHOW FILES [IN] '<path>'` — the live file inventory (the `files`
  * metadata table both formats expose): path, record count, bytes,
  * hive partition tuple. Iceberg rows come from MANIFEST metadata only;
  * Delta record counts/partitions from the log, sizes one fs stat per
  * file.
  */
case class GraftShowFilesCommand(path: String) extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("record_count", LongType, nullable = true)(),
    AttributeReference("size_bytes", LongType, nullable = true)(),
    AttributeReference("partition", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    val df = formatOf(spark, path) match {
      case DeltaFormat   => DeltaLite.files(spark, path)
      case IcebergFormat =>
        IcebergLite.files(spark, path)
          .select("path", "record_count", "size_bytes", "partition")
    }
    df.orderBy("path").collect().toIndexedSeq
  }
}

/** `SHOW PARTITIONS [IN] '<path>'` — [[GraftShowFilesCommand]] rolled up
  * per partition tuple (NULL partition = the unpartitioned root).
  */
case class GraftShowPartitionsCommand(path: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = true)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("record_count", LongType, nullable = true)(),
    AttributeReference("size_bytes", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    import org.apache.spark.sql.functions._
    val filesDf = formatOf(spark, path) match {
      case DeltaFormat   => DeltaLite.files(spark, path)
      case IcebergFormat =>
        IcebergLite.files(spark, path)
          .select("path", "record_count", "size_bytes", "partition")
    }
    filesDf.groupBy("partition")
      .agg(count(lit(1)).as("n_files"),
        sum("record_count").as("record_count"),
        sum("size_bytes").as("size_bytes"))
      .orderBy("partition")
      .collect().toIndexedSeq
  }
}

/** `SHOW TABLES [IN|FROM db]` — the native listing PLUS this session's
  * [[GraftCatalog]] registrations (the reference's maintenance sweeps
  * script `show tables` to feed their optimize/analyze loops,
  * TPC-datagen-notebook.scala:336; graft path-registered tables live in
  * the session registry, not Spark's catalog, so native SHOW TABLES
  * alone cannot drive a sweep over them). Native schema, native rows
  * first (reproduced via the public catalog API — no parser recursion),
  * then registered names not already listed: with `IN db` only that
  * db's registrations append; without it, ALL registrations append
  * (the registry IS the graft namespace — a bare `show tables` sweep
  * should see every table the session can address).
  */
case class GraftShowTablesCommand(db: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("tableName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val native: Seq[Row] = db match {
      case Some(d) =>
        if (spark.sessionState.catalog.databaseExists(d))
          spark.catalog.listTables(d).collect().toSeq.map(t =>
            Row(Option(t.namespace).map(_.mkString(".")).getOrElse(""),
              t.name, t.isTemporary))
        else if (!GraftCatalog.listTables(spark).exists { case (n, _) =>
            n.lastIndexOf('.') > 0 &&
              n.substring(0, n.lastIndexOf('.')) == d.toLowerCase })
          // strict-superset contract: a db that exists in NEITHER the
          // native catalog NOR the graft registry must surface native's
          // NoSuchDatabaseException, not an empty result — interception
          // may widen what SHOW TABLES can see, never silence its errors
          spark.sessionState.catalog.listTables(d).map(t =>
            Row(t.database.getOrElse(""), t.table, false))
        else Seq.empty
      case None =>
        spark.catalog.listTables().collect().toSeq.map(t =>
          Row(Option(t.namespace).map(_.mkString(".")).getOrElse(""),
            t.name, t.isTemporary))
    }
    val seen = native.map(r => (r.getString(0), r.getString(1))).toSet
    val wanted = db.map(_.toLowerCase)
    val graft = GraftCatalog.listTables(spark).flatMap { case (n, _) =>
      val i = n.lastIndexOf('.')
      val (dbPart, tbl) = (n.substring(0, i), n.substring(i + 1))
      if (wanted.forall(_ == dbPart) && !seen((dbPart, tbl)))
        Some(Row(dbPart, tbl, false))
      else None
    }
    native ++ graft
  }
}

/** `DESCRIBE [TABLE] EXTENDED <'<path>' | db.table> <col>` — the
  * per-column statistics form of DESCRIBE (the reference's sweep reads
  * `describe extended <table> <col>` for min/max/null/ndv per column,
  * TPC-datagen-notebook.scala:2131), served for graft tables from the
  * same stats surface ANALYZE (B5) computes: one single-column
  * min/max/count/approx-ndv aggregate over the table read — native
  * (info_name, info_value) row shape, so scripts parsing native output
  * parse this too. Only quoted paths and registered names intercept;
  * a catalog table's native DESCRIBE EXTENDED is never shadowed.
  */
case class GraftDescribeColumnCommand(path: String, column: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("info_name", StringType, nullable = false)(),
    AttributeReference("info_value", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    import org.apache.spark.sql.functions._
    val df = formatOf(spark, path) match {
      case DeltaFormat   => DeltaLite.read(spark, path)
      case IcebergFormat => IcebergLite.read(spark, path)
    }
    val field = df.schema.fields.find(_.name.equalsIgnoreCase(this.column))
      .getOrElse(sys.error(
        s"${this.path}: no column '${this.column}' — table has " +
          df.schema.fieldNames.mkString(", ")))
    val c = col(s"`${field.name}`")
    val r = df.agg(count(lit(1)).as("__n"),
        min(c).cast(StringType).as("__min"),
        max(c).cast(StringType).as("__max"),
        count(c).as("__cnt"),
        approx_count_distinct(c).as("__ndv"))
      .collect().head
    Seq(
      Row("col_name", field.name),
      Row("data_type", field.dataType.simpleString),
      Row("comment", null),
      Row("min", r.getAs[String]("__min")),
      Row("max", r.getAs[String]("__max")),
      Row("num_nulls", (r.getAs[Long]("__n") - r.getAs[Long]("__cnt")).toString),
      Row("distinct_count", r.getAs[Long]("__ndv").toString))
  }
}

/** `MSCK REPAIR TABLE <db.table | '<path>'>` — partition discovery for
  * HIVE-LAYOUT path tables (plain files under `k=v` directories), the
  * datagen notebook's post-write registration verb
  * (resources/TPC-datagen-notebook.scala:1777). One recursive
  * driver-side listing (cost ∝ files, the same class as Spark's own
  * recoverPartitions), the spec's `%xx` escaping and
  * `__HIVE_DEFAULT_PARTITION__` null marker decoded through the shared
  * [[graft.sources.HivePaths]] decoder, one report row per discovered
  * partition. Reads in this engine list partition dirs dynamically, so
  * discovery IS the repair — the report is the verb's product (native
  * MSCK prints the same added-partition inventory). A Delta/Iceberg
  * root refuses loudly: their partitions come from the log/manifests
  * (SHOW PARTITIONS serves them), and directory listing would also
  * count dead files.
  */
case class GraftMsckRepairCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition", StringType, nullable = false)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.sources.HivePaths
    val root = GraftSqlVerbs.resolveTarget(spark, this.path)
    val p = new Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(f.exists(p) && f.getFileStatus(p).isDirectory,
      s"$root: not a directory")
    if (f.exists(new Path(p, "_delta_log")) ||
        f.exists(new Path(p, "metadata/version-hint.text")))
      sys.error(s"$root: MSCK REPAIR is for hive-layout path tables — " +
        "this is a Delta/Iceberg root whose partitions come from the " +
        "log/manifests (use SHOW PARTITIONS)")
    val byPartition =
      scala.collection.mutable.SortedMap.empty[String, (Long, Long)]
    // the shared hidden-path-aware listing (same "data file" definition
    // as DESCRIBE DETAIL's filesystem half)
    graft.maintenance.TableMaintenance.relDataFiles(spark, root)
      .foreach { case (rel, len, _) =>
        val dirs = rel.split("/").dropRight(1)
        if (dirs.nonEmpty && dirs.forall(_.contains("="))) {
          val spec = dirs.map { c =>
            val Array(k, v) = c.split("=", 2)
            val dec = HivePaths.unescape(v)
            s"$k=${if (dec == null) HivePaths.NullMarker else dec}"
          }.mkString("/")
          val (n, bytes) = byPartition.getOrElse(spec, (0L, 0L))
          byPartition(spec) = (n + 1, bytes + len)
        }
      }
    require(byPartition.nonEmpty,
      s"$root: no k=v partition directories found — not a hive-layout " +
        "partitioned table")
    byPartition.toSeq.map { case (spec, (n, bytes)) =>
      Row(spec, n, bytes)
    }
  }
}

/** `ALTER TABLE '<path>' ADD CONSTRAINT <name> CHECK (<expr>)` /
  * `DROP CONSTRAINT <name>` — the Delta CHECK-constraint lifecycle
  * (existing data validated on ADD; every later commit enforces).
  * Delta-only: Iceberg has no table-level constraint channel.
  */
case class GraftConstraintCommand(path: String, name: String,
                                  check: Option[String])
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case DeltaFormat =>
      case IcebergFormat =>
        sys.error(s"$path: CHECK constraints are a Delta surface " +
          "(Iceberg has no table-level constraint channel)")
    }
    check match {
      case Some(expr) =>
        val v = DeltaLite.addCheckConstraint(spark, path, name, expr)
        Seq(Row(v, s"ADD CONSTRAINT $name"))
      case None =>
        val v = DeltaLite.dropCheckConstraint(spark, path, name)
        Seq(Row(v, s"DROP CONSTRAINT $name"))
    }
  }
}

/** `ALTER TABLE '<path>' CLUSTER BY (c1, c2)` / `CLUSTER BY NONE` —
  * declare or drop liquid clustering keys (metadata-only; the next
  * OPTIMIZE re-clusters by them). Delta-only: Iceberg expresses layout
  * through partition transforms instead.
  */
case class GraftClusterByCommand(path: String, cols: Seq[String])
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case DeltaFormat =>
      case IcebergFormat =>
        sys.error(s"$path: liquid clustering is a Delta surface " +
          "(Iceberg lays out via partition transforms — ALTER the spec)")
    }
    if (cols.isEmpty)
      Seq(Row(DeltaLite.clusterByNone(spark, path), "CLUSTER BY NONE"))
    else Seq(Row(DeltaLite.clusterBy(spark, path, cols),
      s"CLUSTER BY (${cols.mkString(", ")})"))
  }
}

/** `ALTER TABLE '<path>' ALTER COLUMN <name> TYPE <type>` — TYPE
  * WIDENING (Delta's `typeWidening` feature): metadata-only, files keep
  * the narrow physical type and scans upcast. Non-widening changes
  * refuse inside [[DeltaLite.widenColumn]]. Delta-only.
  */
case class GraftWidenColumnCommand(path: String, column: String,
                                   toType: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case DeltaFormat =>
      case IcebergFormat =>
        sys.error(s"$path: ALTER COLUMN TYPE rides Delta's typeWidening " +
          "feature — not implemented for Iceberg here")
    }
    val v = DeltaLite.widenColumn(spark, path, column, toType)
    Seq(Row(v, s"ALTER COLUMN $column TYPE $toType"))
  }
}

/** `ALTER TABLE '<path>' ADD|DROP PARTITION FIELD <decl>` — Iceberg
  * partition-spec EVOLUTION (metadata-only; existing files stay bound
  * to the spec they were written under, the next write lands under the
  * new default). `<decl>` is transform DDL: `days(ts)`,
  * `bucket(8, id)`, `truncate(4, s)`. Iceberg-only.
  */
case class GraftPartitionFieldCommand(path: String, decl: String,
                                      add: Boolean)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("spec_id", LongType, nullable = false)(),
    AttributeReference("spec", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case IcebergFormat =>
      case DeltaFormat =>
        sys.error(s"$path: partition-spec evolution is an Iceberg " +
          "surface (Delta lays out via CLUSTER BY / partitionBy)")
    }
    val current = IcebergLite.currentSpecDecls(spark, path)
    def keyOf(d: String) = IcebergLite.parseTransformDecl(d)
    val next =
      if (add) {
        require(!current.map(keyOf).contains(keyOf(decl)),
          s"$path: partition field $decl already in the spec")
        current :+ decl
      } else {
        val kept = current.filterNot(d => keyOf(d) == keyOf(decl))
        require(kept.size < current.size,
          s"$path: partition field $decl not in the current spec " +
            s"(${current.mkString(", ")})")
        kept
      }
    val id = IcebergLite.evolvePartitionSpec(spark, path, next)
    Seq(Row(id.toLong, next.mkString(", ")))
  }
}

/** `ALTER TABLE '<path>' CREATE BRANCH|TAG <name> [AT <snapshot>]` /
  * `DROP BRANCH|TAG <name>` — Iceberg refs (write-audit-publish
  * branches, immutable tags). Iceberg-only.
  */
case class GraftRefCommand(path: String, kind: String, name: String,
                           create: Boolean, at: Option[Long])
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("metadata_version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case IcebergFormat =>
      case DeltaFormat =>
        sys.error(s"$path: branch/tag refs are an Iceberg surface " +
          "(Delta versions by time travel instead)")
    }
    val v =
      if (create && kind == "branch")
        IcebergLite.createBranch(spark, path, name, at)
      else if (create) IcebergLite.createTag(spark, path, name, at)
      else IcebergLite.dropRef(spark, path, name,
        expectedType = Some(kind))
    Seq(Row(v.toLong,
      s"${if (create) "CREATE" else "DROP"} ${kind.toUpperCase} $name"))
  }
}

/** `ALTER TABLE '<path>' FAST FORWARD <branch>` — publish a staged
  * branch onto main (metadata-only; refused unless a true
  * fast-forward). Iceberg-only.
  */
case class GraftFastForwardCommand(path: String, branch: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("metadata_version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case IcebergFormat =>
      case DeltaFormat => sys.error(s"$path: FAST FORWARD is an Iceberg " +
        "branch verb")
    }
    val v = IcebergLite.fastForward(spark, path, branch)
    Seq(Row(v.toLong, s"FAST FORWARD $branch"))
  }
}

/** `REMOVE ORPHAN FILES [FROM] '<path>'` — the Iceberg debris sweep
  * (files no retained snapshot references: lost commit attempts,
  * abandoned staging). On Delta, VACUUM already owns this contract.
  */
case class GraftRemoveOrphansCommand(path: String)
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("removed", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    formatOf(spark, path) match {
      case IcebergFormat =>
      case DeltaFormat => sys.error(s"$path: use VACUUM on Delta tables " +
        "(its retention contract covers unreferenced files)")
    }
    IcebergLite.removeOrphanFiles(spark, path).map(Row(_))
  }
}

/** `CLEANUP LOGS|METADATA '<path>' [RETAIN n VERSIONS]` — metadata
  * retention, the lifecycle half VACUUM doesn't cover: Delta JSON
  * commits below checkpoint+retention (plus superseded checkpoints and
  * orphaned v2 sidecars), Iceberg old `vN.metadata.json` versions.
  */
case class GraftCleanupCommand(path: String, retain: Int,
                               kind: String = "LOGS")
    extends LeafRunnableCommand {
  import GraftSqlVerbs._
  override val output: Seq[Attribute] = Seq(
    AttributeReference("removed", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftSqlVerbs.resolveTarget(spark, this.path)
    // the keyword is the user's intent — CLEANUP METADATA on a Delta
    // table must refuse, not silently delete log commits instead
    val removed = (formatOf(spark, path), kind) match {
      case (DeltaFormat, "LOGS") =>
        DeltaLite.cleanupLogs(spark, path, retain)
      case (IcebergFormat, "METADATA") =>
        IcebergLite.cleanupMetadata(spark, path, retain)
      case (DeltaFormat, other) =>
        sys.error(s"$path: CLEANUP $other is the Iceberg verb — this is " +
          "a Delta table (use CLEANUP LOGS)")
      case (IcebergFormat, other) =>
        sys.error(s"$path: CLEANUP $other is the Delta verb — this is " +
          "an Iceberg table (use CLEANUP METADATA)")
    }
    removed.map(Row(_))
  }
}

/** `REGISTER TABLE <db.table> [AT] '<path>'` / `UNREGISTER TABLE
  * <db.table>` — the explicit layer of [[GraftCatalog]]'s name↔path
  * registry (the catalog-database-location convention needs neither).
  * Metadata-only; the path itself is not touched or validated here —
  * the next verb's format detection owns that, so a registration can
  * precede the table's first commit.
  */
case class GraftRegisterTableCommand(name: String, path: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = path match {
    case Some(p) =>
      GraftCatalog.registerTable(spark, name, p)
      Seq(Row(name, s"REGISTER TABLE AT $p"))
    case None =>
      val had = GraftCatalog.unregisterTable(spark, name)
      require(had, s"$name: not registered (nothing to unregister)")
      Seq(Row(name, "UNREGISTER TABLE"))
  }
}
