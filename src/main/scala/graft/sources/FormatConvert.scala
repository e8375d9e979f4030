package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Zero-copy, metadata-only conversion between the two open table
  * formats — the `CONVERT TO DELTA` / `CONVERT TO ICEBERG` / UniForm
  * verb: both formats are metadata layers over the SAME parquet files,
  * so converting a snapshot means writing the OTHER format's metadata
  * referencing the existing data files in place (absolute paths,
  * protocol-legal in both). A 100 TB table converts in seconds of
  * driver-side footer reads; no data moves, and the converted table
  * keeps data skipping (Delta add-stats / Iceberg manifest bounds are
  * recomputed from the parquet footers at conversion time).
  *
  * The conversion is a SNAPSHOT handoff, exactly like the real verbs:
  * the new table owns its history going forward; later writes to the
  * source do not propagate (and, as with shallow clones, vacuuming /
  * expiring the SOURCE past the converted snapshot breaks the
  * conversion's file references).
  *
  * Refusals, stated: merge-on-read state does not carry — a Delta table
  * with live deletion vectors or an Iceberg table with live delete
  * files must be compacted first (optimizeCompact folds the masks into
  * plain parquet); Delta column-mapped tables keep PHYSICAL parquet
  * names the Iceberg schema would mis-read, so they are refused too.
  */
object FormatConvert {

  /** Delta snapshot → NEW Iceberg table (metadata only). */
  def deltaToIceberg(spark: SparkSession, src: String, dst: String): Long = {
    val s = DeltaLite.snapshot(spark, src)
    require(s.schemaJson.nonEmpty, s"$src: no metaData in log")
    require(s.dvs.isEmpty,
      s"$src: live deletion vectors — optimizeCompact first, then convert")
    require(!s.configuration.get("delta.columnMapping.mode")
        .exists(_ != "none"),
      s"$src: column-mapped table (physical parquet names) — unsupported")
    require(s.partitionColumns.isEmpty,
      s"$src: hive-partitioned table — partition columns live in the " +
        "log/dirs, not the data files; rewrite unpartitioned first")
    val schema = DataType.fromJson(s.schemaJson.get).asInstanceOf[StructType]
    val srcRoot = new Path(src)
    val files = s.files.map(p => new Path(srcRoot, p).toString)
    IcebergLite.addFilesCommit(spark, dst, schema, files)
  }

  /** Iceberg snapshot → NEW Delta table (metadata only). */
  def icebergToDelta(spark: SparkSession, src: String, dst: String): Long = {
    val s = IcebergLite.snapshot(spark, src)
    require(s.deletes.isEmpty,
      s"$src: live delete files — optimizeCompact first, then convert")
    require(s.detail.forall(_.partition.isEmpty),
      s"$src: hive-partitioned table — partition columns live in dir " +
        "names, not the data files; rewrite unpartitioned first")
    val files = s.files.map(p => IcebergLite.resolveDataPath(src, p))
    DeltaLite.addFilesCommit(spark, dst, s.schema, files)
  }
}
