package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{DeltaLite, FormatConvert, IcebergLite}

/** Zero-copy format conversion (FormatConvert): metadata-only handoff
  * of a snapshot between the two open formats — no data file moves,
  * skipping stats recomputed from footers, merge-on-read/mapped state
  * refused with the compact-first remedy named.
  */
class FormatConvertSpec extends SparkSpec {
  import spark.implicits._

  private def base(): String =
    Files.createTempDirectory("graft_fc").toString

  test("delta -> iceberg: same rows through the destination reader, " +
    "ZERO data files written, footer bounds prune on the converted table") {
    val b = base()
    val df = (0L until 200L).map(k => (k, s"r$k", k * 1.5))
      .toDF("id", "name", "score")
    DeltaLite.commit(spark, s"$b/d", df.repartitionByRange(4, col("id")))
    val dataFilesBefore = new java.io.File(s"$b/d").listFiles()
      .count(_.getName.endsWith(".parquet"))
    FormatConvert.deltaToIceberg(spark, s"$b/d", s"$b/i")
    // destination holds METADATA ONLY — not one parquet file of its own
    val dstData = new java.io.File(s"$b/i/data")
    assert(!dstData.exists() || dstData.listFiles().isEmpty)
    assert(new java.io.File(s"$b/d").listFiles()
      .count(_.getName.endsWith(".parquet")) == dataFilesBefore)
    // row-for-row identical through the Iceberg reader
    assert(IcebergLite.read(spark, s"$b/i").orderBy("id").collect().toSeq
      == DeltaLite.read(spark, s"$b/d").orderBy("id").collect().toSeq)
    // conversion recomputed manifest bounds: range reads still skip
    val scan = IcebergLite.readWhere(spark, s"$b/i", "id", 0L, 49L)
    assert(scan.filesSkipped > 0, "converted table must keep skipping")
    assert(scan.df.count() == 50L)
  }

  test("iceberg -> delta: same rows, add-stats prune, and the converted " +
    "table is a normal Delta table going forward (writable, versioned)") {
    val b = base()
    val df = (0L until 120L).map(k => (k, s"v$k")).toDF("k", "s")
    IcebergLite.commit(spark, s"$b/i", df.repartitionByRange(3, col("k")))
    FormatConvert.icebergToDelta(spark, s"$b/i", s"$b/d")
    assert(DeltaLite.read(spark, s"$b/d").orderBy("k").collect().toSeq
      == IcebergLite.read(spark, s"$b/i").orderBy("k").collect().toSeq)
    val scan = DeltaLite.readWhere(spark, s"$b/d", "k", 0L, 39L)
    assert(scan.filesSkipped > 0)
    // the conversion owns its history forward: appends land normally
    DeltaLite.commit(spark, s"$b/d", Seq((999L, "tail")).toDF("k", "s"))
    assert(DeltaLite.read(spark, s"$b/d").count() == 121L)
    assert(IcebergLite.read(spark, s"$b/i").count() == 120L,
      "the source must not see the converted table's writes")
  }

  test("merge-on-read and mapped state refuse with the compact-first " +
    "remedy; compaction then converts cleanly") {
    val b = base()
    // Delta with live DVs
    DeltaLite.commit(spark, s"$b/d", (0L until 30L).toDF("k"))
    DeltaLite.deleteVectors(spark, s"$b/d", Seq(5L).toDF("k"), Seq("k"))
    val e1 = intercept[IllegalArgumentException] {
      FormatConvert.deltaToIceberg(spark, s"$b/d", s"$b/i")
    }
    assert(e1.getMessage.contains("optimizeCompact"))
    // Iceberg with live delete files
    IcebergLite.commit(spark, s"$b/i2", (0L until 30L).toDF("k"))
    IcebergLite.deleteRows(spark, s"$b/i2", Seq(3L).toDF("k"), Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      FormatConvert.icebergToDelta(spark, s"$b/i2", s"$b/d2")
    }
    assert(e2.getMessage.contains("optimizeCompact"))
    // column-mapped Delta
    DeltaLite.commit(spark, s"$b/dm", (0L until 5L).toDF("k"),
      columnMapping = true)
    val e3 = intercept[IllegalArgumentException] {
      FormatConvert.deltaToIceberg(spark, s"$b/dm", s"$b/im")
    }
    assert(e3.getMessage.contains("column-mapped"))
    // the named remedy works: compact, then convert — masks folded in
    DeltaLite.optimizeCompact(spark, s"$b/d", targetFiles = 2)
    FormatConvert.deltaToIceberg(spark, s"$b/d", s"$b/i3")
    assert(IcebergLite.read(spark, s"$b/i3").count() == 29L)
    IcebergLite.optimizeCompact(spark, s"$b/i2", targetFiles = 2)
    FormatConvert.icebergToDelta(spark, s"$b/i2", s"$b/d3")
    assert(DeltaLite.read(spark, s"$b/d3").count() == 29L)
  }
}
