package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.DeltaLite

/** The driver-side snapshot state ceiling (r13 verdict's #6): DeltaLite
  * replays every `add` action (path + stats JSON) into driver memory.
  * This spec MEASURES that cost on a forged 100k-file log — replay
  * touches only the log, never the data files, so the files need not
  * exist — and pins loose upper bounds so a regression in replay
  * complexity (accidental quadratic, per-add fs call) fails loudly.
  * The measured numbers live in SURVEY §5.
  */
class SnapshotScaleSpec extends SparkSpec {
  import spark.implicits._

  private val N = 100000

  test("100k-file log: JSON replay and checkpoint bootstrap stay " +
    "bounded; retained footprint is linear in file count") {
    val t = Files.createTempDirectory("graft_snapceil").toString + "/t"
    DeltaLite.commit(spark, t, Seq((1L, "seed")).toDF("k", "s")) // v0
    // one forged commit adding 100k stats-bearing files (the realistic
    // shape: a backfill); ~35 MB of NDJSON
    val sb = new StringBuilder(N * 300)
    sb.append("""{"commitInfo":{"operation":"BACKFILL","timestamp":0}}""")
      .append('\n')
    var i = 0
    while (i < N) {
      // forged key domain starts at 10^9 — disjoint from the probe range
      // below, so the pruned read only ever opens the REAL seed file
      sb.append("""{"add":{"path":"part-backfill-""").append(i)
        .append(""".parquet","size":1048576,"partitionValues":{},""")
        .append(""""modificationTime":0,"dataChange":true,"stats":""")
        .append(""""{\"numRecords\":1000,\"minValues\":{\"k\":""")
        .append(1000000000L + i)
        .append("""},\"maxValues\":{\"k\":""").append(1000000000L + i)
        .append("""},\"nullCount\":{\"k\":0}}"}}""").append('\n')
      i += 1
    }
    Files.write(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
      sb.toString.getBytes(StandardCharsets.UTF_8))

    val t0 = System.nanoTime()
    val s = DeltaLite.snapshot(spark, t)
    val replayMs = (System.nanoTime() - t0) / 1000000
    assert(s.files.size == N + 1)
    assert(s.stats.size >= N, "stats must ride the replay")
    // retained driver footprint (UTF-16 string bytes of paths + stats)
    val retainedMb = (s.files.map(_.length * 2L).sum +
      s.stats.map { case (k, v) => (k.length + v.length) * 2L }.sum) >> 20
    info(s"JSON replay of ${N + 1} adds: $replayMs ms, " +
      s"~$retainedMb MB retained on the driver")
    assert(replayMs < 60000, s"replay took $replayMs ms — not linear?")
    assert(retainedMb < 200, s"footprint $retainedMb MB — stats blew up?")

    // bootstrap path: one checkpoint, then resolution reads the parquet
    // checkpoint (distributed scan, driver-side collect of the list)
    val cpT0 = System.nanoTime()
    DeltaLite.checkpoint(spark, t)
    val cpWriteMs = (System.nanoTime() - cpT0) / 1000000
    val t1 = System.nanoTime()
    val s2 = DeltaLite.snapshot(spark, t)
    val bootMs = (System.nanoTime() - t1) / 1000000
    assert(s2.files.size == N + 1 && s2.stats.size >= N)
    info(s"checkpoint write: $cpWriteMs ms; bootstrap resolution: $bootMs ms")
    assert(bootMs < 60000, s"bootstrap took $bootMs ms")

    // a pruned read still plans driver-side over the 100k add-stats
    // (statsIntersect over the in-memory map, no I/O): selectiveMerge's
    // planning half must stay interactive at this file count
    val t2 = System.nanoTime()
    val scan = DeltaLite.readWhere(spark, t, "k", 0L, 20L)
    val nSurvived = scan.df.count()
    val planMs = (System.nanoTime() - t2) / 1000000
    assert(scan.filesSkipped == N && nSurvived == 1L,
      s"stats pruning must drop every backfill file: $scan")
    info(s"readWhere plan+scan over ${N + 1} files: $planMs ms")
    assert(planMs < 30000, s"stats planning took $planMs ms")
  }

  test("iceberg 100k-file manifest chain: manifest-list → Avro manifest " +
    "resolution stays bounded and linear; bounds pruning over the " +
    "forged entries stays interactive") {
    import scala.jdk.CollectionConverters._
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import graft.sources.IcebergLite

    val t = Files.createTempDirectory("graft_icesnapceil").toString + "/t"
    IcebergLite.commit(spark, t, Seq((1L, "seed")).toDF("k", "s"))
    val mapper = new ObjectMapper()
    val metaPath = Paths.get(t, "metadata", "v1.metadata.json")
    val meta = mapper.readTree(Files.readAllBytes(metaPath))
      .asInstanceOf[ObjectNode]
    val kFieldId = meta.get("schemas").elements().next()
      .get("fields").elements().next().get("id").asInt() // "k", first col

    // writer-schema copies of the v2 manifest shapes (reads are
    // writer-schema driven, so the forge IS a foreign writer here)
    val entrySchema = new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"sequence_number","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"content","type":"int","default":0},
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"partition","type":{"type":"record","name":"r102","fields":[]}},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"},
        |    {"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"kv1","fields":[{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null},
        |    {"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"kv2","fields":[{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],"default":null}
        |  ]}}
        |]}""".stripMargin)
    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |  {"name":"manifest_path","type":"string"},
        |  {"name":"manifest_length","type":"long"},
        |  {"name":"partition_spec_id","type":"int"},
        |  {"name":"content","type":"int"},
        |  {"name":"sequence_number","type":"long"},
        |  {"name":"added_snapshot_id","type":"long"}
        |]}""".stripMargin)
    def writeAvro(path: java.nio.file.Path, schema: Schema,
                  rows: Iterator[GenericRecord]): Long = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      try { w.create(schema, path.toFile); rows.foreach(w.append) }
      finally w.close()
      Files.size(path)
    }
    def leBytes(v: Long): java.nio.ByteBuffer =
      java.nio.ByteBuffer.wrap(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array())

    // 100 manifests × 1000 entries (the realistic bundling: a compacted
    // 100 TB table carries thousands of entries per manifest, not one)
    val manifests = 100; val perManifest = 1000
    val dfSchema = entrySchema.getField("data_file").schema()
    val boundsArr = dfSchema.getField("lower_bounds").schema().getTypes.get(1)
    val kvSchema = boundsArr.getElementType
    val forged = (0 until manifests).map { m =>
      val rel = f"metadata/forge-m$m%05d.avro"
      val rows = (0 until perManifest).iterator.map { i =>
        val key = 1000000000L + m.toLong * perManifest + i
        def kv(s: Schema, v: Long): GenericRecord = {
          val r = new GenericData.Record(s)
          r.put("key", kFieldId); r.put("value", leBytes(v)); r
        }
        def arr(v: Long): AnyRef = {
          val a = new GenericData.Array[GenericRecord](1, boundsArr)
          a.add(kv(kvSchema, v)); a
        }
        val df = new GenericData.Record(dfSchema)
        df.put("content", 0)
        df.put("file_path", s"data/forge-$m-$i.parquet")
        df.put("file_format", "PARQUET")
        df.put("partition", new GenericData.Record(
          dfSchema.getField("partition").schema()))
        df.put("record_count", 1000L)
        df.put("file_size_in_bytes", 1048576L)
        df.put("lower_bounds", arr(key)); df.put("upper_bounds", arr(key))
        val e = new GenericData.Record(entrySchema)
        e.put("status", 1); e.put("snapshot_id", 2L)
        e.put("sequence_number", 2L); e.put("data_file", df)
        e
      }
      rel -> writeAvro(Paths.get(t, rel), entrySchema, rows)
    }
    // new manifest list = the original snapshot's manifests + the forge
    val snaps = meta.get("snapshots")
    val origList = snaps.elements().next().get("manifest-list").asText()
    val origEntries = {
      val in = new java.io.FileInputStream(new java.io.File(t, origList))
      val s = new org.apache.avro.file.DataFileStream[GenericRecord](
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try s.iterator().asScala.toVector.map(r =>
        (r.get("manifest_path").toString,
          r.get("manifest_length").asInstanceOf[Long]))
      finally s.close()
    }
    val listRel = "metadata/forge-snap-2.avro"
    writeAvro(Paths.get(t, listRel), listSchema,
      (origEntries.map { case (p, len) => (p, len, 1L) } ++
        forged.map { case (p, len) => (p, len, 2L) }).iterator.map {
        case (p, len, seq) =>
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", p); r.put("manifest_length", len)
          r.put("partition_spec_id", 0); r.put("content", 0)
          r.put("sequence_number", seq); r.put("added_snapshot_id", 2L)
          r
      })
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", 2L); snapNode.put("sequence-number", 2L)
    snapNode.put("timestamp-ms", 0L); snapNode.put("manifest-list", listRel)
    val summary = mapper.createObjectNode(); summary.put("operation", "append")
    snapNode.set[ObjectNode]("summary", summary)
    meta.withArray[ArrayNode]("snapshots").add(snapNode)
    val log = mapper.createObjectNode()
    log.put("timestamp-ms", 0L); log.put("snapshot-id", 2L)
    meta.withArray[ArrayNode]("snapshot-log").add(log)
    meta.put("current-snapshot-id", 2L)
    meta.put("last-sequence-number", 2L)
    Files.write(Paths.get(t, "metadata", "v2.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    Files.write(Paths.get(t, "metadata", "version-hint.text"),
      "2".getBytes(StandardCharsets.UTF_8))
    Files.deleteIfExists(Paths.get(t, "metadata", ".version-hint.text.crc"))

    val N = manifests * perManifest
    val t0 = System.nanoTime()
    val s = IcebergLite.snapshot(spark, t)
    val resolveMs = (System.nanoTime() - t0) / 1000000
    assert(s.detail.size == N + 1)
    val retainedMb = (s.detail.map(fi => fi.path.length * 2L +
      fi.lowerBounds.valuesIterator.map(_.length.toLong).sum +
      fi.upperBounds.valuesIterator.map(_.length.toLong).sum).sum) >> 20
    info(s"manifest-chain resolution of ${N + 1} files " +
      s"($manifests manifests): $resolveMs ms, ~$retainedMb MB retained")
    assert(resolveMs < 60000, s"resolution took $resolveMs ms — not linear?")
    assert(retainedMb < 200, s"footprint $retainedMb MB")

    // bounds pruning over the forged entries: the probe range hits only
    // the REAL seed file; every forged file must prune on manifests alone
    val t1 = System.nanoTime()
    val scan = IcebergLite.readWhere(spark, t, "k", 0L, 20L)
    val survived = scan.df.count()
    val planMs = (System.nanoTime() - t1) / 1000000
    assert(scan.filesSkipped == N && survived == 1L,
      s"bound pruning must drop every forged file: $scan")
    info(s"readWhere plan+scan over ${N + 1} manifest entries: $planMs ms")
    assert(planMs < 30000, s"bound planning took $planMs ms")
  }
}
