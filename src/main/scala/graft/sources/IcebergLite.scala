package graft.sources

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Native reader/writer for the (public) Apache Iceberg table format —
  * the second open lakehouse-table protocol, alongside [[DeltaLite]],
  * covered WITHOUT any format jars (none exist in this environment; see
  * README "Table-format boundary"). The format is an open spec
  * (iceberg.apache.org/spec): a table is a parquet-file directory plus
  * `metadata/` holding one immutable JSON table-metadata file per commit
  * (`v<N>.metadata.json`, discovered via `version-hint.text` — the spec's
  * file-system-tables catalog), each naming a current snapshot whose
  * *manifest list* (Avro) points at *manifest files* (Avro) that enumerate
  * the data files. Where Delta is log-REPLAY (state = fold of actions),
  * Iceberg is snapshot-ISOLATION (every commit materializes its complete
  * file graph) — supporting both shapes natively is the point of having
  * two implementations rather than one abstraction.
  *
  * Covered: format-version 1 and 2 metadata; snapshot resolution at the
  * current or any retained snapshot id (time travel); manifest-list and
  * manifest Avro decode (writer-schema driven, so extra v2 fields pass
  * through); Iceberg↔Spark schema conversion (primitives, decimal,
  * struct/list/map); a commit writer (append / overwrite) producing
  * spec-shaped v2 metadata + v2-encoded manifests (explicit per-entry
  * sequence numbers, data_file.content); DESCRIBE HISTORY; snapshot
  * expiration (the format's GC verb) and bin-packing compaction; v2
  * ROW-LEVEL DELETES both ways — position and equality delete files
  * read via [[readWithDeletes]] (sequence-number applicability: ≤ for
  * positional, strict < for equality) and written via [[deleteRows]]
  * (merge-on-read DELETE: one delete file + DELETE manifest, no data
  * rewrite); format-version 3 READS (r15 — deletion vectors as
  * `deletion-vector-v1` blobs in Puffin files, resolved through the
  * shared DV probe; written via [[deleteRowsV3]]). Out of scope
  * (documented, not silently wrong): format-version 4+ — REFUSED
  * loudly rather than mis-read; v3 row-lineage columns are not
  * surfaced.
  *
  * Scale shape: metadata resolution is driver-side and bounded by the
  * manifest count — exactly how the reference implementation plans scans
  * (Iceberg's own value proposition is that planning never lists the
  * directory). Manifest lists/manifests are a few KB per commit; the data
  * is never touched during planning — the snapshot feeds Spark's parquet
  * source as an explicit file list, so scans keep pushdown, pruning, and
  * vectorized decode. At 100 TB the same structure holds: a snapshot
  * with thousands of manifests resolves in one sequential pass over Avro
  * headers, and per-column min/max pruning over the manifests' recorded
  * `lower_bounds`/`upper_bounds` is implemented in [[readWhere]] —
  * metadata-only file skipping with the residual predicate pushed to the
  * surviving scans.
  *
  * Writer concurrency: [[commit]] is the plain single-writer path (the
  * version-hint publish is last-rename-wins absent a CAS catalog);
  * [[commitContended]] layers optimistic concurrency on top — stage
  * once under a writer-unique token, claim the next metadata version via
  * put-if-absent, and on a lost race rebase appends / conflict
  * read-modify-writes, same contract as DeltaLite's. Readers are always
  * safe: metadata files are immutable once named, and a torn commit
  * leaves only unreferenced files that no published metadata names.
  *
  * Reference: the reference's ETL flows land transactional tables via a
  * managed engine (tasks/Query History API to Delta_withmetrics.py:196-230);
  * this re-expresses the same contract on the other open format.
  */
object IcebergLite {

  private val mapper = new ObjectMapper()

  private def metaDir(table: String)  = new Path(table, "metadata")
  private def dataDir(table: String)  = new Path(table, "data")
  private def hintFile(table: String) = new Path(metaDir(table), "version-hint.text")
  private def metaFile(table: String, v: Int) =
    new Path(metaDir(table), s"v$v.metadata.json")

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ------------------------------------------------------------ Avro I/O
  /** Manifest-list entry (spec: `manifest_file`, field-ids 500+). Only
    * the v1-required fields are written; reads are writer-schema driven
    * so real tables' extra fields (content, sequence numbers, partition
    * summaries) are visible when present.
    */
  private val ManifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin)

  /** Manifest entry (spec: `manifest_entry` wrapping `data_file`,
    * field-ids 0-2 / 100+). `block_size_in_bytes` is v1-required
    * (dropped in v2) — written for v1 conformance, ignored on read.
    */
  /** The spec's `map<int, binary>` bound maps (field-ids 125/128) encode
    * as Avro arrays of key/value records with `logicalType: map` — Avro
    * maps only key on strings.
    */
  private val BoundsFieldsJson: String =
    """{"name":"lower_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k126_v127","fields":[{"name":"key","type":"int","field-id":126},{"name":"value","type":"bytes","field-id":127}]},"logicalType":"map"}],"default":null,"field-id":125},
      |{"name":"upper_bounds","type":["null",{"type":"array","items":{"type":"record","name":"k129_v130","fields":[{"name":"key","type":"int","field-id":129},{"name":"value","type":"bytes","field-id":130}]},"logicalType":"map"}],"default":null,"field-id":128}""".stripMargin

  /** DATA-manifest entry, v2 encoding: the entry carries an explicit
    * nullable `sequence_number` (field-id 3) and data_file carries
    * `content` (field-id 134, always 0 = data here) — what real v2
    * readers expect when the table metadata says format-version 2.
    * Reads stay writer-schema driven ([[opt]]), so v1 manifests from
    * foreign/legacy writers still decode with list-level inheritance.
    */
  private val ManifestEntrySchema: Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |    {"name":"content","type":"int","field-id":134,"default":0},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"block_size_in_bytes","type":"long","field-id":105},
      |    $BoundsFieldsJson
      |  ]}}
      |]}""".stripMargin)

  /** v2 manifest-list entry: the v1 fields plus `content` (0 = data,
    * 1 = deletes; field-id 517) and `sequence_number` (field-id 515) —
    * what a delete commit writes so readers can route delete manifests
    * and order applicability. Reads stay writer-schema driven, so v1
    * lists (no such fields) and richer real-writer lists both decode.
    */
  private val ManifestListSchemaV2: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |  {"name":"manifest_path","type":"string","field-id":500},
      |  {"name":"manifest_length","type":"long","field-id":501},
      |  {"name":"partition_spec_id","type":"int","field-id":502},
      |  {"name":"content","type":"int","field-id":517},
      |  {"name":"sequence_number","type":"long","field-id":515},
      |  {"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin)

  /** Manifest entry for DELETE manifests (spec v2 "Delete Manifests"):
    * the data_file struct gains `content` (1 = position deletes, 2 =
    * equality deletes; field-id 134) and `equality_ids` (the schema
    * field ids an equality delete matches on; field-id 135), and the
    * entry carries an explicit `sequence_number` (field-id 3) governing
    * which data files the deletes apply to.
    */
  private val DeleteManifestEntrySchema: Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2d","fields":[
      |    {"name":"content","type":"int","field-id":134},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102d","fields":[]}},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}
      |  ]}}
      |]}""".stripMargin)

  /** v3 delete-manifest entry: the v2 delete shape plus the
    * deletion-vector placement triple (spec v3 "Deletion vectors"):
    * `referenced_data_file` (143), `content_offset` (144),
    * `content_size_in_bytes` (145) — a content=1 entry carrying them
    * points at a `deletion-vector-v1` blob inside a Puffin file instead
    * of a positional-delete parquet.
    */
  private val DeleteManifestEntrySchemaV3: Schema = new Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      |  {"name":"status","type":"int","field-id":0},
      |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2d3","fields":[
      |    {"name":"content","type":"int","field-id":134},
      |    {"name":"file_path","type":"string","field-id":100},
      |    {"name":"file_format","type":"string","field-id":101},
      |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102d3","fields":[]}},
      |    {"name":"record_count","type":"long","field-id":103},
      |    {"name":"file_size_in_bytes","type":"long","field-id":104},
      |    {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135},
      |    {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
      |    {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
      |    {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145}
      |  ]}}
      |]}""".stripMargin)

  /** Field access tolerant of writer-schema variance (GenericRecord.get
    * THROWS on a name the writer schema lacks — v1 files have no
    * `content` field, v2 files do).
    */
  private def opt(r: GenericRecord, field: String): Option[AnyRef] =
    Option(r.getSchema.getField(field)).flatMap(_ => Option(r.get(field)))

  private def readAvro(f: FileSystem, p: Path): Seq[GenericRecord] = {
    val in = f.open(p)
    val stream = new DataFileStream[GenericRecord](
      in, new GenericDatumReader[GenericRecord]())
    try stream.iterator().asScala.toVector
    finally { stream.close() } // closes the underlying FSDataInputStream
  }

  private def writeAvro(f: FileSystem, p: Path, schema: Schema,
                        rows: Seq[GenericRecord],
                        meta: Map[String, String] = Map.empty): Long = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    val out = f.create(p, true)
    try {
      w.create(schema, out)
      rows.foreach(w.append)
    } finally w.close()
    f.getFileStatus(p).getLen
  }

  // -------------------------------------------- Iceberg ⇄ Spark schemas
  /** Iceberg schema JSON → Spark StructType (spec "Schemas" — primitives
    * plus struct/list/map; `required` maps to non-nullable).
    */
  private[graft] def icebergToSpark(schema: JsonNode): StructType = {
    def convert(t: JsonNode): DataType =
      if (t.isTextual) primitive(t.asText())
      else t.get("type").asText() match {
        case "struct" => StructType(t.get("fields").elements().asScala.map { f =>
          StructField(f.get("name").asText(), convert(f.get("type")),
            nullable = !f.get("required").asBoolean())
        }.toSeq)
        case "list" => ArrayType(convert(t.get("element")),
          containsNull = !Option(t.get("element-required")).exists(_.asBoolean()))
        case "map" => MapType(convert(t.get("key")), convert(t.get("value")),
          valueContainsNull = !Option(t.get("value-required")).exists(_.asBoolean()))
        case other => sys.error(s"iceberg type unsupported: $other")
      }
    def primitive(s: String): DataType = s match {
      case "boolean"     => BooleanType
      case "int"         => IntegerType
      case "long"        => LongType
      case "float"       => FloatType
      case "double"      => DoubleType
      case "date"        => DateType
      case "string"      => StringType
      case "uuid"        => StringType
      case "binary"      => BinaryType
      case "timestamp"   => TimestampNTZType
      case "timestamptz" => TimestampType
      case d if d.startsWith("decimal(") =>
        val Array(p, sc) = d.stripPrefix("decimal(").stripSuffix(")").split(",")
        DecimalType(p.trim.toInt, sc.trim.toInt)
      case f if f.startsWith("fixed[") => BinaryType
      case other => sys.error(s"iceberg primitive unsupported: $other")
    }
    convert(schema).asInstanceOf[StructType]
  }

  /** Spark StructType → Iceberg schema JSON with spec-conformant unique
    * field ids (depth-first, 1-based — the id assignment real writers use
    * for a fresh table). Returns (schemaNode, lastColumnId).
    */
  private[graft] def sparkToIceberg(st: StructType,
                                    startId: Int = 0): (ObjectNode, Int) = {
    var id = startId
    def nextId(): Int = { id += 1; id }
    def convert(dt: DataType): Either[String, ObjectNode] = dt match {
      case BooleanType      => Left("boolean")
      case IntegerType      => Left("int")
      case ShortType        => Left("int")
      case ByteType         => Left("int")
      case LongType         => Left("long")
      case FloatType        => Left("float")
      case DoubleType       => Left("double")
      case DateType         => Left("date")
      case StringType       => Left("string")
      case BinaryType       => Left("binary")
      case TimestampNTZType => Left("timestamp")
      case TimestampType    => Left("timestamptz")
      case d: DecimalType   => Left(s"decimal(${d.precision}, ${d.scale})")
      case s: StructType =>
        val n = mapper.createObjectNode()
        n.put("type", "struct")
        val fields = n.putArray("fields")
        s.fields.foreach(f => fields.add(fieldNode(f)))
        Right(n)
      case ArrayType(e, containsNull) =>
        val n = mapper.createObjectNode()
        n.put("type", "list")
        n.put("element-id", nextId())
        setType(n, "element", convert(e))
        n.put("element-required", !containsNull)
        Right(n)
      case MapType(k, v, valueNull) =>
        val n = mapper.createObjectNode()
        n.put("type", "map")
        n.put("key-id", nextId())
        setType(n, "key", convert(k))
        n.put("value-id", nextId())
        setType(n, "value", convert(v))
        n.put("value-required", !valueNull)
        Right(n)
      case other => sys.error(s"spark type unsupported in iceberg: $other")
    }
    def setType(n: ObjectNode, key: String, t: Either[String, ObjectNode]): Unit =
      t match {
        case Left(s)     => n.put(key, s); ()
        case Right(node) => n.set(key, node); ()
      }
    def fieldNode(f: StructField): ObjectNode = {
      val n = mapper.createObjectNode()
      n.put("id", nextId())
      n.put("name", f.name)
      n.put("required", !f.nullable)
      setType(n, "type", convert(f.dataType))
      n
    }
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", 0)
    val fields = root.putArray("fields")
    st.fields.foreach(f => fields.add(fieldNode(f)))
    (root, id)
  }

  // ------------------------------------------------------------ reading
  /** Committed metadata versions, ascending (from `v<N>.metadata.json`
    * names; `version-hint.text` is a convenience pointer, not the truth).
    */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val dir = metaDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json"))
      .filter(_.forall(_.isDigit)).map(_.toInt).sorted
  }

  private def readMetadata(f: FileSystem, p: Path): JsonNode = {
    val in = f.open(p)
    try mapper.readTree(new String(
      org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Latest table metadata (or a pinned metadata version). */
  def metadata(spark: SparkSession, table: String,
               version: Option[Int] = None): JsonNode = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"$table: no iceberg metadata")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"$table: metadata version $v not in $vs")
    val node = readMetadata(fs(spark, metaDir(table)), metaFile(table, v))
    val fv = node.get("format-version").asInt()
    // v3 accepted for READ: its delete shape (deletion vectors in
    // Puffin files, referenced per data file) resolves in
    // readWithDeletes; row-lineage columns are not surfaced. Anything
    // newer refuses loudly.
    require(fv <= 3, s"$table: iceberg format-version $fv unsupported — " +
      "refusing")
    node
  }

  /** One live data file of a snapshot, as the manifests describe it.
    * `seq` is the v2 data sequence number (0 for v1 tables) — the
    * ordering key delete-file applicability is decided on.
    */
  final case class FileInfo(path: String, recordCount: Long, sizeBytes: Long,
                            partition: Map[String, String],
                            lowerBounds: Map[Int, Array[Byte]] = Map.empty,
                            upperBounds: Map[Int, Array[Byte]] = Map.empty,
                            seq: Long = 0L)

  /** One delete file of a v2 snapshot: `content` 1 = position deletes
    * (file_path + pos rows), 2 = equality deletes (rows of the columns
    * named by `equalityIds`); `seq` is the delete's sequence number —
    * position deletes apply to data files with dataSeq ≤ seq, equality
    * deletes to dataSeq < seq (the spec's strict ordering, which lets a
    * row re-inserted AFTER the delete survive it).
    */
  /** v3 deletion vectors extend the position-delete entry with the
    * referenced data file and the blob's placement inside the Puffin
    * file ([[refDataFile]]/[[contentOffset]]/[[contentSize]] — spec
    * field-ids 143/144/145); all None on v2-and-below entries.
    */
  final case class DeleteFileInfo(path: String, content: Int, seq: Long,
                                  equalityIds: Seq[Int],
                                  refDataFile: Option[String] = None,
                                  contentOffset: Option[Long] = None,
                                  contentSize: Option[Long] = None)

  /** Resolved snapshot state: data files + delete files + the
    * Spark-typed schema.
    */
  /** `schemaId` is the schema era this snapshot resolved under (None on
    * legacy metadata). `schemaHistory` (schema-id → field-id → name,
    * populated only when the table has evolved through >1 schema) and
    * `seqToSchemaId` (sequence number → write-era schema-id) are what
    * [[readWithDeletes]] uses to align files written under an earlier
    * era's names after a rename — zero extra I/O, both come from the
    * metadata already in hand.
    */
  final case class Snapshot(snapshotId: Long, schema: StructType,
                            detail: Seq[FileInfo],
                            deletes: Seq[DeleteFileInfo] = Seq.empty,
                            schemaId: Option[Int] = None,
                            schemaHistory: Map[Int, Map[Int, String]] = Map.empty,
                            seqToSchemaId: Map[Long, Int] = Map.empty) {
    def files: Seq[String] = detail.map(_.path)
  }

  /** [[resolvePath]] for FormatConvert's file handoff. */
  private[sources] def resolveDataPath(table: String, p: String): String =
    resolvePath(table, p)

  private def resolvePath(table: String, p: String): String = {
    // manifests may store absolute URIs (real writers) or table-relative
    // paths (ours); both resolve to a readable location
    val path = new Path(p)
    if (path.isAbsolute || p.contains(":/")) p
    else new Path(table, p).toString
  }

  /** Canonical file-path form for position-delete matching: the spec
    * mandates matching on the FULL `file_path`, not the base name — two
    * files with identical base names in different directories (foreign
    * partitioned layouts, converted tables mixing sources) must not
    * cross-apply deletes. Scheme prefix and redundant slashes are
    * stripped (`file:///x`, `file:/x` and a scan's `_metadata.file_path`
    * all canonicalize alike); relative paths resolve against the table
    * root. Driver twin of [[canonCol]].
    */
  private def canonPath(tableAbs: String, p: String): String = {
    val noScheme = p.replaceFirst("^[A-Za-z][A-Za-z0-9+.\\-]*:/*", "/")
      .replaceFirst("^/+", "/")
    if (noScheme.startsWith("/")) noScheme else s"$tableAbs/$p"
  }

  /** Scheme-and-slash-stripped table root, the base [[canonPath]] and
    * [[canonCol]] resolve relative manifest paths against.
    */
  private def canonTableRoot(spark: SparkSession, table: String): String =
    canonPath("", fs(spark, new Path(table))
      .makeQualified(new Path(table)).toString)

  /** Column twin of [[canonPath]] — runs per row on the scan/delete
    * sides, pure string ops (stays in codegen).
    */
  private def canonCol(tableAbs: String,
                       c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{concat, lit, regexp_replace, when}
    val noScheme = regexp_replace(
      regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.\\-]*:/*", "/"), "^/+", "/")
    when(noScheme.startsWith("/"), noScheme)
      .otherwise(concat(lit(tableAbs + "/"), c))
  }

  /** Resolve a snapshot (current, or pinned by snapshot id) to its data
    * file list by walking manifest-list → manifests. Refuses v2 DELETE
    * manifests and delete-content data files rather than returning rows
    * that row-level deletes should have masked.
    */
  def snapshot(spark: SparkSession, table: String,
               snapshotId: Option[Long] = None): Snapshot = {
    val meta = metadata(spark, table)
    val f = fs(spark, metaDir(table))
    val snaps = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    require(snaps.nonEmpty, s"$table: no snapshots")
    val targetId = snapshotId.getOrElse(meta.get("current-snapshot-id").asLong())
    val snap = snaps.find(_.get("snapshot-id").asLong() == targetId)
      .getOrElse(sys.error(s"$table: snapshot $targetId not found " +
        "(expired, or never committed)"))

    // schema resolution: the LATEST snapshot reads under the table's
    // CURRENT schema (so a rename is visible immediately); a PINNED
    // time-travel snapshot reads under its own era's schema-id — the
    // names a reader of that snapshot saw then. "schemas" list (v2) or
    // the legacy single "schema" (v1 writers).
    val isCurrent = targetId == meta.get("current-snapshot-id").asLong()
    val wantSid: Option[Int] =
      if (isCurrent) Option(meta.get("current-schema-id")).map(_.asInt())
      else Option(snap.get("schema-id")).map(_.asInt())
        .orElse(Option(meta.get("current-schema-id")).map(_.asInt()))
    val schemaNode = Option(meta.get("schemas")).flatMap { arr =>
      wantSid.flatMap(want => arr.elements().asScala.find(s =>
        Option(s.get("schema-id")).exists(_.asInt() == want)))
    }.orElse(Option(meta.get("schema")))
      .getOrElse(sys.error(s"$table: metadata has no schema"))
    val schema = icebergToSpark(schemaNode)

    // manifest list (normal) or legacy inline "manifests" array. v2
    // lists route by `content`: 0 = data manifests, 1 = DELETE manifests
    // (position/equality delete files) — both read here; per-manifest
    // sequence numbers carry into applicability ordering.
    val manifestEntries: Seq[(String, Int, Long)] =
      Option(snap.get("manifest-list")) match {
        case Some(ml) =>
          readAvro(f, new Path(resolvePath(table, ml.asText()))).map { r =>
            val content = opt(r, "content").map(_.asInstanceOf[Int]).getOrElse(0)
            val seq = opt(r, "sequence_number")
              .map(_.asInstanceOf[Long]).getOrElse(0L)
            (r.get("manifest_path").toString, content, seq)
          }
        case None => Option(snap.get("manifests"))
          .map(_.elements().asScala.map(a => (a.asText(), 0, 0L)).toSeq)
          .getOrElse(sys.error(s"$table: snapshot $targetId has no manifest list"))
      }

    // a DELETED entry in any manifest of the snapshot masks the file's
    // ADDED entry in an earlier manifest (the partial-rewrite shape:
    // selective merges keep old manifests and tombstone replaced files
    // in the new one)
    val deleted = scala.collection.mutable.Set.empty[String]
    val deleteFiles = Seq.newBuilder[DeleteFileInfo]
    val files = manifestEntries.flatMap { case (mp, mContent, mSeq) =>
      readAvro(f, new Path(resolvePath(table, mp))).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        val entrySeq = opt(e, "sequence_number")
          .collect { case l: java.lang.Long => l.longValue() }.getOrElse(mSeq)
        val content = opt(df, "content").map(_.asInstanceOf[Int]).getOrElse(0)
        if (status == 2) { // DELETED: file dropped at this snapshot
          deleted += df.get("file_path").toString
          None
        } else if (mContent == 1 || content > 0) {
          require(content == 1 || content == 2,
            s"$table: delete file with content=$content — not in the v2 " +
              "vocabulary, refusing")
          val eqIds = opt(df, "equality_ids") match {
            case Some(arr: java.util.Collection[_]) =>
              arr.asScala.map(_.asInstanceOf[Int]).toSeq
            case _ => Seq.empty[Int]
          }
          require(content == 1 || eqIds.nonEmpty,
            s"$table: equality delete file without equality_ids — refusing")
          // v3 DV entries: referenced data file + blob placement
          val refFile = opt(df, "referenced_data_file").map(_.toString)
          val cOff = opt(df, "content_offset")
            .collect { case l: java.lang.Long => l.longValue() }
          val cSize = opt(df, "content_size_in_bytes")
            .collect { case l: java.lang.Long => l.longValue() }
          require(cOff.isEmpty || (refFile.nonEmpty && cSize.nonEmpty),
            s"$table: deletion-vector entry missing referenced_data_file/" +
              "content_size_in_bytes — refusing")
          deleteFiles += DeleteFileInfo(df.get("file_path").toString,
            content, entrySeq, eqIds, refFile, cOff, cSize)
          None
        } else {
          val part = Option(df.get("partition"))
            .map(_.asInstanceOf[GenericRecord]) match {
              case Some(p) => p.getSchema.getFields.asScala.map(fl =>
                fl.name() -> Option(p.get(fl.name())).map(_.toString).orNull)
                .toMap
              case None => Map.empty[String, String]
            }
          def boundsOf(field: String): Map[Int, Array[Byte]] =
            opt(df, field) match {
              case Some(arr: java.util.Collection[_]) =>
                arr.asScala.collect { case r: GenericRecord =>
                  val bb = r.get("value")
                    .asInstanceOf[java.nio.ByteBuffer].duplicate()
                  val bytes = new Array[Byte](bb.remaining())
                  bb.get(bytes)
                  r.get("key").asInstanceOf[Int] -> bytes
                }.toMap
              case _ => Map.empty
            }
          Some(FileInfo(df.get("file_path").toString,
            opt(df, "record_count").map(_.asInstanceOf[Long]).getOrElse(-1L),
            opt(df, "file_size_in_bytes").map(_.asInstanceOf[Long]).getOrElse(-1L),
            part, boundsOf("lower_bounds"), boundsOf("upper_bounds"),
            entrySeq))
        }
      }
    }.distinctBy(_.path).filterNot(fi => deleted.contains(fi.path))
    // schema-era maps for rename alignment — only materialized when the
    // table actually evolved through more than one schema
    val schemaHistory: Map[Int, Map[Int, String]] =
      Option(meta.get("schemas")).map(_.elements().asScala.toSeq.flatMap { sn =>
        Option(sn.get("schema-id")).map(_.asInt()).map(_ ->
          sn.get("fields").elements().asScala
            .map(fn => fn.get("id").asInt() -> fn.get("name").asText()).toMap)
      }.toMap).filter(_.size > 1).getOrElse(Map.empty)
    val seqToSid: Map[Long, Int] =
      if (schemaHistory.isEmpty) Map.empty
      else snaps.flatMap { sn =>
        for {
          sq  <- Option(sn.get("sequence-number")).map(_.asLong())
          sid <- Option(sn.get("schema-id")).map(_.asInt())
        } yield sq -> sid
      }.toMap
    Snapshot(targetId, schema, files,
      // several DV entries legitimately share ONE Puffin file_path —
      // identity for dedup is (path, referenced file, blob offset)
      deleteFiles.result().distinctBy(d =>
        (d.path, d.refDataFile, d.contentOffset))
        .filterNot(d => deleted.contains(d.path)),
      wantSid, schemaHistory, seqToSid)
  }

  /** Metadata-only scan planning (the format's 100 TB value proposition:
    * the file set, sizes, row counts, and partition values come from
    * manifests — the data and the directory listing are never touched).
    * One row per live data file; filter this frame on `partition` and
    * hand the surviving paths to [[readFiles]] for a manifest-pruned
    * scan. Doubles as the DESCRIBE FILES inventory.
    */
  def planFiles(spark: SparkSession, table: String,
                snapshotId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    snapshot(spark, table, snapshotId).detail
      .map(fi => (fi.path, fi.recordCount, fi.sizeBytes, fi.partition))
      .toDF("file_path", "record_count", "file_size_in_bytes", "partition")
  }

  /** Read an IcebergLite/Iceberg table as a DataFrame at the current or a
    * pinned snapshot. The file list feeds Spark's parquet source with the
    * metadata schema — an empty snapshot yields an empty frame WITH the
    * committed schema, and scans keep pushdown + pruning (spec-pinned).
    */
  def read(spark: SparkSession, table: String,
           snapshotId: Option[Long] = None): DataFrame = {
    val s = snapshot(spark, table, snapshotId)
    readWithDeletes(spark, table, s, s.detail)
  }

  /** Scan `subset` of a snapshot's data files with v2 row-level deletes
    * applied (merge-on-read): POSITION deletes anti-join on (canonical
    * full data-file path, `_metadata.row_index`) — the spec matches on
    * `file_path`, and [[canonPath]] keeps identically-named files in
    * different directories apart; applicable when dataSeq ≤ deleteSeq;
    * EQUALITY deletes anti-join on the columns their `equality_ids`
    * name — applicable strictly dataSeq < deleteSeq, so a row
    * re-inserted after the delete survives it (the spec's ordering).
    * Data files are grouped by sequence number (group count ∝ snapshot
    * history, not data) so each group joins only the delete files that
    * govern it. Cost ∝ data scanned + delete rows; the delete sides are
    * small CDC-shaped files and broadcast under AQE.
    */
  private def readWithDeletes(spark: SparkSession, table: String,
                              s: Snapshot, subset: Seq[FileInfo],
                              keepMeta: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    // rename-era alignment applies when the table evolved through more
    // than one schema AND this snapshot resolved a known era
    val targetEra: Map[Int, String] =
      s.schemaId.flatMap(s.schemaHistory.get).getOrElse(Map.empty)
    // (read-with schema, written→target renames) for one sequence group:
    // a group written under a different era with the SAME field-id set
    // reads under its WRITTEN names and relabels by id; anything else
    // (same era, unknown era, add/drop between eras) reads by name.
    def writeSchemaFor(seq: Long): (StructType, Map[String, String]) = {
      val written = s.seqToSchemaId.get(seq)
        .flatMap(s.schemaHistory.get).getOrElse(targetEra)
      if (targetEra.isEmpty || written == targetEra ||
          written.keySet != targetEra.keySet) (s.schema, Map.empty)
      else {
        val ren: Map[String, String] = targetEra.flatMap { case (id, tn) =>
          written.get(id).filter(_ != tn).map(tn -> _)
        }
        (StructType(s.schema.fields.map(f =>
          f.copy(name = ren.getOrElse(f.name, f.name)))), ren)
      }
    }
    val needAlign = targetEra.nonEmpty &&
      subset.map(_.seq).distinct.exists(sq => writeSchemaFor(sq)._2.nonEmpty)
    if (s.deletes.isEmpty && !keepMeta && !needAlign)
      return readFileList(spark, table, s.schema, subset.map(_.path))
    val dataCols = s.schema.fieldNames.toIndexedSeq.map(n => col(s"`$n`")) ++
      (if (keepMeta) Seq(col("__if"), col("__ip")) else Nil)
    val fieldNames: Map[Int, String] =
      if (targetEra.nonEmpty) targetEra
      else {
        val meta = metadata(spark, table)
        currentSchemaNode(meta, table).get("fields").elements().asScala
          .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
      }
    val tableAbs = canonTableRoot(spark, table)
    // v3 deletion vectors, hoisted ABOVE the per-sequence-group loop:
    // each Puffin blob is read + deserialized exactly ONCE for the whole
    // snapshot and ONE broadcast carries every bitmap — a deep history
    // (many sequence groups) must not pay G× the blob I/O or hold G
    // near-identical broadcasts. Applicability (dvSeq >= dataSeq) folds
    // in per referenced data file, which has exactly one sequence
    // number, so the per-group filter below stays a pure probe.
    val dvEntries = s.deletes.filter(d => d.content == 1 &&
      d.contentOffset.isDefined)
    val dvBc: Option[org.apache.spark.broadcast.Broadcast[Map[String, Array[Byte]]]] =
      if (dvEntries.isEmpty) None
      else {
        val fsys = fs(spark, new Path(table))
        val blobOnce: Map[(String, Long), DeletionVectors.Bitmap64] =
          dvEntries.groupBy(d => (d.path, d.contentOffset.get)).map {
            case ((p, off), ds) =>
              (p, off) -> DeletionVectors.Bitmap64.deserialize(
                Puffin.dvBitmap(Puffin.readBlob(fsys,
                  new Path(resolvePath(table, p)), off,
                  ds.head.contentSize.get)))
          }
        val fileSeq: Map[String, Long] = subset.map(fi =>
          canonPath(tableAbs, resolvePath(table, fi.path)) -> fi.seq).toMap
        val merged: Map[String, Array[Byte]] = dvEntries
          .groupBy(d => canonPath(tableAbs,
            resolvePath(table, d.refDataFile.get)))
          .flatMap { case (ref, ds) =>
            val applicable = fileSeq.get(ref).toSeq
              .flatMap(sq => ds.filter(_.seq >= sq))
            if (applicable.isEmpty) None
            else Some(ref -> applicable
              .map(d => blobOnce((d.path, d.contentOffset.get)))
              .reduce(_.or(_)).serialize())
          }
        if (merged.isEmpty) None
        else Some(spark.sparkContext.broadcast(merged))
      }
    val groups = subset.groupBy(_.seq).toSeq.sortBy(_._1)
    val parts = groups.map { case (seq, files) =>
      val (readSchema, renames) = writeSchemaFor(seq)
      val raw = readFileList(spark, table, readSchema, files.map(_.path))
        .withColumn("__if", canonCol(tableAbs, col("_metadata.file_path")))
        .withColumn("__ip", col("_metadata.row_index"))
      var df =
        if (renames.isEmpty) raw
        else raw.select(s.schema.fieldNames.toIndexedSeq.map(n =>
          col(s"`${renames.getOrElse(n, n)}`").as(n)) :+
          col("__if") :+ col("__ip"): _*)
      val pos = s.deletes.filter(d => d.content == 1 && d.seq >= seq &&
        d.contentOffset.isEmpty)
      if (pos.nonEmpty) {
        val posDf = spark.read
          .parquet(pos.map(d => resolvePath(table, d.path)): _*)
          .select(canonCol(tableAbs, col("file_path")).as("__if"),
            col("pos").as("__ip"))
        df = df.join(posDf, Seq("__if", "__ip"), "left_anti")
      }
      // v3 deletion vectors: the shared snapshot-wide broadcast built
      // above, applied as a codegen'd row-index probe — the same
      // masking kernel Delta DVs use, no join at all. Rows probe by
      // their own file path, so the shared map is group-safe; skip the
      // filter entirely when no DV governs this group's sequence.
      if (dvBc.isDefined && dvEntries.exists(_.seq >= seq))
        df = df.filter(!DeletionVectors.dvDeleted(dvBc.get, col("__if"),
          col("__ip")))
      val eqGroups = s.deletes.filter(d => d.content == 2 && d.seq > seq)
        .groupBy(_.equalityIds)
      eqGroups.foreach { case (ids, dels) =>
        val cols = ids.map(id => fieldNames.getOrElse(id,
          sys.error(s"$table: equality_ids references unknown field $id")))
        val eqDf = spark.read
          .parquet(dels.map(d => resolvePath(table, d.path)): _*)
          .select(cols.map(n => col(s"`$n`")): _*).distinct()
        df = df.join(eqDf, cols, "left_anti")
      }
      df.select(dataCols: _*)
    }
    parts.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema))
  }

  /** What [[readWhere]] scanned — same economics contract as
    * DeltaLite.SkippingScan.
    */
  final case class SkippingScan(df: DataFrame, filesScanned: Int,
                                filesSkipped: Int)

  /** Stats-pruned READ on the Iceberg side — the manifests' spec
    * `lower_bounds`/`upper_bounds` maps applied to scan planning, the
    * Delta [[DeltaLite.readWhere]] counterpart: files whose recorded
    * bound range on `keyCol` cannot contain a row in `[lo, hi]` are
    * dropped from the plan using MANIFEST METADATA ONLY (no data or
    * listing I/O — planFiles' 100 TB planning story, now per column, not
    * just per partition); survivors scan with the residual predicate
    * pushed down. Files from writers that recorded no bounds scan
    * conservatively. The key's type comes from the table schema, and a
    * mistyped bound is refused rather than silently compared in the
    * wrong domain.
    */
  /** Resolve a top-level primitive column's (iceberg type, field id)
    * from already-parsed table metadata — the key for the manifest bound
    * maps. Resolves the CURRENT schema by `current-schema-id` (an
    * evolved external table's `schemas` array holds every historical
    * schema; head would be the oldest).
    */
  /** The CURRENT schema node (`schemas` keyed by `current-schema-id`, or
    * the legacy single `schema`).
    */
  private def currentSchemaNode(meta: JsonNode, table: String): JsonNode =
    Option(meta.get("schemas"))
      .map(_.elements().asScala.toSeq)
      .flatMap { seq =>
        Option(meta.get("current-schema-id")).map(_.asInt()) match {
          case Some(id) =>
            seq.find(s => Option(s.get("schema-id")).exists(_.asInt() == id))
              .orElse(seq.headOption)
          case None => seq.headOption
        }
      }
      .orElse(Option(meta.get("schema")))
      .getOrElse(sys.error(s"$table: metadata has no schema"))

  private def topField(meta: JsonNode, table: String,
                       name: String): (String, Int) = {
    val fieldNode = currentSchemaNode(meta, table).get("fields")
      .elements().asScala
      .find(_.get("name").asText() == name)
      .getOrElse(sys.error(s"$table: no column $name"))
    require(fieldNode.get("type").isTextual,
      s"$table.$name: bounds pruning needs a primitive column")
    (fieldNode.get("type").asText(), fieldNode.get("id").asInt())
  }

  /** The DEFAULT partition spec's fields — `partition-specs` keyed by
    * `default-spec-id` (v2) or the legacy flat `partition-spec` (v1).
    */
  private[graft] def partitionSpecFields(meta: JsonNode)
      : Seq[IcebergTransforms.PartField] = {
    val specId = Option(meta.get("default-spec-id")).map(_.asInt()).getOrElse(0)
    Option(meta.get("partition-specs"))
      .flatMap(arr => arr.elements().asScala
        .find(s => Option(s.get("spec-id")).exists(_.asInt() == specId))
        .map(_.get("fields").elements().asScala.toSeq))
      .orElse(Option(meta.get("partition-spec"))
        .map(_.elements().asScala.toSeq))
      .getOrElse(Seq.empty)
      .map(n => IcebergTransforms.PartField(n.get("name").asText(),
        n.get("transform").asText(), n.get("source-id").asInt()))
  }

  /** UTF-8 bytes under unsigned lexicographic order — the domain parquet
    * stats, Iceberg bound truncation, and Spark's binary string
    * comparison all agree on. Java String.compareTo (UTF-16 code units)
    * diverges for supplementary-plane characters, so string bounds are
    * compared HERE, never as Strings.
    */
  private final class Utf8Bytes(val bytes: Array[Byte])
      extends Comparable[Utf8Bytes] {
    def compareTo(o: Utf8Bytes): Int = {
      val n = math.min(bytes.length, o.bytes.length)
      var i = 0
      while (i < n) {
        val c = (bytes(i) & 0xFF) - (o.bytes(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      bytes.length - o.bytes.length
    }
  }

  /** A query key in the column's comparison domain: UTF-8 bytes for
    * strings, exact IEEE doubles for float/double (matching what the
    * residual `col >= lit(x)` filter compares — a decimal-string
    * BigDecimal of 0.3 is NOT the double 0.3), integer BigDecimal for
    * int/long.
    */
  private def keyComparable(tpe: String, x: Any): Comparable[Any] =
    (tpe match {
      case "string" => new Utf8Bytes(
        x.toString.getBytes(StandardCharsets.UTF_8))
      case "float" | "double" =>
        java.lang.Double.valueOf(x.toString.toDouble)
      case _ => new java.math.BigDecimal(x.toString)
    }).asInstanceOf[Comparable[Any]]

  def readWhere(spark: SparkSession, table: String, keyCol: String,
                lo: Any, hi: Any): SkippingScan = {
    import org.apache.spark.sql.functions.col
    val (tpe, fid) = topField(metadata(spark, table), table, keyCol)
    require(Set("int", "long", "float", "double", "string")(tpe),
      s"$table.$keyCol: bounds pruning unsupported for type $tpe")
    val isString = tpe == "string"
    require(isString == lo.isInstanceOf[String] &&
        isString == hi.isInstanceOf[String],
      s"$table.$keyCol is $tpe; bounds " +
        s"(${lo.getClass.getSimpleName}, ${hi.getClass.getSimpleName}) " +
        "must match the column type")
    val (cmpLo, cmpHi) = (keyComparable(tpe, lo), keyComparable(tpe, hi))
    val snap = snapshot(spark, table)
    val (scanned, skipped) = snap.detail.partition { fi =>
      (fi.lowerBounds.get(fid), fi.upperBounds.get(fid)) match {
        case (Some(lb), Some(ub)) =>
          decodeBound(tpe, ub).compareTo(cmpLo) >= 0 &&
            decodeBound(tpe, lb).compareTo(cmpHi) <= 0
        case _ => true // no recorded bounds: scan conservatively
      }
    }
    val base = readWithDeletes(spark, table, snap, scanned)
    SkippingScan(base.filter(col(keyCol) >= lo && col(keyCol) <= hi),
      scanned.size, skipped.size)
  }

  /** One source-column predicate for [[readWherePart]]: a range
    * (`lo`/`hi`, inclusive) or an equality (`eq`). Timestamp/date
    * bounds accept `java.sql.Timestamp`/`Date` or ISO strings
    * (`"1994-01-01"`, `"1994-01-01T12:00:00"`), read as UTC.
    */
  final case class PartPred(col: String, lo: Any = null, hi: Any = null,
                            eq: Any = null) {
    require((eq != null) != (lo != null && hi != null),
      s"PartPred($col): give eq OR lo+hi")
  }

  /** PARTITION-TRANSFORM file pruning (spec "Scan Planning"): for each
    * predicate on a SOURCE column, drop every data file whose manifest
    * partition value under the table's spec transforms cannot contain a
    * matching row — `days(ts)`/`months`/`years`/`hours` prune ranges,
    * `bucket[N]` prunes equalities (the hash is the spec's murmur3, so
    * this is valid on FOREIGN bucket-partitioned tables too),
    * `truncate[W]` prunes both (order-preserving), identity prunes both.
    * Planning is manifest-metadata only (O(files) driver work, zero data
    * I/O — at 100 TB on a days-partitioned table a one-week predicate
    * plans away ~99.9% of the scan before Spark sees a path). Survivors
    * scan with the residual predicates pushed down; `void`, unknown
    * transforms, and files with null partition values scan
    * conservatively. Complements [[readWhere]]'s column-bound pruning —
    * partition values prune even where a writer recorded no bounds
    * (e.g. timestamp columns).
    */
  def readWherePart(spark: SparkSession, table: String,
                    preds: Seq[PartPred]): SkippingScan = {
    import org.apache.spark.sql.functions.col
    val meta = metadata(spark, table)
    val spec = partitionSpecFields(meta)
    val idToField: Map[Int, (String, String)] =
      currentSchemaNode(meta, table).get("fields").elements().asScala
        .map(f => f.get("id").asInt() ->
          (f.get("name").asText(),
            if (f.get("type").isTextual) f.get("type").asText() else "complex"))
        .toMap
    val snap = snapshot(spark, table)
    var kept = snap.detail
    preds.foreach { p =>
      spec.filter(tf => idToField.get(tf.sourceId).exists(_._1 == p.col))
        .foreach { tf =>
          val tpe = idToField(tf.sourceId)._2
          kept = kept.filter(fi =>
            partMayMatch(tf, tpe, fi.partition.get(tf.name), p))
        }
    }
    val base = readWithDeletes(spark, table, snap, kept)
    val filtered = preds.foldLeft(base) { (d, p) =>
      if (p.eq != null) d.filter(col(p.col) === p.eq)
      else d.filter(col(p.col) >= p.lo && col(p.col) <= p.hi)
    }
    SkippingScan(filtered, kept.size, snap.detail.size - kept.size)
  }

  /** Can a file with partition value `pv` under spec field `tf` contain
    * a row matching `p`? Missing/null values and unprunable shapes
    * (bucket under a range, unknown transforms) answer true — pruning
    * must never be a correctness dependency.
    */
  private def partMayMatch(tf: IcebergTransforms.PartField, icebergType: String,
                           pv: Option[String], p: PartPred): Boolean = {
    val v = pv.orNull
    if (v == null) return true
    val isEq = p.eq != null
    val T = IcebergTransforms
    tf.transform match {
      case "identity" => icebergType match {
        case "int" | "long" | "float" | "double" | "string" =>
          // same comparison domain as readWhere's bound pruning
          val x = keyComparable(icebergType, v)
          if (isEq) x.compareTo(keyComparable(icebergType, p.eq)) == 0
          else x.compareTo(keyComparable(icebergType, p.lo)) >= 0 &&
            x.compareTo(keyComparable(icebergType, p.hi)) <= 0
        case _ => true
      }
      case t if T.isTimeTransform(t) =>
        val x = v.toLong
        if (isEq) x == T.timeValue(t, icebergType, p.eq)
        else x >= T.timeValue(t, icebergType, p.lo) &&
          x <= T.timeValue(t, icebergType, p.hi)
      case t if T.bucketN(t).isDefined =>
        if (!isEq) true
        else v.toInt == T.bucketOf(icebergType, p.eq, T.bucketN(t).get)
      case t if T.truncW(t).isDefined =>
        val w = T.truncW(t).get
        icebergType match {
          case "int" | "long" =>
            val x = v.toLong
            if (isEq) x == T.truncateOf(icebergType, p.eq, w).asInstanceOf[Long]
            else x >= T.truncateOf(icebergType, p.lo, w).asInstanceOf[Long] &&
              x <= T.truncateOf(icebergType, p.hi, w).asInstanceOf[Long]
          case "string" =>
            // prefix truncation is monotone: row ∈ [lo,hi] ⇒
            // trunc(lo) ≤ pv ≤ trunc(hi) — compared in the UNSIGNED
            // UTF-8 byte domain (keyComparable), the order parquet
            // stats and Spark binary comparison use; Java String
            // ordering diverges for supplementary-plane characters
            if (isEq) v == T.truncateOf(icebergType, p.eq, w)
            else {
              val c = keyComparable("string", v)
              c.compareTo(keyComparable("string",
                T.truncateOf(icebergType, p.lo, w))) >= 0 &&
                c.compareTo(keyComparable("string",
                  T.truncateOf(icebergType, p.hi, w))) <= 0
            }
          case _ => true
        }
      case _ => true // void / unknown: scan conservatively
    }
  }

  /** Scan an explicit subset of a snapshot's files (the consumer half of
    * [[planFiles]]-driven manifest pruning). Paths must come from the
    * same table's manifests.
    */
  def readFiles(spark: SparkSession, table: String, files: Seq[String],
                snapshotId: Option[Long] = None): DataFrame = {
    val s = snapshot(spark, table, snapshotId)
    val live = s.files.toSet
    require(files.forall(live.contains),
      s"$table: readFiles paths must be manifest-listed data files")
    val want = files.toSet
    readWithDeletes(spark, table, s, s.detail.filter(fi => want(fi.path)))
  }

  private def readFileList(spark: SparkSession, table: String,
                           schema: StructType, files: Seq[String]): DataFrame = {
    val paths = files.map(p => resolvePath(table, p))
    if (paths.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    // partition-spec EVOLUTION leaves one snapshot spanning several
    // directory layouts (old files under id_bucket=N/, new under
    // grp_bucket=M/, or at the root) — one basePath discovery over the
    // mix dies on conflicting partition column names, so group files by
    // their hive-key signature and give each group its own consistent
    // read; single-layout snapshots (the steady state) stay ONE scan.
    val KeyRe = """([^/=]+)=[^/]*""".r
    def signature(p: String): Seq[String] = {
      val rel = p.stripPrefix(table).stripPrefix("/")
      KeyRe.findAllMatchIn(rel)
        .filter(m => rel.indexOf('/', m.start) >= 0) // dir components only
        .map(_.group(1)).toSeq
    }
    val groups = paths.groupBy(signature).toSeq.sortBy(_._1.mkString(","))
    val frames = groups.map { case (sig, ps) =>
      if (sig.isEmpty) spark.read.schema(schema).parquet(ps: _*)
      else {
        // hive-layout group: partition columns live in the directory
        // names, not the data files — basePath discovery re-attaches
        // them (and gives Catalyst real PartitionFilters pruning).
        // Discovery infers partition value types, so re-cast drifted
        // columns to the committed schema and restore column order.
        val raw = spark.read.option("basePath", table).parquet(ps: _*)
        val typed = schema.fields.foldLeft(raw) { (d, fld) =>
          if (d.schema.fieldNames.contains(fld.name) &&
              d.schema(fld.name).dataType != fld.dataType)
            d.withColumn(fld.name, org.apache.spark.sql.functions
              .col(fld.name).cast(fld.dataType))
          else d
        }
        typed.select(schema.fieldNames
          .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      }
    }
    frames.reduce(_.unionByName(_))
  }

  // ------------------------------------------------------------ writing
  /** A type node with every field/element/key/value id removed — the
    * id-insensitive comparison domain for "same type, different era"
    * checks (ids are assignment artifacts, not type identity).
    */
  private def stripTypeIds(t: JsonNode): JsonNode = t match {
    case o: ObjectNode =>
      val c = o.deepCopy[ObjectNode]()
      c.remove("element-id"); c.remove("key-id"); c.remove("value-id")
      Option(c.get("fields")).foreach(_.elements().asScala.foreach {
        case fo: ObjectNode =>
          fo.remove("id")
          fo.set[JsonNode]("type", stripTypeIds(fo.get("type")))
          ()
        case _ =>
      })
      Seq("element", "key", "value").foreach(k =>
        Option(c.get(k)).foreach(v => c.set[JsonNode](k, stripTypeIds(v))))
      c
    case other => other // textual primitive
  }

  private def record(schema: Schema)(fields: (String, Any)*): GenericRecord = {
    val r = new GenericData.Record(schema)
    fields.foreach { case (k, v) => r.put(k, v) }
    r
  }

  /** Avro primitive for a partition column (identity transform keeps the
    * source type; the manifest stores the typed value, spec "Partition
    * Transforms").
    */
  private def partitionAvroType(dt: DataType): String = dt match {
    case LongType                           => "long"
    case IntegerType | ShortType | ByteType => "int"
    case StringType                         => "string"
    case BooleanType                        => "boolean"
    case DoubleType                         => "double"
    case FloatType                          => "float"
    case other => sys.error(s"partition column type unsupported: $other")
  }

  /** Manifest-entry schema with the r102 partition record carrying one
    * nullable typed field per partition column (empty = the static
    * unpartitioned schema).
    */
  private def manifestEntrySchema(partCols: Seq[StructField]): Schema =
    if (partCols.isEmpty) ManifestEntrySchema
    else {
      val fields = partCols.zipWithIndex.map { case (c, i) =>
        s"""{"name":${mapper.writeValueAsString(c.name)},"type":["null","${partitionAvroType(c.dataType)}"],"default":null,"field-id":${1000 + i}}"""
      }.mkString(",")
      new Schema.Parser().parse(
        s"""{"type":"record","name":"manifest_entry","fields":[
           |  {"name":"status","type":"int","field-id":0},
           |  {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
           |  {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
           |  {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
           |    {"name":"content","type":"int","field-id":134,"default":0},
           |    {"name":"file_path","type":"string","field-id":100},
           |    {"name":"file_format","type":"string","field-id":101},
           |    {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[$fields]}},
           |    {"name":"record_count","type":"long","field-id":103},
           |    {"name":"file_size_in_bytes","type":"long","field-id":104},
           |    {"name":"block_size_in_bytes","type":"long","field-id":105},
           |    $BoundsFieldsJson
           |  ]}}
           |]}""".stripMargin)
    }

  /** Per-column [min, max] from a parquet footer as the spec's
    * single-value binary (little-endian numerics, UTF-8 strings), keyed
    * by Iceberg field id — the payload of the manifest's
    * `lower_bounds`/`upper_bounds` maps. Only unambiguous top-level
    * primitives are recorded (int/long/float/double, UTF-8 strings);
    * anything else is skipped rather than mis-ranged, and consumers
    * treat a missing bound conservatively — the same contract as
    * DeltaLite's add-stats. Any footer trouble degrades to no bounds,
    * never a failed commit.
    */
  private def footerBounds(
      reader: org.apache.parquet.hadoop.ParquetFileReader,
      topFields: Map[String, (Int, DataType)])
      : (Map[Int, Array[Byte]], Map[Int, Array[Byte]]) =
    try {
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (Comparable[Any], Comparable[Any])]
      for (b <- reader.getFooter.getBlocks.asScala;
           c <- b.getColumns.asScala) {
        val parts = c.getPath.toArray
        val st: org.apache.parquet.column.statistics.Statistics[_] =
          c.getStatistics
        if (parts.length == 1 && topFields.contains(parts(0)) &&
            st != null && !st.isEmpty && st.hasNonNullValue) {
          val logical = c.getPrimitiveType.getLogicalTypeAnnotation
          val isString = logical != null &&
            logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
          // gate on the TABLE type, not just the parquet annotation: a
          // raw BinaryType column also has a null annotation, and
          // round-tripping arbitrary bytes through UTF-8 would mis-range
          // it ("skipped rather than mis-ranged", like DeltaLite)
          val wantType = topFields(parts(0))._2
          val supported = wantType match {
            case StringType => isString
            case IntegerType | LongType | FloatType | DoubleType =>
              logical == null
            case _ => false
          }
          if (supported) {
            // strings fold in UTF-8 BYTE order — the order parquet stats
            // and the bound truncation contract use; UTF-16 String
            // compare would pick the wrong extreme past the BMP
            def v(x: Any): Comparable[Any] = (x match {
              case bin: org.apache.parquet.io.api.Binary =>
                new Utf8Bytes(bin.getBytes)
              case other => other
            }).asInstanceOf[Comparable[Any]]
            val (mn, mx) = (v(st.genericGetMin(): Any),
              v(st.genericGetMax(): Any))
            acc.get(parts(0)) match {
              case Some((lo, hi)) => acc(parts(0)) = (
                if (mn.compareTo(lo) < 0) mn else lo,
                if (mx.compareTo(hi) > 0) mx else hi)
              case None => acc(parts(0)) = (mn, mx)
            }
          }
        }
      }
      val lower = scala.collection.mutable.Map.empty[Int, Array[Byte]]
      val upper = scala.collection.mutable.Map.empty[Int, Array[Byte]]
      acc.foreach { case (name, (mn, mx)) =>
        for (lb <- singleValueBytes(mn); ub <- singleValueBytes(mx)) {
          lower(topFields(name)._1) = lb
          upper(topFields(name)._1) = ub
        }
      }
      (lower.toMap, upper.toMap)
    } catch {
      case scala.util.control.NonFatal(_) => (Map.empty, Map.empty)
    }

  /** Spec "Binary single-value serialization": little-endian numerics,
    * UTF-8 strings.
    */
  private def singleValueBytes(v: Any): Option[Array[Byte]] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    v match {
      case i: java.lang.Integer => Some(le(4).putInt(i).array())
      case l: java.lang.Long    => Some(le(8).putLong(l).array())
      case f: java.lang.Float   => Some(le(4).putFloat(f).array())
      case d: java.lang.Double  => Some(le(8).putDouble(d).array())
      case u: Utf8Bytes         => Some(u.bytes)
      case s: String            => Some(s.getBytes(StandardCharsets.UTF_8))
      case _                    => None
    }
  }

  /** Decode a spec single-value bound into [[keyComparable]]'s domain for
    * the type: UTF-8 bytes for strings, IEEE doubles for float/double
    * (infinities compare fine as doubles; a decimal constructor would
    * throw on them), integer BigDecimal for int/long.
    */
  private def decodeBound(tpe: String, b: Array[Byte]): Comparable[Any] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    (tpe match {
      case "string" => new Utf8Bytes(b)
      case "int"    => new java.math.BigDecimal(le.getInt)
      case "long"   => java.math.BigDecimal.valueOf(le.getLong)
      case "float"  => java.lang.Double.valueOf(le.getFloat.toDouble)
      case "double" => java.lang.Double.valueOf(le.getDouble)
      case other    => sys.error(s"bounds unsupported for type $other")
    }).asInstanceOf[Comparable[Any]]
  }

  /** A hive dir value, typed for the manifest's partition record (the
    * shared [[HivePaths]] decoder; a null marker stores null).
    */
  private def typedPartitionValue(raw: String, dt: DataType): Any = {
    val v = HivePaths.unescape(raw)
    if (v == null) return null
    if (v == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case LongType                           => java.lang.Long.valueOf(v)
      case IntegerType | ShortType | ByteType => java.lang.Integer.valueOf(v)
      case StringType                         => v
      case BooleanType                        => java.lang.Boolean.valueOf(v)
      case DoubleType                         => java.lang.Double.valueOf(v)
      case FloatType                          => java.lang.Float.valueOf(v)
      case other => sys.error(s"partition column type unsupported: $other")
    }
  }

  /** Commit `df` as the next snapshot: land parquet parts under `data/`,
    * write one ADDED-entry manifest (+ DELETED entries when overwriting),
    * a manifest list, and a new immutable `v<N>.metadata.json`; publish
    * by rewriting `version-hint.text` last. Snapshot ids are sequential
    * (deterministic logs, like DeltaLite's ts=0 — wall-clock ids add
    * nothing here and would break reproducible tests). Returns the new
    * snapshot id.
    */
  def commit(spark: SparkSession, table: String, df: DataFrame,
             overwrite: Boolean = false, operation: String = "",
             partitionBy: Seq[String] = Nil,
             replacing: Option[Seq[String]] = None,
             partitionTransforms: Seq[String] = Nil): Long =
    commitAttempt(spark, table, df, overwrite, operation, partitionBy,
      replacing, nameToken = None, ifAbsent = false,
      partitionTransforms = partitionTransforms)
      .getOrElse(sys.error("unreachable: non-contended publish cannot lose"))

  /** `"days(ts)"` / `"bucket(8, id)"` / `"truncate(4, s)"` /
    * `"months(ts)"` / `"years(ts)"` / `"hours(ts)"` — the Iceberg DDL
    * transform syntax → (spec transform string, source column).
    */
  private[graft] def parseTransformDecl(s: String): (String, String) = {
    val TimeRe  = """(?i)(years?|months?|days?|hours?)\s*\(\s*([\w.]+)\s*\)""".r
    val ArgRe   = """(?i)(bucket|truncate)\s*\(\s*(\d+)\s*,\s*([\w.]+)\s*\)""".r
    val IdentRe = """(?i)identity\s*\(\s*([\w.]+)\s*\)""".r
    s.trim match {
      case TimeRe(t, col) =>
        (t.toLowerCase.stripSuffix("s"), col)
      case ArgRe(t, n, col) =>
        (s"${t.toLowerCase}[$n]", col)
      case IdentRe(col) => ("identity", col)
      case other => sys.error(s"unparseable partition transform: '$other' " +
        "(expected e.g. days(ts), bucket(8, id), truncate(4, s))")
    }
  }

  /** Spec-field name for a transform, the Iceberg convention:
    * `ts_day`, `id_bucket`, `s_trunc`; identity keeps the column name.
    */
  private def transformFieldName(transform: String, source: String): String =
    transform match {
      case "identity" => source
      case t if t.startsWith("bucket[")   => s"${source}_bucket"
      case t if t.startsWith("truncate[") => s"${source}_trunc"
      case t => s"${source}_$t"
    }

  /** One resolved partition-spec column of a commit: manifest field
    * `name` of `resultType`, computed as `transform(source)`.
    */
  private final case class SpecCol(name: String, transform: String,
                                   source: String, resultType: DataType)

  private def commitAttempt(spark: SparkSession, table: String, df: DataFrame,
                            overwrite: Boolean, operation: String,
                            partitionBy: Seq[String],
                            replacing: Option[Seq[String]],
                            nameToken: Option[String],
                            ifAbsent: Boolean,
                            partitionTransforms: Seq[String] = Nil,
                            toBranch: Option[String] = None): Option[Long] = {
    val root = new Path(table)
    val f = fs(spark, root)
    val vs = versions(spark, table)
    val prevMeta = if (vs.isEmpty) None else Some(metadata(spark, table))
    val prevSnaps: Seq[JsonNode] = prevMeta
      .flatMap(m => Option(m.get("snapshots")))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val snapId: Long =
      if (prevSnaps.isEmpty) 0L
      else prevSnaps.map(_.get("snapshot-id").asLong()).max + 1
    val metaV = if (vs.isEmpty) 1 else vs.last + 1
    // branch commits append on the BRANCH head (refs[name]), leaving
    // main (current-snapshot-id) untouched — the WAP shape
    require(toBranch.isEmpty || (!overwrite && replacing.isEmpty),
      s"$table: branch commits are append-only (no overwrite/replace)")
    val prevRefs: Option[ObjectNode] = prevMeta.flatMap(m =>
      Option(m.get("refs")).collect { case o: ObjectNode => o })
    val prevHead: Option[Long] = toBranch match {
      case Some(b) =>
        val r = prevRefs.flatMap(o => Option(o.get(b))).getOrElse(
          sys.error(s"$table: no ref $b — createBranch first"))
        require(r.get("type").asText() == "branch",
          s"$table: ref $b is a tag — tags are immutable")
        Some(r.get("snapshot-id").asLong())
      case None =>
        prevMeta.map(_.get("current-snapshot-id").asLong()).filter(_ >= 0)
    }
    // contended read-modify-write liveness: the files this commit
    // replaces must still be live at the tip (a winner landing before
    // our base read invalidates the rewrite without a CAS collision)
    if (ifAbsent) replacing.foreach { r =>
      val live = snapshot(spark, table).files.toSet
      if (!r.forall(live.contains))
        throw new java.util.ConcurrentModificationException(
          s"$table: files this rewrite replaces are no longer live — " +
            "re-run the read-modify-write against the new tip")
    }
    require(partitionBy.isEmpty || partitionTransforms.isEmpty,
      s"$table: give partitionBy (identity) OR partitionTransforms, not both")
    // unified spec columns: identity partitionBy keeps its source column
    // in the DIRECTORY (hive layout, recovered at read); non-identity
    // transforms derive an EXTRA column for the directory and keep the
    // source column in the data files. An APPEND that declares nothing
    // INHERITS the table's current default spec (the real engine's
    // contract — the table's spec governs writes; without this an
    // undeclared append silently evolves a partitioned table to an
    // unpartitioned default and pruning dies); overwrites re-declare
    // the layout explicitly or flatten.
    val effectiveTransforms: Seq[String] =
      if (partitionTransforms.isEmpty && partitionBy.isEmpty &&
          !overwrite && replacing.isEmpty && prevMeta.nonEmpty)
        currentSpecDecls(spark, table)
      else partitionTransforms
    val specCols: Seq[SpecCol] =
      if (effectiveTransforms.nonEmpty) effectiveTransforms.map { decl =>
        val (tf, src) = parseTransformDecl(decl)
        val srcType = df.schema(src).dataType
        SpecCol(transformFieldName(tf, src), tf, src,
          IcebergTransforms.resultType(tf, srcType))
      }
      else partitionBy.map(c =>
        SpecCol(c, "identity", c, df.schema(c).dataType))
    val partCols: Seq[StructField] =
      specCols.map(sc => StructField(sc.name, sc.resultType, nullable = true))
    // append-time schema drift: additive evolution only (every existing
    // column kept, same type) — the new metadata's schema governs the
    // whole table, so old files read with nulls for added columns;
    // dropped/retyped columns on append are refused loudly. Overwrites
    // may replace the schema freely.
    prevMeta.filter(_ => !overwrite && replacing.isEmpty).foreach { m =>
      val prevSchema = icebergToSpark(currentSchemaNode(m, table))
      val missing = prevSchema.fields.filterNot(pf =>
        df.schema.fields.exists(nf =>
          nf.name == pf.name && nf.dataType == pf.dataType))
      require(missing.isEmpty,
        s"$table: append schema drops/retypes columns " +
          s"${missing.map(_.name).mkString(", ")} — only additive " +
          "evolution is allowed on append (overwrite to replace the schema)")
      // field ids are assigned positionally (sparkToIceberg, depth-first)
      // and old manifests keep bounds under the OLD ids — a reordered
      // append would silently re-key every surviving file's bounds, so
      // existing columns must stay a prefix in their original order
      val prefix = df.schema.fields.take(prevSchema.fields.length)
        .map(f => (f.name, f.dataType)).toSeq
      require(prefix == prevSchema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"$table: append must keep existing columns in their original " +
          "order (field ids are positional; new columns go at the end)")
    }

    // effective schema node for this commit. Field-id STABILITY is the
    // load-bearing rule: same-named fields REUSE their previous node
    // verbatim (ids, nested ids), and genuinely NEW fields get ids
    // allocated strictly PAST last-column-id — never a positional
    // re-assignment, which would recycle a dropped column's id and make
    // the rename-era alignment resurrect its data under the new name
    // (and silently re-key every surviving file's manifest bounds). A
    // node identical to one in the history reuses its schema-id;
    // otherwise it joins the history under a fresh id, so each snapshot
    // still resolves under its own era (snapshot()/readWithDeletes).
    val prevSchemasArr: Seq[JsonNode] = prevMeta.map { m =>
      Option(m.get("schemas")).map(_.elements().asScala.toSeq)
        .getOrElse(Option(m.get("schema")).toSeq)
    }.getOrElse(Seq.empty).map { s =>
      val o = s.deepCopy[ObjectNode]()
      if (!o.has("schema-id")) o.put("schema-id", 0) // legacy single-schema
      o: JsonNode
    }
    val prevLastColId = prevMeta.flatMap(pm =>
      Option(pm.get("last-column-id")).map(_.asInt())).getOrElse(0)
    val prevCurrentFields: Map[String, JsonNode] = prevMeta.map(m =>
      currentSchemaNode(m, table).get("fields").elements().asScala
        .map(fn => fn.get("name").asText() -> fn).toMap)
      .getOrElse(Map.empty)
    val (candidate: ObjectNode, candidateLastColId: Int) =
      if (prevCurrentFields.isEmpty || (overwrite && replacing.isEmpty))
        sparkToIceberg(df.schema) // creation / full schema replacement
      else {
        val root = mapper.createObjectNode()
        root.put("type", "struct")
        root.put("schema-id", 0) // provisional; final id assigned below
        val fieldsArr = root.putArray("fields")
        var nextId = prevLastColId
        df.schema.fields.foreach { fl =>
          prevCurrentFields.get(fl.name) match {
            case Some(pf) =>
              // name-matched reuse must also TYPE-match (id-insensitive):
              // the replacing path skips the additive-evolution guard,
              // and silently keeping the old type while writing files in
              // the frame's type would corrupt every later read
              val (sub, _) = sparkToIceberg(StructType(Seq(fl)))
              val freshT = sub.get("fields").get(0).get("type")
              require(stripTypeIds(pf.get("type")) == stripTypeIds(freshT),
                s"$table: column ${fl.name} type drift " +
                  s"(table ${pf.get("type")} vs frame $freshT) — a " +
                  "merge/replace rewrite may not retype columns")
              fieldsArr.add(pf.deepCopy[JsonNode]())
            case None =>
              val (sub, innerMax) =
                sparkToIceberg(StructType(Seq(fl)), startId = nextId)
              fieldsArr.add(sub.get("fields").get(0).deepCopy[JsonNode]())
              nextId = innerMax
          }
        }
        (root, nextId)
      }
    // a NAME that ever existed under a DIFFERENT field id (dropped or
    // renamed away) must not come back: this reader resolves parquet
    // columns by name, so a re-added same-named column would read the
    // old files' stale physical values as the new column's data. A FULL
    // overwrite is exempt — it removes every prior file, so there is
    // nothing stale left to read.
    if (!(overwrite && replacing.isEmpty)) {
      val historyIdsByName: Map[String, Set[Int]] = prevSchemasArr
        .flatMap(_.get("fields").elements().asScala.map(fn =>
          fn.get("name").asText() -> fn.get("id").asInt()))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      candidate.get("fields").elements().asScala.foreach { fn =>
        val nm = fn.get("name").asText()
        val id = fn.get("id").asInt()
        require(!historyIdsByName.get(nm).exists(ids => !ids.contains(id)),
          s"$table: column $nm previously existed under a different field " +
            "id (dropped or renamed away) — re-adding the name would read " +
            "old files' stale values; use a new column name")
      }
    }
    def schemaSig(n: JsonNode): Seq[JsonNode] =
      n.get("fields").elements().asScala.toSeq
    val matchedSchema = prevSchemasArr.find(s =>
      schemaSig(s) == schemaSig(candidate))
    val (schemaNode: ObjectNode, schemaId: Int,
         allSchemas: Seq[JsonNode], lastColId: Int) = matchedSchema match {
      case Some(m) =>
        (m.asInstanceOf[ObjectNode], m.get("schema-id").asInt(),
          prevSchemasArr, math.max(prevLastColId, candidateLastColId))
      case None =>
        val sid = prevSchemasArr.flatMap(s =>
          Option(s.get("schema-id")).map(_.asInt()))
          .maxOption.map(_ + 1).getOrElse(0)
        candidate.put("schema-id", sid)
        (candidate, sid, prevSchemasArr :+ (candidate: JsonNode),
          math.max(prevLastColId, candidateLastColId))
    }

    // 1. data files: stage (hive layout when partitioned — identity
    //    transform, the dir name carrying the value), then publish under
    //    data/ with snapshot-stamped names (metadata, not the listing,
    //    defines the table)
    val staging = new Path(root,
      s".staging-s${nameToken.getOrElse(snapId.toString)}")
    // non-identity transforms: derive the partition-value columns (they
    // are consumed by partitionBy into the dir names; the SOURCE columns
    // stay in the data files, so reads need no value reconstruction)
    val stageDf = specCols.filter(_.transform != "identity")
      .foldLeft(df) { (d, sc) =>
        d.withColumn(sc.name, IcebergTransforms.transformColumn(
          sc.transform, d(sc.source), df.schema(sc.source).dataType))
      }
    val w0 = stageDf.write.mode("overwrite")
    val dirCols = specCols.map(_.name)
    (if (dirCols.isEmpty) w0 else w0.partitionBy(dirCols: _*))
      .parquet(staging.toString)
    def leaves(dir: Path, rel: String): Seq[(Path, String)] =
      f.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.contains("="))
          leaves(st.getPath, if (rel.isEmpty) n else s"$rel/$n")
        else if (n.startsWith("part-") && n.endsWith(".parquet"))
          Seq((st.getPath, rel))
        else Nil
      }
    f.mkdirs(dataDir(table))
    // top-level field ids for the bound maps, from the EFFECTIVE schema
    // node (reused ids survive rename/drop; a positional re-derivation
    // here would mis-key bounds after a drop)
    val topFields: Map[String, (Int, DataType)] =
      schemaNode.get("fields").elements().asScala
        .filter(_.get("type").isTextual)
        .map(fn => fn.get("name").asText() ->
          (fn.get("id").asInt(), df.schema(fn.get("name").asText()).dataType))
        .toMap
    // contended writers stamp a writer-unique token into part names so
    // two racers at the same prospective snapshot id can never clobber
    // each other's data files
    val partTag = nameToken.getOrElse(f"$snapId%05d")
    val named = leaves(staging, "").zipWithIndex.map { case ((p, relDir), i) =>
      val rel =
        if (relDir.isEmpty) f"data/part-$partTag-$i%05d.parquet"
        else f"data/$relDir/part-$partTag-$i%05d.parquet"
      val target = new Path(root, rel)
      f.mkdirs(target.getParent)
      require(f.rename(p, target), s"rename failed: $p")
      // spec-required record_count + the spec's lower/upper bound maps
      // (field-ids 125/128), from the parquet footer (driver-side,
      // metadata-only — the stats real planners prune with)
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          target, spark.sparkContext.hadoopConfiguration))
      val (rows, bounds) =
        try (footer.getRecordCount, footerBounds(footer, topFields))
        finally footer.close()
      (rel, f.getFileStatus(target).getLen, rows, relDir,
        bounds._1, bounds._2)
    }
    f.delete(staging, true)

    // 2. manifest: ADDED entries for the new files (typed partition
    //    values parsed back out of the hive dirs); on overwrite, DELETED
    //    entries recording the prior snapshot's files dropping out
    val removed: Seq[String] = replacing.getOrElse(
      if (overwrite && prevSnaps.nonEmpty) snapshot(spark, table).files else Nil)
    val entrySchema = manifestEntrySchema(partCols)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    def partRecord(relDir: String): GenericRecord = {
      val r = new GenericData.Record(partSchema)
      if (relDir.nonEmpty) {
        val byName = relDir.split("/").toSeq.map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> v
        }.toMap
        partCols.foreach(c => byName.get(c.name).foreach(v =>
          r.put(c.name, typedPartitionValue(v, c.dataType))))
      }
      r
    }
    def boundsArray(fieldName: String,
                    m: Map[Int, Array[Byte]]): AnyRef =
      if (m.isEmpty) null
      else {
        // union [null, array-with-map-logicalType]
        val arrSchema = dataFileSchema.getField(fieldName).schema()
          .getTypes.get(1)
        val arr = new GenericData.Array[GenericRecord](m.size, arrSchema)
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          arr.add(record(arrSchema.getElementType)(
            "key" -> k, "value" -> java.nio.ByteBuffer.wrap(v)))
        }
        arr
      }
    def entry(status: Int, path: String, size: Long, rows: Long,
              relDir: String, lower: Map[Int, Array[Byte]],
              upper: Map[Int, Array[Byte]]): GenericRecord =
      record(entrySchema)(
        "status" -> status, "snapshot_id" -> snapId,
        "sequence_number" -> snapId,
        "data_file" -> record(dataFileSchema)(
          "content" -> 0,
          "file_path" -> path, "file_format" -> "PARQUET",
          "partition" -> partRecord(relDir), "record_count" -> rows,
          "file_size_in_bytes" -> size, "block_size_in_bytes" -> (128L << 20),
          "lower_bounds" -> boundsArray("lower_bounds", lower),
          "upper_bounds" -> boundsArray("upper_bounds", upper)))
    val entries =
      named.map { case (p, size, rows, relDir, lower, upper) =>
        entry(1, p, size, rows, relDir, lower, upper) } ++
        removed.map(p => entry(2, p, 0L, 0L, "", Map.empty, Map.empty))
    f.mkdirs(metaDir(table))
    val manifestRel = s"metadata/m-$partTag-0.avro"
    val manifestLen = writeAvro(f, new Path(root, manifestRel),
      entrySchema, entries,
      Map("format-version" -> "2", "content" -> "data"))

    // partition specs: the HISTORY carries forward — partition-spec
    // EVOLUTION means a table accumulates specs over its life, each
    // data file forever bound to the spec it was written under (old
    // files lack the new spec's partition values and prune
    // conservatively by field name, readWherePart's contract). This
    // commit's declared layout either matches an existing spec (reuse
    // its id — the steady state) or appends a fresh one. Partition
    // FIELD-ids are globally unique across the history (spec's reserved
    // ≥1000 range, continued from last-partition-id); a field already
    // seen in any prior spec keeps its id, exactly the real writer's
    // assignment.
    val prevSpecNodes: Seq[ObjectNode] =
      prevMeta.flatMap(m => Option(m.get("partition-specs")))
        .map(_.elements().asScala
          .collect { case o: ObjectNode => o.deepCopy[ObjectNode]() }.toSeq)
        .getOrElse(Nil)
    val prevLastPartId: Int =
      prevMeta.flatMap(m => Option(m.get("last-partition-id")))
        .map(_.asInt()).getOrElse(999)
    val knownFieldIds: Map[(Int, String), Int] =
      prevSpecNodes.flatMap(_.get("fields").elements().asScala)
        .map(f => (f.get("source-id").asInt(),
          f.get("transform").asText()) -> f.get("field-id").asInt()).toMap
    var nextPartId = math.max(prevLastPartId, 999)
    val declaredFields: Seq[ObjectNode] = specCols.map { sc =>
      val sourceId = schemaNode.get("fields").elements().asScala
        .find(_.get("name").asText() == sc.source)
        .map(_.get("id").asInt())
        .getOrElse(sys.error(s"partition source column not in schema: ${sc.source}"))
      val id = knownFieldIds.getOrElse((sourceId, sc.transform),
        { nextPartId += 1; nextPartId })
      val n = mapper.createObjectNode()
      n.put("name", sc.name)
      n.put("transform", sc.transform)
      n.put("source-id", sourceId)
      n.put("field-id", id)
      n
    }
    def specKey(fields: Seq[JsonNode]): Seq[(Int, String)] =
      fields.map(f => (f.get("source-id").asInt(),
        f.get("transform").asText()))
    val matchingSpec = prevSpecNodes.find(s =>
      specKey(s.get("fields").elements().asScala.toSeq) ==
        specKey(declaredFields))
    val (allSpecNodes, defaultSpecId) = matchingSpec match {
      case Some(s) => (prevSpecNodes, s.get("spec-id").asInt())
      case None =>
        val newId = prevSpecNodes.map(_.get("spec-id").asInt())
          .maxOption.getOrElse(-1) + 1
        val n = mapper.createObjectNode()
        n.put("spec-id", newId)
        val fs = n.putArray("fields")
        declaredFields.foreach(f => fs.add(f.deepCopy[JsonNode]()))
        (prevSpecNodes :+ n, newId)
    }

    // 3. manifest list: append keeps prior manifests (their content kind,
    //    sequence numbers AND spec ids preserved — a carried DELETE
    //    manifest must not be re-listed as data, and a carried manifest
    //    keeps the spec its files were written under); overwrite starts
    //    fresh (the DELETED entries above record the transition)
    val prevManifests: Seq[(String, Long, Int, Long, Int)] =
      if (overwrite || prevSnaps.isEmpty) Nil
      else {
        val cur = prevHead.flatMap(h =>
          prevSnaps.find(_.get("snapshot-id").asLong() == h))
        cur.map { s =>
          readAvro(f, new Path(resolvePath(table, s.get("manifest-list").asText())))
            .map(r => (r.get("manifest_path").toString,
              r.get("manifest_length").asInstanceOf[Long],
              opt(r, "content").map(_.asInstanceOf[Int]).getOrElse(0),
              opt(r, "sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L),
              opt(r, "partition_spec_id").map(_.asInstanceOf[Int]).getOrElse(0)))
        }.getOrElse(Nil)
      }
    val listRel = s"metadata/snap-$partTag.avro"
    val listRows =
      (prevManifests :+ (manifestRel, manifestLen, 0, snapId, defaultSpecId))
        .map { case (p, len, content, seq, specId) =>
          record(ManifestListSchemaV2)(
            "manifest_path" -> p, "manifest_length" -> len,
            "partition_spec_id" -> specId, "content" -> content,
            "sequence_number" -> seq, "added_snapshot_id" -> snapId)
        }
    writeAvro(f, new Path(root, listRel), ManifestListSchemaV2, listRows,
      Map("format-version" -> "2"))

    // 4. new metadata version (immutable), then the version-hint publish
    val meta = mapper.createObjectNode()
    // v2 metadata (sequence numbers are the delete-applicability
    // ordering); v1 tables written by older rounds still read fine.
    // The declared version only RATCHETS UP: a table deleteRowsV3 moved
    // to format-version 3 (live DVs in Puffin files) must not be
    // re-stamped 2 by a later append — a spec-conforming v2 reader
    // would skip the carried DV entries and resurrect deleted rows.
    val prevFv = prevMeta.flatMap(m => Option(m.get("format-version")))
      .map(_.asInt()).getOrElse(2)
    meta.put("format-version", math.max(prevFv, 2))
    meta.put("last-sequence-number", snapId)
    meta.put("table-uuid", f"graft-iceberg-$metaV%08d")
    meta.put("location", table)
    meta.put("last-updated-ms", 0L)
    meta.put("last-column-id", lastColId)
    meta.set[ObjectNode]("schema", schemaNode.deepCopy())
    val schemas = meta.putArray("schemas")
    allSchemas.foreach(s => schemas.add(s.deepCopy[JsonNode]()))
    meta.put("current-schema-id", schemaId)
    val legacySpec = meta.putArray("partition-spec") // v1 legacy form
    declaredFields.foreach(f => legacySpec.add(f.deepCopy[JsonNode]()))
    val specs = meta.putArray("partition-specs")
    allSpecNodes.foreach(s => specs.add(s.deepCopy[JsonNode]()))
    meta.put("default-spec-id", defaultSpecId)
    meta.put("last-partition-id", math.max(nextPartId,
      allSpecNodes.flatMap(_.get("fields").elements().asScala)
        .map(_.get("field-id").asInt()).maxOption.getOrElse(999)))
    // table PROPERTIES and REFS are durable foreign state this writer
    // must carry forward, never silently reset
    meta.set[JsonNode]("properties",
      prevMeta.flatMap(m => Option(m.get("properties")))
        .map(_.deepCopy[JsonNode]())
        .getOrElse(mapper.createObjectNode()))
    meta.put("current-snapshot-id",
      if (toBranch.isEmpty) snapId
      else prevMeta.get.get("current-snapshot-id").asLong())
    prevRefs.map(_.deepCopy[ObjectNode]()).foreach { rs =>
      // the written snapshot moves its ref: the target branch, or the
      // `main` branch ref (kept in sync with current-snapshot-id) when
      // committing to main
      val moved = toBranch.getOrElse("main")
      if (toBranch.nonEmpty || rs.has("main")) {
        val r = mapper.createObjectNode()
        r.put("snapshot-id", snapId); r.put("type", "branch")
        rs.set[ObjectNode](moved, r)
      }
      meta.set[ObjectNode]("refs", rs)
    }
    val op = if (operation.nonEmpty) operation
      else if (overwrite) "overwrite" else "append"
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", snapId)
    prevHead.foreach(h => snapNode.put("parent-snapshot-id", h))
    snapNode.put("timestamp-ms", 0L)
    val summary = mapper.createObjectNode()
    summary.put("operation", op)
    summary.put("added-data-files", named.size.toString)
    summary.put("removed-data-files", removed.size.toString)
    snapNode.set[ObjectNode]("summary", summary)
    snapNode.put("manifest-list", listRel)
    snapNode.put("schema-id", schemaId)
    val allSnaps = meta.putArray("snapshots")
    prevSnaps.foreach(s => allSnaps.add(s.deepCopy[JsonNode]()))
    allSnaps.add(snapNode)
    val log = meta.putArray("snapshot-log")
    prevMeta.flatMap(m => Option(m.get("snapshot-log")))
      .foreach(_.elements().asScala.foreach(e => log.add(e.deepCopy[JsonNode]())))
    // snapshot-log tracks CURRENT-snapshot-id changes (the time-travel
    // channel) — a branch commit does not move main, so no entry
    if (toBranch.isEmpty) {
      val logEntry = mapper.createObjectNode()
      logEntry.put("timestamp-ms", 0L); logEntry.put("snapshot-id", snapId)
      log.add(logEntry)
    }

    val tmp = new Path(metaDir(table),
      s".v$metaV-${nameToken.getOrElse("0")}.metadata.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(meta))
    finally out.close()
    if (ifAbsent) {
      // the CAS point of the file-system-tables catalog: the immutable
      // metadata file name IS the version — claim it without overwrite
      if (!renameIfAbsent(spark, f, tmp, metaFile(table, metaV)))
        return None
    } else
      require(f.rename(tmp, metaFile(table, metaV)),
        s"metadata rename failed: v$metaV")
    val hint = f.create(hintFile(table), true)
    try hint.write(metaV.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    maybeAutoCleanupMetadata(spark, table, meta)
    Some(snapId)
  }

  /** The spec's automatic metadata retention
    * (`write.metadata.delete-after-commit.enabled` +
    * `write.metadata.previous-versions-max`, default 100): when the
    * table opts in, each commit prunes metadata JSONs beyond the window
    * — without it a streaming writer leaves one immortal metadata file
    * per batch. Time travel rides the CURRENT metadata's snapshots
    * array, so nothing user-visible is lost ([[cleanupMetadata]]'s own
    * contract). Failure must not fail the commit.
    */
  private def maybeAutoCleanupMetadata(spark: SparkSession, table: String,
                                       meta: ObjectNode): Unit = {
    val props = Option(meta.get("properties"))
      .collect { case o: ObjectNode => o }
    val enabled = props
      .flatMap(p => Option(p.get("write.metadata.delete-after-commit.enabled")))
      .exists(_.asText().equalsIgnoreCase("true"))
    if (!enabled) return
    val keepPrev = props
      .flatMap(p => Option(p.get("write.metadata.previous-versions-max")))
      .flatMap(n => scala.util.Try(n.asText().trim.toInt).toOption)
      .getOrElse(100)
    try cleanupMetadata(spark, table,
      retainVersions = math.max(keepPrev, 0) + 1)
    catch { case scala.util.control.NonFatal(_) => }
  }

  /** Atomic put-if-absent claim of `dst` — shared primitive with
    * DeltaLite ([[DeltaLite.atomicClaim]]: hard link on `file:` stores,
    * Rename.NONE elsewhere). False when the destination already exists.
    */
  private def renameIfAbsent(spark: SparkSession, f: FileSystem,
                             src: Path, dst: Path): Boolean = {
    if (f.exists(dst)) { f.delete(src, false); return false }
    DeltaLite.atomicClaim(spark, f, src, dst)
  }

  /** OPTIMISTIC-CONCURRENCY commit for the file-system-tables catalog —
    * the multi-writer loop the single-writer contract (object scaladoc)
    * deferred: every attempt stamps a writer-unique token into data,
    * manifest, and list names (racers can never clobber each other's
    * files), and the immutable `v<N>.metadata.json` claim is the CAS —
    * [[renameIfAbsent]]. On losing:
    *  - blind APPEND / OVERWRITE: rebase — metadata is rebuilt against
    *    the new tip and re-published (appends keep the winner's
    *    manifests; overwrite tombstones the winner's files explicitly).
    *    Data written by the lost attempt is re-staged (Iceberg commits
    *    derive manifests during staging; conflicts are rare, and the
    *    orphaned parts of a lost attempt are unreferenced debris no
    *    snapshot names).
    *  - READ-MODIFY-WRITE (`replacing` defined): the rewrite was
    *    computed against a stale tip — ConcurrentModificationException;
    *    the caller re-runs the merge (the same file-level OCC contract
    *    as DeltaLite.commitContended).
    */
  def commitContended(spark: SparkSession, table: String, df: DataFrame,
                      overwrite: Boolean = false, operation: String = "",
                      partitionBy: Seq[String] = Nil,
                      replacing: Option[Seq[String]] = None,
                      maxRetries: Int = 5): Long = {
    val baseV: Option[Int] = versions(spark, table).lastOption
    var attempt = 0
    while (attempt <= maxRetries) {
      val token = java.util.UUID.randomUUID().toString.take(8)
      commitAttempt(spark, table, df, overwrite, operation, partitionBy,
        replacing, nameToken = Some(token), ifAbsent = true) match {
        case Some(id) => return id
        case None =>
          if (replacing.isDefined)
            throw new java.util.ConcurrentModificationException(
              s"$table: a concurrent commit won the race — re-run the " +
                "read-modify-write against the new tip")
          attempt += 1
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"$table: lost the publish race $maxRetries times (base " +
        s"version $baseV) — giving up")
  }

  /** What [[selectiveMerge]] did — `filesSkipped` is the table volume a
    * full-rewrite MERGE would have paid for.
    */
  final case class MergeStats(snapshotId: Long, filesRewritten: Int,
                              filesSkipped: Int)

  /** Partition-pruned copy-on-write MERGE — data skipping by Iceberg's
    * native mechanism (manifest partition values), the complement of
    * DeltaLite.selectiveMerge's add-stats pruning: for a table
    * identity-partitioned on `partitionCol`, only data files whose
    * manifest partition value occurs in the update batch are read,
    * merged through the SAME LakehouseOps.mergeUpsert kernel, and
    * rewritten (tombstoned in the new manifest; untouched files' old
    * manifests carry forward). Cost ∝ touched partitions + the batch,
    * not table size. The pruning is metadata-only — planning never
    * touches data or directory listings.
    *
    * Contract: `partitionCol` must be stable per merge key (the standard
    * partitioned-MERGE requirement — a key that migrates partitions
    * would dodge its old row). Unpartitioned files in the snapshot are
    * rewritten conservatively. The update batch's distinct partition
    * values / first-key values drive the prune and are collected to the
    * driver BOUNDED (at most `maxPruneKeys + 1` rows via `limit`; a
    * batch past the bound falls back to an unpruned full-file-set merge
    * — same guard as DeltaLite.selectiveMerge).
    */
  def selectiveMerge(spark: SparkSession, table: String, updates: DataFrame,
                     keys: Seq[String], partitionCol: String = "",
                     skewSafe: Boolean = false,
                     maxPruneKeys: Int = DeltaLite.DefaultMaxPruneKeys,
                     clauses: Seq[graft.operators.MergeClause] = Nil,
                     schemaEvolution: Boolean = false)
      : MergeStats = {
    require(!schemaEvolution || clauses.isEmpty,
      s"$table: schemaEvolution composes with the plain upsert only " +
        "(clause merges name explicit columns — align the source first)")
    val meta0 = metadata(spark, table)
    val spec = partitionSpecFields(meta0)
    val specSourceName: Map[Int, String] =
      currentSchemaNode(meta0, table).get("fields").elements().asScala
        .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
    require(spec.forall(_.transform != "void"),
      s"$table: selectiveMerge cannot rewrite a void-partitioned spec")
    val identityOnly = spec.forall(_.transform == "identity")
    val snap = snapshot(spark, table)
    val noPrune = (snap.detail, Seq.empty[FileInfo])
    val (touched, skipped) =
      // whenNotMatchedBySource clauses involve EVERY target row by
      // definition — pruning untouched partitions/files would hide rows
      // from the clause
      if (graft.operators.MergeClause.touchesBySource(clauses)) noPrune
      else if (partitionCol.nonEmpty) {
        // partitioned table: prune whole partitions on the manifests'
        // typed partition values — TRANSFORM-AWARE: each spec field
        // sourced from partitionCol admits exactly the partition values
        // its transform maps the batch keys to (bucket hashes, day
        // numbers, truncated prefixes, identity raw values)
        DeltaLite.boundedKeys(updates, partitionCol, maxPruneKeys) match {
          case None => noPrune
          case Some(rows) =>
            val fieldsOnCol = spec.filter(tf =>
              specSourceName.get(tf.sourceId).contains(partitionCol))
            if (fieldsOnCol.isEmpty && spec.nonEmpty &&
                !spec.exists(_.name == partitionCol)) noPrune
            else if (spec.isEmpty || (identityOnly && fieldsOnCol.isEmpty)) {
              // legacy identity layout keyed by field NAME
              val updParts: Set[String] =
                rows.map(r => String.valueOf(r.get(0))).toSet
              snap.detail.partition { fi =>
                fi.partition.get(partitionCol) match {
                  case Some(v) if v != null => updParts.contains(v)
                  case _                    => true // unknown: rewrite
                }
              }
            } else {
              val tpe = topField(meta0, table, partitionCol)._1
              val T = IcebergTransforms
              val valueSets: Seq[(T.PartField, Set[String])] =
                fieldsOnCol.map { tf =>
                  val vs: Set[String] = tf.transform match {
                    case "identity" =>
                      rows.map(r => String.valueOf(r.get(0))).toSet
                    case t if T.isTimeTransform(t) =>
                      rows.map(r =>
                        T.timeValue(t, tpe, r.get(0)).toString).toSet
                    case t if T.bucketN(t).isDefined =>
                      rows.map(r => T.bucketOf(tpe, r.get(0),
                        T.bucketN(t).get).toString).toSet
                    case t if T.truncW(t).isDefined =>
                      rows.map(r => T.truncateOf(tpe, r.get(0),
                        T.truncW(t).get).toString).toSet
                    case _ => null // unknown transform: no pruning
                  }
                  tf -> vs
                }
              snap.detail.partition { fi =>
                valueSets.forall { case (tf, vs) =>
                  vs == null || (fi.partition.get(tf.name) match {
                    case Some(v) if v != null => vs.contains(v)
                    case _                    => true // unknown: rewrite
                  })
                }
              }
            }
        }
      } else {
        // unpartitioned table: prune on the manifests' column bound maps
        // for the first merge key — the DeltaLite add-stats shape, so a
        // range-clustered (Z-ORDERed) Iceberg table merges ∝ touched
        // files too. Bound-less files rewrite conservatively.
        val keyCol = keys.head
        val (tpe, fid) = topField(metadata(spark, table), table, keyCol)
        // null keys never equi-join an existing row (they land as
        // inserts), so they don't drive the prune — and must not NPE it
        DeltaLite.boundedKeys(updates, keyCol, maxPruneKeys) match {
          case None => noPrune
          case Some(keyRows) =>
        val sortedKeys: Array[Comparable[Any]] = keyRows
          .map(r => keyComparable(tpe, r.get(0))).sortWith(_.compareTo(_) < 0)
        snap.detail.partition { fi =>
          (fi.lowerBounds.get(fid), fi.upperBounds.get(fid)) match {
            case (Some(lb), Some(ub)) =>
              val lo = decodeBound(tpe, lb)
              val hi = decodeBound(tpe, ub)
              // first key ≥ lo, then check ≤ hi
              var l = 0; var r = sortedKeys.length
              while (l < r) {
                val m = (l + r) >>> 1
                if (lo.compareTo(sortedKeys(m)) > 0) l = m + 1 else r = m
              }
              l < sortedKeys.length && hi.compareTo(sortedKeys(l)) >= 0
            case _ => true
          }
        }
        }
      }
    val base =
      if (touched.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else readWithDeletes(spark, table, snap, touched)
    val merged =
      if (clauses.nonEmpty) graft.operators.LakehouseOps
        .mergeClauses(base, updates, keys, clauses, skewSafe = skewSafe)
      else graft.operators.LakehouseOps
        // MERGE WITH SCHEMA EVOLUTION: source-only columns join the
        // schema additively (commit's append-drift channel re-keys the
        // metadata schema; untouched files read the new columns as null)
        .mergeUpsert(base, updates, keys, skewSafe = skewSafe,
          autoAlign = schemaEvolution)
    // rewrite under the table's OWN layout: the FULL spec (identity
    // fields included — collapsing to just partitionCol would drop the
    // other partition columns from the rewritten metadata/dirs) is
    // reconstructed as decl strings so the rewritten files land in the
    // same directories and the spec survives the commit. Spec-less
    // tables keep the legacy partitionBy behavior.
    val specDecls: Seq[String] =
      spec.map(tf => transformDecl(tf,
        specSourceName.getOrElse(tf.sourceId,
          sys.error(s"$table: spec field ${tf.name} has no source column"))))
    val sid = commit(spark, table, merged, operation = "merge",
      partitionBy =
        if (spec.isEmpty && partitionCol.nonEmpty) Seq(partitionCol) else Nil,
      partitionTransforms = specDecls,
      replacing = Some(touched.map(_.path)))
    MergeStats(sid, touched.size, skipped.size)
  }

  /** Spec transform string + source column → the DDL decl
    * [[parseTransformDecl]] accepts (the rewrite round trip).
    */
  private def transformDecl(tf: IcebergTransforms.PartField,
                            source: String): String =
    tf.transform match {
      case "identity" => s"identity($source)"
      case t => IcebergTransforms.bucketN(t)
        .map(n => s"bucket($n, $source)")
        .orElse(IcebergTransforms.truncW(t).map(w => s"truncate($w, $source)"))
        .getOrElse(s"${t}s($source)")
    }

  /** METADATA-ONLY table creation over EXISTING parquet files — the
    * kernel behind zero-copy format conversion ([[FormatConvert]], the
    * `CONVERT TO` / UniForm verb): commit 0 of a NEW Iceberg table whose
    * manifests reference `files` in place (absolute paths,
    * protocol-legal — the same referencing shape as
    * DeltaLite.shallowClone). No data moves; per-file record counts and
    * the spec's `lower_bounds`/`upper_bounds` come from the parquet
    * FOOTERS (driver-side metadata, ~ms/file), so stats-pruned reads and
    * merges work on the converted table from snapshot 0. Unpartitioned
    * identity spec; the caller owns schema fidelity (the files must
    * actually carry these columns).
    */
  def addFilesCommit(spark: SparkSession, table: String,
                     schema: StructType, files: Seq[String],
                     sync: Boolean = false,
                     knownCounts: Map[String, Long] = Map.empty): Long = {
    val existing = versions(spark, table)
    require(existing.isEmpty || sync, s"$table: already a table")
    val root = new Path(table)
    val f = fs(spark, root)
    // sync mode (the UniForm face): the NEXT metadata version whose
    // current snapshot lists exactly `files` — prior snapshots stay in
    // the history (expireSnapshots can reap their manifests later)
    val prevMeta = if (existing.isEmpty) None else Some(metadata(spark, table))
    val prevSnapId = prevMeta.map(_.get("current-snapshot-id").asLong())
      .getOrElse(-1L)
    val snapId = prevSnapId + 1L
    val metaV = existing.lastOption.map(_.toInt + 1).getOrElse(1)
    val topFields: Map[String, (Int, DataType)] = {
      val (node, _) = sparkToIceberg(schema)
      node.get("fields").elements().asScala.filter(_.get("type").isTextual)
        .map(fn => fn.get("name").asText() ->
          (fn.get("id").asInt(), schema(fn.get("name").asText()).dataType))
        .toMap
    }
    val entrySchema = manifestEntrySchema(Nil)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    def boundsArray(fieldName: String, m: Map[Int, Array[Byte]]): AnyRef =
      if (m.isEmpty) null
      else {
        val arrSchema = dataFileSchema.getField(fieldName).schema()
          .getTypes.get(1)
        val arr = new GenericData.Array[GenericRecord](m.size, arrSchema)
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          arr.add(record(arrSchema.getElementType)(
            "key" -> k, "value" -> java.nio.ByteBuffer.wrap(v)))
        }
        arr
      }
    val entries = files.map { p =>
      val qualified = f.makeQualified(new Path(p))
      val size = f.getFileStatus(qualified).getLen
      // record counts the CALLER already knows (the universal-format
      // sync carries Delta's add-stats) skip the parquet footer open —
      // a per-commit sync must not pay O(live files) footer decodes;
      // bounds are omitted there (face scans plan conservatively)
      val (rows, bounds) = knownCounts.get(p) match {
        case Some(n) =>
          (n, (Map.empty[Int, Array[Byte]], Map.empty[Int, Array[Byte]]))
        case None =>
          val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              qualified, spark.sparkContext.hadoopConfiguration))
          try (footer.getRecordCount, footerBounds(footer, topFields))
          finally footer.close()
      }
      record(entrySchema)(
        "status" -> 1, "snapshot_id" -> snapId,
        "sequence_number" -> snapId,
        "data_file" -> record(dataFileSchema)(
          "content" -> 0,
          "file_path" -> qualified.toString, "file_format" -> "PARQUET",
          "partition" -> new GenericData.Record(partSchema),
          "record_count" -> rows, "file_size_in_bytes" -> size,
          "block_size_in_bytes" -> (128L << 20),
          "lower_bounds" -> boundsArray("lower_bounds", bounds._1),
          "upper_bounds" -> boundsArray("upper_bounds", bounds._2)))
    }
    f.mkdirs(metaDir(table))
    val manifestRel = f"metadata/m-$snapId%05d-0.avro"
    val manifestLen = writeAvro(f, new Path(root, manifestRel),
      entrySchema, entries, Map("format-version" -> "2", "content" -> "data"))
    val listRel = f"metadata/snap-$snapId%05d.avro"
    writeAvro(f, new Path(root, listRel), ManifestListSchemaV2,
      Seq(record(ManifestListSchemaV2)(
        "manifest_path" -> manifestRel, "manifest_length" -> manifestLen,
        "partition_spec_id" -> 0, "content" -> 0,
        "sequence_number" -> snapId, "added_snapshot_id" -> snapId)),
      Map("format-version" -> "2"))
    val (schemaNode, lastColId) = sparkToIceberg(schema)
    val meta = mapper.createObjectNode()
    // same ratchet as commitAttempt: a synced face whose carried
    // snapshots hold DV manifests keeps declaring format-version 3
    meta.put("format-version", math.max(prevMeta
      .flatMap(m => Option(m.get("format-version"))).map(_.asInt())
      .getOrElse(2), 2))
    meta.put("last-sequence-number", snapId)
    meta.put("table-uuid",
      prevMeta.flatMap(m => Option(m.get("table-uuid")).map(_.asText()))
        .getOrElse(f"graft-iceberg-$metaV%08d"))
    meta.put("location", table)
    meta.put("last-updated-ms", 0L)
    meta.put("last-column-id", lastColId)
    meta.set[ObjectNode]("schema", schemaNode)
    val schemas = meta.putArray("schemas"); schemas.add(schemaNode.deepCopy())
    meta.put("current-schema-id", 0)
    meta.putArray("partition-spec")
    val specs = meta.putArray("partition-specs")
    val spec0 = mapper.createObjectNode()
    spec0.put("spec-id", 0); spec0.putArray("fields"); specs.add(spec0)
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 999)
    // a synced face keeps its properties (and any refs) across syncs
    meta.set[JsonNode]("properties",
      prevMeta.flatMap(m => Option(m.get("properties")))
        .map(_.deepCopy[JsonNode]())
        .getOrElse(mapper.createObjectNode()))
    prevMeta.flatMap(m => Option(m.get("refs"))).foreach(r =>
      meta.set[JsonNode]("refs", r.deepCopy[JsonNode]()))
    meta.put("current-snapshot-id", snapId)
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", snapId)
    if (prevSnapId >= 0) snapNode.put("parent-snapshot-id", prevSnapId)
    snapNode.put("timestamp-ms", 0L)
    val summary = mapper.createObjectNode()
    // a re-sync REPLACES the visible file set wholesale — recorded as
    // overwrite so incremental readers refuse the range instead of
    // double-counting the re-listed files
    summary.put("operation", if (prevSnapId >= 0) "overwrite" else "append")
    summary.put("added-data-files", files.size.toString)
    snapNode.set[ObjectNode]("summary", summary)
    snapNode.put("manifest-list", listRel)
    snapNode.put("schema-id", 0)
    val snapsArr = meta.putArray("snapshots")
    prevMeta.flatMap(m => Option(m.get("snapshots")))
      .foreach(_.elements().asScala
        .foreach(sn => snapsArr.add(sn.deepCopy[JsonNode]())))
    snapsArr.add(snapNode)
    val log = meta.putArray("snapshot-log")
    prevMeta.flatMap(m => Option(m.get("snapshot-log")))
      .foreach(_.elements().asScala
        .foreach(e => log.add(e.deepCopy[JsonNode]())))
    val logEntry = mapper.createObjectNode()
    logEntry.put("timestamp-ms", 0L); logEntry.put("snapshot-id", snapId)
    log.add(logEntry)
    val tmp = new Path(metaDir(table), s".v$metaV.metadata.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(meta))
    finally out.close()
    require(f.rename(tmp, metaFile(table, metaV)),
      s"metadata rename failed: v$metaV")
    val hint = f.create(hintFile(table), true)
    try hint.write(metaV.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    snapId
  }

  /** What [[deleteRows]] did: the new snapshot id, delete files written,
    * and (for positional) victim rows recorded / (for equality) data
    * rows currently matched.
    */
  final case class DeleteStats(snapshotId: Long, deleteFiles: Int,
                               rowsDeleted: Long)

  /** v2 MERGE-ON-READ row deletion — the write half of the delete-file
    * support (spec "Row-level deletes"), mirroring
    * DeltaLite.deleteVectors on the other format: no data file is
    * rewritten; the commit adds ONE delete file + a DELETE manifest +
    * a new manifest list and metadata version.
    *
    *  - `equality = false` (default): POSITION deletes. Matching rows
    *    are located in one distributed pass (existing deletes applied
    *    first — already-dead rows are neither re-marked nor re-counted),
    *    their (file_path, pos) pairs collected BOUNDED by
    *    `maxDeleteRows` (refused past it — bulk erasure should rewrite
    *    files via selectiveMerge/compaction) and written sorted, the
    *    spec's ordering for efficient merge-on-read.
    *  - `equality = true`: EQUALITY deletes. The distinct key rows
    *    themselves are the delete file (columns = `keyCols`, declared
    *    via `equality_ids` field ids); no data scan is needed to WRITE
    *    the delete — the spec's O(batch) streaming-CDC shape — and the
    *    strict `dataSeq < deleteSeq` rule at read time lets later
    *    re-inserts of the same key survive.
    *
    * Readers at this snapshot see the rows gone ([[readWithDeletes]]);
    * time travel to earlier snapshots still sees them; compaction
    * (optimizeCompact/optimizeZorder — they read THROUGH the masks and
    * rewrite) folds deletes into data files and drops the delete
    * manifests from the new snapshot.
    */
  def deleteRows(spark: SparkSession, table: String, keys: DataFrame,
                 keyCols: Seq[String], equality: Boolean = false,
                 maxDeleteRows: Int = 16 << 20): DeleteStats = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, when}
    val root = new Path(table)
    val f = fs(spark, root)
    val meta = metadata(spark, table)
    val prevSnaps = Option(meta.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    require(prevSnaps.nonEmpty, s"$table: no snapshots")
    val snapId = prevSnaps.map(_.get("snapshot-id").asLong()).max + 1
    val metaV = versions(spark, table).last + 1
    val snap = snapshot(spark, table)
    if (snap.detail.isEmpty) return DeleteStats(snap.snapshotId, 0, 0L)
    // v2-style delete FILES are spec-illegal once the table is
    // format-version 3 / carries deletion vectors (v3 requires position
    // deletes as DVs) — refuse loudly instead of writing a mixed
    // snapshot a conforming reader would misread
    val declaredFv = Option(meta.get("format-version")).map(_.asInt())
      .getOrElse(2)
    require(declaredFv < 3 &&
        !snap.deletes.exists(_.contentOffset.isDefined),
      s"$table: v2 delete files are illegal on a format-version-3 table " +
        "carrying deletion vectors — use deleteRowsV3")

    val keySel = keys.select(keyCols.map(k => keys(s"`$k`")).toIndexedSeq: _*)
      .distinct()
    // build the delete-file rows; delFileRows is the delete FILE's own
    // row count (what the manifest's record_count must carry — for
    // equality deletes that is the distinct-key count, NOT the number of
    // currently-matched data rows)
    val (deleteRowsDf, nRows, eqIds, delFileRows): (DataFrame, Long, Seq[Int], Long) =
      if (!equality) {
        // victims stay DISTRIBUTED (r17): the old path collected every
        // (file, pos) pair to the driver, sorted there, and re-shipped —
        // driver wall and GC ∝ deleted rows, the superlinear piece of
        // the decade lifecycle queries. Now the semi join's output maps
        // file names through a broadcast (metadata-sized) relation and
        // lands sorted in the single delete-file partition on an
        // executor; the one eager checkpoint is victim-sized and runs
        // the scan+join exactly once for the count + the write.
        val scan = readWithDeletes(spark, table, snap, snap.detail,
          keepMeta = true)
        val tableAbs = canonTableRoot(spark, table)
        import spark.implicits._
        // one row per canonical path: duplicate manifest entries for the
        // same file (same canon key) must not fan the broadcast join out —
        // each would duplicate its victim rows, inflating nVictims and
        // emitting duplicate delete entries where the old driver-side Map
        // collapsed them. Identical (canon, path) pairs collapse silently;
        // two DIFFERENT manifest paths canonicalizing to one key is a
        // corrupt-metadata state and fails loudly (matching the unmapped-
        // victim require below).
        val n2p = snap.detail.map(fi =>
          canonPath(tableAbs, resolvePath(table, fi.path)) -> fi.path).distinct
        require(n2p.map(_._1).distinct.size == n2p.size,
          s"$table: multiple manifest data-file paths canonicalize to one " +
            "scan path — refusing to write a delete file against " +
            "ambiguous file identities")
        val nameToPath = n2p.toDF("__if", "file_path")
        // LEFT join: an __if canonicalization mismatch must fail loudly
        // (the old driver-side Map lookup threw NoSuchElementException; an
        // inner join would silently DROP the victim and leave the row
        // alive). The limit bounds the eager checkpoint — it is a no-op
        // below the cap, and an over-limit bulk delete is refused without
        // first materializing an unbounded victim set (the old
        // limit(maxDeleteRows+1).collect() economics, kept distributed).
        val victims = scan.join(broadcast(keySel), keyCols, "left_semi")
          .join(broadcast(nameToPath), Seq("__if"), "left")
          .select(col("file_path"), col("__ip").as("pos"))
          .limit(maxDeleteRows + 1)
          .localCheckpoint(true)
        val vStats = victims.agg(
          count(lit(1)).as("n"),
          count(when(col("file_path").isNull, lit(1))).as("unmapped")).head()
        val (nVictims, nUnmapped) = (vStats.getLong(0), vStats.getLong(1))
        require(nUnmapped == 0L,
          s"$table: $nUnmapped victim rows matched no manifest data-file " +
            "path after canonicalization — refusing to write a delete " +
            "file that would silently miss them")
        require(nVictims <= maxDeleteRows,
          s"$table: delete batch exceeds $maxDeleteRows rows — rewrite " +
            "files (selectiveMerge / compaction) for bulk erasure")
        if (nVictims == 0) return DeleteStats(snap.snapshotId, 0, 0L)
        // the position-delete spec requires (file_path, pos) order; sort
        // inside the one output partition, executor-side
        (victims.repartition(1).sortWithinPartitions("file_path", "pos"),
          nVictims, Seq.empty, nVictims)
      } else {
        val ids = keyCols.map(k => topField(meta, table, k)._2)
        val matched = readWithDeletes(spark, table, snap, snap.detail)
          .join(broadcast(keySel), keyCols, "left_semi").count()
        (keySel, matched, ids, keySel.count())
      }

    // 1. the delete file (parquet, spec-allowed), via stage-and-rename
    val staging = new Path(root, s".staging-del-s$snapId")
    deleteRowsDf.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = f.listStatus(staging).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(sys.error("delete-file write produced no part file"))
    val delRel = f"data/delete-$snapId%05d-0.parquet"
    f.mkdirs(dataDir(table))
    require(f.rename(part, new Path(root, delRel)), "delete-file rename failed")
    f.delete(staging, true)
    val delLen = f.getFileStatus(new Path(root, delRel)).getLen

    // 2. the DELETE manifest (content routed at the list level AND the
    //    entry level, sequence number explicit)
    val dfSchema = DeleteManifestEntrySchema.getField("data_file").schema()
    val eqArr: AnyRef =
      if (eqIds.isEmpty) null
      else {
        val arrSchema = dfSchema.getField("equality_ids").schema().getTypes.get(1)
        val a = new GenericData.Array[Integer](eqIds.size, arrSchema)
        eqIds.foreach(i => a.add(Int.box(i)))
        a
      }
    val entry = record(DeleteManifestEntrySchema)(
      "status" -> 1, "snapshot_id" -> snapId, "sequence_number" -> snapId,
      "data_file" -> record(dfSchema)(
        "content" -> (if (equality) 2 else 1),
        "file_path" -> delRel, "file_format" -> "PARQUET",
        "partition" -> record(dfSchema.getField("partition").schema())(),
        "record_count" -> delFileRows,
        "file_size_in_bytes" -> delLen,
        "equality_ids" -> eqArr))
    val manifestRel = f"metadata/m-$snapId%05d-del.avro"
    val manifestLen = writeAvro(f, new Path(root, manifestRel),
      DeleteManifestEntrySchema, Seq(entry),
      Map("format-version" -> "2", "content" -> "deletes"))

    // 3. new manifest list: every prior manifest carried (content/seq
    //    preserved) + the delete manifest
    val curList = prevSnaps.find(_.get("snapshot-id").asLong() ==
      meta.get("current-snapshot-id").asLong())
      .map(_.get("manifest-list").asText())
      .getOrElse(sys.error(s"$table: current snapshot has no manifest list"))
    val carried = readAvro(f, new Path(resolvePath(table, curList))).map(r =>
      (r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        opt(r, "content").map(_.asInstanceOf[Int]).getOrElse(0),
        opt(r, "sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L)))
    val listRel = f"metadata/snap-$snapId%05d.avro"
    val listRows = (carried :+ (manifestRel, manifestLen, 1, snapId)).map {
      case (p, len, content, seq) => record(ManifestListSchemaV2)(
        "manifest_path" -> p, "manifest_length" -> len,
        "partition_spec_id" -> 0, "content" -> content,
        "sequence_number" -> seq, "added_snapshot_id" -> snapId)
    }
    writeAvro(f, new Path(root, listRel), ManifestListSchemaV2, listRows,
      Map("format-version" -> "2"))

    // 4. new metadata: the previous version with a delete snapshot
    //    appended (schema untouched — a delete never evolves it)
    val newMeta = meta.deepCopy[ObjectNode]()
    newMeta.put("format-version", 2)
    newMeta.put("last-sequence-number", snapId)
    newMeta.put("current-snapshot-id", snapId)
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", snapId)
    snapNode.put("parent-snapshot-id", snap.snapshotId)
    snapNode.put("timestamp-ms", 0L)
    val summary = mapper.createObjectNode()
    summary.put("operation", "delete")
    summary.put("added-delete-files", "1")
    snapNode.set[ObjectNode]("summary", summary)
    snapNode.put("manifest-list", listRel)
    Option(meta.get("current-schema-id"))
      .foreach(id => snapNode.put("schema-id", id.asInt()))
    newMeta.withArray[ArrayNode]("snapshots").add(snapNode)
    val logEntry = mapper.createObjectNode()
    logEntry.put("timestamp-ms", 0L)
    logEntry.put("snapshot-id", snapId)
    newMeta.withArray[ArrayNode]("snapshot-log").add(logEntry)
    val tmp = new Path(metaDir(table), s".v$metaV.metadata.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(newMeta))
    finally out.close()
    require(f.rename(tmp, metaFile(table, metaV)),
      s"metadata rename failed: v$metaV")
    val hint = f.create(hintFile(table), true)
    try hint.write(metaV.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    DeleteStats(snapId, 1, nRows)
  }

  /** v3 MERGE-ON-READ DELETE — DELETION VECTORS (the format-version-3
    * delete shape, mirroring [[graft.sources.DeltaLite.deleteVectors]]
    * on the other format): matching rows' indices land as one roaring
    * bitmap per referenced data file, all bitmaps in ONE Puffin file
    * (`deletion-vector-v1` blobs), one manifest entry per DV carrying
    * the spec's placement triple (referenced_data_file/content_offset/
    * content_size_in_bytes), and the table's metadata moves to
    * format-version 3. A file that already carries a DV gets old ∪ new
    * (the spec's writers-must-merge rule — the reader's OR across
    * superseded blobs is then idempotent). Scale shape identical to the
    * Delta twin: one distributed victim scan with the key set
    * broadcast, bitmaps built driver-side bounded by `maxDeleteRows`,
    * kilobytes of blob written — data files never rewritten.
    */
  def deleteRowsV3(spark: SparkSession, table: String, keys: DataFrame,
                   keyCols: Seq[String],
                   maxDeleteRows: Int = 16 << 20): DeleteStats = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val root = new Path(table)
    val f = fs(spark, root)
    val meta = metadata(spark, table)
    val prevSnaps = Option(meta.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    require(prevSnaps.nonEmpty, s"$table: no snapshots")
    val snapId = prevSnaps.map(_.get("snapshot-id").asLong()).max + 1
    val metaV = versions(spark, table).last + 1
    val snap = snapshot(spark, table)
    if (snap.detail.isEmpty) return DeleteStats(snap.snapshotId, 0, 0L)

    val keySel = keys.select(keyCols.map(k => keys(s"`$k`")).toIndexedSeq: _*)
      .distinct()
    val scan = readWithDeletes(spark, table, snap, snap.detail,
      keepMeta = true)
    val victims = scan.join(broadcast(keySel), keyCols, "left_semi")
      .select("__if", "__ip").limit(maxDeleteRows + 1).collect()
    require(victims.length <= maxDeleteRows,
      s"$table: delete batch exceeds $maxDeleteRows rows — rewrite " +
        "files (selectiveMerge / compaction) for bulk erasure")
    if (victims.isEmpty) return DeleteStats(snap.snapshotId, 0, 0L)
    val tableAbs = canonTableRoot(spark, table)
    val nameToPath = snap.detail.map(fi =>
      canonPath(tableAbs, resolvePath(table, fi.path)) -> fi.path).toMap
    // per-file victim indices; merge in any EXISTING DV on the same file
    val byFile: Seq[(String, Seq[Long])] = victims
      .map(r => nameToPath(r.getString(0)) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toSeq.sortBy(_._1)
    val existingDv: Map[String, DeletionVectors.Bitmap64] = snap.deletes
      .filter(d => d.content == 1 && d.contentOffset.isDefined)
      .flatMap(d => nameToPath.get(canonPath(tableAbs,
        resolvePath(table, d.refDataFile.get))).map(_ ->
        DeletionVectors.Bitmap64.deserialize(Puffin.dvBitmap(
          Puffin.readBlob(f, new Path(resolvePath(table, d.path)),
            d.contentOffset.get, d.contentSize.get)))))
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_.or(_))).toMap
    val bitmaps: Seq[(String, DeletionVectors.Bitmap64)] =
      byFile.map { case (p, poss) =>
        val fresh = DeletionVectors.Bitmap64(poss)
        p -> existingDv.get(p).map(_.or(fresh)).getOrElse(fresh)
      }

    // 1. ONE Puffin file, one deletion-vector-v1 blob per data file
    val puffinRel = f"data/dv-$snapId%05d.puffin"
    f.mkdirs(dataDir(table))
    val blobRefs = Puffin.write(f, new Path(root, puffinRel),
      bitmaps.map { case (p, bm) =>
        (Puffin.dvBlob(bm.serialize()),
          Map("referenced-data-file" -> p,
            "cardinality" -> bm.cardinality.toString))
      })
    val puffinLen = f.getFileStatus(new Path(root, puffinRel)).getLen

    // 2. the DELETE manifest: one entry per DV, v3 placement triple
    val dfSchema = DeleteManifestEntrySchemaV3.getField("data_file").schema()
    val entries = bitmaps.zip(blobRefs).map { case ((p, bm), ref) =>
      record(DeleteManifestEntrySchemaV3)(
        "status" -> 1, "snapshot_id" -> snapId, "sequence_number" -> snapId,
        "data_file" -> record(dfSchema)(
          "content" -> 1,
          "file_path" -> puffinRel, "file_format" -> "PUFFIN",
          "partition" -> record(dfSchema.getField("partition").schema())(),
          "record_count" -> bm.cardinality,
          "file_size_in_bytes" -> puffinLen,
          "equality_ids" -> null,
          "referenced_data_file" -> p,
          "content_offset" -> ref.offset,
          "content_size_in_bytes" -> ref.length))
    }
    val manifestRel = f"metadata/m-$snapId%05d-dv.avro"
    val manifestLen = writeAvro(f, new Path(root, manifestRel),
      DeleteManifestEntrySchemaV3, entries,
      Map("format-version" -> "3", "content" -> "deletes"))

    // 3. new manifest list: carried priors + the DV manifest
    val curList = prevSnaps.find(_.get("snapshot-id").asLong() ==
      meta.get("current-snapshot-id").asLong())
      .map(_.get("manifest-list").asText())
      .getOrElse(sys.error(s"$table: current snapshot has no manifest list"))
    val carried = readAvro(f, new Path(resolvePath(table, curList))).map(r =>
      (r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        opt(r, "content").map(_.asInstanceOf[Int]).getOrElse(0),
        opt(r, "sequence_number").map(_.asInstanceOf[Long]).getOrElse(0L)))
    val listRel = f"metadata/snap-$snapId%05d.avro"
    val listRows = (carried :+ (manifestRel, manifestLen, 1, snapId)).map {
      case (p, len, content, seq) => record(ManifestListSchemaV2)(
        "manifest_path" -> p, "manifest_length" -> len,
        "partition_spec_id" -> 0, "content" -> content,
        "sequence_number" -> seq, "added_snapshot_id" -> snapId)
    }
    writeAvro(f, new Path(root, listRel), ManifestListSchemaV2, listRows,
      Map("format-version" -> "3"))

    // 4. new metadata: format-version 3 (the DV entries are only legal
    //    there), delete snapshot appended, schema untouched
    val newMeta = meta.deepCopy[ObjectNode]()
    newMeta.put("format-version", 3)
    newMeta.put("last-sequence-number", snapId)
    newMeta.put("current-snapshot-id", snapId)
    val snapNode = mapper.createObjectNode()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", snapId)
    snapNode.put("parent-snapshot-id", snap.snapshotId)
    snapNode.put("timestamp-ms", 0L)
    val summary = mapper.createObjectNode()
    summary.put("operation", "delete")
    summary.put("added-dvs", bitmaps.size.toString)
    snapNode.set[ObjectNode]("summary", summary)
    snapNode.put("manifest-list", listRel)
    Option(meta.get("current-schema-id"))
      .foreach(id => snapNode.put("schema-id", id.asInt()))
    newMeta.withArray[ArrayNode]("snapshots").add(snapNode)
    val logEntry = mapper.createObjectNode()
    logEntry.put("timestamp-ms", 0L)
    logEntry.put("snapshot-id", snapId)
    newMeta.withArray[ArrayNode]("snapshot-log").add(logEntry)
    val tmp = new Path(metaDir(table), s".v$metaV.metadata.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(newMeta))
    finally out.close()
    require(f.rename(tmp, metaFile(table, metaV)),
      s"metadata rename failed: v$metaV")
    val hint = f.create(hintFile(table), true)
    try hint.write(metaV.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    DeleteStats(snapId, bitmaps.size, victims.length.toLong)
  }

  /** What [[purgeDeletes]] did. */
  final case class PurgeStats(snapshotId: Long, filesRewritten: Int,
                              filesUntouched: Int)

  /** REORG / PURGE on the Iceberg side — materialize row-level deletes
    * into plain parquet by rewriting ONLY the GOVERNED data files:
    * those referenced by a position delete file, plus those whose data
    * sequence number any equality delete's strict ordering covers.
    * Untouched files survive byte-identical through their old
    * manifests. The carried delete manifests then apply to NOTHING
    * (positional references point at retired paths; the rewrite's
    * sequence number exceeds every delete's), so reads are delete-free;
    * [[expireSnapshots]] past the pre-purge snapshots reaps the delete
    * files themselves — together the compliance-erasure completion of
    * [[deleteRows]], and the [[FormatConvert]] unblocker that doesn't
    * pay a full compaction.
    */
  def purgeDeletes(spark: SparkSession, table: String): PurgeStats = {
    import org.apache.spark.sql.functions.col
    val snap = snapshot(spark, table)
    if (snap.deletes.isEmpty)
      return PurgeStats(snap.snapshotId, 0, snap.detail.size)
    val eqMaxSeq = snap.deletes.filter(_.content == 2).map(_.seq)
      .maxOption.getOrElse(Long.MinValue)
    // v3 DV entries are NOT parquet (their path is the shared Puffin
    // file) — their governed files come from referenced_data_file, the
    // positional parquet read must exclude them
    val posFiles = snap.deletes.filter(d => d.content == 1 &&
      d.contentOffset.isEmpty)
    // full canonical paths a position delete references: metadata-scale
    // collect (delete files are CDC-sized by deleteRows' own bound)
    val tableAbs = canonTableRoot(spark, table)
    val posPaths: Set[String] =
      if (posFiles.isEmpty) Set.empty
      else spark.read
        .parquet(posFiles.map(d => resolvePath(table, d.path)): _*)
        .select(canonCol(tableAbs, col("file_path")).as("p"))
        .distinct().collect().map(_.getString(0)).toSet
    val dvPaths: Set[String] = snap.deletes
      .filter(d => d.content == 1 && d.contentOffset.isDefined)
      .flatMap(_.refDataFile)
      .map(p => canonPath(tableAbs, resolvePath(table, p))).toSet
    val (touched, untouched) = snap.detail.partition { fi =>
      val canon = canonPath(tableAbs, resolvePath(table, fi.path))
      fi.seq < eqMaxSeq || posPaths.contains(canon) ||
        dvPaths.contains(canon)
    }
    if (touched.isEmpty)
      return PurgeStats(snap.snapshotId, 0, untouched.size)
    val rewritten = readWithDeletes(spark, table, snap, touched)
    val sid = commit(spark, table, rewritten, operation = "merge",
      replacing = Some(touched.map(_.path)))
    PurgeStats(sid, touched.size, untouched.size)
  }

  /** Write `meta` as the next immutable metadata version and repoint the
    * version hint — the metadata-only publish rename/drop ride.
    */
  private def publishMetadataVersion(spark: SparkSession, table: String,
                                     meta: ObjectNode): Int = {
    val f = fs(spark, metaDir(table))
    val metaV = versions(spark, table).last + 1
    val tmp = new Path(metaDir(table), s".v$metaV-evo.metadata.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(meta))
    finally out.close()
    require(f.rename(tmp, metaFile(table, metaV)),
      s"metadata rename failed: v$metaV")
    val hint = f.create(hintFile(table), true)
    try hint.write(metaV.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()
    maybeAutoCleanupMetadata(spark, table, meta)
    metaV
  }

  /** Ensure `meta` carries a `schemas` HISTORY array (migrating legacy
    * single-`schema` metadata), every entry with a schema-id. Returns
    * the array.
    */
  private def schemasArray(meta: ObjectNode, table: String): ArrayNode = {
    val arr = Option(meta.get("schemas")) match {
      case Some(a: ArrayNode) => a
      case _ =>
        val a = meta.putArray("schemas")
        val legacy = Option(meta.get("schema"))
          .getOrElse(sys.error(s"$table: metadata has no schema"))
          .deepCopy[ObjectNode]()
        a.add(legacy); a
    }
    arr.elements().asScala.zipWithIndex.foreach {
      case (o: ObjectNode, i) if !o.has("schema-id") => o.put("schema-id", i)
      case _ =>
    }
    arr
  }

  /** RENAME COLUMN by FIELD ID — the format's defining evolution rule:
    * a new schema (same field ids, one name changed) is APPENDED to the
    * schema history under a fresh schema-id and made current; not a byte
    * of data moves. Old data files still carry the old column name, so
    * the scan aligns PER SEQUENCE GROUP: files from an earlier schema
    * era read under their WRITTEN name and relabel to the current name
    * by field id (see readWithDeletes) — exactly how real Iceberg
    * readers resolve columns. Manifest bound maps are keyed by field id
    * and keep pruning untouched; time travel to a pre-rename snapshot
    * reads under that era's names. Top-level columns only (nested
    * renames refused).
    */
  def renameColumn(spark: SparkSession, table: String, from: String,
                   to: String): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val cur = currentSchemaNode(meta, table)
    val names = cur.get("fields").elements().asScala
      .map(_.get("name").asText()).toSeq
    require(names.contains(from), s"$table: no column $from")
    require(!names.contains(to), s"$table: column $to already exists")
    val renamed = cur.deepCopy[ObjectNode]()
    renamed.get("fields").elements().asScala.foreach {
      case fn: ObjectNode if fn.get("name").asText() == from =>
        fn.put("name", to); ()
      case _ =>
    }
    val arr = schemasArray(meta, table)
    val sid = arr.elements().asScala.map(_.get("schema-id").asInt()).max + 1
    renamed.put("schema-id", sid)
    arr.add(renamed)
    meta.put("current-schema-id", sid)
    meta.set[ObjectNode]("schema", renamed.deepCopy())
    publishMetadataVersion(spark, table, meta)
  }

  /** DROP COLUMN — metadata-only, the [[renameColumn]] sibling: the
    * field leaves the current schema (fresh schema-id in the history);
    * its values stay orphaned in the data files, invisible to every
    * read because scans project the current schema's columns only. The
    * field id is never reused (`last-column-id` is monotonic), and
    * RE-ADDING the dropped NAME is REFUSED at commit (this reader
    * resolves parquet columns by name, so a same-named column would
    * read the orphaned values — the refusal is what makes "old values
    * never resurrect" a hard guarantee here).
    */
  def dropColumn(spark: SparkSession, table: String, name: String): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val cur = currentSchemaNode(meta, table)
    val fields = cur.get("fields").elements().asScala.toSeq
    require(fields.exists(_.get("name").asText() == name),
      s"$table: no column $name")
    require(fields.size > 1, s"$table: cannot drop the last column")
    val dropped = cur.deepCopy[ObjectNode]()
    val keep = dropped.putArray("fields")
    fields.filterNot(_.get("name").asText() == name)
      .foreach(fn => keep.add(fn.deepCopy[JsonNode]()))
    val arr = schemasArray(meta, table)
    val sid = arr.elements().asScala.map(_.get("schema-id").asInt()).max + 1
    dropped.put("schema-id", sid)
    arr.add(dropped)
    meta.put("current-schema-id", sid)
    meta.set[ObjectNode]("schema", dropped.deepCopy())
    publishMetadataVersion(spark, table, meta)
  }

  /** ROLLBACK to a retained snapshot — the format's RESTORE: metadata
    * only (current-snapshot-id repointed in a NEW metadata version);
    * nothing is deleted, history keeps moving forward, and the
    * rolled-past snapshots stay time-travelable until
    * [[expireSnapshots]].
    */
  def rollbackTo(spark: SparkSession, table: String,
                 snapshotId: Long): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val ids = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).map(_.get("snapshot-id").asLong())
    require(ids.contains(snapshotId),
      s"$table: snapshot $snapshotId not retained (have $ids)")
    meta.put("current-snapshot-id", snapshotId)
    val logEntry = mapper.createObjectNode()
    logEntry.put("timestamp-ms", 0L)
    logEntry.put("snapshot-id", snapshotId)
    meta.withArray[ArrayNode]("snapshot-log").add(logEntry)
    publishMetadataVersion(spark, table, meta)
  }

  // ===== branch/tag refs — the spec's `refs` map: named snapshot
  // pointers; branches advance via commitToBranch (write-audit-publish),
  // tags are immutable audit marks =====

  /** The table's refs: name -> (snapshot-id, "branch"|"tag"). The
    * `main` branch ref, when present, mirrors current-snapshot-id
    * (kept in sync by every main commit).
    */
  def tableRefs(spark: SparkSession, table: String): Map[String, (Long, String)] = {
    val meta = metadata(spark, table)
    Option(meta.get("refs")).collect { case o: ObjectNode => o }
      .map(_.properties().iterator().asScala.map { e =>
        e.getKey -> (e.getValue.get("snapshot-id").asLong(),
          e.getValue.get("type").asText())
      }.toMap).getOrElse(Map.empty)
  }

  private def putRef(spark: SparkSession, table: String, name: String,
                     refType: String, at: Option[Long]): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val ids = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).map(_.get("snapshot-id").asLong())
    val target = at.getOrElse(meta.get("current-snapshot-id").asLong())
    require(ids.contains(target),
      s"$table: snapshot $target not retained (have $ids)")
    val refs = Option(meta.get("refs"))
      .collect { case o: ObjectNode => o }
      .getOrElse(meta.putObject("refs"))
    require(!refs.has(name), s"$table: ref $name already exists")
    val r = mapper.createObjectNode()
    r.put("snapshot-id", target); r.put("type", refType)
    refs.set[ObjectNode](name, r)
    publishMetadataVersion(spark, table, meta)
  }

  /** CREATE BRANCH at a retained snapshot (default: the current one).
    * Later [[commitToBranch]] calls advance it independently of main —
    * the write-audit-publish (WAP) staging shape.
    */
  def createBranch(spark: SparkSession, table: String, name: String,
                   at: Option[Long] = None): Int =
    putRef(spark, table, name, "branch", at)

  /** CREATE TAG — an immutable named snapshot pointer (audit marks,
    * release pins). Protected from [[expireSnapshots]].
    */
  def createTag(spark: SparkSession, table: String, name: String,
                at: Option[Long] = None): Int =
    putRef(spark, table, name, "tag", at)

  /** DROP a branch or tag (its snapshots stay until expire). `main`
    * is not droppable — it mirrors current-snapshot-id.
    */
  def dropRef(spark: SparkSession, table: String, name: String,
              expectedType: Option[String] = None): Int = {
    require(name != "main", s"$table: the main branch ref is not droppable")
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val refs = Option(meta.get("refs")).collect { case o: ObjectNode => o }
      .getOrElse(sys.error(s"$table: no refs"))
    require(refs.has(name), s"$table: no ref $name")
    // DROP TAG on a branch (or vice versa) must refuse — dropping the
    // wrong kind un-protects snapshots the caller meant to keep
    expectedType.foreach { want =>
      val actual = Option(refs.get(name).get("type")).map(_.asText())
        .getOrElse("branch")
      require(actual == want,
        s"$table: ref $name is a $actual, not a $want — " +
          s"use DROP ${actual.toUpperCase}")
    }
    refs.remove(name)
    publishMetadataVersion(spark, table, meta)
  }

  /** Read the table at a branch head or tag (`VERSION AS OF 'ref'`). */
  def readRef(spark: SparkSession, table: String, name: String): DataFrame = {
    val r = tableRefs(spark, table).getOrElse(name,
      sys.error(s"$table: no ref $name"))
    read(spark, table, Some(r._1))
  }

  /** Append `df` on the BRANCH head — main (current-snapshot-id and
    * the snapshot-log) is untouched; only refs[branch] advances. The
    * staged snapshot rides the normal commit machinery (manifests,
    * bounds, stats), so branch reads prune like any other.
    */
  def commitToBranch(spark: SparkSession, table: String, branch: String,
                     df: DataFrame, operation: String = ""): Long =
    commitAttempt(spark, table, df, overwrite = false, operation,
      partitionBy = Nil, replacing = None, nameToken = None,
      ifAbsent = false, toBranch = Some(branch))
      .getOrElse(sys.error("unreachable: non-contended publish cannot lose"))

  /** FAST-FORWARD main to a branch head — the publish half of WAP:
    * metadata-only (current-snapshot-id repointed + snapshot-log
    * entry), refused unless the current main head is an ANCESTOR of
    * the branch head (anything else is not a fast-forward — rollback
    * or cherry-pick territory).
    */
  def fastForward(spark: SparkSession, table: String, branch: String): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val refs = Option(meta.get("refs")).collect { case o: ObjectNode => o }
      .getOrElse(sys.error(s"$table: no refs"))
    val r = Option(refs.get(branch)).getOrElse(
      sys.error(s"$table: no ref $branch"))
    require(r.get("type").asText() == "branch",
      s"$table: ref $branch is a tag")
    val target = r.get("snapshot-id").asLong()
    val cur = meta.get("current-snapshot-id").asLong()
    val byId: Map[Long, JsonNode] = Option(meta.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map(s => s.get("snapshot-id").asLong() -> s).toMap
    // ancestor walk: target ... parent chain ... must pass through cur
    var probe: Option[Long] = Some(target)
    var isAncestor = false
    while (probe.nonEmpty && !isAncestor) {
      if (probe.contains(cur)) isAncestor = true
      else probe = probe.flatMap(byId.get)
        .flatMap(s => Option(s.get("parent-snapshot-id")).map(_.asLong()))
    }
    require(isAncestor,
      s"$table: main ($cur) is not an ancestor of $branch ($target) — " +
        "not a fast-forward")
    meta.put("current-snapshot-id", target)
    if (refs.has("main")) {
      val m = mapper.createObjectNode()
      m.put("snapshot-id", target); m.put("type", "branch")
      refs.set[ObjectNode]("main", m)
    }
    val logEntry = mapper.createObjectNode()
    logEntry.put("timestamp-ms", 0L)
    logEntry.put("snapshot-id", target)
    meta.withArray[ArrayNode]("snapshot-log").add(logEntry)
    publishMetadataVersion(spark, table, meta)
  }

  /** SET TBLPROPERTIES — metadata-only property write (carried forward
    * verbatim by every later commit).
    */
  def setProperty(spark: SparkSession, table: String, key: String,
                  value: String): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val props = Option(meta.get("properties"))
      .collect { case o: ObjectNode => o }
      .getOrElse(meta.putObject("properties"))
    props.put(key, value)
    publishMetadataVersion(spark, table, meta)
  }

  /** The newest snapshot stamped strictly BEFORE `tsMillis` — the
    * anchor the `startingTimestamp` stream option translates to (the
    * source delivers changes strictly after its anchor, so everything
    * stamped at or after T flows). None when every snapshot is at or
    * after the bound (deliver from the beginning).
    */
  /** Does any snapshot carry a real wall-clock `timestamp-ms`? (This
    * library's own writer zeroes them for determinism; foreign logs
    * carry real stamps.) Time-keyed callers refuse on zero-stamp logs.
    */
  def hasWallClockStamps(spark: SparkSession, table: String): Boolean =
    Option(metadata(spark, table).get("snapshots"))
      .exists(_.elements().asScala.exists(s =>
        Option(s.get("timestamp-ms")).exists(_.asLong() > 0)))

  def lastSnapshotBefore(spark: SparkSession, table: String,
                         tsMillis: Long): Option[Long] = {
    val meta = metadata(spark, table)
    Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
      .filter(s => Option(s.get("timestamp-ms")).exists(_.asLong() < tsMillis))
      .lastOption.map(_.get("snapshot-id").asLong())
  }

  /** PARTITION SPEC EVOLUTION (`ALTER TABLE … WRITE PARTITIONED BY` —
    * the spec's `update-spec` DDL): declare a NEW default partition
    * spec, metadata-only — NO data moves. Existing files stay bound
    * forever to the spec they were written under (pruning on a field
    * they lack is conservative — [[readWherePart]]'s by-name contract);
    * the next write under [[currentSpecDecls]] lands under the new
    * default, so OPTIMIZE/selectiveMerge adopt it automatically.
    * Partition field-ids continue globally from `last-partition-id`,
    * fields already seen in any prior spec keep their ids, and
    * re-declaring a historical spec just moves `default-spec-id` back —
    * the exact id algebra the real writer uses. Empty `transforms`
    * evolves to the unpartitioned spec. Returns the new default
    * spec-id.
    */
  def evolvePartitionSpec(spark: SparkSession, table: String,
                          transforms: Seq[String]): Int = {
    val meta = metadata(spark, table).deepCopy[ObjectNode]()
    val schemaNode = currentSchemaNode(meta, table)
    val prevSpecs: Seq[ObjectNode] =
      Option(meta.get("partition-specs"))
        .map(_.elements().asScala
          .collect { case o: ObjectNode => o.deepCopy[ObjectNode]() }.toSeq)
        .getOrElse(Nil)
    val knownIds: Map[(Int, String), Int] =
      prevSpecs.flatMap(_.get("fields").elements().asScala)
        .map(f => (f.get("source-id").asInt(),
          f.get("transform").asText()) -> f.get("field-id").asInt()).toMap
    var nextId = math.max(Option(meta.get("last-partition-id"))
      .map(_.asInt()).getOrElse(999), 999)
    val fields: Seq[ObjectNode] = transforms.map { decl =>
      val (tf, src) = parseTransformDecl(decl)
      val sourceId = schemaNode.get("fields").elements().asScala
        .find(_.get("name").asText() == src)
        .map(_.get("id").asInt())
        .getOrElse(sys.error(
          s"$table: partition source column not in schema: $src"))
      val id = knownIds.getOrElse((sourceId, tf), { nextId += 1; nextId })
      val n = mapper.createObjectNode()
      n.put("name", transformFieldName(tf, src))
      n.put("transform", tf)
      n.put("source-id", sourceId)
      n.put("field-id", id)
      n
    }
    // identity fields put their SOURCE COLUMN in the directory layout
    // and DROP it from the data files — that physical choice is fixed at
    // write time, so a metadata-only evolution may not change the
    // identity set once data exists (old and new files would need
    // conflicting basePath discovery). Transforms (bucket/truncate/
    // time) keep the source column in-file and evolve freely.
    val hasData = Option(meta.get("snapshots"))
      .exists(_.elements().asScala.nonEmpty)
    val currentIdentity = partitionSpecFields(meta)
      .filter(_.transform == "identity").map(_.sourceId).toSet
    val newIdentity = fields.filter(_.get("transform").asText() == "identity")
      .map(_.get("source-id").asInt()).toSet
    require(!hasData || newIdentity == currentIdentity,
      s"$table: identity (hive-layout) partition fields cannot change " +
        "by metadata-only evolution — existing files' directory layout " +
        "is fixed; rewrite via overwrite with the new partitionBy")
    def key(fs: Seq[JsonNode]): Seq[(Int, String)] =
      fs.map(f => (f.get("source-id").asInt(), f.get("transform").asText()))
    val defaultId = prevSpecs.find(s =>
      key(s.get("fields").elements().asScala.toSeq) == key(fields)) match {
      case Some(s) => s.get("spec-id").asInt()
      case None =>
        val newId = prevSpecs.map(_.get("spec-id").asInt())
          .maxOption.getOrElse(-1) + 1
        val n = mapper.createObjectNode()
        n.put("spec-id", newId)
        val fs = n.putArray("fields")
        fields.foreach(f => fs.add(f.deepCopy[JsonNode]()))
        val arr = meta.putArray("partition-specs")
        (prevSpecs :+ n).foreach(s => arr.add(s))
        newId
    }
    val legacy = meta.putArray("partition-spec")
    fields.foreach(f => legacy.add(f.deepCopy[JsonNode]()))
    meta.put("default-spec-id", defaultId)
    meta.put("last-partition-id", nextId)
    publishMetadataVersion(spark, table, meta)
    defaultId
  }

  /** The table's property map (SHOW TBLPROPERTIES' source) — metadata
    * JSON only, no snapshot resolution.
    */
  def tableProperties(spark: SparkSession,
                      table: String): Map[String, String] =
    Option(metadata(spark, table).get("properties"))
      .collect { case o: ObjectNode => o }
      .map(_.properties().iterator().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)

  /** Incremental consumption (the format's append-changelog surface):
    * the rows added by snapshots in `(fromSnapshotId, toSnapshotId]`,
    * read WITHOUT rescanning the table — under append-only history the
    * added file set is exactly the snapshot file-set difference, so the
    * scan touches only the new files. Every snapshot in the range must
    * be an `append` (an overwrite/replace in range rewrites history and
    * has no well-defined row delta — REFUSED loudly, matching the real
    * reader's incremental-scan contract).
    */
  def incrementalRead(spark: SparkSession, table: String,
                      fromSnapshotId: Long,
                      toSnapshotId: Option[Long] = None): DataFrame = {
    val meta = metadata(spark, table)
    val snaps = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    val ids = snaps.map(_.get("snapshot-id").asLong())
    val toId = toSnapshotId.getOrElse(meta.get("current-snapshot-id").asLong())
    // range resolution by the snapshots array's APPEND ORDER, not id
    // arithmetic — foreign writers use RANDOM snapshot ids, where
    // numeric comparison would pick a garbage window (this library's own
    // sequential ids order identically either way)
    val fromIdx = ids.indexOf(fromSnapshotId)
    val toIdx = ids.indexOf(toId)
    require(fromIdx >= 0 && toIdx >= 0,
      s"$table: snapshot range ($fromSnapshotId, $toId] not resolvable in $ids")
    require(fromIdx <= toIdx, "from must precede to in table history")
    val inRange = snaps.slice(fromIdx + 1, toIdx + 1)
    inRange.foreach { s =>
      val op = Option(s.get("summary")).flatMap(x => Option(x.get("operation")))
        .map(_.asText()).getOrElse("")
      require(op == "append",
        s"$table: snapshot ${s.get("snapshot-id").asLong()} is '$op' — " +
          "incremental read requires an append-only range, refusing")
    }
    val to = snapshot(spark, table, Some(toId))
    val fromFiles = snapshot(spark, table, Some(fromSnapshotId)).files.toSet
    readFileList(spark, table, to.schema,
      to.files.filterNot(fromFiles.contains))
  }

  /** ROW-LEVEL changelog between two snapshots — the [[incrementalRead]]
    * counterpart that handles DELETES and REWRITES, and the Iceberg face
    * of [[DeltaLite.changes]]: the net visibility diff classified into
    * the CDF `_change_type` vocabulary (insert / delete /
    * update_preimage / update_postimage by `keys`).
    *
    * File identity = (path, data sequence number, the delete files
    * APPLICABLE to it) — so a merge-on-read delete snapshot (same data
    * files, one new position/equality delete file) diffs exactly the
    * newly-masked rows; an overwrite/merge diffs the replaced files; and
    * a compaction `replace` nets to ZERO rows (rows moved, visibility
    * unchanged) instead of refusing the way incrementalRead must. Cost ∝
    * files whose visibility changed (each side read through its OWN
    * snapshot's delete masks via the merge-on-read scan), never the
    * table.
    *
    * `withVersion` stamps `_commit_version` with the TO snapshot's
    * HISTORY ORDINAL (its index in the snapshots array) — foreign
    * writers use RANDOM snapshot ids, so the ordinal, not the id, is
    * what ordering-sensitive consumers (replication) must sort on.
    */
  /** The files whose VISIBILITY differs between two snapshots — the
    * planning half of [[changes]], factored out so its economics are
    * testable (the symmetric diff cancels rows either way; what this
    * decides is how much gets READ). Identity = (data sequence number,
    * the delete files applicable to the file). v3 DVs are scoped to
    * their referenced_data_file — without the scoping one DV delete
    * would change EVERY file's identity and the diff would re-read the
    * whole table on both sides; the DV tag carries the blob offset so
    * two DVs sharing a Puffin path stay distinct. Canonicalization is
    * precomputed per DELETE entry (O(files + deletes) driver work, not
    * O(files × deletes) regex passes — a streaming CDF micro-batch
    * plans this on every trigger).
    */
  private[graft] def changedSplit(spark: SparkSession, table: String,
                                  from: Snapshot, to: Snapshot)
      : (Seq[FileInfo], Seq[FileInfo]) = {
    val tableAbs = canonTableRoot(spark, table)
    def identOf(s: Snapshot): Map[String, (Long, String)] = {
      val dvByRef: Map[String, Seq[(Long, String)]] = s.deletes
        .filter(d => d.content == 1 && d.contentOffset.isDefined)
        .groupBy(d => canonPath(tableAbs,
          resolvePath(table, d.refDataFile.get)))
        .view.mapValues(_.map(d =>
          (d.seq, d.path + "@" + d.contentOffset.get)).toSeq).toMap
      val plainDeletes = s.deletes.filter(d =>
        d.content == 2 || (d.content == 1 && d.contentOffset.isEmpty))
      s.detail.map { fi =>
        val plain = plainDeletes.collect {
          case d if (d.content == 1 && d.seq >= fi.seq) ||
            (d.content == 2 && d.seq > fi.seq) => d.path
        }
        val dv =
          if (dvByRef.isEmpty) Nil
          else dvByRef.getOrElse(
            canonPath(tableAbs, resolvePath(table, fi.path)), Nil)
            .collect { case (seq, tag) if seq >= fi.seq => tag }
        fi.path -> (fi.seq, (plain ++ dv).sorted.mkString(","))
      }.toMap
    }
    val fromIdent = identOf(from)
    val toIdent = identOf(to)
    (to.detail.filter(fi =>
      !fromIdent.get(fi.path).contains(toIdent(fi.path))),
      from.detail.filter(fi =>
        !toIdent.get(fi.path).contains(fromIdent(fi.path))))
  }

  def changes(spark: SparkSession, table: String, fromSnapshotId: Long,
              toSnapshotId: Option[Long], keys: Seq[String],
              withVersion: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "changes needs the key columns for classification")
    val meta = metadata(spark, table)
    val ids = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).map(_.get("snapshot-id").asLong())
    val toId = toSnapshotId.getOrElse(meta.get("current-snapshot-id").asLong())
    val fromIdx = ids.indexOf(fromSnapshotId)
    val toIdx = ids.indexOf(toId)
    require(fromIdx >= 0 && toIdx >= 0,
      s"$table: snapshot range ($fromSnapshotId, $toId] not resolvable in $ids")
    require(fromIdx <= toIdx, "from must precede to in table history")
    val from = snapshot(spark, table, Some(fromSnapshotId))
    val to = snapshot(spark, table, Some(toId))
    val (changedNew, changedOld) = changedSplit(spark, table, from, to)
    // additive-evolution alignment: project each side to the TO schema,
    // null-filling columns the old snapshot doesn't carry
    val schema = to.schema
    val dataCols = schema.fieldNames.toIndexedSeq
    def aligned(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(schema.fields.toIndexedSeq.map { fld =>
        if (have.contains(fld.name)) col(s"`${fld.name}`")
        else lit(null).cast(fld.dataType).as(fld.name)
      }: _*)
    }
    val newSide = aligned(readWithDeletes(spark, table, to, changedNew))
    val oldSide = aligned(readWithDeletes(spark, table, from, changedOld))
    // the shared symmetric-diff classifier cancels rows whose visibility
    // didn't actually change (compaction rewrites) in ONE scan per side
    val out = ChangeFeed.classify(newSide, oldSide, keys, dataCols)
    if (withVersion) out.withColumn("_commit_version", lit(toIdx.toLong))
    else out
  }

  /** TIMESTAMP AS OF — [[DeltaLite.readAsOf]]'s Iceberg face: resolve
    * the latest `snapshot-log` entry at or before `timestampMs` (the
    * spec's time-travel channel; foreign writers stamp real wall-clock
    * there) and read that snapshot. Refused when the table predates any
    * log entry at the asked time, naming the earliest available.
    */
  def readAsOf(spark: SparkSession, table: String,
               timestampMs: Long): DataFrame = {
    val meta = metadata(spark, table)
    val entries = Option(meta.get("snapshot-log"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    require(entries.nonEmpty,
      s"$table: no snapshot-log to resolve a timestamp against")
    val at = entries.filter(_.get("timestamp-ms").asLong() <= timestampMs)
    require(at.nonEmpty,
      s"$table: no snapshot at or before $timestampMs (earliest is " +
        s"${entries.head.get("timestamp-ms").asLong()})")
    read(spark, table, Some(at.last.get("snapshot-id").asLong()))
  }

  /** METADATA-VERSION retention — [[DeltaLite.cleanupLogs]]' Iceberg
    * face: every commit writes a full `vN.metadata.json`, and without
    * cleanup a busy table accumulates one forever (snapshot TIME TRAVEL
    * does NOT need them — the `snapshots` array of the CURRENT metadata
    * resolves every retained snapshot; old metadata versions serve only
    * metadata archaeology). Deletes all but the newest `retainVersions`
    * metadata files; `version-hint.text` keeps pointing at the tip.
    * Returns deleted file names.
    */
  def cleanupMetadata(spark: SparkSession, table: String,
                      retainVersions: Int = 1): Seq[String] = {
    require(retainVersions >= 1, "must retain at least the current version")
    val vs = versions(spark, table)
    val f = fs(spark, metaDir(table))
    vs.dropRight(retainVersions).map { v =>
      f.delete(metaFile(table, v), false)
      s"v$v.metadata.json"
    }
  }

  /** A snapshot id's position in the table history (the ordering key
    * foreign random ids can't provide).
    */
  private[graft] def historyOrdinal(spark: SparkSession, table: String,
                                    snapshotId: Long): Long = {
    val ids = Option(metadata(spark, table).get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map(_.get("snapshot-id").asLong())
    val idx = ids.indexOf(snapshotId)
    require(idx >= 0, s"$table: snapshot $snapshotId not in history $ids")
    idx.toLong
  }

  /** The `files` METADATA TABLE — planFiles exposed as a queryable
    * DataFrame (the Iceberg twin of DESCRIBE DETAIL's per-file
    * economics): one row per live data file of the current snapshot with
    * its manifest-recorded record count, byte size, hive-style partition
    * tuple, and data sequence number. Manifest metadata only — no data
    * or file-system I/O, the 100 TB planning contract.
    */
  def files(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val s = snapshot(spark, table)
    s.detail.map { fi =>
      val part =
        if (fi.partition.isEmpty) null
        else fi.partition.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString("/")
      (fi.path, fi.recordCount, fi.sizeBytes, part, fi.seq)
    }.toDF("path", "record_count", "size_bytes", "partition", "data_seq")
  }

  /** The `partitions` METADATA TABLE: [[files]] rolled up per partition
    * tuple — file count, record count, bytes. Same metadata-only cost.
    */
  def partitions(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    files(spark, table)
      .groupBy("partition")
      .agg(count(lit(1)).as("n_files"),
        sum("record_count").as("record_count"),
        sum("size_bytes").as("size_bytes"))
      .orderBy("partition")
  }

  /** DESCRIBE HISTORY over the snapshot log: one row per snapshot —
    * id, parent, operation, files added/removed (from the summary the
    * writer recorded). Driver-side, bounded by snapshot count.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val meta = metadata(spark, table)
    Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).map { s =>
        val sum = Option(s.get("summary"))
        (s.get("snapshot-id").asLong(),
          Option(s.get("parent-snapshot-id")).map(_.asLong()).getOrElse(-1L),
          sum.flatMap(x => Option(x.get("operation"))).map(_.asText()).getOrElse(""),
          sum.flatMap(x => Option(x.get("added-data-files"))).map(_.asText().toLong).getOrElse(-1L),
          sum.flatMap(x => Option(x.get("removed-data-files"))).map(_.asText().toLong).getOrElse(-1L))
      }.toDF("snapshot_id", "parent_id", "operation", "n_added", "n_removed")
  }

  /** Expire all but the last `retainSnapshots` snapshots (the format's GC
    * verb): a NEW metadata version drops the expired snapshot entries,
    * then data files / manifests / manifest lists referenced by no
    * retained snapshot are deleted. Time travel to an expired id now
    * fails at resolution (snapshot not found) — the format's own
    * contract. Returns deleted file paths (relative).
    */
  /** [[expireSnapshots]], wall-clock flavored (the spec's
    * `expire_snapshots(older_than)`): keep every snapshot stamped at or
    * after the cutoff (plus the current one and all ref'd ones — the
    * count delegates to the version-count keep-set, which protects
    * refs). The snapshots array is append-ordered with monotonic
    * `timestamp-ms`, so the retained set is a trailing window.
    */
  def expireSnapshotsOlderThan(spark: SparkSession, table: String,
                               cutoffMillis: Long): Seq[String] = {
    val meta = metadata(spark, table)
    val snaps = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    if (snaps.isEmpty) return Seq.empty
    // a zero-stamp snapshot log (this library's own deterministic
    // writer) has no wall-clock to retain by — refuse rather than
    // silently expiring everything a positive cutoff would compute
    require(snaps.exists(s =>
        Option(s.get("timestamp-ms")).exists(_.asLong() > 0)),
      s"$table: no wall-clock snapshot timestamps — use the " +
        "version-count flavor (expireSnapshots / RETAIN n VERSIONS)")
    // +1 keeps the snapshot a reader AT the cutoff still resolves to
    val retained = snaps.count(s =>
      Option(s.get("timestamp-ms")).exists(_.asLong() >= cutoffMillis)) + 1
    expireSnapshots(spark, table,
      math.min(math.max(retained, 1), snaps.size))
  }

  def expireSnapshots(spark: SparkSession, table: String,
                      retainSnapshots: Int = 1): Seq[String] = {
    require(retainSnapshots >= 1, "must retain at least the current snapshot")
    val meta = metadata(spark, table)
    val f = fs(spark, metaDir(table))
    val snaps = Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    if (snaps.size <= retainSnapshots) return Seq.empty
    // branch heads and tags are PROTECTED: a ref'd snapshot expiring
    // would leave a dangling named pointer
    val refIds: Set[Long] = Option(meta.get("refs"))
      .collect { case o: ObjectNode => o }
      .map(_.properties().iterator().asScala
        .map(_.getValue.get("snapshot-id").asLong()).toSet)
      .getOrElse(Set.empty)
    // the CURRENT snapshot is always kept outright: branch commits share
    // the snapshots array, so a busy staging branch could otherwise push
    // main's head out of the takeRight window and brick expiry on the
    // old require("refusing to expire the current snapshot")
    val keepIds = snaps.takeRight(retainSnapshots)
      .map(_.get("snapshot-id").asLong()).toSet ++ refIds +
      meta.get("current-snapshot-id").asLong()

    def reachable(ids: Set[Long]): (Set[String], Set[String]) = {
      val (ls, ms, ds) = snaps.filter(s => ids.contains(s.get("snapshot-id").asLong()))
        .foldLeft((Set.empty[String], Set.empty[String], Set.empty[String])) {
          case ((lists, manifests, files), s) =>
            val lp = s.get("manifest-list").asText()
            val mps = readAvro(f, new Path(resolvePath(table, lp)))
              .map(_.get("manifest_path").toString)
            val fps = mps.flatMap(mp =>
              readAvro(f, new Path(resolvePath(table, mp)))
                .filter(_.get("status").asInstanceOf[Int] != 2)
                .map(_.get("data_file").asInstanceOf[GenericRecord]
                  .get("file_path").toString))
            (lists + lp, manifests ++ mps, files ++ fps)
        }
      (ls ++ ms, ds)
    }
    val allIds = snaps.map(_.get("snapshot-id").asLong()).toSet
    val (keepMeta, keepData) = reachable(keepIds)
    val (dropMeta, dropData) = reachable(allIds -- keepIds)

    // publish the pruned metadata FIRST — readers must stop resolving
    // expired snapshots before their files disappear
    val metaV = versions(spark, table).last + 1
    val pruned = meta.deepCopy[ObjectNode]()
    val arr = pruned.putArray("snapshots")
    snaps.filter(s => keepIds.contains(s.get("snapshot-id").asLong()))
      .foreach(s => arr.add(s.deepCopy[JsonNode]()))
    val tmp = new Path(metaDir(table), s".v$metaV.metadata.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(pruned))
    finally out.close()
    require(f.rename(tmp, metaFile(table, metaV)), "expire metadata rename failed")
    val hint = f.create(hintFile(table), true)
    try hint.write(metaV.toString.getBytes(StandardCharsets.UTF_8))
    finally hint.close()

    val victims = (dropMeta -- keepMeta) ++ (dropData -- keepData)
    victims.toSeq.sorted.map { rel =>
      f.delete(new Path(resolvePath(table, rel)), false); rel
    }
  }

  /** REMOVE ORPHAN FILES — the debris sweep [[expireSnapshots]] can
    * never reach because nothing references it: data files and avro
    * manifests/lists left by failed or lost commit attempts (the OCC
    * loop's losers), plus abandoned `.staging-*` dirs. Builds the
    * referenced set from EVERY retained snapshot's manifest chain
    * (driver-side avro metadata reads — bounded by manifest count, the
    * same cost every Iceberg `remove_orphan_files` pays), then deletes
    * unreferenced files under `data/` and unreferenced `.avro` under
    * `metadata/`. Metadata JSON versions belong to [[cleanupMetadata]];
    * `version-hint.text` is never touched. The real engine's in-flight
    * caveat applies here too: run this only when no write is in
    * progress (a racer's staged-but-uncommitted attempt looks exactly
    * like an orphan).
    */
  def removeOrphanFiles(spark: SparkSession, table: String): Seq[String] = {
    val root = new Path(table)
    val f = fs(spark, root)
    val meta = metadata(spark, table)
    val qual = (p: Path) => f.makeQualified(p).toString
    val referenced = scala.collection.mutable.Set.empty[String]
    Option(meta.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).foreach { s =>
        val lp = new Path(resolvePath(table, s.get("manifest-list").asText()))
        referenced += qual(lp)
        readAvro(f, lp).foreach { r =>
          val mp = new Path(resolvePath(table,
            r.get("manifest_path").toString))
          referenced += qual(mp)
          readAvro(f, mp).foreach(e =>
            referenced += qual(new Path(resolvePath(table,
              e.get("data_file").asInstanceOf[GenericRecord]
                .get("file_path").toString))))
        }
      }
    val victims = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(dir: Path): Unit =
      if (f.exists(dir)) f.listStatus(dir).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (!referenced.contains(qual(st.getPath))) {
          f.delete(st.getPath, false)
          victims += st.getPath.toString.stripPrefix(qual(root) + "/")
        }
      }
    walk(dataDir(table))
    // metadata/: unreferenced avro only — JSON versions + hint stay
    if (f.exists(metaDir(table)))
      f.listStatus(metaDir(table)).foreach { st =>
        if (!st.isDirectory && st.getPath.getName.endsWith(".avro") &&
            !referenced.contains(qual(st.getPath))) {
          f.delete(st.getPath, false)
          victims += s"metadata/${st.getPath.getName}"
        }
      }
    // abandoned staging dirs at the root
    f.listStatus(root).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".staging-")) {
        f.delete(st.getPath, true)
        victims += st.getPath.getName
      }
    }
    victims.toSeq.sorted
  }

  /** Bin-packing compaction as a snapshot commit (OPTIMIZE): rewrite the
    * current snapshot into `targetFiles` files in one distributed pass;
    * readers see the old or new file set atomically, and time travel to
    * pre-compaction snapshots works until [[expireSnapshots]].
    */
  def optimizeCompact(spark: SparkSession, table: String,
                      targetFiles: Int = 1): Long =
    commit(spark, table, read(spark, table).coalesce(targetFiles),
      overwrite = true, operation = "replace",
      partitionTransforms = currentSpecDecls(spark, table))

  /** The table's current partition spec reconstructed as DDL decl strings
    * (`days(ts)`, `bucket(8, id)`, …) so maintenance rewrites preserve the
    * spec and hive layout — an OPTIMIZE must never silently flatten a
    * partitioned table into an unpartitioned one (readWherePart and
    * selectiveMerge pruning would stop working).
    */
  private[graft] def currentSpecDecls(spark: SparkSession,
                                      table: String): Seq[String] = {
    val meta = metadata(spark, table)
    val sourceName: Map[Int, String] =
      currentSchemaNode(meta, table).get("fields").elements().asScala
        .map(f => f.get("id").asInt() -> f.get("name").asText()).toMap
    partitionSpecFields(meta).filter(_.transform != "void").map(tf =>
      transformDecl(tf, sourceName.getOrElse(tf.sourceId,
        sys.error(s"$table: spec field ${tf.name} has no source column"))))
  }

  /** Z-ORDER re-cluster as a `replace` snapshot — the Iceberg face of the
    * shared graft.functions.ZOrder.clusterByZ kernel (data-sized bit
    * budget, wrap-proof shifts): one range-shuffle rewrite after which
    * every data file covers a tight rectangle in the clustered key space,
    * so the manifest `lower_bounds`/`upper_bounds` written at commit time
    * become selective per column and [[readWhere]]/[[selectiveMerge]]
    * prune again on interleave-degraded layouts.
    */
  def optimizeZorder(spark: SparkSession, table: String, cols: Seq[String],
                     targetFiles: Int, bits: Int = 0): Long =
    commit(spark, table,
      graft.functions.ZOrder.clusterByZ(
        read(spark, table), cols, targetFiles, bits),
      overwrite = true, operation = "replace",
      partitionTransforms = currentSpecDecls(spark, table))
}
