package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.SparkSpec
import graft.sources.IcebergLite

/** Source-internals unit tests that need package access (the providers'
  * Source classes are package-private to graft.streaming).
  */
class TableStreamsUnitSpec extends SparkSpec {
  import spark.implicits._

  test("iceberg tail source: a foreign 'no snapshot yet' table " +
    "(current-snapshot-id = -1) reports no offset instead of failing " +
    "to resolve snapshot -1") {
    val t = java.nio.file.Files
      .createTempDirectory("graft_icebergtail").toString + "/t"
    IcebergLite.commit(spark, t, Seq((1L, "a")).toDF("k", "s"))
    val schema = IcebergLite.read(spark, t).schema
    // forge the next metadata version the way a foreign writer creating
    // a fresh (or truncated) table does: snapshots empty, the Iceberg
    // "no current snapshot" sentinel -1
    val mapper = new ObjectMapper()
    val v1 = java.nio.file.Paths.get(t, "metadata", "v1.metadata.json")
    val node = mapper.readTree(
      java.nio.file.Files.readAllBytes(v1)).asInstanceOf[ObjectNode]
    node.put("current-snapshot-id", -1L)
    node.putArray("snapshots")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "metadata", "v2.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "metadata", "version-hint.text"),
      "2".getBytes("UTF-8"))

    val src = new IcebergLiteTailSource(spark, t, schema)
    assert(src.getOffset.isEmpty,
      "no snapshot yet must mean 'no offset, wait for data' — " +
        "a LongOffset(-1) would make getBatch resolve snapshot -1")
  }
}
