package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary pipeline: deterministic features, real batching") {
    val out1 = Multimodal.mmBinaryPipeline(spark, sf).collect()
    val out2 = Multimodal.mmBinaryPipeline(spark, sf).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    assert(out1.nonEmpty)
    out1.foreach { r =>
      assert(r.getAs[String]("mime") == "text/plain")
      assert(r.getAs[Int]("n_bytes") > 0)
      val bs = r.getAs[Int]("batch_size")
      assert(bs >= 1 && bs <= 64)
    }
  }

  test("extractFeatures: checksum is a pure function of payload bytes") {
    val recs = Seq(
      Multimodal.MMRecord(1L, "image/fake", Array[Byte](1, 2, 3)),
      Multimodal.MMRecord(2L, "image/fake", Array[Byte](1, 2, 3)),
      Multimodal.MMRecord(3L, "image/fake", Array[Byte](9, 9)))
    val ds = spark.createDataset(recs)
    val out = Multimodal.extractFeatures(ds, batchSize = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("checksum")).toMap
    assert(out(1L) == out(2L)) // same bytes → same checksum
    assert(out(1L) != out(3L))
    // CRC32 of [1,2,3] is a known public constant
    val crc = new java.util.zip.CRC32(); crc.update(Array[Byte](1, 2, 3))
    assert(out(1L) == crc.getValue)
  }
}
