package graft.multimodal

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 C12 — multimodal column plumbing.
  *
  * Media lands as opaque `binary` payloads with typed metadata; the
  * decode/feature-extract step runs batched inside `mapPartitions` (the
  * Scala analogue of `mapInPandas` batching — amortizes model/codec setup
  * per batch, not per row). The decode itself is STUBBED deterministically
  * (no image/audio codecs in this environment); everything Spark-side —
  * schema, batching, partition parallelism — is real and tested.
  */
object Multimodal {

  case class MMRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MMFeature(doc_id: Long, mime: String, n_bytes: Int,
                       checksum: Long, feat_w: Int, feat_h: Int,
                       batch_size: Int)

  /** STUB decode: a real implementation would decode the payload via an
    * image/audio codec here. The fake is a pure function of the bytes
    * (CRC32 + derived dims) so results are deterministic and testable.
    */
  def decodeStub(r: MMRecord, batchSize: Int): MMFeature = {
    val crc = new CRC32()
    crc.update(r.payload)
    val c = crc.getValue
    MMFeature(r.doc_id, r.mime, r.payload.length, c,
      feat_w = (c % 640).toInt, feat_h = (c % 480).toInt,
      batch_size = batchSize)
  }

  /** Batched feature extraction over a binary column. `batchSize` mirrors
    * the arrow-batch sizing of mapInPandas: big enough to amortize setup,
    * small enough to bound memory per task.
    */
  def extractFeatures(records: org.apache.spark.sql.Dataset[MMRecord],
                      batchSize: Int = 64): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup (codec/model init) would happen here, once
        batch.iterator.map(r => decodeStub(r, batch.size))
      }
    }.toDF()
  }

  /** The documents table as a multimodal feed: text bytes stand in for the
    * opaque payload, `mime`/`n_chars` for the typed metadata.
    */
  def mmBinaryPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = Tables.documents(s, dir)
      .select(col("doc_id"), lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MMRecord]
    extractFeatures(recs).orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_pipeline" -> ((s: SparkSession, d: String) => mmBinaryPipeline(s, d)))
}
