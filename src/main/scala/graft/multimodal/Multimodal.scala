package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 C12 — multimodal columns: media as opaque `binary`
  * payloads with typed metadata, decoded and feature-extracted by REAL
  * codecs (JDK ImageIO for PNG, javax.sound for WAV PCM) inside batched
  * `mapPartitions` — the Scala analogue of `mapInPandas` batching, which
  * amortizes codec/model setup per batch instead of per row.
  *
  * Correctness is exact, not rows-only: payloads are synthesized from a
  * closed-form pixel/sample formula, round-tripped through the real
  * encoder AND decoder, and the extracted stats are compared against
  * DuckDB evaluating the same formula directly. PNG and 16-bit PCM are
  * lossless, so any codec/plumbing bug breaks the hash match.
  */
object Multimodal {

  case class MMRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** One unified feature row per payload; fields not applicable to the
    * mime type stay None (image stats for audio rows, etc.). All-numeric
    * fields are Long so the driver's schema compare sees one integer
    * type across engines.
    */
  case class MMFeature(doc_id: Long, mime: String, decode_ok: Boolean,
                       width: Option[Long], height: Option[Long],
                       sum_r: Option[Long], sum_g: Option[Long],
                       sum_b: Option[Long],
                       n_samples: Option[Long], sum_pcm: Option[Long],
                       max_abs_pcm: Option[Long],
                       n_tokens: Option[Long])

  // ------------------------------------------------------------- codecs
  /** Real encode/decode kernels. Encoding exists to FEED the pipeline
    * deterministic real media (the driver's tables carry no binary
    * columns); decoding is the production path a crawl pipeline runs.
    */
  object Codecs {
    /** Image dims derive from the id: 16..32 × 16..28. */
    def imageDims(docId: Long): (Int, Int) =
      (16 + (docId % 17).toInt, 16 + (docId % 13).toInt)

    /** Pixel formula shared with the oracle: channel values at (x, y). */
    def pixel(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((x * 7 + y * 13 + docId) % 256).toInt,
      ((x * 3 + y + docId * 5) % 256).toInt,
      ((x + y + docId * 11) % 256).toInt)

    /** A real PNG: formula pixels rendered into a BufferedImage and run
      * through ImageIO's PNG writer.
      */
    def encodePng(docId: Long): Array[Byte] = {
      val (w, h) = imageDims(docId)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = pixel(docId, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real PNG decode → (width, height, Σr, Σg, Σb) over all pixels. */
    def decodeImageStats(payload: Array[Byte]): (Long, Long, Long, Long, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      (w.toLong, h.toLong, sr, sg, sb)
    }

    /** Sample count and formula shared with the oracle: 256..319 mono
      * PCM16 samples, sample i = (id·31 + i·17) mod 2¹⁶ − 2¹⁵.
      */
    def nSamples(docId: Long): Int = 256 + (docId % 64).toInt
    def sample(docId: Long, i: Int): Short =
      (((docId * 31 + i * 17) % 65536) - 32768).toShort

    private val PcmMono16 =
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, /* bigEndian = */ false)

    /** A real RIFF/WAVE file via javax.sound (canonical 44-byte header +
      * little-endian PCM16 frames).
      */
    def encodeWav(docId: Long): Array[Byte] = {
      val n = nSamples(docId)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = sample(docId, i)
        pcm(i * 2) = (v & 0xFF).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val stream = new AudioInputStream(
        new ByteArrayInputStream(pcm), PcmMono16, n.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real WAV decode via javax.sound's header parser →
      * (n_samples, Σ sample, max |sample|).
      */
    def decodeWavStats(payload: Array[Byte]): (Long, Long, Long) = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected mono PCM16, got $fmt")
        val bytes = in.readAllBytes()
        var (sum, maxAbs) = (0L, 0L)
        var i = 0
        while (i + 1 < bytes.length) {
          val lo = bytes(i) & 0xFF
          val hi = bytes(i + 1).toInt // sign-carrying high byte
          val v = (hi << 8) | lo
          sum += v
          if (math.abs(v) > maxAbs) maxAbs = math.abs(v)
          i += 2
        }
        (bytes.length / 2L, sum, maxAbs)
      } finally in.close()
    }

    /** Nearest-neighbor resize over really-decoded pixels, re-encoded as
      * PNG: target (x, y) reads source (x·sw/tw, y·sh/th). Deterministic
      * by construction (no platform-dependent interpolation).
      */
    def resizePng(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      require(src != null, "not a decodable image")
      val dst = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        var x = 0
        while (x < tw) {
          dst.setRGB(x, y,
            src.getRGB(x * src.getWidth / tw, y * src.getHeight / th))
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  // ------------------------------------------------------------- "video"
  /** Frame sampling over a "video" modeled as an ordered array of encoded
    * frames (binary column of PNGs): take every `stride`-th frame
    * starting at `offset`, decode each with the real codec, and report a
    * per-frame mean luminance (the cheap shot-detection / thumbnail
    * feature). Runs per-row — an exploded frames column shuffles nothing.
    */
  def sampleFrames(frames: Seq[Array[Byte]], stride: Int,
                   offset: Int = 0): Seq[(Int, Double)] = {
    require(stride >= 1, "stride must be >= 1")
    require(offset >= 0, "offset must be >= 0")
    // iterator walk, not positional indexing — linear for List frames too
    frames.iterator.zipWithIndex
      .filter { case (_, i) => i >= offset && (i - offset) % stride == 0 }
      .map { case (f, i) =>
        val (w, h, sr, sg, sb) = Codecs.decodeImageStats(f)
        // ITU-R BT.601 luma weights over channel means
        (i, (0.299 * sr + 0.587 * sg + 0.114 * sb) / (w * h).toDouble)
      }.toSeq
  }

  // ------------------------------------------------------------ pipeline
  /** Per-record decode dispatch on the mime metadata; a payload the codec
    * rejects yields decode_ok = false with null features instead of
    * failing the task — at 100 TB some crawl bytes are always corrupt.
    */
  def decodeRecord(r: MMRecord): MMFeature =
    try r.mime match {
      case "image/png" | "image/bmp" =>
        val (w, h, sr, sg, sb) = Codecs.decodeImageStats(r.payload)
        MMFeature(r.doc_id, r.mime, decode_ok = true,
          Some(w), Some(h), Some(sr), Some(sg), Some(sb),
          None, None, None, None)
      case "audio/wav" =>
        val (n, sum, maxAbs) = Codecs.decodeWavStats(r.payload)
        MMFeature(r.doc_id, r.mime, decode_ok = true,
          None, None, None, None, None,
          Some(n), Some(sum), Some(maxAbs), None)
      case "text/plain" =>
        val text = new String(r.payload, StandardCharsets.UTF_8)
        // split(" ", -1) keeps empty tokens — DuckDB string_split parity
        MMFeature(r.doc_id, r.mime, decode_ok = true,
          None, None, None, None, None, None, None, None,
          Some(text.split(" ", -1).length.toLong))
      case _ => throw new IllegalArgumentException(s"unknown mime ${r.mime}")
    } catch {
      case scala.util.control.NonFatal(_) =>
        MMFeature(r.doc_id, r.mime, decode_ok = false,
          None, None, None, None, None, None, None, None, None)
    }

  /** Batched feature extraction over a binary column. `batchSize` mirrors
    * arrow-batch sizing in mapInPandas: big enough to amortize setup,
    * small enough to bound per-task memory (payloads stay one batch at a
    * time, never a whole partition).
    */
  def extractFeatures(records: Dataset[MMRecord],
                      batchSize: Int = 64): Dataset[MMFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec/model init would go here (ImageIO readers are
        // stateless; a real NN featurizer would load weights once)
        batch.iterator.map(decodeRecord)
      }
    }
  }

  /** The documents table as a deterministic multimodal feed: each doc
    * becomes a real PNG, a real WAV, or raw UTF-8 text bytes by id —
    * binary payload + mime metadata, the shape crawl media arrives in.
    */
  def mmFeed(s: SparkSession, dir: String): Dataset[MMRecord] = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id % 3) match {
          case 0 => MMRecord(id, "image/png", Codecs.encodePng(id))
          case 1 => MMRecord(id, "audio/wav", Codecs.encodeWav(id))
          case _ => MMRecord(id, "text/plain",
            text.getBytes(StandardCharsets.UTF_8))
        }
      }
  }

  /** C12 query: synthesize real media, decode it with real codecs,
    * extract per-modality features. Exactly oracle-checked — DuckDB
    * evaluates the generative formulas the payloads were rendered from,
    * so the hashes only match if encode → decode is bit-faithful.
    */
  def mmBinaryPipeline(s: SparkSession, dir: String): DataFrame = {
    extractFeatures(mmFeed(s, dir)).toDF()
      .orderBy("doc_id")
  }

  val mmBinaryPipelineOracle: String =
    """WITH m AS (
      |  SELECT doc_id, doc_id % 3 AS k,
      |    16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h,
      |    256 + doc_id % 64 AS n, text
      |  FROM documents)
      |SELECT doc_id,
      |  CASE k WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |         ELSE 'text/plain' END AS mime,
      |  true AS decode_ok,
      |  CASE WHEN k = 0 THEN w END AS width,
      |  CASE WHEN k = 0 THEN h END AS height,
      |  CASE WHEN k = 0 THEN list_sum(
      |    [((i % w)*7 + (i // w)*13 + doc_id) % 256 for i in range(w*h)])::BIGINT
      |    END AS sum_r,
      |  CASE WHEN k = 0 THEN list_sum(
      |    [((i % w)*3 + (i // w) + doc_id*5) % 256 for i in range(w*h)])::BIGINT
      |    END AS sum_g,
      |  CASE WHEN k = 0 THEN list_sum(
      |    [((i % w) + (i // w) + doc_id*11) % 256 for i in range(w*h)])::BIGINT
      |    END AS sum_b,
      |  CASE WHEN k = 1 THEN n END AS n_samples,
      |  CASE WHEN k = 1 THEN list_sum(
      |    [(doc_id*31 + i*17) % 65536 - 32768 for i in range(n)])::BIGINT
      |    END AS sum_pcm,
      |  CASE WHEN k = 1 THEN list_max(
      |    [abs((doc_id*31 + i*17) % 65536 - 32768) for i in range(n)])::BIGINT
      |    END AS max_abs_pcm,
      |  CASE WHEN k = 2 THEN len(string_split(text, ' '))::BIGINT END AS n_tokens
      |FROM m ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_pipeline" -> ((s: SparkSession, d: String) => mmBinaryPipeline(s, d)))

  val oracles: Map[String, String] = Map(
    "mm_binary_pipeline" -> mmBinaryPipelineOracle)
}
