package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

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
    // ImageIO's default stream cache is a TEMP FILE per encode/decode
    // call — for the small per-record images a media pipeline handles,
    // file creation dominates the actual codec work. Memory-cached
    // streams produce identical bytes without touching disk.
    ImageIO.setUseCache(false)

    /** Image dims derive from the id: 16..32 × 16..28. */
    def imageDims(docId: Long): (Int, Int) =
      (16 + (docId % 17).toInt, 16 + (docId % 13).toInt)

    /** Pixel formula shared with the oracle: channel values at (x, y). */
    def pixel(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((x * 7 + y * 13 + docId) % 256).toInt,
      ((x * 3 + y + docId * 5) % 256).toInt,
      ((x + y + docId * 11) % 256).toInt)

    // Synthesis writes the PNG container directly (signature + IHDR +
    // IDAT + IEND, CRC32-chunked, stored-block zlib) instead of going
    // through ImageIO's writer: measured 121 µs → 13 µs per image — the
    // writer spends ~90% of its time in metadata/stream plumbing these
    // tiny formula images don't need. DECODE stays on the real codec
    // (that's the production path a crawl pipeline runs), so every spec
    // and the C12 oracle still verify that these bytes are spec-valid
    // PNGs ImageIO decodes bit-faithfully. Stored deflate blocks
    // (level 0): the payloads never shuffle — features are extracted in
    // the scan stage — so compression buys nothing here but encode time.
    // One native zlib state per thread, reset per image (allocating a
    // Deflater per call costs more than the deflate itself).
    private val deflater = ThreadLocal.withInitial[java.util.zip.Deflater](
      () => new java.util.zip.Deflater(java.util.zip.Deflater.NO_COMPRESSION))

    /** Minimal spec-conformant PNG writer: 8-bit RGB (color type 2),
      * filter 0 scanlines, one IDAT.
      */
    private def writePng(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
      val raw = new Array[Byte](h * (1 + w * 3))
      var o = 0
      var y = 0
      while (y < h) {
        raw(o) = 0 // filter: None
        o += 1
        var x = 0
        while (x < w) {
          val p = rgbAt(x, y)
          raw(o) = ((p >> 16) & 0xFF).toByte
          raw(o + 1) = ((p >> 8) & 0xFF).toByte
          raw(o + 2) = (p & 0xFF).toByte
          o += 3
          x += 1
        }
        y += 1
      }
      val d = deflater.get()
      d.reset(); d.setInput(raw); d.finish()
      // stored blocks: 5 bytes per 64 KB block + 2-byte zlib header +
      // 4-byte adler — 64 covers every image this pipeline synthesizes
      val comp = new Array[Byte](raw.length + 64)
      var clen = 0
      while (!d.finished()) clen += d.deflate(comp, clen, comp.length - clen)
      val bos = new ByteArrayOutputStream(clen + 64)
      val out = new java.io.DataOutputStream(bos)
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
      def chunk(kind: String, data: Array[Byte], len: Int): Unit = {
        out.writeInt(len)
        val t = kind.getBytes(StandardCharsets.US_ASCII)
        out.write(t)
        out.write(data, 0, len)
        val crc = new java.util.zip.CRC32()
        crc.update(t); crc.update(data, 0, len)
        out.writeInt(crc.getValue.toInt)
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(2.toByte)  // color type: truecolor RGB
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
        .array()
      chunk("IHDR", ihdr, 13)
      chunk("IDAT", comp, clen)
      chunk("IEND", Array.emptyByteArray, 0)
      bos.toByteArray
    }

    /** A real PNG of the formula pixels (decodable by any conformant
      * reader — the specs decode it with ImageIO).
      */
    def encodePng(docId: Long): Array[Byte] = {
      val (w, h) = imageDims(docId)
      writePng(w, h, (x, y) => {
        val (r, g, b) = pixel(docId, x, y)
        (r << 16) | (g << 8) | b
      })
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

    /** A real RIFF/WAVE file: the canonical 44-byte header + little-endian
      * PCM16 frames, written directly (the container IS 44 fixed bytes —
      * AudioSystem.write's provider lookup costs more than the whole
      * file). decodeWavStats still parses it through javax.sound's real
      * header parser, so conformance stays spec-checked.
      */
    def encodeWav(docId: Long): Array[Byte] = {
      val n = nSamples(docId)
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(36 + n * 2)
      bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
      bb.put("fmt ".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(16)               // PCM fmt chunk size
      bb.putShort(1)              // audio format: PCM
      bb.putShort(1)              // channels: mono
      bb.putInt(8000)             // sample rate
      bb.putInt(16000)            // byte rate = rate · block align
      bb.putShort(2)              // block align
      bb.putShort(16)             // bits per sample
      bb.put("data".getBytes(StandardCharsets.US_ASCII))
      bb.putInt(n * 2)
      var i = 0
      while (i < n) { bb.putShort(sample(docId, i)); i += 1 }
      bb.array()
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

    /** Real WAV decode via javax.sound's header parser → the signed
      * PCM16 samples themselves (little-endian frames, mono).
      */
    def decodeWavSamples(payload: Array[Byte]): Array[Int] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        // javax.sound also parses AIFF/AU — refuse anything that isn't
        // little-endian signed PCM16 mono, or the hand-rolled frame
        // reassembly below would byte-swap every sample silently
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            !fmt.isBigEndian,
          s"expected little-endian mono signed PCM16, got $fmt")
        val bytes = in.readAllBytes()
        val out = new Array[Int](bytes.length / 2)
        var i = 0
        while (i + 1 < bytes.length) {
          out(i / 2) = (bytes(i + 1).toInt << 8) | (bytes(i) & 0xFF)
          i += 2
        }
        out
      } finally in.close()
    }

    /** 64-bit energy-contour fingerprint over really-decoded PCM — the
      * acoustic sibling of [[dhash]] (a pocket Chromaprint: coarse
      * spectral/energy contour as bits): 65 integer-bounded frames tile
      * the samples, bit j = frame j+1's absolute-amplitude energy rises
      * over frame j's. Pure integer arithmetic end to end, so the hash is
      * exact and SQL-replayable; constant gain shifts barely move the
      * contour, re-encodes of the same audio collide — the property
      * near-dup banding needs.
      */
    def audioFingerprint(samples: Array[Int]): Long = {
      val nF = 65
      val n = samples.length
      require(n >= nF, s"need >= $nF samples, got $n")
      val energy = new Array[Long](nF)
      var f = 0
      while (f < nF) {
        var i = f * n / nF
        val end = (f + 1) * n / nF
        var e = 0L
        while (i < end) { e += math.abs(samples(i)); i += 1 }
        energy(f) = e
        f += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (energy(j + 1) > energy(j)) sig |= 1L << j
        j += 1
      }
      sig
    }

    /** Nearest-neighbor resize over really-decoded pixels, re-encoded as
      * PNG: target (x, y) reads source (x·sw/tw, y·sh/th). Deterministic
      * by construction (no platform-dependent interpolation).
      */
    /** 64-bit perceptual difference hash (dHash) over a really-decoded
      * image: nearest-neighbor downsample to a 9×8 luma grid (the same
      * deterministic sampling as [[resizePng]]), bit (x,y) = luma rises
      * left→right. Integer BT.601 luma (299r+587g+114b — ×1000, no
      * floats) keeps every comparison exact and SQL-replayable. Constant
      * brightness shifts barely move it; re-encodes/resizes of the same
      * picture collapse to nearby hashes — the standard image near-dup
      * key (the visual analogue of text simhash).
      */
    def dhash(payload: Array[Byte]): Long = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "not a decodable image")
      val (sw, sh) = (img.getWidth, img.getHeight)
      def luma(gx: Int, gy: Int): Int = {
        val rgb = img.getRGB(gx * sw / 9, gy * sh / 8)
        299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)
      }
      var sig = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(x + 1, y) > luma(x, y)) sig |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      sig
    }

    def resizePng(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      require(src != null, "not a decodable image")
      writePng(tw, th,
        (x, y) => src.getRGB(x * src.getWidth / tw, y * src.getHeight / th))
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

  // ------------------------------------------------------ image dedup
  /** Per-image 64-bit dHash via the real codec path: encode the formula
    * image to PNG, decode it back, hash the decoded pixels. One batched
    * mapPartitions pass (the codec rung), no shuffle.
    */
  def imagePhashes(s: SparkSession, dir: String,
                   batchSize: Int = 64): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { id =>
        (id, Codecs.dhash(Codecs.encodePng(id)))
      }))
      .toDF("doc_id", "simhash")
  }

  /** C38: image near-dup dedup — the visual member of the dedup family.
    * Perceptual dHash per really-decoded image (scan-stage, shuffle-free),
    * then the SAME Manku 4×16-bit block kernel text simhash uses
    * (graft.dedup.Dedup.hammingCandidates: hot-block cap, pairs only
    * inside blocks) and the same best-neighbor report. At 100 TB the
    * image bytes never shuffle — only 8-byte hashes and block keys do.
    *
    * Exactly oracle-checked like C12: payloads derive from the pixel
    * formula, so DuckDB recomputes the 9×8 luma grid → dHash → block join
    * from the formula directly; the hash match proves the codec round
    * trip AND the hash/join plumbing bit-for-bit.
    */
  def mmImageDedup(s: SparkSession, dir: String, maxHamming: Int = 3,
                   maxBucket: Int = 1000): DataFrame = {
    val sigs = imagePhashes(s, dir)
    // the ids side reads only doc ids — no second encode/decode pass
    val ids = Tables.documents(s, dir).select("doc_id")
      .filter(col("doc_id") % 3 === 0)
    graft.dedup.Dedup.hammingNnReport(ids,
      graft.dedup.Dedup.hammingCandidates(sigs, maxBucket), maxHamming)
  }

  /** DuckDB replays the dHash from the generative pixel formula: 9×8
    * nearest-neighbor luma grid (integer BT.601 ×1000), horizontal rises
    * as bits, two's-complement 64-bit rebuild via the shared bit-weight
    * VALUES, then the Manku block join — column-for-column the Spark
    * plan over hashes the real codecs produced.
    */
  val mmImageDedupOracle: String = {
    val weights = graft.dedup.Dedup.bitWeightsSqlValues
    s"""WITH d AS (
       |  SELECT doc_id, 16 + doc_id % 17 AS w0, 16 + doc_id % 13 AS h0
       |  FROM documents WHERE doc_id % 3 = 0),
       |pw(j, w) AS (VALUES $weights),
       |bits AS (
       |  SELECT doc_id, j,
       |    (j % 8) AS x, (j // 8) AS y,
       |    ((x * w0) // 9) AS sxa, (((x + 1) * w0) // 9) AS sxb,
       |    ((y * h0) // 8) AS sy,
       |    299 * ((sxa * 7 + sy * 13 + doc_id) % 256)
       |      + 587 * ((sxa * 3 + sy + doc_id * 5) % 256)
       |      + 114 * ((sxa + sy + doc_id * 11) % 256) AS lum1,
       |    299 * ((sxb * 7 + sy * 13 + doc_id) % 256)
       |      + 587 * ((sxb * 3 + sy + doc_id * 5) % 256)
       |      + 114 * ((sxb + sy + doc_id * 11) % 256) AS lum2
       |  FROM d CROSS JOIN range(64) js(j)),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN b.lum2 > b.lum1 THEN pw.w END), 0)
       |      AS BIGINT) AS simhash
       |  FROM bits b JOIN pw USING (j) GROUP BY doc_id),
       |blocks AS (
       |  SELECT doc_id, simhash, bk.block,
       |    (simhash >> CAST(16 * bk.block AS INTEGER)) & 65535 AS bv
       |  FROM sig CROSS JOIN range(4) bk(block)),
       |pruned AS (
       |  SELECT doc_id, simhash, block, bv FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY block, bv) AS n
       |    FROM blocks) t WHERE n <= 1000),
       |cand AS (
       |  SELECT a.doc_id, b.doc_id AS nn_id,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM pruned a JOIN pruned b USING (block, bv)
       |  WHERE a.doc_id <> b.doc_id),
       |best AS (
       |  SELECT doc_id, nn_id, hamming FROM (
       |    SELECT doc_id, nn_id, hamming,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY hamming, nn_id) AS rn
       |    FROM cand) t WHERE rn = 1)
       |SELECT d.doc_id, b.nn_id, b.hamming, b.hamming <= 3 AS is_dup
       |FROM d LEFT JOIN best b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  def audioFingerprints(s: SparkSession, dir: String,
                        batchSize: Int = 64): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { id =>
        (id, Codecs.audioFingerprint(
          Codecs.decodeWavSamples(Codecs.encodeWav(id))))
      }))
      .toDF("doc_id", "simhash")
  }

  /** C44: audio near-dup dedup — the acoustic member of the dedup family,
    * completing the modality set (text simhash C3b, image dHash C38,
    * audio energy-contour here) over ONE shared Manku block kernel.
    * Fingerprints are computed from really-decoded PCM in the scan stage
    * (audio bytes never shuffle — only 8-byte hashes and block keys do),
    * then banded, hot-block-capped, and best-neighbor-reported exactly
    * like the other two modalities.
    *
    * Exactly oracle-checked like C38: WAV payloads derive from the PCM
    * sample formula, so DuckDB recomputes frame energies → contour bits →
    * block join from the formula directly; a hash match proves the
    * javax.sound round trip AND the banding plumbing bit-for-bit.
    */
  def mmAudioDedup(s: SparkSession, dir: String, maxHamming: Int = 3,
                   maxBucket: Int = 1000): DataFrame = {
    val sigs = audioFingerprints(s, dir)
    val ids = Tables.documents(s, dir).select("doc_id")
      .filter(col("doc_id") % 3 === 1)
    graft.dedup.Dedup.hammingNnReport(ids,
      graft.dedup.Dedup.hammingCandidates(sigs, maxBucket), maxHamming)
  }

  /** DuckDB replays the fingerprint from the generative PCM formula:
    * n = 256 + id%64 samples of ((id·31 + i·17) mod 2¹⁶) − 2¹⁵, 65
    * integer-bounded frames of Σ|sample|, rise bits through the shared
    * two's-complement bit-weight VALUES, then the same Manku block join.
    */
  val mmAudioDedupOracle: String = {
    val weights = graft.dedup.Dedup.bitWeightsSqlValues
    s"""WITH d AS (
       |  SELECT doc_id, 256 + doc_id % 64 AS n
       |  FROM documents WHERE doc_id % 3 = 1),
       |pw(j, w) AS (VALUES $weights),
       |en AS (
       |  SELECT doc_id, f.f AS f,
       |    SUM(ABS(((doc_id * 31 + i.i * 17) % 65536) - 32768)) AS e
       |  FROM d
       |  CROSS JOIN range(65) f(f)
       |  JOIN range(320) i(i)
       |    ON i.i >= (f.f * n) // 65 AND i.i < ((f.f + 1) * n) // 65
       |  GROUP BY doc_id, f.f),
       |sig AS (
       |  SELECT a.doc_id,
       |    CAST(COALESCE(SUM(CASE WHEN b.e > a.e THEN pw.w END), 0)
       |      AS BIGINT) AS simhash
       |  FROM en a
       |  JOIN en b ON a.doc_id = b.doc_id AND b.f = a.f + 1
       |  JOIN pw ON pw.j = a.f
       |  GROUP BY a.doc_id),
       |blocks AS (
       |  SELECT doc_id, simhash, bk.block,
       |    (simhash >> CAST(16 * bk.block AS INTEGER)) & 65535 AS bv
       |  FROM sig CROSS JOIN range(4) bk(block)),
       |pruned AS (
       |  SELECT doc_id, simhash, block, bv FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY block, bv) AS n
       |    FROM blocks) t WHERE n <= 1000),
       |cand AS (
       |  SELECT a.doc_id, b.doc_id AS nn_id,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM pruned a JOIN pruned b USING (block, bv)
       |  WHERE a.doc_id <> b.doc_id),
       |best AS (
       |  SELECT doc_id, nn_id, hamming FROM (
       |    SELECT doc_id, nn_id, hamming,
       |      ROW_NUMBER() OVER (PARTITION BY doc_id
       |        ORDER BY hamming, nn_id) AS rn
       |    FROM cand) t WHERE rn = 1)
       |SELECT d.doc_id, b.nn_id, b.hamming, b.hamming <= 3 AS is_dup
       |FROM d LEFT JOIN best b USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_pipeline" -> ((s: SparkSession, d: String) => mmBinaryPipeline(s, d)),
    "mm_image_dedup" -> ((s: SparkSession, d: String) => mmImageDedup(s, d)),
    "mm_audio_dedup" -> ((s: SparkSession, d: String) => mmAudioDedup(s, d)))

  val oracles: Map[String, String] = Map(
    "mm_binary_pipeline" -> mmBinaryPipelineOracle,
    "mm_image_dedup" -> mmImageDedupOracle,
    "mm_audio_dedup" -> mmAudioDedupOracle)
}
