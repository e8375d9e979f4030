package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Codecs, MMRecord}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG round trip: real encode -> real decode recovers formula pixels") {
    val id = 42L
    val (w, h) = Codecs.imageDims(id)
    val (dw, dh, sr, sg, sb) = Codecs.decodeImageStats(Codecs.encodePng(id))
    assert((dw, dh) == (w.toLong, h.toLong))
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Codecs.pixel(id, x, y)
      er += r; eg += g; eb += b
    }
    assert((sr, sg, sb) == (er, eg, eb))
  }

  test("WAV round trip: javax.sound encode -> decode recovers PCM exactly") {
    val id = 7L
    val n = Codecs.nSamples(id)
    val (dn, sum, maxAbs) = Codecs.decodeWavStats(Codecs.encodeWav(id))
    assert(dn == n.toLong)
    val samples = (0 until n).map(i => Codecs.sample(id, i).toLong)
    assert(sum == samples.sum)
    assert(maxAbs == samples.map(math.abs).max)
  }

  test("nearest-neighbor resize: exact target dims and source pixels") {
    val id = 5L
    val resized = Codecs.resizePng(Codecs.encodePng(id), 8, 6)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 8 && img.getHeight == 6)
    val (sw, sh) = Codecs.imageDims(id)
    for (y <- 0 until 6; x <- 0 until 8) {
      val (r, g, b) = Codecs.pixel(id, x * sw / 8, y * sh / 6)
      assert(img.getRGB(x, y) == (0xFF << 24 | r << 16 | g << 8 | b))
    }
  }

  test("corrupt payloads surface decode_ok=false instead of failing tasks") {
    val recs = Seq(
      MMRecord(1L, "image/png", Array[Byte](1, 2, 3)), // not a PNG
      MMRecord(2L, "image/png", Codecs.encodePng(2L)),
      MMRecord(3L, "mime/unknown", Array[Byte](9)))
    val out = Multimodal.extractFeatures(spark.createDataset(recs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(!out(1L).decode_ok && out(1L).width.isEmpty)
    assert(out(2L).decode_ok && out(2L).width.contains(18L))
    assert(!out(3L).decode_ok)
  }

  test("pipeline dispatches all three modalities with real decodes") {
    val rows = Multimodal.mmBinaryPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("decode_ok")))
    val byMime = rows.groupBy(_.getAs[String]("mime"))
    assert(byMime.keySet == Set("image/png", "audio/wav", "text/plain"))
    byMime("image/png").foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") == 16 + id % 17)
      assert(r.isNullAt(r.fieldIndex("n_samples")))
    }
    byMime("audio/wav").foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_samples") == 256 + id % 64)
    }
  }

  test("frame sampling: every k-th frame decoded, luma from real pixels") {
    val frames = (0L until 10L).map(Codecs.encodePng)
    val sampled = Multimodal.sampleFrames(frames, stride = 3, offset = 1)
    assert(sampled.map(_._1) == Seq(1, 4, 7))
    sampled.foreach { case (i, luma) =>
      val (w, h, sr, sg, sb) = Codecs.decodeImageStats(frames(i))
      val expect = (0.299 * sr + 0.587 * sg + 0.114 * sb) / (w * h).toDouble
      assert(math.abs(luma - expect) < 1e-12)
      assert(luma > 0 && luma < 255)
    }
  }

  test("batch size bounds memory, not results") {
    val feed = Multimodal.mmFeed(spark, sf)
    val small = Multimodal.extractFeatures(feed, batchSize = 3)
      .collect().sortBy(_.doc_id)
    val big = Multimodal.extractFeatures(feed, batchSize = 512)
      .collect().sortBy(_.doc_id)
    assert(small.toSeq == big.toSeq)
  }

  test("dHash: brightness-shift invariant away from wraps, dims-independent length") {
    // +k on every channel flips a luma comparison only where a channel
    // wraps mod 256; a 1-unit shift flips few bits — the near-dup property
    val base = Codecs.dhash(Codecs.encodePng(42L))
    assert(base == Codecs.dhash(Codecs.encodePng(42L))) // deterministic
    val shifted = Codecs.dhash(Codecs.encodePng(42L + 256 * 221)) // same dims, +r/g/b shift
    assert(java.lang.Long.bitCount(base ^ shifted) <= 16,
      "a brightness-style shift must move few dHash bits")
  }

  test("audio fingerprint: deterministic, decode-true, and gain-robust " +
    "contour bits") {
    val fp = Codecs.audioFingerprint(
      Codecs.decodeWavSamples(Codecs.encodeWav(4L)))
    assert(fp == Codecs.audioFingerprint(
      Codecs.decodeWavSamples(Codecs.encodeWav(4L))))
    // decode-true: recompute straight from the sample formula
    val n = Codecs.nSamples(4L)
    val direct = Codecs.audioFingerprint(
      Array.tabulate(n)(i => Codecs.sample(4L, i).toInt))
    assert(fp == direct, "javax.sound round trip changed the samples")
  }

  test("mm_audio_dedup: identical formula audio pairs at hamming 0") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_mmad").toString
    // Δ = 3·65536: sample stream identical mod 2^16 AND n identical
    // (3·65536 ≡ 0 mod 64) → identical WAV bytes → fingerprints equal
    Seq((4L, "x", "en", "s", 1L), (196612L, "y", "en", "s", 1L),
      (7L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.mmAudioDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2), r.getBoolean(3)))))
      .toMap
    assert(rows(4L).contains((196612L, 0, true)))
    assert(rows(196612L).contains((4L, 0, true)))
    assert(rows(7L).forall(_._2 > 0))
  }

  test("mm_image_dedup: identical formula images pair at hamming 0") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_mmid").toString
    // Δ = 3·lcm(256,17,13) = 169728: identical dims AND identical pixels
    // (every channel shift ≡ 0 mod 256) → identical PNGs → dHash equal
    Seq((0L, "x", "en", "s", 1L), (169728L, "y", "en", "s", 1L),
      (3L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.mmImageDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2), r.getBoolean(3)))))
      .toMap
    assert(rows(0L).contains((169728L, 0, true)))
    assert(rows(169728L).contains((0L, 0, true)))
    // the third image is unrelated: either no candidate in any block, or
    // a far-off one — never a 0-distance pair
    assert(rows(3L).forall(_._2 > 0))
  }

  test("AVI round trip: real RIFF write -> chunk-walk read recovers " +
    "header fields and every frame's formula pixels") {
    val id = 11L
    val avi = Multimodal.Codecs.decodeAvi(Multimodal.Codecs.encodeAvi(id))
    val (w, h) = Multimodal.Codecs.imageDims(id)
    assert((avi.width, avi.height) == (w, h))
    assert(avi.totalFrames == Multimodal.Codecs.nVideoFrames(id))
    assert(avi.frames.size == avi.totalFrames)
    avi.frames.zipWithIndex.foreach { case (fb, f) =>
      val seed = Multimodal.Codecs.frameSeed(id, f)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fb))
      assert((img.getWidth, img.getHeight) == (w, h),
        "frames render at the VIDEO's dims, not the seed's")
      val rgb = img.getRGB(3, 2)
      val (r, g, b) = Multimodal.Codecs.pixel(seed, 3, 2)
      assert(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) == (r, g, b))
    }
  }

  test("AVI reader is index-independent and refuses non-AVI bytes") {
    val id = 7L
    val full = Multimodal.Codecs.encodeAvi(id)
    // drop the trailing idx1 chunk (16·nf + 8 bytes): stream order is
    // normative, the index is a player optimization
    val nf = Multimodal.Codecs.nVideoFrames(id)
    val truncated = full.dropRight(16 * nf + 8)
    val avi = Multimodal.Codecs.decodeAvi(truncated)
    assert(avi.frames.size == nf)
    intercept[IllegalArgumentException] {
      Multimodal.Codecs.decodeAvi("definitely not a RIFF".getBytes)
    }
  }

  test("video fingerprint: stride sampling arithmetic, determinism, and " +
    "majority-vote robustness to a minority of swapped frames") {
    val id = 14L // nf = 6 + 14%4 = 8 -> samples frames 0,2,4,6
    val frames = Multimodal.Codecs.decodeAvi(
      Multimodal.Codecs.encodeAvi(id)).frames
    val fp = Multimodal.Codecs.videoFingerprint(frames)
    assert(fp == Multimodal.Codecs.videoFingerprint(frames), "deterministic")
    // stride 2 ignores odd frames entirely: corrupting one changes nothing
    val oddSwapped = frames.updated(1, frames(3))
    assert(Multimodal.Codecs.videoFingerprint(oddSwapped) == fp)
    // replacing ONE sampled frame of four moves at most the bits where
    // the vote was 2-2 or 3-1 around that frame — strictly fewer than a
    // full re-hash; an unrelated video's fingerprint is far away
    val oneSampledSwapped = frames.updated(2,
      Multimodal.Codecs.encodePngSized(999999L, 16, 16))
    val moved = java.lang.Long.bitCount(
      fp ^ Multimodal.Codecs.videoFingerprint(oneSampledSwapped))
    assert(moved < 32, s"one frame of four moved $moved bits")
    val other = Multimodal.Codecs.videoFingerprint(
      Multimodal.Codecs.decodeAvi(Multimodal.Codecs.encodeAvi(900L)).frames)
    assert(java.lang.Long.bitCount(fp ^ other) > 3,
      "unrelated videos must not collide within the dup threshold")
  }

  test("mm_video_dedup: identical formula videos pair at hamming 0") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_mmvd").toString
    // Δ = 3·4·lcm(256,17,13) = 678912: same dims, same frame count,
    // every per-frame seed shifted by a multiple of 256 -> identical
    // pixels -> identical fingerprints (doc_id % 3 == 2 both)
    Seq((2L, "x", "en", "s", 1L), (2L + 678912L, "y", "en", "s", 1L),
      (5L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.mmVideoDedup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2), r.getBoolean(3)))))
      .toMap
    assert(rows(2L).contains((2L + 678912L, 0, true)))
    assert(rows(2L + 678912L).contains((2L, 0, true)))
    assert(rows(5L).forall(_._2 > 0))
  }
}
