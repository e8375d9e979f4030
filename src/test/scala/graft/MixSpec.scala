package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Mix

class MixSpec extends SparkSpec {
  import spark.implicits._

  test("corpusMix keeps ~rate per source, deterministically, with no shuffle") {
    val docs = (0L until 4000L).map(i => (i, s"src${i % 2}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val rates = Map("src0" -> 0.25, "src1" -> 0.75)
    val out = Mix.corpusMix(docs, rates)
    // per-source keep fraction converges on the target rate
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("src0") / 2000.0 - 0.25) < 0.05, s"src0: $kept")
    assert(math.abs(kept("src1") / 2000.0 - 0.75) < 0.05, s"src1: $kept")
    // same inputs → byte-identical keep set (no RNG anywhere)
    val again = Mix.corpusMix(docs, rates).select("doc_id").as[Long].collect()
    assert(out.select("doc_id").as[Long].collect().toSeq == again.toSeq)
    // scan-stage gate: the filter plans without any exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "sampling must not shuffle")
  }

  test("corpusSplit: content-keyed splits co-assign exact duplicates, " +
    "hold their fractions, and never shuffle") {
    val docs = (0L until 6000L).map(i => (i, "web", s"document body $i"))
      .toDF("doc_id", "source", "text")
    val out = Mix.corpusSplit(docs)
    val byjoin = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(byjoin.keySet == Set("train", "validation", "test"))
    assert(math.abs(byjoin("train") / 6000.0 - 0.96) < 0.02, s"$byjoin")
    assert(math.abs(byjoin("validation") / 6000.0 - 0.02) < 0.01, s"$byjoin")
    // exact duplicates land in the SAME split regardless of doc_id —
    // the decontamination guarantee an id-keyed split cannot give
    val dups = (0L until 500L).map(i => (900000L + i, "crawl2",
      s"document body ${i * 7 % 6000}")).toDF("doc_id", "source", "text")
    val both = Mix.corpusSplit(docs.unionByName(dups))
      .groupBy("text").agg(countDistinct("split").as("n"))
    assert(both.filter(col("n") > 1).count() == 0,
      "duplicate texts split across the train/test fence")
    // membership is per-row: a doc keeps its split in ANY corpus subset
    val sub = Mix.corpusSplit(docs.filter(col("doc_id") % 3 === 0))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = out.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(sub.forall { case (id, sp) => full(id) == sp })
    // scan-stage projection: no exchange anywhere
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "split assignment must not shuffle")
  }

  test("corpusMix salt decorrelates: different salts, different keep sets") {
    val docs = (0L until 2000L).map(i => (i, "s", "t")).toDF("doc_id", "source", "text")
    val a = Mix.corpusMix(docs, Map("s" -> 0.5), salt = "mix")
      .select("doc_id").as[Long].collect().toSet
    val b = Mix.corpusMix(docs, Map("s" -> 0.5), salt = "other")
      .select("doc_id").as[Long].collect().toSet
    val overlap = (a & b).size.toDouble / math.max(a.size, 1)
    // independent 0.5-samples overlap on ~50% of members, not ~100%
    assert(overlap > 0.3 && overlap < 0.7, s"overlap $overlap")
  }

  test("seqPack: offsets stay in [0, capacity); chunks tile the stream") {
    val docs = (0L until 300L)
      .map(i => (i, s"src${i % 3}", Seq.fill(1 + (i % 7).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val out = Mix.seqPack(docs, capacity = 16,
        tokens = size(split(col("text"), " ")),
        streamCol = col("source"), orderCol = col("doc_id"))
      .select("doc_id", "source", "n_tokens", "seq_id", "offset_in_seq")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.length == 300)
    out.foreach { case (id, _, n, seq, off) =>
      assert(off >= 0 && off < 16, s"doc $id offset $off")
      assert(seq >= 0)
      assert(n >= 1)
    }
    // within a stream: start offsets are the running sum — doc k starts
    // exactly where doc k-1 ended (concat semantics, no gaps, no overlap)
    out.groupBy(_._2).foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._1)
      sorted.zip(sorted.tail).foreach { case ((_, _, n1, s1, o1), (_, _, _, s2, o2)) =>
        val endAbs = s1 * 16 + o1 + n1
        assert(s2 * 16 + o2 == endAbs, "gap or overlap in packed stream")
      }
    }
  }

  test("seqPack: orderCol ties still tile gap-free (ROWS frame, not RANGE)") {
    // every doc shares the same order key — under the default RANGE frame
    // all rows would get one collapsed running sum and overlapping offsets
    val docs = (0L until 50L).map(i => (i, "s", "a b c"))
      .toDF("doc_id", "source", "text").withColumn("k", lit(1))
    val out = Mix.seqPack(docs, capacity = 8,
        tokens = size(split(col("text"), " ")),
        streamCol = col("source"), orderCol = col("k"))
      .select("n_tokens", "seq_id", "offset_in_seq")
      .as[(Long, Long, Long)].collect()
    val starts = out.map { case (_, s, o) => s * 8 + o }.sorted
    // starts are exactly 0, 3, 6, ... — each doc begins where one ended
    assert(starts.toSeq == (0L until 50L).map(_ * 3))
  }

  test("corpusStratified: exactly min(quota, |stratum|) per stratum, deterministic") {
    // src0 has 30 docs (> quota), src1 has 4 (< quota)
    val docs = ((0L until 30L).map(i => (i, "src0", "t")) ++
        (100L until 104L).map(i => (i, "src1", "t")))
      .toDF("doc_id", "source", "text")
    val out = Mix.corpusStratified(docs, col("source"), 10, col("doc_id"))
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts == Map("src0" -> 10L, "src1" -> 4L))
    // ranks are contiguous 1..k within each stratum
    val ranks = out.select("source", "rn").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(ranks("src0") == (1L to 10L) && ranks("src1") == (1L to 4L))
    // deterministic: the same draw twice is the same set; a different salt
    // draws a (very likely) different one
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Mix.corpusStratified(docs, col("source"), 10, col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val c = Mix.corpusStratified(docs, col("source"), 10, col("doc_id"),
      salt = "other").select("doc_id").as[Long].collect().toSet
    assert((a -- c).nonEmpty, "independent salts should disagree somewhere")
  }

  test("corpusShuffle: positions tile each shard, order is partition-stable " +
    "and actually shuffles runs of neighbors") {
    val docs = (0L until 1000L).map(i => (i, s"src${i / 100}"))
      .toDF("doc_id", "source")
    val a = Mix.corpusShuffle(docs, col("doc_id"))
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Mix.corpusShuffle(docs.repartition(7), col("doc_id"))
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "shuffle order must not depend on partitioning")
    // positions are 0..n-1 within each shard, no gaps or dups
    a.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // all 8 shards used, roughly evenly (uniform split: no shard > 2x mean)
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.size == 8 && sizes.values.max <= 2 * 1000 / 8)
    // randomization is real: consecutive source docs scatter — within one
    // shard, the average position distance of adjacent doc_ids is large
    val shard0 = a.filter(_._2 == 0L).sortBy(_._1)
    val adjacent = shard0.sliding(2).collect {
      case Array((_, _, p1), (_, _, p2)) => math.abs(p2 - p1)
    }.toSeq
    assert(adjacent.sum.toDouble / adjacent.length > shard0.length / 10.0,
      "adjacent input docs should land far apart in shuffled order")
  }

  test("corpus_build_shuffled: same survivors and stream totals as id-order " +
    "build, different sequence layout") {
    val a = Mix.corpusBuildQuery(spark, sf)
      .select("doc_id", "source", "n_tokens", "seq_id")
      .as[(Long, String, Long, Long)].collect()
    val b = Mix.corpusBuildShuffledQuery(spark, sf)
      .select("doc_id", "source", "n_tokens", "seq_id")
      .as[(Long, String, Long, Long)].collect()
    // identical doc set and token counts (the shuffle reorders, never drops)
    assert(a.map(r => (r._1, r._2, r._3)).toSet == b.map(r => (r._1, r._2, r._3)).toSet)
    // per-stream sequence counts identical (same tokens, same capacity)
    def seqsPerStream(rows: Array[(Long, String, Long, Long)]) =
      rows.groupBy(_._2).view.mapValues(_.map(_._4).max).toMap
    assert(seqsPerStream(a) == seqsPerStream(b))
    // but the layout genuinely shuffled: some doc changed sequence
    val aSeq = a.map(r => r._1 -> r._4).toMap
    assert(b.exists { case (id, _, _, s) => aSeq(id) != s },
      "shuffled build must assign at least one doc to a different sequence")
  }

  test("docChunk: chunks tile every token, overlap by chunk-stride, no shuffle") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks → starts 0,4,8
      (2L, "single"),                                  // 1 tok  → one short chunk
      (3L, (1 to 4).map(i => s"x$i").mkString(" ")))   // 4 toks → starts 0 only? no: 0 (n-1=3 < stride)
      .toDF("doc_id", "text")
    val out = Mix.docChunk(docs, col("text"), chunkTokens = 6, stride = 4)
      .select("doc_id", "chunk_id", "start_tok", "chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    // doc 1: starts 0/4 — chunk@4 (w5..w10) reaches the end, so the naive
    // start 8 (w9 w10, wholly inside chunk@4) is NOT emitted
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 4L))
    assert(d1.map(_._4).toSeq == Seq(6L, 6L))
    assert(d1(1)._5 == "w5 w6 w7 w8 w9 w10")
    // every token of doc 1 is still covered by some chunk
    val covered = d1.flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0L until 10L).toSet)
    // chunk_text token count always equals chunk_tokens
    out.foreach { case (_, _, _, ct, txt) =>
      assert(txt.split(" ").length.toLong == ct) }
    // single-token and shorter-than-chunk docs still emit one full cover
    assert(out.filter(_._1 == 2L).map(r => (r._3, r._4, r._5)).toSeq ==
      Seq((0L, 1L, "single")))
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq(4L))
    // disjoint mode (stride = chunk) reconstructs the document exactly
    val rebuilt = Mix.docChunk(docs, col("text"), chunkTokens = 4, stride = 4)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
    assert(rebuilt(1L) == (1 to 10).map(i => s"w$i").mkString(" "))
    // scan-shaped: explode + slice plan without any exchange
    val plan = Mix.docChunk(docs, col("text"), 6, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "chunking must not shuffle")
  }

  test("seqPack shards: hashed streams parallelize a single big source") {
    val docs = (0L until 1000L).map(i => (i, "web", "a b c"))
      .toDF("doc_id", "source", "text")
    val sharded = Mix.seqPack(docs, capacity = 64,
      tokens = size(split(col("text"), " ")),
      streamCol = concat(col("source"), lit(":"), pmod(col("doc_id"), lit(8))),
      orderCol = col("doc_id"))
    // every shard packs independently: 8 streams, each with its own seq 0
    val zeroSeqs = sharded.filter(col("seq_id") === 0 && col("offset_in_seq") === 0)
    assert(zeroSeqs.count() == 8)
  }
}
