package graft

import org.apache.spark.sql.functions._

import graft.dedup.Bloom

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom build/probe: no false negatives ever, false positives at " +
    "the sized-for rate, build is partition-count invariant") {
    val hist = (0L until 2000L).map(i => s"history doc $i").toDF("text")
    val mBits = 1 << Bloom.bloomBitsFor(2000L) // 2^15 < 16·2000 ≤ 2^16 → 16? (sized)
    val words = Bloom.build(hist, col("text"), mBits)
    // every inserted key answers maybe_seen = true — the one-sided error
    val seen = hist.select(Bloom.contains(words, col("text"), mBits).as("m"))
      .as[Boolean].collect()
    assert(seen.forall(identity), "bloom false negative — structurally impossible")
    // fresh keys: false positives exist but stay ~‰-scale at the sizing
    val fresh = (0L until 2000L).map(i => s"unseen doc $i").toDF("text")
    val fp = fresh.select(Bloom.contains(words, col("text"), mBits).as("m"))
      .as[Boolean].collect().count(identity)
    assert(fp < 2000 * 0.05, s"false-positive rate blew the sizing: $fp/2000")
    // the OR-fold is layout-independent: 1-partition and 8-partition
    // builds produce the identical bitmap
    val words1 = Bloom.build(hist.repartition(8), col("text"), mBits)
    assert(words.toSeq == words1.toSeq)
  }

  test("bloom guards: non-power-of-two m refused on both ends; a null " +
    "key probes to false, never null") {
    val keys = Seq("a", "b").toDF("text")
    intercept[IllegalArgumentException](
      Bloom.build(keys, col("text"), mBits = 100))
    intercept[IllegalArgumentException](
      Bloom.contains(new Array[Long](2), col("text"), mBits = 100))
    intercept[IllegalArgumentException](
      Bloom.contains(new Array[Long](1), col("text"), mBits = 128))
    val words = Bloom.build(keys, col("text"), 1 << 16)
    val out = Seq(Some("a"), None).toDF("text")
      .select(Bloom.contains(words, col("text"), 1 << 16).as("m"))
      .as[Boolean].collect()
    assert(out.toSeq == Seq(true, false))
  }

  test("bloom sizing: power-of-two m >= 16n within clamps, SQL CASE " +
    "mirrors the Scala thresholds at every boundary") {
    assert(Bloom.bloomBitsFor(1L) == Bloom.MinBloomBits)
    assert(Bloom.bloomBitsFor(1L << 12) == 16)
    assert(Bloom.bloomBitsFor((1L << 12) + 1) == 17)
    assert(Bloom.bloomBitsFor(Long.MaxValue / 32) == Bloom.MaxBloomBits)
    // boundary parity against the generated SQL, evaluated by Spark's own
    // SQL engine (same integer CASE semantics DuckDB applies)
    val cases = Seq(1L, 4096L, 4097L, 100000L, 1L << 23)
    cases.foreach { n =>
      val sql = Bloom.bloomBitsSqlCase(n.toString)
      val got = spark.sql(s"SELECT $sql AS b").head().getInt(0)
      assert(got == Bloom.bloomBitsFor(n), s"n=$n: SQL $got != Scala")
    }
  }

  test("dedup_bloom: maybe_seen covers seen_exact row for row on a " +
    "corpus with cross-partition duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    // odd batch ids 1..999; every batch doc with id%10==1 duplicates a
    // history doc's text
    (0L until 2000L).map { i =>
      val text = if (i % 2 == 1 && i % 10 == 1) s"doc ${i - 1}" else s"doc $i"
      (i, text, "en", "s", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = Bloom.dedupBloom(spark, dir)
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.length == 1000)
    // no false negatives: exact ⊆ maybe
    assert(out.forall { case (_, maybe, exact) => !exact || maybe })
    // the planted duplicates are all found
    assert(out.count(_._3) == 200)
  }

  test("broadcast probe agrees with the literal probe bit for bit at " +
    "literal-feasible sizes") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val keys = (0L until 3000L).map(k => s"key-$k").toDF("k")
    val hist = keys.filter(length(col("k")) % 3 =!= 0)
    val mBits = 1 << 16
    val words = Bloom.build(hist, col("k"), mBits)
    val both = keys.select(col("k"),
        Bloom.contains(words, col("k"), mBits).as("lit"),
        Bloom.containsBroadcast(words, col("k"), mBits).as("bc"))
      .as[(String, Boolean, Boolean)].collect()
    assert(both.forall { case (_, l, b) => l == b },
      "the two probe paths must be the same function")
    assert(both.exists(_._2) && both.exists(!_._2))
  }

  test("a build PAST the 2^26 literal clamp probes correctly through " +
    "the broadcast expression (no false negatives, sane FP rate)") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val mBits = 1 << 27 // 2x the literal clamp; 16 MB of words
    val n = 20000
    val hist = (0 until n).map(k => s"seen-$k").toDF("k")
    val words = Bloom.build(hist, col("k"), mBits)
    val probes = ((0 until n).map(k => (s"seen-$k", true)) ++
      (0 until n).map(k => (s"fresh-$k", false))).toDF("k", "inserted")
    val got = probes.select(col("inserted"),
        Bloom.containsBroadcast(words, col("k"), mBits).as("maybe"))
      .as[(Boolean, Boolean)].collect()
    assert(got.filter(_._1).forall(_._2), "false negative — impossible")
    val fp = got.filterNot(_._1).count(_._2).toDouble / n
    // at 2^27 bits / 2·10^4 keys the filter is almost empty — any real
    // FP rate means the probe or build is broken
    assert(fp < 0.001, s"false-positive rate $fp at near-zero load")
    // and the clamp itself is enforced on the probe side (2^31 is past
    // the broadcast ceiling)
    intercept[IllegalArgumentException] {
      Bloom.containsBroadcast(new Array[Long](1 << 25), col("k"), 1 << 31)
    }
  }
}
