package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainLocal learns the expected merges on a tiny corpus") {
    // "low low lower": pairs (l,o)=3, (o,w)=3 — tie breaks lexicographically
    // to (l,o); then (lo,w)=3; then (e,r)/(low,e) tie at 1 → (e,r) first
    // ("e" < "low"); finally (low,er)
    val merges = Bpe.trainLocal(Seq(("low", 2L), ("lower", 1L)), 4)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
  }

  test("training is deterministic and bounded (one aggregate collect)") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.train(docs, col("text"), 16)
    val b = Bpe.train(docs.repartition(7), col("text"), 16)
    assert(a == b, "merge table must not depend on partitioning")
    assert(a.length == 16)
  }

  test("tokenCount: sequential rank-order encoding, replace() semantics") {
    def count(text: String, merges: (String, String)*): Int =
      Bpe.tokenCount(org.apache.spark.unsafe.types.UTF8String.fromString(text),
        merges.flatMap { case (x, y) => Seq(x, y) }.toArray)
    // no merges applicable: one token per char
    assert(count("abc", ("x", "y")) == 3)
    // greedy left-to-right non-overlapping: "aaa" + (a,a) → [aa, a]
    assert(count("aaa", ("a", "a")) == 2)
    assert(count("aaaa", ("a", "a")) == 2) // [aa, aa]
    // merged symbol not re-matched within the same rule's pass
    assert(count("ab ab", ("a", "b")) == 2) // each word → [ab]
    // rank order: later rule consumes the earlier rule's output
    assert(count("abc", ("a", "b"), ("ab", "c")) == 1)
    // a lower-rank rule never re-fires after a higher-rank one (sequential)
    assert(count("abc", ("b", "c"), ("a", "b")) == 2) // [a, bc]
    // words are independent; empty segments (double spaces) count zero
    assert(count("ab  ab", ("a", "b")) == 2)
    assert(count("", ("a", "b")) == 0)
  }

  test("bpe_token_count agrees with an independent per-word reference") {
    val docs = Tables.documents(spark, sf).limit(50)
    val got = docs.select(col("doc_id"), Bpe.bpe_token_count(col("text")).as("c"))
      .as[(Long, Int)].collect().toMap
    val flat = Bpe.DefaultMerges.flatMap { case (a, b) => Seq(a, b) }.toArray
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      // reference: split words, encode each via the TRAINER's applyMerge
      // (an independent list-of-strings implementation of the same pass)
      val expect = text.split(" ", -1).filter(_.nonEmpty).map { w =>
        var syms = w.map(_.toString).toArray
        Bpe.DefaultMerges.foreach { rule =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == rule._1 && syms(j + 1) == rule._2) {
              out += syms(j) + syms(j + 1); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.toArray
        }
        syms.length
      }.sum
      assert(got(id) == expect, s"doc $id")
    }
  }

  test("property: slice-based counter ≡ list-based reference on random corpora " +
    "under freshly trained tables") {
    val rnd = new scala.util.Random(1234)
    def word() = // small alphabet so merges actually fire
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    def doc() = (0 until (1 + rnd.nextInt(30))).map(_ => word()).mkString(" ")
    def refCount(text: String, merges: Seq[(String, String)]): Int =
      text.split(" ", -1).filter(_.nonEmpty).map { w =>
        var syms = w.map(_.toString).toArray
        merges.foreach { rule =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == rule._1 && syms(j + 1) == rule._2) {
              out += syms(j) + syms(j + 1); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.toArray
        }
        syms.length
      }.sum
    (0 until 20).foreach { _ =>
      val corpus = (0 until 50).map(_ => (doc(), 1L + rnd.nextInt(5)))
      val merges = Bpe.trainLocal(corpus, 24)
      val flat = merges.flatMap { case (a, b) => Seq(a, b) }.toArray
      corpus.foreach { case (text, _) =>
        val got = Bpe.tokenCount(
          org.apache.spark.unsafe.types.UTF8String.fromString(text), flat)
        assert(got == refCount(text, merges), s"'$text' under $merges")
      }
    }
  }

  test("property: heap encoder ≡ rule-sweep encoder on random corpora " +
    "under freshly trained tables") {
    val rnd = new scala.util.Random(4321)
    def word() =
      (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    def doc() = (0 until (1 + rnd.nextInt(30))).map(_ => word()).mkString(" ")
    (0 until 20).foreach { _ =>
      val corpus = (0 until 50).map(_ => (doc(), 1L + rnd.nextInt(5)))
      val merges = Bpe.trainLocal(corpus, 24)
      val flat = merges.flatMap { case (a, b) => Seq(a, b) }.toArray
      val model = new graft.functions.BpeModel(merges)
      corpus.foreach { case (text, _) =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
        assert(Bpe.tokenCountFast(u, model) == Bpe.tokenCount(u, flat),
          s"'$text' under $merges")
      }
    }
  }

  test("heap encoder ≡ sweep on the corpus under DefaultMerges, and on malformed surrogates") {
    val model = new graft.functions.BpeModel(Bpe.DefaultMerges)
    val flat = Bpe.DefaultMerges.flatMap { case (a, b) => Seq(a, b) }.toArray
    Tables.documents(spark, sf).select("text").as[String].collect()
      .foreach { text =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
        assert(Bpe.tokenCountFast(u, model) == Bpe.tokenCount(u, flat))
      }
    // unpaired high surrogate must stay its own symbol in both encoders
    Seq("a\uD800b c", "𐀀 ab", "x\uD800", "\uDC00er").foreach { text =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      assert(Bpe.tokenCountFast(u, model) == Bpe.tokenCount(u, flat), text)
    }
  }

  test("production vocab: 4k-merge table encodes within ~2x of the 64-merge wall") {
    // a trainer-shaped synthetic table: all 2-grams over a-z, then
    // 3-grams (xy, z) — elements exist before use, like a trained table
    val twoGrams = for (a <- 'a' to 'z'; b <- 'a' to 'z')
      yield (a.toString, b.toString)
    val threeGrams = for (a <- 'a' to 'z'; b <- 'a' to 'z'; c <- 'a' to 'f')
      yield (s"$a$b", c.toString)
    val big = (twoGrams ++ threeGrams).take(4096)
    assert(big.length == 4096)
    val bigModel = new graft.functions.BpeModel(big)
    val smallModel = new graft.functions.BpeModel(Bpe.DefaultMerges)
    val texts = Tables.documents(spark, sf).select("text").as[String].collect()
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
    def wall(model: graft.functions.BpeModel): Double = {
      var sink = 0L
      val t0 = System.nanoTime()
      (0 until 5).foreach(_ => texts.foreach(t => sink += Bpe.tokenCountFast(t, model)))
      require(sink != Long.MinValue) // keep the loop un-eliminable
      (System.nanoTime() - t0) / 1e9
    }
    wall(smallModel); wall(bigModel) // JIT warmup
    val small = wall(smallModel)
    val bigT = wall(bigModel)
    info(f"64-merge: $small%.3fs, 4096-merge: $bigT%.3fs, ratio ${bigT / small}%.2f")
    assert(bigT <= small * 2.5 + 0.05,
      f"4k-merge encode must stay within ~2x of 64-merge: $small%.3f vs $bigT%.3f")
  }

  test("subword counts are bounded by words below and characters above") {
    val r = graft.functions.Bpe.textTokensBpe(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"),
        length(col("text")).as("n_chars")), Seq("doc_id"))
      .filter(col("n_tokens_bpe") < col("n_tokens") ||
        col("n_tokens_bpe") > col("n_chars"))
      .count()
    assert(r == 0)
  }

  test("oracle separator assumption holds: corpus text is pipe-free") {
    assert(Tables.documents(spark, sf)
      .filter(col("text").contains("|")).count() == 0)
  }

  test("the counter stays inside whole-stage codegen") {
    val df = graft.functions.Bpe.textTokensBpe(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), "text_tokens_bpe fell out of codegen")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }
}
