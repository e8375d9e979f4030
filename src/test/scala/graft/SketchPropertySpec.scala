package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Sketch

/** Pure-JVM property tests of the sketch primitives (no Spark session) —
  * the algebraic guarantees the distributed operators rely on. Seeded
  * generators, 200 cases per property, fully deterministic.
  */
class Md5MinhashSigSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.PortableHash

  private def unfused(text: String, n: Int, k: Int): Array[Long] = {
    // reference semantics: min over word n-shingles (whole text below n
    // tokens) of the per-shingle KM permutation values
    val toks = text.split(" ", -1)
    val shingles =
      if (toks.length < n) Seq(text)
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    val perms = shingles.map(sh =>
      PortableHash.md5Perms(UTF8String.fromString(sh), k))
    Array.tabulate(k)(i => perms.map(_(i)).min)
  }

  test("fused signature == min over per-shingle perms, all edge shapes") {
    for (text <- Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three", "one two", "single", "",
      "a  b c d", // consecutive spaces → empty tokens, split parity
      "exactly three words")) {
      val fused = PortableHash.md5MinhashSig(UTF8String.fromString(text), 3, 64)
      assert(fused.toSeq == unfused(text, 3, 64).toSeq, s"text: '$text'")
    }
  }

  test("fused simhash == per-token bit-sum reference, split parity") {
    def reference(text: String): Long = {
      val counts = new Array[Int](64)
      text.split(" ", -1).foreach { tok =>
        val b = tok.getBytes("UTF-8")
        val h = PortableHash.md5Long(b, 0, b.length)
        for (j <- 0 until 64)
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
      (0 until 64).map(j => if (counts(j) > 0) 1L << j else 0L).sum
    }
    for (text <- Seq("the quick brown fox", "a  b", "", "one",
      "repeated repeated repeated words words")) {
      assert(PortableHash.md5Simhash(UTF8String.fromString(text)) ==
        reference(text), s"text: '$text'")
    }
  }
}

class SketchPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def word(): String =
    (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

  private def doc(): String =
    (0 until (1 + rnd.nextInt(60))).map(_ => word()).mkString(" ")

  private def u(s: String) = UTF8String.fromString(s)

  private def forAllDocs(n: Int = 200)(check: String => Unit): Unit =
    (0 until n).foreach(_ => check(doc()))

  test("shingleHashes: deterministic, distinct, count = max(tokens-n+1, 1) pre-dedup") {
    forAllDocs() { s =>
      val a = Sketch.shingleHashes(u(s), 3)
      val b = Sketch.shingleHashes(u(s), 3)
      assert(a.toSeq == b.toSeq)
      assert(a.length == a.distinct.length) // deduped
      val nTok = s.split(" ", -1).length
      if (nTok >= 3) assert(a.length <= nTok - 2 && a.nonEmpty)
      else assert(a.length == 1)
    }
  }

  test("shingleHashes: appending a word only adds (old shingles survive)") {
    forAllDocs() { s =>
      val nTok = s.split(" ", -1).length
      if (nTok >= 3) {
        val base = Sketch.shingleHashes(u(s), 3).toSet
        val ext = Sketch.shingleHashes(u(s + " " + word()), 3).toSet
        assert(base.subsetOf(ext))
        assert(ext.size <= base.size + 1)
      }
    }
  }

  test("wordNgrams: reconstructs the original token sequence") {
    forAllDocs() { s =>
      val grams = Sketch.wordNgrams(u(s), 2).map(_.toString)
      val toks = s.split(" ", -1)
      if (toks.length >= 2) {
        assert(grams.length == toks.length - 1)
        grams.zipWithIndex.foreach { case (g, i) =>
          assert(g == s"${toks(i)} ${toks(i + 1)}")
        }
      } else assert(grams.isEmpty)
    }
  }

  test("winnowing guarantee: docs sharing a long substring share a fingerprint") {
    val k = 8
    val w = 4
    // any common substring of length >= k + w - 1 guarantees at least one
    // shared window minimum (Schleimer/Wilkerson/Aiken, theorem: winnowing
    // fingerprints every match of length >= w + k - 1)
    (0 until 200).foreach { _ =>
      val common = (0 until (k + w - 1 + 10))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val s1 = doc() + common + "x"
      val s2 = doc() + common + "y"
      val f1 = Sketch.winnowFingerprints(u(s1), k, w).toSet
      val f2 = Sketch.winnowFingerprints(u(s2), k, w).toSet
      assert((f1 & f2).nonEmpty, s"no shared fingerprint:\n$s1\n$s2")
    }
  }

  test("winnowing: deterministic, non-empty, count bounded by window count") {
    forAllDocs() { s =>
      val fps = Sketch.winnowFingerprints(u(s), 8, 4)
      assert(fps.nonEmpty)
      assert(fps.length <= math.max(s.length - 8 + 1 - 4 + 1, 1))
      assert(fps.toSeq == Sketch.winnowFingerprints(u(s), 8, 4).toSeq)
    }
  }
}
