package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeletionVectors

/** Pure-JVM property tests of the deletion-vector kernels (no Spark
  * session): the Z85 codec and the portable 64-bit roaring bitmap are
  * the byte-level foundations every DV read/write rests on — a single
  * off-by-one here silently undeletes (or over-deletes) rows at scale.
  * Seeded generators, deterministic.
  */
class DvKernelPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(0xD7L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  test("Z85 round-trips every 4-byte-aligned payload") {
    val bytesGen = Gen.chooseNum(0, 16)
      .flatMap(n => Gen.listOfN(n * 4, Gen.chooseNum(-128, 127).map(_.toByte)))
    check("z85 roundtrip", Prop.forAll(bytesGen) { bs =>
      val arr = bs.toArray
      DeletionVectors.z85Decode(DeletionVectors.z85Encode(arr))
        .sameElements(arr)
    })
  }

  test("Z85 output length and alphabet are spec-exact (5 chars per 4 " +
    "bytes, no whitespace/quote characters — JSON-safe by construction)") {
    val alphabet =
      ("0123456789abcdefghijklmnopqrstuvwxyz" +
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toSet
    val bytesGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n * 4, Gen.chooseNum(-128, 127).map(_.toByte)))
    check("z85 shape", Prop.forAll(bytesGen) { bs =>
      val enc = DeletionVectors.z85Encode(bs.toArray)
      enc.length == bs.length / 4 * 5 && enc.forall(alphabet.contains)
    })
  }

  test("Bitmap64 membership == the source set, cardinality exact, " +
    "through a serialize/deserialize round trip (incl. >2^32 indices)") {
    val idxGen = Gen.oneOf(
      Gen.chooseNum(0L, 1024L),
      Gen.chooseNum(0L, (1L << 40) - 1), // within the plausibility guard
      Gen.chooseNum((1L << 32) - 8, (1L << 32) + 8)) // the word boundary
    val setGen = Gen.listOf(idxGen).map(_.toSet)
    check("bitmap64 roundtrip", Prop.forAll(setGen) { vals =>
      val b = DeletionVectors.Bitmap64(vals)
      val back = DeletionVectors.Bitmap64.deserialize(b.serialize())
      val probes = vals ++ vals.map(_ + 1) ++ Seq(0L, 63L, 64L)
      back.cardinality == vals.size.toLong &&
        probes.forall(v => back.contains(v) == vals.contains(v))
    })
  }

  test("Bitmap64 union == set union") {
    val setGen = Gen.listOf(Gen.chooseNum(0L, 4096L)).map(_.toSet)
    check("bitmap64 or", Prop.forAll(setGen, setGen) { (a, b) =>
      val or = DeletionVectors.Bitmap64(a).or(DeletionVectors.Bitmap64(b))
      val u = a ++ b
      or.cardinality == u.size.toLong &&
        (0L to 4097L).forall(v => or.contains(v) == u.contains(v))
    })
  }
}
