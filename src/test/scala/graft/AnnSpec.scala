package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("dot: unit vectors give cosine in [-1,1]; self-dot is 1") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(20)
    val self = e.select(Ann.dot(col("embedding"), col("embedding")).as("d"))
      .as[Double].collect()
    assert(self.forall(d => math.abs(d - 1.0) < 1e-5)) // unit-norm input
  }

  test("bruteforce: k results per query, sorted by score desc") {
    val out = Ann.annBruteforce(spark, sf, nQueries = 4, k = 5).collect()
    assert(out.length == 4 * 5)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("lsh: same-bucket-only candidates, positive recall vs bruteforce; " +
    "multi-probe only improves it") {
    val exact = Ann.annBruteforce(spark, sf, nQueries = 8, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(probeBits: Int) = {
      val approx = Ann.annLsh(spark, sf, nQueries = 8, k = 5, bits = 4,
          probeBits = probeBits)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      assert(approx.nonEmpty)
      (exact & approx).size.toDouble / exact.size
    }
    val single = recallOf(0)
    val multi = recallOf(1)
    assert(single > 0.1, s"recall=$single") // hyperplane LSH beats chance
    assert(multi >= single, s"multi=$multi < single=$single")
  }

  test("ivf: k results per query, recall beats chance, deterministic") {
    val exact = Ann.annBruteforce(spark, sf, nQueries = 8, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf1 = Ann.annIvf(spark, sf, nQueries = 8, k = 5)
    val got = ivf1.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall > 0.2, s"recall=$recall")
    val got2 = Ann.annIvf(spark, sf, nQueries = 8, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == got2)
  }

  test("hyperplaneBucket: deterministic and within [0, 2^bits)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val b1 = e.select(Ann.hyperplaneBucket(col("embedding"), 4).as("b"))
      .as[Long].collect().toSeq
    val b2 = e.select(Ann.hyperplaneBucket(col("embedding"), 4).as("b"))
      .as[Long].collect().toSeq
    assert(b1 == b2)
    assert(b1.forall(b => b >= 0 && b < 16))
  }
}
