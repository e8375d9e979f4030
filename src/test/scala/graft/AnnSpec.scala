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

  test("embQuantize: error bounded by half a grid step, constant vectors " +
    "report exactly zero, plan stays shuffle-free") {
    val out = Ann.embQuantize(spark, sf)
    val rows = out.as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, mn, mx, err) =>
      val half = (mx - mn) / 255.0 / 2.0
      assert(err <= half * (1 + 1e-12) + java.lang.Math.ulp(half),
        s"vec $id: err $err above half-step $half")
    }
    // grid endpoints reconstruct exactly: min and max of every vector
    // land on grid points 0 and 255, so no vector can have err == half
    // exactly at the extremes — err strictly below half implies the
    // round-to-nearest is centered, not truncating
    assert(rows.exists(_._4 > 0), "real vectors must show nonzero error")
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

  test("ann_recall: one row per method; recall agrees with a direct " +
    "intersection; every method's candidate budget is sublinear") {
    val rows = Ann.annRecall(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "ivf_pq", "lsh"))
    val exact = Ann.annBruteforce(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def direct(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (exact & s).size.toDouble / exact.size
    }
    val byM = rows.map(r => r.getString(0) -> r).toMap
    assert(byM("lsh").getDouble(1) == direct(Ann.annLsh(spark, sf)))
    assert(byM("ivf").getDouble(1) == direct(Ann.annIvf(spark, sf)))
    assert(byM("ivf_pq").getDouble(1) == direct(Ann.annIvfPq(spark, sf)))
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.2, s"${r.getString(0)} recall=${r.getDouble(1)}")
      // the whole point of approximate search: strictly fewer pairs scored
      // than brute force (cand_ratio < 1), and a real budget (> 0)
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 1.0,
        s"${r.getString(0)} cand_ratio=${r.getDouble(3)}")
    }
  }

  test("recall floor holds at the sf1-equivalent decade (10x-replicated corpus)") {
    // the bench's big-decade shape (tools/gen_scale.py), made adversarial:
    // 10 NEAR-replicas per vector under shifted ids (deterministic gaussian
    // jitter, renormalized — cosine ≈ 0.9 to the original). Exact copies
    // would share buckets and score recall 1.0 trivially; near-copies
    // straddle LSH hyperplanes and IVF cell boundaries, so the floors
    // asserted here are a real quality counterweight to every
    // bucket-sizing dial at replica-heavy scale.
    val src = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val stride = src.map(_._1).max + 1
    val big = for {
      r <- 0 until 10
      (id, v) <- src
    } yield {
      if (r == 0) (id, v)
      else {
        val rnd = new scala.util.Random(id * 31 + r)
        val p = v.map(x => x + 0.06f * rnd.nextGaussian().toFloat)
        val n = math.sqrt(p.map(x => x.toDouble * x).sum)
        (id + r * stride, p.map(x => (x / n).toFloat))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_sf1eq_ann").toString
    big.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rec = Ann.annRecall(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    info(s"sf1-equiv recall@k: $rec")
    // deterministic corpus + deterministic training ⇒ exact reproducible
    // values (measured: ivf 1.0, ivf_pq 1.0, lsh 0.875); floors leave
    // margin for k/probe retuning without silencing a real regression
    assert(rec("ivf") >= 0.9, s"ivf recall ${rec("ivf")} below floor at the big decade")
    assert(rec("ivf_pq") >= 0.8, s"ivf_pq recall ${rec("ivf_pq")} below floor")
    assert(rec("lsh") >= 0.7, s"lsh recall ${rec("lsh")} below floor")
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

  test("ivf-pq: ADC + re-rank recovers most of plain IVF's recall, deterministic") {
    val exact = Ann.annBruteforce(spark, sf, nQueries = 8, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Ann.annIvfPq(spark, sf, nQueries = 8, k = 5)
    val got = pq.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    val recall = (exact & got).size.toDouble / exact.size
    // compression costs some recall vs uncompressed IVF (same probes), but
    // must comfortably beat chance — and the exact re-rank means every
    // returned score is a TRUE cosine, so scores are sorted + exact
    assert(recall > 0.2, s"recall=$recall")
    pq.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
    val got2 = Ann.annIvfPq(spark, sf, nQueries = 8, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == got2)
  }

  test("pq codec: codes bounded by the codebook; decode approximates the vector") {
    import graft.functions.Pq
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // train a tiny model through the public operator path pieces: just
    // verify shape/range invariants via a direct encode/decode round trip
    val v = e.select("embedding").limit(64).collect()
      .map(_.getSeq[Float](0).toArray)
    val cents = Array(Array.fill(v(0).length)(0.0f)) // single zero centroid
    val cbs = Array.tabulate(8) { mi =>
      Array.tabulate(4)(j => Array.tabulate(8)(d => v(j)(mi * 8 + d)))
    }
    import spark.implicits._
    val df = v.toSeq.map(_.toSeq).toDF("embedding")
      .withColumn("cell", lit(0L))
      .withColumn("codes", Pq.encode(col("embedding")
        .cast("array<float>"), col("cell"), cents, cbs))
      .withColumn("dec", Pq.decode(col("codes"), col("cell"), cents, cbs))
    val rows = df.select("codes", "dec").collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 4))
      assert(r.getSeq[Float](1).length == 64)
    }
    // a vector that IS a codebook entry reconstructs exactly
    val probe = df.limit(4).select(
      Ann.dot(col("embedding").cast("array<float>"), col("dec")).as("d"),
      Ann.dot(col("embedding").cast("array<float>"),
        col("embedding").cast("array<float>")).as("s"))
      .collect()
    probe.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-5,
        "codebook-member vectors must round-trip through the codec")
    }
  }

  test("assignCellsJoin: matches the literal-expression assignment exactly; " +
    "broadcast plan, argmax collapsed before the shuffle") {
    val e = Tables.embeddings(spark, sf)
    val centroids = Ann.trainIvf(spark, sf)
    val viaLit = e.select(col("vec_id"),
        Ann.assignCell(col("embedding"), centroids).as("cell"))
      .as[(Long, Long)].collect().toMap
    val joined = Ann.assignCellsJoin(e, centroids)
    val viaJoin = joined.as[(Long, Long)].collect().toMap
    assert(viaJoin == viaLit,
      "the large-model join path must assign identically to the literal path")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "centroid table must broadcast — shuffling the corpus against it is " +
        "the 100 TB failure mode")
    assert(!plan.contains("SortMergeJoin"))
    // no shuffle may carry the n×cells candidate stream. Two shapes
    // satisfy that: (a) the r20 keyed fan-out (hashpartitioning on
    // vec_id) sits BELOW the broadcast join and already satisfies the
    // argmax groupBy's clustering, so the join output collapses with no
    // further exchange at all; (b) at production layouts the fan-out is
    // the identity and the groupBy plans its own exchange ABOVE the join
    // — then the argmax must partially aggregate below it (struct max is
    // not hash-aggregable — it plans as SortAggregate, whose partial_max
    // marker is what we pin), so the shuffle carries n collapsed rows.
    val bnlj = plan.indexOf("BroadcastNestedLoopJoin")
    val exAbove = plan.lastIndexOf("Exchange hashpartitioning", bnlj)
    if (exAbove >= 0) {
      val partialIdx = plan.indexOf("partial_max", exAbove)
      assert(partialIdx >= 0 && partialIdx < bnlj,
        "an exchange above the cells join must sit above a map-side " +
          "partial argmax — otherwise it shuffles n×cells candidates")
    }
  }

  test("withCells: the >64-cell join path agrees with the literal " +
    "expression row for row (the decade path is not oracle-covered)") {
    val e = Tables.embeddings(spark, sf)
    // a model big enough to force the broadcast-join branch
    val big = Ann.trainIvf(spark, sf, nCells = 128)
    assert(big.size > Ann.LiteralAssignMaxCells)
    val viaJoin = Ann.withCells(e, big)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val viaLit = e.select(col("vec_id"),
        Ann.assignCell(col("embedding"), big).as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(viaJoin == viaLit)
    // embeddings survive the re-attach intact
    val n = Ann.withCells(e, big)
      .filter(size(col("embedding")) === 64).count()
    assert(n == e.count())
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
