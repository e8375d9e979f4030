package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 C6–C7 — similarity search over the embedding column.
  *
  * C6 is the exact baseline: broadcast the (small) query set, stream the
  * candidate side through a codegen'd dot product, per-query top-k. Cost is
  * |Q|·n — linear in the table, no shuffle of the big side, so it scales to
  * 100 TB as a single scan whenever |Q| is broadcast-able.
  *
  * C7 is the sublinear path: random-hyperplane LSH buckets both sides; only
  * same-bucket pairs are scored. Recall is tunable via bucket bits and
  * multi-probe; candidates shrink by ~2^bits.
  */
object Ann {

  /** Dot product of two float vectors — graft.functions.Vec.dot, a native
    * expression (one compiled loop per row; double accumulation for
    * cross-engine parity).
    */
  def dot(a: Column, b: Column): Column = graft.functions.Vec.dot(a, b)

  /** LSH bucket id: bit p = sign(planes(p) · v) — native expression, fixed
    * seeded planes.
    */
  def hyperplaneBucket(v: Column, bits: Int, dim: Int = 64): Column =
    graft.functions.Vec.cosineLshBucket(v, bits, dim)

  private def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    scored
      // embeddings end here — the top-k shuffle moves only (q, id, score)
      .select("query_id", "vec_id", "score")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "vec_id", "score")
      .orderBy("query_id", "rnk")
  }

  // --------------------------------------------------------------- C6
  /** Exact brute-force top-k cosine (vectors are unit-norm → dot). */
  def annBruteforce(s: SparkSession, dir: String,
                    nQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
    topkPerQuery(scored, k)
  }

  val annBruteforceOracle: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
      |           FROM embeddings WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
      |SELECT query_id, rnk, vec_id, score FROM (
      |  SELECT query_id, vec_id, score,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
      |  FROM scored) t
      |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin

  // --------------------------------------------------------------- C7
  /** LSH-bucketed ANN: score only same-bucket candidates. `probeBits` > 0
    * turns on multi-probe — each query also searches the buckets at
    * hamming distance ≤ probeBits from its own (here: all 1-bit flips),
    * the standard recall/cost knob: candidates ×(bits+1), recall way up,
    * no duplicate pairs possible because every vector lives in exactly one
    * bucket.
    */
  def annLsh(s: SparkSession, dir: String,
             nQueries: Int = 8, k: Int = 5, bits: Int = 4,
             probeBits: Int = 1): DataFrame = {
    require(bits <= 20, "mask enumeration is 2^bits — keep bits <= 20")
    val e = Tables.embeddings(s, dir)
      .withColumn("bucket", hyperplaneBucket(col("embedding"), bits))
    // all XOR masks within hamming distance probeBits of the home bucket
    val masks: Seq[Long] = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeBits)
    val probed = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket"))
      .withColumn("bucket",
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
    val scored = e.join(broadcast(probed), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
    topkPerQuery(scored, k)
  }

  /** Oracle with the seeded hyperplane constants emitted as SQL and the
    * same 1-bit-flip multi-probe masks; every vector lives in exactly one
    * home bucket, so the probe join generates the identical candidate set.
    */
  val annLshOracle: String = {
    val bucket = graft.functions.Vec.cosineLshBucketSql("embedding", 4)
    val masks = (0L until (1L << 4))
      .filter(m => java.lang.Long.bitCount(m) <= 1).mkString("[", ", ", "]")
    s"""WITH b AS (SELECT vec_id, embedding, BUCKET_EXPR AS bucket FROM embeddings),
       |probed AS (
       |  SELECT vec_id AS query_id, embedding AS qe, xor(bucket, m.mask) AS bucket
       |  FROM b, (SELECT unnest($masks) AS mask) m
       |  WHERE vec_id < 8),
       |scored AS (
       |  SELECT p.query_id, e.vec_id,
       |    list_dot_product(CAST(p.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
       |  FROM b e JOIN probed p USING (bucket) WHERE e.vec_id <> p.query_id)
       |SELECT query_id, rnk, vec_id, score FROM (
       |  SELECT query_id, vec_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
       |  FROM scored) t
       |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
      .replace("BUCKET_EXPR", bucket)
  }

  // --------------------------------------------------------------- C7b
  /** IVF (inverted-file) ANN: a coarse quantizer of `nCells` centroids
    * learned with a few Lloyd iterations, candidates fetched from the
    * `nProbe` nearest cells per query. The other classic sublinear path
    * next to hyperplane LSH — better recall/candidate ratio when the data
    * is clustered (as embedding corpora are).
    *
    * Deterministic: centroids init from a fixed hash-sample of the data;
    * every step is a DataFrame plan (broadcast the ≤nCells centroids,
    * stream the table) — at 100 TB the train sample is bounded and
    * assignment stays a single scan per iteration.
    */
  def annIvf(s: SparkSession, dir: String,
             nQueries: Int = 8, k: Int = 5,
             nCells: Int = 16, nProbe: Int = 4,
             iterations: Int = 2, maxTrain: Int = 4096): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // Lloyd trains on a bounded deterministic hash-sample: top `maxTrain`
    // by vec_id hash is a TakeOrdered (per-partition partial top-k, never a
    // full shuffle) — ONE collect job, then the whole Lloyd loop runs on
    // the driver over ≤ maxTrain × dim floats (≈1 MB). Iterating on the
    // driver instead of the cluster removes 2 Spark jobs per iteration for
    // a model that is microseconds of arithmetic; training cost stays FIXED
    // no matter how big the table is. Only assignment touches the full
    // table, and assignment is a pure projection.
    val train: Array[Array[Float]] = e
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxTrain)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(train.nonEmpty, "annIvf: embeddings table is empty")
    // dimensionality comes from the data, not a parameter
    val dim = train(0).length
    var centroids: Seq[(Long, Array[Float])] =
      train.take(nCells).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    for (_ <- 0 until iterations) {
      // driver-side Lloyd step: assign each sample to its max-dot cell
      // (vectors are unit-norm → dot = cosine), recompute cell means
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      train.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        centroids.foreach { case (c, cv) =>
          var d0 = 0.0; var j = 0
          while (j < dim) { d0 += v(j).toDouble * cv(j).toDouble; j += 1 }
          // ties break toward the higher cell id, matching the previous
          // in-plan struct-max (lexicographic on (sim, cell)) semantics
          if (d0 > bestDot || (d0 == bestDot && c > best)) {
            bestDot = d0; best = c.toInt
          }
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.map { case (c, cv) =>
        val i = c.toInt
        if (counts(i) == 0) (c, cv)   // empty cell keeps its centroid
        else (c, Array.tabulate(dim)(j => (sums(i)(j) / counts(i)).toFloat))
      }
    }
    // The trained centroid model (≤nCells × dim floats) enters the plan as
    // literal arrays, so assignment is a pure per-row projection — nCells
    // dot products and an argmax, no join, no window, no shuffle.
    // (sim, cell) structs per centroid; struct max/sort = lexicographic,
    // so argmax-by-sim falls out of array_max
    def cellScores(v: Column, cs: Seq[(Long, Array[Float])]): Column =
      array(cs.map { case (cell, arr) =>
        struct(dot(v, typedLit(arr.toSeq)).as("sim"), lit(cell).as("cell"))
      }: _*)
    def assignCell(v: Column, cs: Seq[(Long, Array[Float])]): Column =
      array_max(cellScores(v, cs)).getField("cell")
    val assigned = e.select(col("vec_id"), col("embedding"),
      assignCell(col("embedding"), centroids).as("cell"))
    // queries probe their nProbe nearest cells: per-row sort of the
    // (sim, cell) array, top slice, explode
    val probes = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(slice(reverse(array_sort(
          cellScores(col("embedding"), centroids))), 1, nProbe)
          .getField("cell")).as("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
    topkPerQuery(scored, k)
  }

  // --------------------------------------------------------------- C16
  /** Per-label embedding norm statistics — the standard sanity pass before
    * any ANN build (unnormalized vectors silently break cosine = dot, and
    * a label whose norms collapse toward 0 is a degenerate embedding run).
    * Pure scan-stage projection + one tiny aggregation; norms come from the
    * native VecDot (double accumulation, bit-identical to the oracle's
    * list_dot_product).
    */
  def embNormStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("norm", sqrt(dot(col("embedding"), col("embedding"))))
    e.groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
        min("norm").as("min_norm"),
        max("norm").as("max_norm"),
        avg("norm").as("avg_norm"))
      .orderBy("label")
  }

  val embNormStatsOracle: String =
    """SELECT label, COUNT(*) AS n_vectors,
      |  MIN(norm) AS min_norm, MAX(norm) AS max_norm, AVG(norm) AS avg_norm
      |FROM (SELECT label,
      |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                              CAST(embedding AS DOUBLE[]))) AS norm
      |      FROM embeddings) t
      |GROUP BY label ORDER BY label""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> ((s: SparkSession, d: String) => annBruteforce(s, d)),
    "ann_lsh"        -> ((s: SparkSession, d: String) => annLsh(s, d)),
    "ann_ivf"        -> ((s: SparkSession, d: String) => annIvf(s, d)),
    "emb_norm_stats" -> (embNormStats _))

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceOracle,
    "ann_lsh"        -> annLshOracle,
    "emb_norm_stats" -> embNormStatsOracle)
}
