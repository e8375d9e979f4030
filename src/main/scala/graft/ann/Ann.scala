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
             iterations: Int = 2): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // The centroid model (≤nCells × dim floats) lives on the driver
    // between iterations; it enters each plan as literal arrays, so
    // assignment is a pure per-row projection — nCells dot products and an
    // argmax, no join, no window, no shuffle. Each Lloyd iteration is
    // exactly one scan + one tiny (nCells × dim rows) aggregation.
    var centroids: Seq[(Long, Array[Float])] = e
      .withColumn("__r", xxhash64(col("vec_id")))
      .orderBy("__r").limit(nCells)
      .select("embedding").collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](0).toArray) }
      .toSeq
    // (sim, cell) structs per centroid; struct max/sort = lexicographic,
    // so argmax-by-sim falls out of array_max
    def cellScores(v: Column, cs: Seq[(Long, Array[Float])]): Column =
      array(cs.map { case (cell, arr) =>
        struct(dot(v, typedLit(arr.toSeq)).as("sim"), lit(cell).as("cell"))
      }: _*)
    def assignCell(v: Column, cs: Seq[(Long, Array[Float])]): Column =
      array_max(cellScores(v, cs)).getField("cell")
    for (_ <- 0 until iterations) {
      // update: per-cell dimension-wise mean, collected back to the driver
      centroids = e
        .select(assignCell(col("embedding"), centroids).as("cell"),
          posexplode(col("embedding")).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("cell"),
          expr("transform(dm, p -> CAST(p.m AS FLOAT))").as("centroid"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    }
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

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> ((s: SparkSession, d: String) => annBruteforce(s, d)),
    "ann_lsh"        -> ((s: SparkSession, d: String) => annLsh(s, d)),
    "ann_ivf"        -> ((s: SparkSession, d: String) => annIvf(s, d)))

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceOracle)
}
