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

  // Shared defaults — the query functions AND the oracle generators read
  // these same values, so a tuning change can never silently desynchronize
  // an oracle from its query.
  private[ann] val NQueries = 8
  private[ann] val TopK = 5
  private[ann] val LshBits = 4
  private[ann] val LshProbeBits = 1
  private[ann] val IvfCells = 16
  private[ann] val MaxIvfCells = 256
  private[ann] val TargetCellSize = 128
  private[ann] val IvfProbe = 4
  private[ann] val LloydIters = 2
  private[ann] val MaxTrain = 4096
  private[ann] val PqM = 8
  private[ann] val PqCodebook = 16
  private[ann] val RerankFactor = 4

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
                    nQueries: Int = NQueries, k: Int = TopK): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
    topkPerQuery(scored, k)
  }

  /** The shared final-ranking SQL: per-query top-k of `scored`(query_id,
    * vec_id, score), identical to [[topkPerQuery]].
    */
  private def topkSql(k: Int): String =
    s"""SELECT query_id, rnk, vec_id, score FROM (
       |  SELECT query_id, vec_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rnk
       |  FROM scored) t
       |WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  val annBruteforceOracle: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |           FROM embeddings WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id,
       |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id)
       |${topkSql(TopK)}""".stripMargin

  // --------------------------------------------------------------- C7
  /** LSH-bucketed ANN: score only same-bucket candidates. `probeBits` > 0
    * turns on multi-probe — each query also searches the buckets at
    * hamming distance ≤ probeBits from its own (here: all 1-bit flips),
    * the standard recall/cost knob: candidates ×(bits+1), recall way up,
    * no duplicate pairs possible because every vector lives in exactly one
    * bucket.
    */
  def annLsh(s: SparkSession, dir: String,
             nQueries: Int = NQueries, k: Int = TopK, bits: Int = LshBits,
             probeBits: Int = LshProbeBits): DataFrame =
    topkPerQuery(lshScored(s, dir, nQueries, bits, probeBits), k)

  /** The LSH candidate set, scored: every (query, probed-bucket candidate)
    * pair with its exact dot — shared by [[annLsh]] (top-k slice) and
    * [[annRecall]] (candidate-budget counting).
    */
  private def lshScored(s: SparkSession, dir: String, nQueries: Int,
                        bits: Int, probeBits: Int): DataFrame = {
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
    e.join(broadcast(probed), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
  }

  /** Oracle with the seeded hyperplane constants emitted as SQL and the
    * same multi-probe masks. Generated from the SAME named constants the
    * query's defaults read (nQueries/k/bits/probeBits), so retuning either
    * side cannot desynchronize them; every vector lives in exactly one
    * home bucket, so the probe join generates the identical candidate set.
    */
  def annLshOracle(nQueries: Int = NQueries, k: Int = TopK,
                   bits: Int = LshBits, probeBits: Int = LshProbeBits): String =
    lshWithBlock(nQueries, bits, probeBits) + "\n" + topkSql(k)

  /** The LSH oracle's WITH-chain ending at `scored` — shared by the top-k
    * oracle and the recall oracle's candidate count.
    */
  private def lshWithBlock(nQueries: Int, bits: Int, probeBits: Int): String = {
    val bucket = graft.functions.Vec.cosineLshBucketSql("embedding", bits)
    val masks = (0L until (1L << bits))
      .filter(m => java.lang.Long.bitCount(m) <= probeBits)
      .mkString("[", ", ", "]")
    s"""WITH b AS (SELECT vec_id, embedding, BUCKET_EXPR AS bucket FROM embeddings),
       |probed AS (
       |  SELECT vec_id AS query_id, embedding AS qe, xor(bucket, m.mask) AS bucket
       |  FROM b, (SELECT unnest($masks) AS mask) m
       |  WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT p.query_id, e.vec_id,
       |    list_dot_product(CAST(p.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
       |  FROM b e JOIN probed p USING (bucket) WHERE e.vec_id <> p.query_id)""".stripMargin
      .replace("BUCKET_EXPR", bucket)
  }

  // ----------------------------------------------- driver-side training
  /** Bounded deterministic hash-sample of the embedding table: top
    * `maxTrain` by vec_id hash is a TakeOrdered (per-partition partial
    * top-k, never a full shuffle) — ONE collect job; training cost is
    * FIXED no matter how big the table is.
    */
  private def sampleTrain(e: DataFrame, maxTrain: Int,
                          who: String): Array[Array[Float]] = {
    val train: Array[Array[Float]] = e
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxTrain)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    require(train.nonEmpty, s"$who: embeddings table is empty")
    train
  }

  /** Index of the max-dot centroid; ties break toward the higher cell id,
    * matching the in-plan struct-max (lexicographic (sim, cell)) of
    * `assignCell`.
    */
  private def nearestByDot(v: Array[Float],
                           cs: Seq[(Long, Array[Float])]): Int = {
    val dim = v.length
    var best = 0; var bestDot = Double.MinValue
    cs.foreach { case (c, cv) =>
      var d0 = 0.0; var j = 0
      while (j < dim) { d0 += v(j).toDouble * cv(j).toDouble; j += 1 }
      if (d0 > bestDot || (d0 == bestDot && c > best)) {
        bestDot = d0; best = c.toInt
      }
    }
    best
  }

  /** Driver-side Lloyd over a bounded sample, max-dot assignment (vectors
    * are unit-norm → dot = cosine); empty cells keep their centroid.
    * Microseconds of arithmetic — iterating on the driver removes 2 Spark
    * jobs per iteration.
    */
  private def lloydDot(train: Array[Array[Float]], nCells: Int,
                       iterations: Int): Seq[(Long, Array[Float])] = {
    val dim = train(0).length
    var centroids: Seq[(Long, Array[Float])] =
      train.take(nCells).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    for (_ <- 0 until iterations) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      train.foreach { v =>
        val best = nearestByDot(v, centroids)
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      centroids = centroids.map { case (c, cv) =>
        val i = c.toInt
        if (counts(i) == 0) (c, cv)
        else (c, Array.tabulate(dim)(j => (sums(i)(j) / counts(i)).toFloat))
      }
    }
    centroids
  }

  /** Driver-side Lloyd with L2 assignment (ties → lower code) — the
    * subspace-codebook trainer for PQ, where residuals are not unit-norm
    * and dot ordering would be wrong.
    */
  private def lloydL2(train: Array[Array[Float]], k: Int,
                      iterations: Int): Array[Array[Float]] = {
    val dim = train(0).length
    var centers: Array[Array[Float]] = train.take(k).map(_.clone())
    def nearest(v: Array[Float]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < centers.length) {
        var d2 = 0.0; var d = 0
        while (d < dim) {
          val r = v(d).toDouble - centers(j)(d); d2 += r * r; d += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      best
    }
    for (_ <- 0 until iterations) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      train.foreach { v =>
        val b = nearest(v)
        counts(b) += 1
        var d = 0
        while (d < dim) { sums(b)(d) += v(d); d += 1 }
      }
      centers = centers.zipWithIndex.map { case (cv, i) =>
        if (counts(i) == 0) cv
        else Array.tabulate(dim)(d => (sums(i)(d) / counts(i)).toFloat)
      }
    }
    centers
  }

  /** The trained centroid model (≤nCells × dim floats) enters the plan as
    * literal arrays, so assignment is a pure per-row projection — nCells
    * dot products and an argmax, no join, no window, no shuffle. The
    * (sim, cell) structs sort/max lexicographically, so argmax-by-sim
    * falls out of array_max.
    */
  private def cellScores(v: Column, cs: Seq[(Long, Array[Float])]): Column =
    array(cs.map { case (cell, arr) =>
      struct(dot(v, typedLit(arr.toSeq)).as("sim"), lit(cell).as("cell"))
    }: _*)
  private[graft] def assignCell(v: Column, cs: Seq[(Long, Array[Float])]): Column =
    array_max(cellScores(v, cs)).getField("cell")

  /** Cell assignment as a broadcast join instead of a literal expression —
    * the path for cell counts past [[MaxIvfCells]], where a √N-sized model
    * (tens of thousands of centroids at 10⁹ vectors) would bloat the
    * expression tree and the generated code. The centroid table broadcasts
    * (cells × dim floats — MBs at √N scale), each row meets all centroids
    * via BroadcastNestedLoopJoin in its own scan partition, and the argmax
    * collapses MAP-SIDE: the partial max(struct(sim, cell)) aggregate sees
    * every candidate for a vec_id inside one partition, so the one shuffle
    * carries exactly n pre-collapsed (vec_id, best) rows — embeddings
    * never ride it. Tie-break (sim, cell) lexicographic = [[assignCell]]'s
    * struct-max, so both paths assign identically on any model where both
    * are feasible (AnnSpec pins this).
    *
    * Returns (vec_id, cell) — re-attach embeddings by vec_id where the
    * consumer needs them (the exact-group join shape dedupEmbeddingClusters
    * already uses).
    */
  def assignCellsJoin(emb: DataFrame,
                      centroids: Seq[(Long, Array[Float])]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val cent = broadcast(centroids.toDF("cell", "cv"))
    emb.select(col("vec_id"), col("embedding")).crossJoin(cent)
      .select(col("vec_id"),
        struct(dot(col("embedding"), col("cv")).as("sim"),
          col("cell").as("cell")).as("sc"))
      .groupBy("vec_id")
      .agg(max("sc").as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))
  }

  /** Largest model the literal-expression assignment path should carry:
    * past this, the generated CreateArray-of-256-structs code blows
    * through JVM/codegen method limits and Spark silently falls back to
    * INTERPRETED evaluation of every dot — measured at the 20k-vector
    * decade (256 cells): the pair join's sides each paid ~8 s of
    * interpreted argmax vs ~0.3 s codegen'd. 64 cells ≈ 2.5k generated
    * lines, safely inside codegen.
    */
  private[graft] val LiteralAssignMaxCells = 64

  /** (vec_id, embedding, cell) by whichever assignment path fits the
    * model: the zero-shuffle literal expression for small models, the
    * [[assignCellsJoin]] broadcast-argmax above [[LiteralAssignMaxCells]]
    * followed by ONE n-row equi-join to re-attach embeddings. The n×cells
    * candidate stream stays 16 bytes/row (embeddings must NOT ride the
    * crossJoin — measured: attaching them to the argmax struct multiplied
    * vector traffic by the cell count and cost more than the interpreted
    * path it replaced); the re-attach join shuffles n (vec_id, embedding)
    * rows once, the same weight any downstream pairing moves.
    */
  private[graft] def withCells(emb: DataFrame,
                               centroids: Seq[(Long, Array[Float])]): DataFrame =
    if (centroids.size <= LiteralAssignMaxCells)
      emb.select(col("vec_id"), col("embedding"),
        assignCell(col("embedding"), centroids).as("cell"))
    else
      emb.select(col("vec_id"), col("embedding"))
        .join(assignCellsJoin(emb, centroids), "vec_id")

  /** The IVF query skeleton shared by [[annIvf]] and [[annIvfPq]]:
    * cell-assigned table plus each query's `nProbe` nearest cells (per-row
    * sort of the (sim, cell) array, top slice, explode).
    */
  private def assignAndProbe(e: DataFrame,
                             centroids: Seq[(Long, Array[Float])],
                             nQueries: Int, nProbe: Int)
      : (DataFrame, DataFrame) = {
    val assigned = e.select(col("vec_id"), col("embedding"),
      assignCell(col("embedding"), centroids).as("cell"))
    val probes = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(slice(reverse(array_sort(
          cellScores(col("embedding"), centroids))), 1, nProbe)
          .getField("cell")).as("cell"))
    (assigned, probes)
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
  /** Deterministic IVF coarse-quantizer training — ONE bounded collect;
    * shared by the query and its literal-model oracle generator so both
    * always see the identical centroids.
    */
  private[graft] def trainIvf(s: SparkSession, dir: String,
                            nCells: Int = IvfCells,
                            iterations: Int = LloydIters,
                            maxTrain: Int = MaxTrain): Seq[(Long, Array[Float])] = {
    val train = sampleTrain(Tables.embeddings(s, dir), maxTrain, "annIvf")
    lloydDot(train, nCells, iterations)
  }

  /** Count-sized cell budget for whole-corpus cell partitioning (SemDeDup):
    * smallest power-of-two c in [IvfCells, MaxIvfCells] with
    * n ≤ TargetCellSize·c, so expected cell occupancy stays ~TargetCellSize
    * and in-cell all-pairs work is ~TargetCellSize²/2 per cell — total
    * candidate volume grows ~n·TargetCellSize instead of n²/const. Same
    * integer-arithmetic clamp shape as graft.dedup.Dedup.lshBitsFor; the
    * min clamp preserves the historical 16-cell behavior at test SFs.
    * The max clamp bounds the literal-centroid model that rides the plan
    * (and the generated oracle SQL); past it, the hot-cell prune in the
    * semantic-dedup kernel is the documented back-stop.
    */
  private[graft] def cellsFor(n: Long, targetCell: Int = TargetCellSize,
                              minCells: Int = IvfCells,
                              maxCells: Int = MaxIvfCells): Int = {
    var c = minCells
    while (c < maxCells && n > targetCell.toLong * c) c *= 2
    c
  }

  /** [[trainIvf]] with nCells sized from a cheap count of the table —
    * the SemDeDup √N-style regime with integer clamps. ONE extra count
    * job (parquet metadata-only at scan level); shared by the
    * dedup_semantic queries and their literal-model oracle generators, so
    * both always train the identically-sized model.
    */
  private[graft] def trainIvfSized(s: SparkSession, dir: String,
                                   iterations: Int = LloydIters,
                                   maxTrain: Int = MaxTrain): Seq[(Long, Array[Float])] = {
    val n = Tables.embeddings(s, dir).count()
    trainIvf(s, dir, cellsFor(n), iterations, maxTrain)
  }

  def annIvf(s: SparkSession, dir: String,
             nQueries: Int = NQueries, k: Int = TopK,
             nCells: Int = IvfCells, nProbe: Int = IvfProbe,
             iterations: Int = LloydIters, maxTrain: Int = MaxTrain): DataFrame = {
    val e = Tables.embeddings(s, dir)
    // Only training (one bounded collect) runs on the driver; assignment
    // over the full table is a pure projection — see the helpers above.
    val centroids = trainIvf(s, dir, nCells, iterations, maxTrain)
    topkPerQuery(ivfScored(e, centroids, nQueries, nProbe), k)
  }

  /** The IVF candidate set, scored: every (query, probed-cell candidate)
    * pair with its exact dot — shared by [[annIvf]] and [[annRecall]].
    */
  private def ivfScored(e: DataFrame, centroids: Seq[(Long, Array[Float])],
                        nQueries: Int, nProbe: Int): DataFrame = {
    val (assigned, probes) = assignAndProbe(e, centroids, nQueries, nProbe)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
  }

  // --------------------------------------------------------------- C7c
  /** IVF-PQ: the coarse quantizer of [[annIvf]] plus product-quantized
    * residuals — each vector stored as `m` small codebook ids (8 ints
    * here) instead of `dim` floats, the representation that makes
    * billion-vector ANN fit a cluster's memory. Search is two-stage:
    * ADC scoring `dot(q, decode(codes))` over the probed cells' COMPRESSED
    * rows (the full float table is never shuffled), then an exact re-rank
    * of the top `rerankFactor × k` candidates that fetches only those few
    * vectors by key.
    *
    * Deterministic end-to-end: coarse centroids and subspace codebooks
    * train driver-side on the same bounded hash-sample as [[annIvf]];
    * encode/decode are native expressions carrying the model (see
    * graft.functions.Pq).
    */
  /** The trained PQ model: coarse centroids + per-subspace codebooks. */
  private[ann] case class PqModel(centroids: Seq[(Long, Array[Float])],
                                  centArr: Array[Array[Float]],
                                  codebooks: Array[Array[Array[Float]]])

  /** Deterministic PQ training (coarse Lloyd + per-subspace residual
    * Lloyd) — shared by the query and its literal-model oracle generator.
    */
  private[ann] def trainPq(s: SparkSession, dir: String,
                           nCells: Int = IvfCells, iterations: Int = LloydIters,
                           maxTrain: Int = MaxTrain, m: Int = PqM,
                           codebookSize: Int = PqCodebook): PqModel = {
    val train = sampleTrain(Tables.embeddings(s, dir), maxTrain, "annIvfPq")
    val dim = train(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val centroids = lloydDot(train, nCells, iterations)
    val centArr: Array[Array[Float]] =
      centroids.sortBy(_._1).map(_._2).toArray
    // residuals of the training sample against their coarse cell, then
    // one L2 Lloyd per subspace — all driver-side, all bounded
    val residuals = train.map { v =>
      val cent = centArr(nearestByDot(v, centroids))
      Array.tabulate(dim)(d => v(d) - cent(d))
    }
    val codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { mi =>
      val subs = residuals.map(r =>
        java.util.Arrays.copyOfRange(r, mi * subDim, (mi + 1) * subDim))
      lloydL2(subs, codebookSize, iterations)
    }
    PqModel(centroids, centArr, codebooks)
  }

  def annIvfPq(s: SparkSession, dir: String,
               nQueries: Int = NQueries, k: Int = TopK,
               nCells: Int = IvfCells, nProbe: Int = IvfProbe,
               iterations: Int = LloydIters, maxTrain: Int = MaxTrain,
               m: Int = PqM, codebookSize: Int = PqCodebook,
               rerankFactor: Int = RerankFactor): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val model = trainPq(s, dir, nCells, iterations, maxTrain, m, codebookSize)
    pqTopk(e, model, nQueries, k, nProbe, rerankFactor)
  }

  /** Stage 1 of the PQ search: ADC scores over the COMPRESSED rows of the
    * probed cells — the candidate set whose size is the method's scan
    * budget. Shared by [[pqTopk]] and [[annRecall]].
    */
  private def pqAdc(e: DataFrame, model: PqModel,
                    nQueries: Int, nProbe: Int): DataFrame = {
    // the compressed index: (vec_id, cell, m codes) — floats dropped
    val (assigned, probes) = assignAndProbe(e, model.centroids, nQueries, nProbe)
    val index = assigned.select(col("vec_id"), col("cell"),
      graft.functions.Pq.encode(col("embedding"), col("cell"),
        model.centArr, model.codebooks).as("codes"))
    index.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", dot(col("qe"),
        graft.functions.Pq.decode(col("codes"), col("cell"),
          model.centArr, model.codebooks)))
      .select("query_id", "vec_id", "adc")
  }

  private def pqTopk(e: DataFrame, model: PqModel, nQueries: Int, k: Int,
                     nProbe: Int, rerankFactor: Int): DataFrame =
    pqTopkFromAdc(e, pqAdc(e, model, nQueries, nProbe), nQueries, k, rerankFactor)

  /** Stage 2 from a precomputed ADC candidate set — split out so
    * [[annRecall]] can score the SAME materialized ADC pass it counts.
    */
  private def pqTopkFromAdc(e: DataFrame, adc: DataFrame, nQueries: Int,
                            k: Int, rerankFactor: Int): DataFrame = {
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("vec_id"))
    val candidates = adc
      .withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= k * rerankFactor)
      .select("query_id", "vec_id")
    // stage 2: exact re-rank — the candidate list (nQueries × k ×
    // rerankFactor rows) broadcasts; the float table is probed in place,
    // never shuffled (without the hint, the window upstream hides the
    // candidate cardinality and static planning would sort-merge the
    // whole table)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = e.select(col("vec_id"), col("embedding"))
      .join(broadcast(candidates), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("score", dot(col("qe"), col("embedding")))
    topkPerQuery(scored, k)
  }

  // --------------------------------------------------------------- C7d
  /** Measured recall of every approximate method against the exact
    * baseline, as a driver-checkable query: for each of lsh / ivf /
    * ivf_pq, recall@k (fraction of the brute-force top-k recovered) and
    * the candidate budget it spent — pairs actually scored, absolute and
    * as a fraction of brute-force's |Q|·(n−1). THE quality-vs-cost dial
    * of the ANN family, tracked round over round instead of asserted once
    * in a spec. One trained model serves both ivf and ivf_pq (the PQ
    * model's coarse centroids ARE the IVF model — same sample, same
    * Lloyd), exactly as the oracle generator shares it.
    */
  def annRecall(s: SparkSession, dir: String,
                nQueries: Int = NQueries, k: Int = TopK): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val model = trainPq(s, dir)
    // The brute-force top-k and each method's scored candidate set feed
    // TWO downstream aggregates apiece (intersection join + count); a
    // localCheckpoint materializes each subtree exactly once instead of
    // trusting exchange reuse to deduplicate the heaviest scans, and the
    // blocks are ContextCleaner-reclaimed (nothing pinned on the caller).
    // Scored sets are projected to (query_id, vec_id, score) first so the
    // checkpoint never stores embedding columns.
    // hits = |approx top-k ∩ exact top-k| (both sides unique per pair, so
    // the inner-join count IS the intersection size); candidates = scored
    // pair count. Both are 1-row aggregates — broadcast hints keep the
    // stitching joins as BNLJ, never a cartesian.
    // The four scored subtrees are INDEPENDENT once the model exists, but
    // as lazy checkpoints they materialized strictly one after another —
    // the r20 job probe showed their 0.6–1.3 s jobs running back to back
    // with the cluster draining between them. Guide §2.6: submit
    // independent jobs from a small thread pool so each job's tail
    // back-fills the next one's tasks; eager checkpoints from four driver
    // threads overlap exactly those four materializations (results are
    // unchanged — each leg's plan is identical, only the submission
    // schedule moves). Job descriptions are thread-local, so the UI
    // labels stay per-leg.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val (bf, lshS, ivfS, adcS) =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        def leg(label: String)(mk: => DataFrame) =
          scala.concurrent.Future {
            s.sparkContext.setJobDescription(s"ann_recall: $label")
            mk.localCheckpoint(true)
          }
        val bfF = leg("brute-force top-k") {
          annBruteforce(s, dir, nQueries, k).select("query_id", "vec_id") }
        val lshF = leg("lsh scored") {
          lshScored(s, dir, nQueries, LshBits, LshProbeBits)
            .select("query_id", "vec_id", "score") }
        val ivfF = leg("ivf scored") {
          ivfScored(e, model.centroids, nQueries, IvfProbe)
            .select("query_id", "vec_id", "score") }
        val adcF = leg("pq adc") { pqAdc(e, model, nQueries, IvfProbe) }
        val all = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(Seq(bfF, lshF, ivfF, adcF)),
          scala.concurrent.duration.Duration.Inf)
        (all(0), all(1), all(2), all(3))
      } finally pool.shutdown()
    def one(name: String, topk: DataFrame, scoredCands: DataFrame): DataFrame =
      topk.select("query_id", "vec_id").join(bf, Seq("query_id", "vec_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(
          scoredCands.agg(count(lit(1)).as("candidates"))))
        .select(lit(name).as("method"), col("hits"), col("candidates"))
    val rows =
      one("ivf", topkPerQuery(ivfS, k), ivfS)
        .unionByName(one("ivf_pq",
          pqTopkFromAdc(e, adcS, nQueries, k, RerankFactor), adcS))
        .unionByName(one("lsh", topkPerQuery(lshS, k), lshS))
    val bfCand = e.agg((lit(nQueries.toLong) * (count(lit(1)) - 1))
      .as("bf_candidates"))
    // recall denominator = the ACTUAL brute-force top-k count, not the
    // nominal |Q|·k: on a table with fewer than k+1 vectors the nominal
    // denominator understates recall (and diverges from AnnSpec's direct
    // intersection check). Equal on any real corpus; still an
    // exact-integer division, so the compare stays bit-stable.
    val bfN = bf.agg(count(lit(1)).as("bf_n"))
    rows.crossJoin(broadcast(bfCand)).crossJoin(broadcast(bfN))
      .select(col("method"),
        (col("hits").cast("double") / col("bf_n").cast("double"))
          .as("recall_at_k"),
        col("candidates"),
        (col("candidates").cast("double") / col("bf_candidates").cast("double"))
          .as("cand_ratio"))
      .orderBy("method")
  }

  // ---------------------------------------- literal-model oracle generation
  private def dlist(a: Array[Float]): String =
    a.map(_.toDouble.toString).mkString("[", ", ", "]")

  /** CTEs shared by the IVF and IVF-PQ oracles: the trained centroids as
    * literal DOUBLE[] rows (Double.toString round-trips, float→double is
    * exact), per-(vec, cell) sims, argmax cell assignment (ties → higher
    * cell, like assignCell's struct-max), and each query's nProbe best
    * cells. Training is deterministic, so emitting the model as SQL
    * literals makes the whole query DuckDB-checkable — the same trick
    * cosineLshBucketSql uses for its hyperplanes.
    */
  /** The cent → sc → assigned CTE prefix alone (no probes) — shared with
    * the semantic-dedup oracle (graft.dedup.Dedup.semanticDedup), whose
    * pair join needs cell assignment but no query probing.
    */
  private[graft] def assignedSqlCte(centroids: Seq[(Long, Array[Float])]): String = {
    val rows = centroids.sortBy(_._1)
      .map { case (c, v) => s"($c, CAST(${dlist(v)} AS DOUBLE[]))" }
      .mkString(",\n    ")
    s"""cent AS (SELECT * FROM (VALUES
       |    $rows) t(cell, cv)),
       |sc AS (
       |  SELECT e.vec_id, e.embedding, c.cell,
       |    list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cv) AS sim
       |  FROM embeddings e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT vec_id, embedding, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
       |    FROM sc) t WHERE rn = 1)""".stripMargin
  }

  private def ivfSqlCtes(centroids: Seq[(Long, Array[Float])],
                         nQueries: Int, nProbe: Int): String = {
    s"""${assignedSqlCte(centroids)},
       |probes AS (
       |  SELECT vec_id AS query_id, embedding AS qe, cell FROM (
       |    SELECT vec_id, embedding, cell,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell DESC) AS rn
       |    FROM sc WHERE vec_id < $nQueries) t WHERE rn <= $nProbe)""".stripMargin
  }

  /** DuckDB oracle for [[annIvf]] with the trained centroids inlined. */
  def annIvfOracleSql(s: SparkSession, dir: String): String =
    ivfOracleFromCentroids(trainIvf(s, dir))

  private def ivfOracleFromCentroids(centroids: Seq[(Long, Array[Float])]): String =
    ivfScoredCtes(centroids) + "\n" + topkSql(TopK)

  /** The IVF oracle's WITH-chain ending at `scored` — shared by the top-k
    * oracle and the recall oracle's candidate count.
    */
  private def ivfScoredCtes(centroids: Seq[(Long, Array[Float])]): String =
    s"""WITH ${ivfSqlCtes(centroids, NQueries, IvfProbe)},
       |scored AS (
       |  SELECT p.query_id, a.vec_id,
       |    list_dot_product(CAST(p.qe AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) AS score
       |  FROM assigned a JOIN probes p USING (cell) WHERE a.vec_id <> p.query_id)""".stripMargin

  /** DuckDB oracle for [[annIvfPq]]: centroids AND codebooks inlined;
    * encode = per-subspace argmin of the double-exact residual distance
    * (list_dot_product(diff, diff) accumulates like PqEncode's loop),
    * decode rounds each reconstructed value through FLOAT exactly as
    * PqDecode's float storage does, then ADC → top-k·rerank → exact
    * re-rank, mirroring the DataFrame plan stage for stage.
    */
  def annIvfPqOracleSql(s: SparkSession, dir: String): String =
    pqOracleFromModel(trainPq(s, dir))

  private def pqOracleFromModel(model: PqModel): String =
    s"""${pqAdcCtes(model)},
       |cands AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rn
       |    FROM adcs) t WHERE rn <= ${TopK * RerankFactor}),
       |scored AS (
       |  SELECT cd.query_id, cd.vec_id,
       |    list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS score
       |  FROM cands cd
       |  JOIN embeddings e ON e.vec_id = cd.vec_id
       |  JOIN (SELECT vec_id AS query_id, embedding AS qe
       |        FROM embeddings WHERE vec_id < $NQueries) q
       |    ON q.query_id = cd.query_id)
       |${topkSql(TopK)}""".stripMargin

  /** The PQ oracle's WITH-chain ending at `adcs` (the ADC candidate set —
    * the method's scan budget) — shared by the top-k oracle and the recall
    * oracle's candidate count.
    */
  private def pqAdcCtes(model: PqModel): String = {
    val subDim = model.centArr(0).length / PqM
    val cbRows = (for {
      mi <- 0 until PqM
      code <- 0 until PqCodebook
    } yield s"($mi, $code, CAST(${dlist(model.codebooks(mi)(code))} AS DOUBLE[]))")
      .mkString(",\n    ")
    val diff =
      s"[CAST(a.embedding[c.mi * $subDim + i] AS DOUBLE) - ct.cv[c.mi * $subDim + i] - c.cbv[i] for i in range(1, ${subDim + 1})]"
    s"""WITH ${ivfSqlCtes(model.centroids, NQueries, IvfProbe)},
       |cb AS (SELECT * FROM (VALUES
       |    $cbRows) t(mi, code, cbv)),
       |encd AS (
       |  SELECT vec_id, cell, mi, code FROM (
       |    SELECT a.vec_id, a.cell, c.mi, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id, c.mi
       |        ORDER BY list_dot_product($diff, $diff), c.code) AS rn
       |    FROM assigned a JOIN cent ct USING (cell) CROSS JOIN cb c) t
       |  WHERE rn = 1),
       |dec AS (
       |  SELECT e.vec_id, e.cell, e.mi,
       |    [CAST(CAST(ct.cv[e.mi * $subDim + i] + c.cbv[i] AS FLOAT) AS DOUBLE) for i in range(1, ${subDim + 1})] AS seg
       |  FROM encd e JOIN cent ct USING (cell)
       |  JOIN cb c ON c.mi = e.mi AND c.code = e.code),
       |decoded AS (
       |  SELECT vec_id, cell, flatten(list(seg ORDER BY mi)) AS dv
       |  FROM dec GROUP BY vec_id, cell),
       |adcs AS (
       |  SELECT p.query_id, d.vec_id,
       |    list_dot_product(CAST(p.qe AS DOUBLE[]), d.dv) AS adc
       |  FROM decoded d JOIN probes p USING (cell)
       |  WHERE d.vec_id <> p.query_id)""".stripMargin
  }

  /** The recall oracle: each approximate method's full top-k oracle is
    * nested as a derived table (its own WITH scope — no CTE-name
    * collisions), intersected with the brute-force top-k, and paired with
    * the candidate count of its scored CTE. Mirrors [[annRecall]] stage
    * for stage; every double it emits is a division of exact integers, so
    * the compare is bit-stable.
    */
  private def recallOracleFromModel(model: PqModel): String = {
    def cnt(withChain: String, cte: String): String =
      withChain + s"\nSELECT COUNT(*) AS c FROM $cte"
    def hits(topkSql: String): String =
      s"(SELECT COUNT(*) FROM (\n$topkSql\n) t JOIN bf USING (query_id, vec_id))"
    def cand(candSql: String): String =
      s"(SELECT c FROM (\n$candSql\n) t)"
    s"""WITH bf AS (SELECT query_id, vec_id FROM (
       |$annBruteforceOracle
       |) t),
       |nb AS (SELECT CAST($NQueries AS BIGINT) * (COUNT(*) - 1) AS c FROM embeddings),
       |r AS (
       |  SELECT 'ivf' AS method,
       |    ${hits(ivfOracleFromCentroids(model.centroids))} AS hits,
       |    ${cand(cnt(ivfScoredCtes(model.centroids), "scored"))} AS candidates
       |  UNION ALL
       |  SELECT 'ivf_pq',
       |    ${hits(pqOracleFromModel(model))},
       |    ${cand(cnt(pqAdcCtes(model), "adcs"))}
       |  UNION ALL
       |  SELECT 'lsh',
       |    ${hits(annLshOracle())},
       |    ${cand(cnt(lshWithBlock(NQueries, LshBits, LshProbeBits), "scored"))})
       |SELECT method,
       |  CAST(hits AS DOUBLE) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM bf) AS recall_at_k,
       |  CAST(candidates AS BIGINT) AS candidates,
       |  CAST(candidates AS DOUBLE) / (SELECT CAST(c AS DOUBLE) FROM nb) AS cand_ratio
       |FROM r ORDER BY method""".stripMargin
  }

  /** Data-dependent oracles (trained-model literals), generated at Verify
    * dump time with the same (session, sfDir) the queries run against.
    * `wanted` gates per entry so a subset dump trains nothing it doesn't
    * need; all three oracles share ONE training run — the PQ model's
    * coarse centroids ARE the IVF model (same sample, same Lloyd).
    */
  def dynamicOracles(s: SparkSession, dir: String,
                     wanted: String => Boolean = _ => true): Map[String, String] = {
    val names = Seq("ann_ivf", "ann_ivf_pq", "ann_recall").filter(wanted)
    if (names.isEmpty) Map.empty
    else {
      lazy val model = trainPq(s, dir)
      names.map {
        case n @ "ann_ivf"    => n -> ivfOracleFromCentroids(model.centroids)
        case n @ "ann_ivf_pq" => n -> pqOracleFromModel(model)
        case n @ "ann_recall" => n -> recallOracleFromModel(model)
      }.toMap
    }
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

  /** C46: int8 scalar-quantization audit — the storage-compression step a
    * 100 TB embedding store runs before ANN serving (4× smaller than
    * float32), with the error accounting that decides whether recall
    * survives it. Per vector: the affine [min,max]/255 grid, round to
    * nearest (spelled `floor(x + 0.5)` so both engines round identically
    * — SQL ROUND ties-away vs banker's would diverge), and the MAX
    * absolute reconstruction error. Max — not sum — keeps the metric
    * associativity-order-free, so the oracle is exact under IEEE doubles
    * with no tolerance. Pure per-row array arithmetic: zero shuffle,
    * composes in the scan stage.
    */
  def embQuantize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .withColumn("q_min", array_min(col("embedding")).cast("double"))
      .withColumn("q_max", array_max(col("embedding")).cast("double"))
      .withColumn("__scale", (col("q_max") - col("q_min")) / lit(255.0))
    val err = array_max(transform(col("embedding"), v => {
      val x = v.cast("double")
      val q = floor((x - col("q_min")) / col("__scale") + lit(0.5))
      abs(x - (col("q_min") + q * col("__scale")))
    }))
    e.select(col("vec_id"), col("q_min"), col("q_max"),
        when(col("__scale") === 0, lit(0.0)).otherwise(err)
          .as("max_abs_err"))
  }

  val embQuantizeOracle: String =
    """SELECT vec_id, q_min, q_max,
      |  CASE WHEN q_max = q_min THEN 0.0 ELSE
      |    list_max(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> abs(x - (q_min + floor((x - q_min) / ((q_max - q_min) / 255.0) + 0.5)
      |                           * ((q_max - q_min) / 255.0)))))
      |  END AS max_abs_err
      |FROM (SELECT vec_id, embedding,
      |        CAST(list_min(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS q_min,
      |        CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE) AS q_max
      |      FROM embeddings) t
      |ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_quantize"   -> (embQuantize _),
    "ann_bruteforce" -> ((s: SparkSession, d: String) => annBruteforce(s, d)),
    "ann_lsh"        -> ((s: SparkSession, d: String) => annLsh(s, d)),
    "ann_ivf"        -> ((s: SparkSession, d: String) => annIvf(s, d)),
    "ann_ivf_pq"     -> ((s: SparkSession, d: String) => annIvfPq(s, d)),
    "ann_recall"     -> ((s: SparkSession, d: String) => annRecall(s, d)),
    "emb_norm_stats" -> (embNormStats _))

  val oracles: Map[String, String] = Map(
    "emb_quantize"   -> embQuantizeOracle,
    "ann_bruteforce" -> annBruteforceOracle,
    "ann_lsh"        -> annLshOracle(),
    "emb_norm_stats" -> embNormStatsOracle)
}
