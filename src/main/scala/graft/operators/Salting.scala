package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's skew
  * handling can't help (e.g. skewed *aggregations*, or joins below AQE's
  * size thresholds but above a single task's comfort).
  *
  * A hot key that would land 10⁹ rows in one shuffle partition is split
  * across `nSalts` partitions; the other side replicates `nSalts`× (it is
  * the small side — that's the regime where salting wins). The salt is
  * derived deterministically from stable fact columns, never `rand()`, so
  * retried tasks produce identical output (a failed+retried stage with
  * rand() salts silently corrupts results).
  */
object Salting {

  /** Equi-join `fact ⋈ dim` on `key`, spreading each fact key over
    * `nSalts` shuffle partitions. `saltSource` must be stable fact columns
    * (ideally unique-ish, e.g. the fact's id) — it only controls spread.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Seq[Column], nSalts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(nSalts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe `groupBy(key).agg(...)` in two hops: partial aggregate on
    * (key, salt) — the hot key's rows split across `nSalts` reducers —
    * then final aggregate on key over the (tiny) partials. Only works for
    * algebraic aggregates; the caller supplies both halves.
    */
  def saltedAgg(df: DataFrame, key: String, saltSource: Seq[Column],
                nSalts: Int,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(saltSource: _*), lit(nSalts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)

  /** Skew-safe last-non-null carry-forward — the as-of join kernel,
    * re-partitioned so no task ever holds a whole hot key.
    *
    * `Window.partitionBy(key)` puts EVERY row of a key in one task, and
    * AQE's skew splitting cannot break a window partition apart — at
    * 100 TB one hot key stalls the stage. Bucketing the time axis bounds
    * every shuffle partition at the (key, bucket) group size instead:
    *
    *  1. a local window per (key, bucket) computes the within-bucket
    *     running last-non-null (bounded partitions);
    *  2. a `groupBy(key, bucket)` aggregate over the windowed output
    *     reduces each bucket to its overall last value — it reuses the
    *     window's (key, bucket) partitioning, so it adds no exchange and
    *     inherits the same bounded-group guarantee;
    *  3. a carry window over that per-bucket table (ONE row per
    *     (key, bucket) — tiny even for the hottest key) propagates the
    *     last value of all strictly-earlier buckets;
    *  4. a join on (key, bucket) — again bounded — stitches the carry-in
    *     back, and `coalesce(local, carry)` is the global answer.
    *
    * Equivalent to `last(value, ignoreNulls).over(partitionBy(keys)
    * .orderBy(time, tiebreak))` whenever `bucket` is monotonic in `time`
    * (b1 < b2 ⟹ every t in b1 ≤ every t in b2 — e.g. `date_trunc`, or
    * `floor(epoch / width)`). Null keys and null times are preserved with
    * window semantics too: the stitch join is null-safe, a null key is its
    * own group, and a null time lands in the null bucket, which sorts
    * first — exactly where an ascending orderBy puts null times.
    * `valueCols` must be null/non-null together (one "carrier row"
    * marker — the as-of union shape); pick the bucket granularity so the
    * hottest key spreads over many buckets.
    */
  def carryLastOverBuckets(df: DataFrame, keys: Seq[String], time: Column,
                           tiebreak: Seq[Column], valueCols: Seq[String],
                           bucket: Column): DataFrame = {
    val kcols = keys.map(col)
    val ord = time +: tiebreak
    val in = df.withColumn("__bkt", bucket)
    val wLocal = Window.partitionBy(kcols :+ col("__bkt"): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localized = valueCols.foldLeft(in) { (d, v) =>
      d.withColumn(s"__loc_$v", last(col(v), ignoreNulls = true).over(wLocal))
    }
    // The bucket table derives from the WINDOWED output, not from `df`
    // again: the bucket's last non-null value tuple is exactly the local
    // running-last at the bucket's max-(time, tiebreak) row, and
    // `localized` is already hash-partitioned on (key, bucket) by the
    // window, so this aggregate needs no second scan and no second
    // exchange (the one exchange is shared with the stitch side via
    // ReuseExchange). Buckets whose max row carries no value (no carrier
    // row in the bucket) nullify to a null __last so the carry skips them.
    val bktLast = localized.groupBy(kcols :+ col("__bkt"): _*)
      .agg(max_by(struct(valueCols.map(v => col(s"__loc_$v").as(v)): _*),
        struct(ord: _*)).as("__last"))
      .withColumn("__last",
        when(col("__last").getField(valueCols.head).isNotNull, col("__last")))
    val wCarry = Window.partitionBy(kcols: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the stitch join is NULL-SAFE (<=> stays an equi-join key, so the
    // plan is still a bounded hash join): a USING join would silently
    // drop rows whose key or time is null, where the window formulation
    // keeps them
    val carry = bktLast
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .select(keys.zipWithIndex.map { case (k, i) => col(k).as(s"__ck$i") } :+
        col("__bkt").as("__cb") :+ col("__carry"): _*)
    val cond = keys.zipWithIndex
      .map { case (k, i) => localized(k) <=> carry(s"__ck$i") }
      .reduce(_ && _) && (localized("__bkt") <=> carry("__cb"))
    val stitched = valueCols.foldLeft(localized.join(carry, cond)) { (d, v) =>
      d.withColumn(v, coalesce(col(s"__loc_$v"), col("__carry").getField(v)))
    }
    stitched.drop(
      keys.indices.map(i => s"__ck$i") ++
        Seq("__bkt", "__cb", "__carry") ++ valueCols.map(v => s"__loc_$v"): _*)
  }
}
