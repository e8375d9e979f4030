package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
