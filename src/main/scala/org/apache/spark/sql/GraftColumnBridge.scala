package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported-but-internal seam every Spark extension library uses to expose
  * custom Catalyst expressions through the public Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint`ed Dataset.
    *
    * `localCheckpoint(true)` pins its materialized RDD blocks until the
    * driver GCs the RDD reference — there is no public unpersist for it.
    * Iterative operators (label propagation) checkpoint every round and
    * must release round i-1 once round i is materialized; this walks the
    * plan to the underlying checkpointed RDD and unpersists it. The Dataset
    * is UNUSABLE afterwards (lineage was truncated at the checkpoint) —
    * only call on superseded intermediates.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ =>
    }

  /** Re-tag a batch DataFrame as STREAMING — what a V1 streaming
    * `Source.getBatch` must return (MicroBatchExecution asserts
    * `isStreaming`). Same internalCreateDataFrame pattern Spark's own
    * file stream source uses: the batch plan's execution RDD under the
    * same schema, marked streaming.
    */
  def asStreamingFrame(df: Dataset[Row]): DataFrame = {
    val ss = df.sparkSession.asInstanceOf[classic.SparkSession]
    ss.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** Where the session catalog would place a managed table of this name —
    * resolving the current database, db-qualified names, and the
    * catalog's case normalization, exactly as `saveAsTable` will. Needed
    * to clean orphaned locations (an in-memory catalog forgets its tables
    * across sessions but leaves their directories).
    */
  def managedTableLocation(spark: SparkSession, table: String): java.net.URI = {
    val ss = spark.asInstanceOf[classic.SparkSession]
    val ident = ss.sessionState.sqlParser.parseTableIdentifier(table)
    ss.sessionState.catalog.defaultTablePath(ident)
  }
}
