package org.apache.spark.sql

/** Bridge into Spark's private[sql] internalCreateDataFrame — the
  * zero-conversion way to rebuild a DataFrame from an already-materialized
  * (localCheckpoint'd) Dataset so that its Catalyst statistics reset to the
  * conservative default.
  *
  * Why it exists: iterative loops must cut lineage AND reset stats every
  * round (localCheckpoint alone preserves the child plan's sizeInBytes,
  * which the per-round joins multiply into a planner-killing BigInteger —
  * the failure Adjacency.ckFresh documents). The public reset path,
  * `createDataFrame(ck.rdd, schema)`, round-trips every row through
  * InternalRow → boxed Row → InternalRow — measured as a dominant CPU term
  * on million-edge component graphs (two boxed longs per edge per round).
  * `internalCreateDataFrame(queryExecution.toRdd, schema)` builds the same
  * fresh-stats LogicalRDD directly over the checkpointed UnsafeRows —
  * the exact mechanism Dataset.checkpoint uses internally.
  */
object GraftRddBridge {
  /** `df` must be backed by materialized rows (e.g. a localCheckpoint) —
    * the caller keeps responsibility for lineage truncation; this only
    * rebuilds the frame with default statistics and no row conversion. */
  def freshStatsCopy(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
