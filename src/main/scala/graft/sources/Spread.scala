package graft.sources

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for under-split inputs (optimization guide
  * §2.5 "input skew": one small/unsplittable file yields ONE scan task, so
  * every per-row expression downstream of the scan — URL canonicalization,
  * gram hashing, winnowing selection, page synthesis — runs serially no
  * matter how many cores the session has; the prescribed fix is
  * "repartition immediately after the read").
  *
  * The trigger is INPUT-SIZE-DERIVED, not a local[32] constant: when the
  * source's optimizer-estimated bytes already yield at least ~half the
  * session's parallelism in splits (size ≥ maxPartitionBytes · cores / 2),
  * this is the identity — a production-scale scan gains nothing and pays
  * nothing. Only an under-split scan gets one round-robin repartition to
  * `defaultParallelism` (deterministic: Spark sorts rows before
  * round-robin distribution, SPARK-23207, so retries and reruns place rows
  * identically). Dimension-sized sources below the floor stay untouched —
  * for a broadcast side the exchange would cost more than the single-task
  * scan it parallelizes.
  */
object Spread {
  /** Bytes below which a source is dimension-sized and left alone. */
  val Floor: Long = 64L * 1024

  def scan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val maxSplit =
      org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes
    val par = spark.sparkContext.defaultParallelism
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size >= Floor && size < BigInt(maxSplit) * par / 2) df.repartition(par)
    else df
  }
}
