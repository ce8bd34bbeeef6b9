package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents in the
  * deterministic (splitBucket, id) shuffle order and chunk the resulting
  * token stream into fixed-length training sequences ("concat-and-chunk"
  * packing). Per document it reports the first sequence the document lands
  * in and how many sequences it spans — the assignment a training-data
  * writer needs to emit packed shards. (Deterministic-order discipline
  * generalizes the reference's task splitting, catatom2osm/app.py:214-246.)
  *
  * The global token offset of every document is an exclusive prefix sum
  * over the whole corpus — naively one global window sort, the classic
  * 100 TB anti-pattern (a single task owns the total order). Two-phase
  * instead, the same decomposition as [[Sampling]]:
  *
  *   1. bounded per-bucket token totals (one map-side-combined groupBy over
  *      100 constant buckets) give the exact START OFFSET of every bucket;
  *   2. an independent cumulative-sum window runs INSIDE each bucket — 100
  *      parallel ~1%-of-corpus sorts instead of one corpus-wide total
  *      order — and adds the bucket's start offset.
  *
  * The assignment is identical to the global-window formulation at every
  * input; no single task ever materializes more than one bucket.
  */
object Packing {

  /** Pack documents into sequences of `seqLen` tokens. Returns
    * (idCol, n_tokens, first_seq, n_seqs); a document with zero tokens
    * occupies no sequence (n_seqs = 0, first_seq = the boundary it sits
    * at). `tokCol` is evaluated against `docs`. */
  def seqPack(docs: DataFrame, idCol: String, tokCol: Column,
              seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(col(idCol),
      TextFns.splitBucket(col(idCol)).as("bucket"), tokCol.as("n_tokens"))

    // Phase 1: bounded per-bucket totals -> exact bucket start offsets
    // (shared NULL-hardened helper; <=100 rows on the driver).
    val offsets = Sampling.bucketOffsets(base)
      .map { case (b, before, _, _) => (b, before) }

    // Phase 2: per-bucket exclusive prefix sum + the bucket's start offset.
    val offDf = offsets.toSeq.toDF("bucket", "bucket_off")
    val w = Window.partitionBy("bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("within", coalesce(sum("n_tokens").over(w), lit(0L)))
      .join(broadcast(offDf), "bucket")
      .withColumn("prior", col("bucket_off") + col("within"))
      .select(col(idCol),
        col("n_tokens"),
        expr(s"prior div $seqLen").as("first_seq"),
        when(col("n_tokens") > 0,
          expr(s"(prior + n_tokens - 1) div $seqLen") -
            expr(s"prior div $seqLen") + lit(1L))
          .otherwise(lit(0L)).as("n_seqs"))
  }
}
