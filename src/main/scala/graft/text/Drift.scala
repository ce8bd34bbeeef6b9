package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution-shift detection between two crawl slices: which
  * words changed their share of the corpus most between slice A and
  * slice B? The standard QA gate before mixing a fresh crawl into a
  * training corpus (did the new snapshot drift toward spam/SEO
  * vocabulary?). Reference analog: the reference's report surface diffs
  * counted feature categories across pipeline stages (report.py validate
  * counters); here the "categories" are the corpus vocabulary itself.
  *
  * Determinism contract: the drift score is the INTEGER cross-product
  * share delta  c_a·N_b − c_b·N_a  (the sign/magnitude of
  * c_a/N_a − c_b/N_b without any division), so ranking is exact in both
  * engines; ties break on the word. At true corpus scale (c ~ 10¹²,
  * N ~ 10¹⁴) the cross-product overflows a 64-bit long — the documented
  * scale path is the same formula over per-word counts DOWNSCALED by a
  * common constant (or decimal(38) arithmetic), which preserves the
  * ordering; the oracle-gated variant keeps raw longs.
  *
  * Plan shape at 10¹² docs: ONE word-keyed exchange (the conditional
  * count aggregate, map-side combined — not one shuffle per slice); the
  * two totals are a 1-row aggregate broadcast back; the top-k is
  * TakeOrdered over the vocab-bounded count table (never a global sort
  * of corpus rows). */
object Drift {

  /** Top-`topK` drifted words between the `isB = false` slice (A) and the
    * `isB = true` slice (B). Output: (word, c_a, c_b, delta) with
    * delta = c_a·N_b − c_b·N_a, ordered by |delta| desc, word asc. */
  def vocabDrift(docs: DataFrame, textCol: String, isB: Column,
                 topK: Int): DataFrame = {
    val words = docs
      .select(isB.as("b"), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val counts = words.groupBy("word").agg(
      sum(when(!col("b"), 1L).otherwise(0L)).as("c_a"),
      sum(when(col("b"), 1L).otherwise(0L)).as("c_b"))
    val totals = counts.agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
    counts.crossJoin(broadcast(totals))
      .withColumn("delta", col("c_a") * col("n_b") - col("c_b") * col("n_a"))
      .orderBy(abs(col("delta")).desc, col("word"))
      .limit(topK)
      .select("word", "c_a", "c_b", "delta")
  }
}
