package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT duplicate-span detection over a document corpus — the
  * "exact substring dedup" of Lee et al. 2022 (Deduplicating Training Data
  * Makes Language Models Better), re-expressed relationally: a token
  * position is DUPLICATED if some k-token window covering it occurs ≥ 2
  * times in the corpus (other docs or a self-repeat); maximal runs of
  * duplicated windows merge into removable spans. The suffix-array
  * construction the paper uses is a single-node data structure; the
  * corpus-scale equivalent of its "duplicated substring of length ≥ k"
  * predicate is this k-gram frequency join, which is three shuffles at
  * corpus size and needs no global ordering:
  *
  *  1. gram stream: one row per token position (posexplode over a
  *     transform/slice — no UDF), keyed by a 48-bit md5 gram hash
  *     (TextFns.hash48, the engine's oracle-parity hash; a production run
  *     widens the same plan to xxhash64(gram) or a 128-bit pair — the
  *     hash is only a grouping key, collisions only over-mark).
  *  2. duplicated keys: groupBy(hash) count ≥ 2 — map-side combined; the
  *     wire carries (hash, count) not grams. Marked positions come back
  *     via a left-semi join (AQE picks broadcast when the dup set is
  *     small, as it is on clean corpora).
  *  3. span merge: per-doc gaps-and-islands (lag + running sum, the
  *     sessionize idiom) over MARKED positions only — the sort is over
  *     duplicated windows, not the corpus.
  *
  * Output: (doc_id, span_start, span_end, n_tokens) — token-index spans
  * (0-based, inclusive) whose removal de-duplicates the corpus at the
  * k-gram level. Two windows merge when their coverage overlaps or
  * touches (next.pos ≤ prev.pos + k).
  */
object SpanDedup {

  /** @param docs (doc_id: long, text: string) — whitespace-tokenized
    * @param k    minimum duplicated span length in tokens */
  def dupSpans(docs: DataFrame, k: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val grams = docs.select(col("doc_id"),
        when(size(toks) >= k,
          transform(sequence(lit(0), size(toks) - lit(k)),
            i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
          .otherwise(array().cast("array<string>")).as("gs"))
      .select(col("doc_id"), posexplode(col("gs")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.text.TextFns.hash48(col("gram")).as("h"))
    val keyed = graft.CacheBin.persist(grams)
    val dup = keyed.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("h"))
    val marked = keyed.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, 0L)
          .otherwise(1L))
      .withColumn("isl", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1)).as("n_tokens"))
    spans
  }

  /** Per-document duplication profile: how much of each doc is removable
    * span mass — the corpus-health rollup a pipeline gates on (one row per
    * doc that HAS duplicated spans). */
  def dupProfile(docs: DataFrame, k: Int): DataFrame =
    dupSpans(docs, k)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("n_tokens")).as("dup_tokens"),
        max(col("n_tokens")).as("longest_span"))
}
