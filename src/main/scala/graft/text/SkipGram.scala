package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skip-gram training-pair generation (word2vec, Mikolov et al. 2013):
  * every (center, context) token pair within a ±window offset, counted
  * corpus-wide — the co-occurrence statistics an embedding trainer (or a
  * GloVe-style factorization) consumes.
  *
  * 100 TB shape: the pair stream is built INSIDE one codegen projection —
  * a 2-arg `transform` over the token array emits each token's bounded
  * context slice as struct pairs, `flatten` + ONE `explode` turn them into
  * rows — so nothing shuffles until the final groupBy(center, context),
  * whose map-side combine reduces the wire to distinct-pair partials
  * (vocabulary-bounded, not corpus-token-bounded). Per-row work is
  * doc_len × 2·window, never corpus-sized; there is no self-join and no
  * window function anywhere.
  */
object SkipGram {

  /** (center, context, n) counts over all ±`window` skip-gram pairs of
    * the whitespace tokens of `textCol` (empty tokens dropped). */
  def pairCounts(docs: DataFrame, textCol: Column, window: Int): DataFrame = {
    val toks = docs.select(
      filter(split(textCol, " "), t => length(t) > lit(0)).as("l"))
    val pairs = toks
      .select(explode(flatten(transform(col("l"), (w, i) =>
        transform(
          filter(
            sequence(greatest(i - window, lit(0)),
              least(i + window, size(col("l")) - 1)),
            j => j =!= i),
          j => struct(w.as("center"),
            element_at(col("l"), j + 1).as("context")))))).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
    pairs.groupBy("center", "context").agg(count(lit(1)).as("n"))
  }

  /** Deterministic negative sampling (the word2vec unigram-table draw,
    * made reproducible): for each vocabulary word, `k` negatives whose
    * FREQUENCY RANK is md5-48(center:j) % V — a pure column hash, so the
    * sample is a function of the corpus alone (reruns, cluster sizes and
    * the DuckDB oracle agree bit-exactly).
    *
    * Scale: every table here is VOCABULARY-sized, never corpus-sized —
    * the one corpus pass is the word-count groupBy (map-side combined);
    * the rank window sorts only the vocab; the draw is an equi-join of
    * the k-exploded vocab against the rank table. Returns
    * (center, j, neg) for j in [0, k). */
  def negatives(docs: DataFrame, textCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs
      .select(explode(filter(split(textCol, " "), t => length(t) > lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val ranked = graft.CacheBin.persist(words.select(col("w"),
      row_number().over(Window.orderBy(desc("n"), asc("w"))).as("rank")))
    val v = ranked.count()
    val draws = ranked.select(col("w").as("center"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("center"), col("j"),
        (TextFns.hash48(concat_ws(":", col("center"), col("j").cast("string")))
          % v + 1).as("rk"))
    draws.join(ranked.select(col("rank").as("rk"), col("w").as("neg")), Seq("rk"))
      .select(col("center"), col("j"), col("neg"))
  }
}
