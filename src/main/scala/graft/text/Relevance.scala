package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term relevance: per-document TF-IDF keyword extraction and
  * DSIR-style hashed-n-gram importance weighting for data selection.
  *
  * The reference's analog is its frequency-driven name normalization —
  * street-name tokens scored against a corpus-wide frequency table to pick
  * the canonical form (catatom2osm/hgwnames.py match/dsmatch) — here
  * generalized to the web corpus: term statistics against the whole
  * collection drive per-document scoring and selection.
  */
object Relevance {

  /** Top-k terms per document by tf·ln(nDocs/df).
    *
    * 100 TB shape: term frequencies are one groupBy(doc, word) whose
    * map-side partial aggregation bounds the EXCHANGE at distinct
    * (doc, word) pairs, not corpus tokens (same-doc tokens share a
    * partition, so they combine before the wire; an in-row HOF histogram
    * was tried and reverted — lambda functions run interpreted, outside
    * whole-stage codegen, and measured ~3× slower for the same exchange
    * volume). Document frequencies fall out of the tf table with a second
    * aggregate on the word alone. The tf⨝df join is word-keyed — stopword
    * keys are heavy, which is exactly the skew AQE's skew-join split
    * handles (the df side is 1 row per key, so a split bucket replicates
    * one 16-byte row). The final top-k window partitions by doc_id —
    * partition-local, never a global sort. ln(n/df) is evaluated once per
    * distinct word, not once per (doc, word) pair.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: Column,
                k: Int): DataFrame = {
    val nDocs = docs.count()
    val tf = docs
      .select(col(idCol), explode(split(textCol, " ")).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val persisted = graft.CacheBin.persist(tf)
    val df = persisted.groupBy("term")
      .agg(count(lit(1)).as("df"))
      // idf computed here — once per distinct word — and carried through
      // the join, instead of per (doc, word) row after it
      .withColumn("idf", log(lit(nDocs.toDouble) / col("df")))
    val rank = row_number().over(
      Window.partitionBy(idCol).orderBy(col("score").desc, col("term")))
    persisted.join(df, "term")
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", rank)
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"),
        round(col("score"), 6).as("score"))
  }

  /** 48-bit md5 prefix of a term, mod `buckets` — the hashed feature
    * space (the engine-wide TextFns.hashBucket idiom; DuckDB parity
    * documented there). */
  def featureBucket(term: Column, buckets: Int): Column =
    TextFns.hashBucket(term, buckets)

  /** DSIR-style importance weight per document (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): hash every
    * token into `buckets` features, estimate the target (rows matching
    * `targetPred`) and raw feature distributions with add-one smoothing,
    * and score each document by the sum over its tokens of
    * ln p_target(feature) − ln p_raw(feature). High weight = looks like
    * the target distribution; downstream sampling keeps docs
    * proportionally.
    *
    * Returns (idCol, n_tokens, weight) with the weight rounded to 6
    * decimals (the two engines sum the per-bucket doc counts in different
    * orders; every other term of the arithmetic is integral).
    *
    * 100 TB shape: the feature tables are BOUNDED — `buckets` rows each —
    * built by one scan + one tiny aggregate (partial map-side sums over
    * the hashed bucket id; the shuffle carries at most buckets×partitions
    * rows). The per-document scoring pass joins the token stream to the
    * bucket table by BROADCAST (2×buckets doubles), so scoring is
    * scan-shaped: one codegen pass over the text, zero extra full-corpus
    * shuffles beyond the per-doc aggregate on the 8-byte id.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: Column,
                        targetPred: Column, buckets: Int = 64): DataFrame = {
    // the token stream is NOT persisted: caching it would materialize one
    // row per CORPUS TOKEN (~10^15 at the target scale) to save re-running
    // a split+explode — the cache write costs far more than the second
    // scan. What IS persisted is `counts`, the `buckets`-row aggregate all
    // three downstream reads (totals, ratios, broadcast build) share, so
    // the corpus is scanned exactly twice: once here, once for scoring
    def toks = docs
      .select(col(idCol), targetPred.as("is_t"),
        explode(split(textCol, " ")).as("term"))
      .withColumn("f", featureBucket(col("term"), buckets))
    val counts = graft.CacheBin.persist(toks.groupBy("f").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr")))
    val totals = counts.agg(
      // coalesce: a fully-empty corpus yields a null-sum row, not 0
      coalesce(sum("ct"), lit(0L)).as("tt"),
      coalesce(sum("cr"), lit(0L)).as("tr")).head()
    val (tt, tr) = (totals.getLong(0), totals.getLong(1))
    // add-one smoothing keeps empty target buckets finite; the log ratio
    // is formed from exact integers, so parity only depends on the final
    // double arithmetic both engines share
    val ratios = counts.select(col("f"),
      (log((col("ct") + lit(1)).cast("double") / lit((tt + buckets).toDouble)) -
        log((col("cr") + lit(1)).cast("double") / lit((tr + buckets).toDouble)))
        .as("lr"))
    toks.join(broadcast(ratios), "f")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(sum("lr"), 6).as("weight"))
  }
}
