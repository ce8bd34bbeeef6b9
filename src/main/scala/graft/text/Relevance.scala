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

  /** BM25 top-k retrieval: score every document against every query and
    * return the k best docs per query — the inverted-index probe workload
    * (Robertson/Zaragoza BM25, idf = ln(1 + (N−df+0.5)/(df+0.5)), Lucene's
    * positive form).
    *
    * `queries` is a SMALL table (qid, query text); docs are the corpus.
    * Returns (qid, rank, doc_id, score) with score rounded to 6 decimals
    * and rank ordered by (rounded score desc, doc_id) — rounding BEFORE
    * ranking keeps the ordering identical across engines whose partial-sum
    * orders differ in the last ulp.
    *
    * 100 TB shape: the corpus is aggregated ONCE into tf(doc, term) — the
    * same map-side-combining groupBy as [[tfIdfTopK]] — and doc lengths
    * fall out of tf with a second 8-byte-keyed aggregate. The QUERY
    * VOCABULARY (distinct terms over all queries) is tiny and broadcast,
    * so the posting-list probe is a broadcast-hash semi-shaped join: only
    * postings of query terms survive the scan (this IS the inverted-index
    * lookup — no corpus-sized exchange is keyed on anything but the 8-byte
    * doc id). df comes from the filtered postings (count over all docs
    * holding the term — the filter is term-exact, so df is exact). The
    * per-(query, doc) score sum and the final top-k window both partition
    * by qid — partition-local, never a global sort. Skew lives in stopword
    * query terms (huge posting lists): that is AQE skew-split territory,
    * and the broadcast side stays bounded by the query vocabulary.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: Column,
               queries: DataFrame, qidCol: String, qtextCol: Column,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = graft.CacheBin.persist(docs
      .select(col(idCol), explode(split(textCol, " ")).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf")))
    val docLen = graft.CacheBin.persist(
      tf.groupBy(idCol).agg(sum("tf").as("len")))
    val stats = docLen.agg(count(lit(1)).as("n"), sum("len").as("tot")).head()
    val (nDocs, totLen) = (stats.getLong(0), stats.getLong(1))
    // exact-integer division once, identically on both engines
    val avgLen = totLen.toDouble / nDocs

    val qTerms = queries
      .select(col(qidCol).as("qid"), explode(split(qtextCol, " ")).as("term"))
      .distinct()
    val vocab = qTerms.select("term").distinct()

    // inverted-index probe: corpus postings restricted to query terms
    val tfQ = graft.CacheBin.persist(tf.join(broadcast(vocab), "term"))
    val df = tfQ.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") * (lit(k1) + lit(1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("len") / lit(avgLen)))

    val scored = tfQ
      .join(broadcast(qTerms), "term")
      .join(broadcast(df), "term")
      .join(docLen, idCol)
      .groupBy(col("qid"), col(idCol))
      .agg(round(sum(idf * tfn), 6).as("score"))
    val rank = row_number().over(Window.partitionBy("qid")
      .orderBy(col("score").desc, col(idCol)))
    scored.withColumn("rank", rank.cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol), col("score"))
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
