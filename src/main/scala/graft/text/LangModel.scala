package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style quality
  * gate (Wenzek et al., LREC 2020): score every document by its cross-
  * entropy under a bigram LM trained on a trusted slice of the corpus
  * itself (here the lang='en' documents), then bucket into head/middle/
  * tail. Low cross-entropy = looks like the reference distribution; the
  * tail bucket is the spam/boilerplate candidate set.
  *
  * Reference analog: the quality/validation reporting over layer feature
  * streams (catatom2osm/report.py validate + stats surface) — generalized
  * to the statistical text-quality filter every LLM corpus pipeline runs.
  *
  * Determinism contract (the oracle hash-compares values): each bigram's
  * cost -ln p is rounded to integer MICRO-NATS before summation, so the
  * per-document total is a BIGINT sum — associative and order-independent
  * at any partitioning, unlike a double sum whose value depends on
  * reduction order. The only fp steps left are one IEEE division and one
  * ln() per DISTINCT (w1,w2) pair, identical expressions in both engines.
  *
  * Smoothing: add-one (Laplace) over the reference vocabulary —
  * p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), where c(w1) counts w1 as a
  * bigram HEAD in the reference slice (so the conditional normalizes) and
  * V = distinct bigram-head tokens there. Unseen heads degrade to the
  * uniform 1/V floor.
  *
  * Plan shape at 10^12 docs: one exploded bigram scan feeds (a) the two
  * reference-slice count aggregates and (b) the per-doc multiplicity
  * aggregate — all map-side partial on constant-width string keys; the LM
  * lookup is a shuffle equi-join on (w1,w2) (the LM table is vocab-bounded
  * but corpus-vocab can be huge, so it is never broadcast); V is a 1-row
  * aggregate crossed in via broadcast. No sort anywhere but the caller's
  * final ORDER BY.
  */
object LangModel {

  /** (w1, w2) bigram pairs per row of `toks`, 1 row per position; a
    * single-token document yields one (w1, null) row — null w2 never
    * equi-joins, so it scores as an unseen bigram (matching the SQL
    * oracle, where w[i+1] past the end is NULL). */
  def bigramPairs(toks: Column): Column =
    transform(sequence(lit(1), greatest(size(toks) - 1, lit(1))),
      i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2")))

  /** Score every document of `docs` under a bigram LM trained on the
    * `isRef` slice. Output: (idCol, n_bigrams, cost_unats, bucket) where
    * cost_unats = sum of round(-ln p * 1e6) per bigram occurrence and
    * bucket is head/middle/tail by average micro-nats per bigram
    * (<= headMax / <= middleMax / else). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        isRef: Column,
                        headMaxUnats: Long, middleMaxUnats: Long): DataFrame = {
    val toks = split(col(textCol), " ")
    // one bigram generation, three consumers (c1, c2, per-doc m) — persist
    // so the explode runs once; CacheBin-registered, caller drains
    val g = graft.CacheBin.persist(docs
      .select(col(idCol), isRef.as("is_ref"), explode(bigramPairs(toks)).as("p"))
      .select(col(idCol), col("is_ref"), col("p.w1"), col("p.w2")))
    val ref = g.filter(col("is_ref"))
    val c1 = ref.groupBy("w1").agg(count(lit(1)).as("c1"))
    val c2 = ref.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val v = ref.agg(countDistinct(col("w1")).as("v"))
    val m = g.groupBy(col(idCol), col("w1"), col("w2")).agg(count(lit(1)).as("m"))
    val cost = m
      .join(c1, Seq("w1"), "left")
      .join(c2, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(v))
      .withColumn("unats",
        round(-log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))) * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).cast("long").as("n_bigrams"),
        sum(col("m") * col("unats")).cast("long").as("cost_unats"))
    cost.withColumn("bucket",
      when(col("cost_unats") <= col("n_bigrams") * headMaxUnats, "head")
        .when(col("cost_unats") <= col("n_bigrams") * middleMaxUnats, "middle")
        .otherwise("tail"))
  }

  /** CCNet's actual bucketing discipline (Wenzek et al. §4.3): one bigram
    * LM PER LANGUAGE trained on that language's trusted slice, and the
    * head/middle/tail cut at the per-language perplexity TERCILES derived
    * from the data — not fixed thresholds like [[perplexityBuckets]].
    *
    * Cross-engine determinism: per-doc cost is the integer micro-nat sum
    * (order-independent); avg = cost/n is ONE IEEE double division of two
    * longs (bit-identical in any engine); the tercile cutoffs come from
    * [[graft.ops.Stats.exactQuantiles]]'s multiply-only integer rank
    * predicate over the avg-value histogram, so the cut VALUE is one of
    * the exact per-doc doubles and every comparison agrees.
    *
    * Plan shape at 10^12 docs: the LM scoring is the same
    * exploded-bigram / vocab-keyed-join shape as [[perplexityBuckets]]
    * (now keyed by (lang, w1[, w2]) — still constant-width, still never
    * broadcast); the cutoff derivation adds one histogram aggregate whose
    * output is bounded by DISTINCT avg values, and the cutoff table is
    * #langs rows — broadcast back into a scan-shaped bucket assignment.
    * Languages with an empty trusted slice have no LM and are dropped
    * (inner join on the per-lang vocabulary), matching CCNet, which only
    * scores languages it has a reference model for. */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, isRef: Column): DataFrame = {
    val toks = split(col(textCol), " ")
    val g = graft.CacheBin.persist(docs
      .select(col(idCol), col(langCol).as("lang"), isRef.as("is_ref"),
        explode(bigramPairs(toks)).as("p"))
      .select(col(idCol), col("lang"), col("is_ref"), col("p.w1"), col("p.w2")))
    val ref = g.filter(col("is_ref"))
    val c1 = ref.groupBy("lang", "w1").agg(count(lit(1)).as("c1"))
    val c2 = ref.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c2"))
    val v = ref.groupBy("lang").agg(countDistinct(col("w1")).as("v"))
    val m = g.groupBy(col(idCol), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("m"))
    val cost = m
      .join(c1, Seq("lang", "w1"), "left")
      .join(c2, Seq("lang", "w1", "w2"), "left")
      .join(broadcast(v), Seq("lang")) // inner: unscored langs drop
      .withColumn("unats",
        round(-log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))) * lit(1e6)).cast("long"))
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("m")).cast("long").as("n_bigrams"),
        sum(col("m") * col("unats")).cast("long").as("cost_unats"))
      .withColumn("avg_unats", col("cost_unats") / col("n_bigrams"))
    val scored = graft.CacheBin.persist(cost)
    val cuts = graft.ops.Stats.exactQuantiles(
      scored.select(col("lang"), col("avg_unats")),
      "lang", "avg_unats", Seq(333, 667))
    scored
      .join(broadcast(cuts.select(col("lang"), col("q333"), col("q667"))),
        Seq("lang"))
      .withColumn("bucket",
        when(col("avg_unats") <= col("q333"), "head")
          .when(col("avg_unats") <= col("q667"), "middle")
          .otherwise("tail"))
      .select(col(idCol), col("lang"), col("n_bigrams"), col("cost_unats"),
        col("bucket"))
  }
}
