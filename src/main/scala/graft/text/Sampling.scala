package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling under a token budget.
  *
  * The pipeline op behind "train on the first B tokens of the cleaned
  * corpus, chosen pseudo-randomly but reproducibly": order documents by
  * (splitBucket(id), id) — a deterministic shuffle that is a pure function
  * of the id — and keep every document whose PRIOR cumulative token count
  * is still under the budget. (Generalizes the reference's deterministic
  * task-splitting discipline, catatom2osm/app.py:214-246, to corpus scale.)
  *
  * A naive implementation is one global window sort over the whole corpus —
  * the classic 100 TB anti-pattern. This one is two-phase:
  *
  *   1. per-bucket token totals (one map-side-combined groupBy over 100
  *      constant buckets; the result is a bounded 100-row table — the same
  *      driver-data class as an IVF centroid matrix);
  *   2. buckets strictly below the boundary are kept WHOLE with zero
  *      sorting; only the single boundary bucket — ~1% of the corpus —
  *      runs the in-bucket cumulative-sum window to find the exact cut.
  *
  * The kept set is identical to the global-window formulation (the oracle
  * replays exactly that), but the sort touches 1/nBuckets of the data at
  * any corpus size.
  */
object Sampling {

  /** Keep documents in (bucket, id) order while the running token total
    * stays under `budget`. Returns (idCol, n_tokens) for kept docs.
    *
    * `docs` must expose `idCol`; `tokCol` is evaluated against it. */
  def tokenBudgetSample(docs: DataFrame, idCol: String, tokCol: Column,
                        budget: Long): DataFrame = {
    val base = docs.select(col(idCol), TextFns.splitBucket(col(idCol)).as("bucket"),
      tokCol.as("n_tokens"))

    // Phase 1: bounded per-bucket totals (<=100 rows on the driver).
    val totals = base.groupBy("bucket").agg(sum("n_tokens").as("tot"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    val cumBefore = totals.map { case (b, tot) =>
      val before = cum; cum += tot; (b, before, tot)
    }
    // fully-kept buckets: even their LAST doc has prior < budget, which is
    // guaranteed when before + tot <= budget (prior <= before + tot - 1).
    val fullBuckets = cumBefore.collect {
      case (b, before, tot) if before + tot <= budget => b
    }
    // the single boundary bucket, if the budget lands inside one
    val boundary = cumBefore.find { case (_, before, tot) =>
      before < budget && before + tot > budget
    }

    val kept = base.filter(col("bucket").isin(fullBuckets: _*))
    val out = boundary match {
      case None => kept
      case Some((b, before, _)) =>
        // Phase 2: cumulative sum inside the ONE boundary bucket only.
        val w = Window.partitionBy("bucket").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, -1)
        val cut = base.filter(col("bucket") === b)
          .withColumn("prior", lit(before) + coalesce(sum("n_tokens").over(w), lit(0L)))
          .filter(col("prior") < budget)
          .drop("prior")
        kept.unionByName(cut)
    }
    out.select(col(idCol), col("n_tokens"))
  }
}
