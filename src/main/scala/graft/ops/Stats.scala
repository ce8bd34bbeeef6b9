package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus profiling statistics.
  *
  * Reference analog: the per-layer stat/histogram reporting surface
  * (catatom2osm/report.py — validate counters, `*_stats` min/max/mean) —
  * generalized to the corpus-distribution profiling every training-data
  * pipeline runs before choosing filter thresholds (length cuts, token
  * budgets, quality gates).
  */
object Stats {

  /** EXACT discrete quantiles of an integer-valued column per group,
    * WITHOUT a global sort — the decomposition that survives 10^12 rows:
    *
    *  1. `groupBy(group, v) count` — one map-side-combined exchange whose
    *     width is the DISTINCT VALUE DOMAIN per group (doc lengths: ~10^4
    *     rows), not the corpus;
    *  2. a cumulative-count window per group over that aggregate only —
    *     the sort the window pays is over domain-sized data;
    *  3. quantile q = the smallest v whose cumulative count reaches
    *     ceil(q*n) — the standard discrete (type-1) definition, integer
    *     arithmetic only, so any two engines agree bit-for-bit (no fp
    *     interpolation like percentile_approx / quantile_cont).
    *
    * The anti-pattern this replaces is ORDER BY v + row_number over the
    * corpus: a global range exchange of every row. Here no corpus-sized
    * data is ever sorted; the only window runs over the value histogram.
    *
    * Returns one row per group: (groupCol, n, q<p> for each requested
    * per-mille point, e.g. q500/q900/q990). */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     permille: Seq[Int]): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(groupCol).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy(groupCol)))
    // cum >= ceil(p*n/1000)  ⟺  1000*cum >= p*n — multiply-only integer
    // predicate, no division of any kind to disagree on
    val qCols = permille.map { p =>
      min(when(col("cum") * lit(1000L) >= lit(p.toLong) * col("n"),
        col("v"))).as(s"q$p")
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), qCols: _*)
  }
}
