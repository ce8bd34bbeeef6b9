package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- HyperLogLog distinct-count registers ----------------------------

  /** Register width: md5-48 hashes split into `b` bucket bits (callers
    * pick m = 2^b buckets) and 48−b rank bits. */
  private def rhoCol(v: Column, rankBits: Int): Column =
    // rho = leftmost-1 position in the rank bits, 1-based; v == 0 (all
    // rank bits zero) takes the max rank+1 by HLL convention. Bit length
    // via base-2 string length — identical in Spark (conv) and DuckDB
    // (bin), no floating-point log to disagree on.
    when(v === 0L, lit(rankBits + 1))
      .otherwise(lit(rankBits + 1) - length(conv(v, 10, 2)))

  /** HyperLogLog registers (Flajolet et al. 2007) per group: one row per
    * (group, bucket) with the max rank observed — the MERGEABLE sketch
    * state for approximate count-distinct at 10^12 keys:
    *
    *  - one scan computes (bucket, rho) per row in pure column math
    *    (md5-48 idiom — any engine replays the exact registers);
    *  - ONE groupBy(group, bucket) max — map-side combine collapses every
    *    partition to ≤ m rows per group, so the wire carries sketch-sized
    *    partials, never the corpus (the count-distinct that needs no
    *    distinct);
    *  - sketches MERGE by the same max — union of corpora = element-wise
    *    register max, the property incremental ingest needs.
    *
    * `bucketBits` ≤ 14 keeps the standard-error ≈ 1.04/√m ladder
    * (b=11 → ~2.3%). Estimation from the registers (with the small-range
    * linear-counting correction) is [[hllEstimate]] — kept OUT of the
    * integer register table so cross-engine gates stay fp-free. */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 14, s"bucketBits=$bucketBits")
    val m = 1L << bucketBits
    val h = graft.text.TextFns.hash48(col(keyCol).cast("string"))
    df.select(col(groupCol),
        (h % m).as("bucket"),
        rhoCol(call_function("shiftright", h, lit(bucketBits)),
          48 - bucketBits).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max("rho").cast("long").as("r"))
  }

  /** Estimate distinct counts from [[hllRegisters]] output: the raw HLL
    * harmonic-mean estimator with the linear-counting small-range
    * correction. Driver-free: one group-sized aggregate. */
  def hllEstimate(registers: DataFrame, groupCol: String,
      bucketBits: Int): DataFrame = {
    val m = (1L << bucketBits).toDouble
    val alpha = bucketBits match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    registers
      .groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("r"))).as("sumPresent"),
        count(lit(1)).as("present"))
      .withColumn("z", col("sumPresent") + (lit(m) - col("present")))
      .withColumn("raw", lit(alpha * m * m) / col("z"))
      .withColumn("zeros", lit(m) - col("present")) // rho >= 1 when present
      .withColumn("est",
        when(col("raw") <= 2.5 * m && col("zeros") > 0,
          lit(m) * log(lit(m) / col("zeros")))
          .otherwise(col("raw")))
      .select(col(groupCol), round(col("est")).cast("long").as("est"))
  }

  /** Sketch ALGEBRA — the property that makes HLL the 100 TB
    * count-distinct: registers of a UNION of corpora equal the
    * element-wise MAX of the corpora's separate registers, so sketches
    * built shard-by-shard (or crawl-by-crawl) merge in register-sized
    * work with no rescan. Input: [[hllRegisters]] output over any number
    * of slices; output: one merged register row per bucket. Intersection
    * cardinality follows by inclusion-exclusion over [[hllEstimate]] of
    * the parts and the merge ([[StatsSpec]] checks both laws). */
  def hllMerge(registers: DataFrame): DataFrame =
    registers.groupBy(col("bucket")).agg(max(col("r")).cast("long").as("r"))
}
