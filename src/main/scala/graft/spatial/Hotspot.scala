package graft.spatial

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Getis–Ord Gi* hotspot detection (Getis & Ord 1992) over cell counts —
  * the standard spatial-autocorrelation z-score for "where do geotagged
  * pages clump beyond chance". Completes the engine's spatial-statistics
  * family (IDW resampling, areal reaggregation, DBSCAN clustering; this is
  * the significance-scored density surface).
  *
  * Frame contract (documented, the oracle replays it): the study frame is
  * the OCCUPIED cells; the neighborhood is the 3×3 window restricted to
  * occupied cells (binary weights, self included — the Gi* convention).
  *
  * Plan shape at 10^12 points: ONE groupBy(cell) count with map-side
  * combine reduces the corpus to cell rows; global stats are a 1-row
  * aggregate broadcast back; the neighborhood sum is a constant-9×
  * literal-offset explode + cell equi-join — everything downstream of the
  * first count is cell-cardinality work, never corpus-sized. All
  * aggregates are exact 64-bit integers; the z-score's fp math runs once
  * per cell from exact integer inputs (cross-engine bit-stable).
  */
object Hotspot {

  /** @param cells one row per point: (cx: long, cy: long)
    * @return (cx, cy, n, k, wsum, gi) per occupied cell, gi rounded to 6. */
  def giStar(cells: DataFrame): DataFrame = {
    val cnt = graft.CacheBin.persist(
      cells.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n")))
    val g = cnt.agg(sum(col("n")).as("tot"), count(lit(1)).as("nc"),
      sum(col("n") * col("n")).as("totsq"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    // each occupied cell donates its count to its 9 neighbor positions;
    // the inner join back to cnt keeps the occupied frame, so k counts
    // occupied neighbors only
    val w = cnt.select(col("cx").as("scx"), col("cy").as("scy"), col("n"),
        explode(offsets).as("o"))
      .groupBy((col("scx") + col("o.dx")).as("cx"),
        (col("scy") + col("o.dy")).as("cy"))
      .agg(sum(col("n")).as("wsum"), count(lit(1)).as("k"))
    val mu = col("tot").cast("double") / col("nc")
    val s = sqrt(col("totsq").cast("double") / col("nc") - mu * mu)
    cnt.join(w, Seq("cx", "cy"))
      .crossJoin(broadcast(g))
      .select(col("cx"), col("cy"), col("n"), col("k"), col("wsum"),
        round((col("wsum") - mu * col("k")) /
          (s * sqrt((col("nc") * col("k") - col("k") * col("k")) /
            (col("nc") - lit(1.0)))), 6).as("gi"))
  }

  /** Global Moran's I (Moran 1950) over the same occupied-cell frame,
    * binary queen weights (8 neighbors, self EXCLUDED). The textbook form
    * sums fp cross-products Σ z_i z_j — a partitioning-dependent fp
    * reduction. Expanded algebraically instead:
    *   Σ_adj (n_i−μ)(n_j−μ) = P − μ·S + μ²·W,  Σ(n−μ)² = Q − 2μ·T + nc·μ²
    * where P = Σ_adj n_i n_j, S = Σ_adj (n_i+n_j), W = ordered adjacent
    * pair count, Q = Σ n², T = Σ n — ALL exact 64-bit integer aggregates
    * (order-independent at any partitioning); the fp math is ONE closed
    * form evaluated once. Returns one row (nc, w_pairs, moran_i). */
  def moranI(cells: DataFrame): DataFrame = {
    val cnt = graft.CacheBin.persist(
      cells.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n")))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1
                              if dx != 0 || dy != 0)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val pairs = cnt.select(col("cx").as("scx"), col("cy").as("scy"),
        col("n").as("ni"), explode(offsets).as("o"))
      .select((col("scx") + col("o.dx")).as("cx"),
        (col("scy") + col("o.dy")).as("cy"), col("ni"))
      .join(cnt, Seq("cx", "cy")) // keeps occupied neighbors; n = n_j
      .agg(sum(col("ni") * col("n")).as("p"),
        sum(col("ni") + col("n")).as("sp"), count(lit(1)).as("w"))
    val g = cnt.agg(sum(col("n")).as("t"), count(lit(1)).as("nc"),
      sum(col("n") * col("n")).as("q"))
    val mu = col("t").cast("double") / col("nc")
    pairs.crossJoin(g)
      .select(col("nc"), col("w").as("w_pairs"),
        round((col("nc") / (col("w") * lit(1.0))) *
          (col("p") - mu * col("sp") + mu * mu * col("w")) /
          (col("q") - lit(2.0) * mu * col("t") + col("nc") * mu * mu), 6)
          .as("moran_i"))
  }

  /** LISA — Anselin's LOCAL Moran's I (Anselin 1995) per occupied cell,
    * binary queen weights (8 neighbors, self excluded):
    *   I_i = (n_i − μ) · Σ_{j∈N(i)} (n_j − μ) / m2,   m2 = Σ(n−μ)²/nc
    * The neighbor sum expands to wsum_i − k_i·μ (wsum/k exact integer
    * aggregates from the same 8-offset donate join as [[giStar]]); m2
    * expands as in [[moranI]]. Quadrant classification (HH/LL/HL/LH hot,
    * cold, high-outlier, low-outlier) uses the INTEGER-EXACT signs
    * sign(n·nc − T) and sign(wsum·nc − k·T) — no fp comparison crosses the
    * engine boundary; an isolated cell (k = 0) or an on-the-mean value
    * classifies 'NS'. Same corpus→cell cardinality collapse as giStar. */
  def lisa(cells: DataFrame): DataFrame = {
    val cnt = graft.CacheBin.persist(
      cells.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n")))
    val g = cnt.agg(sum(col("n")).as("t"), count(lit(1)).as("nc"),
      sum(col("n") * col("n")).as("q"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1
                              if dx != 0 || dy != 0)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val w = cnt.select(col("cx").as("scx"), col("cy").as("scy"), col("n"),
        explode(offsets).as("o"))
      .groupBy((col("scx") + col("o.dx")).as("cx"),
        (col("scy") + col("o.dy")).as("cy"))
      .agg(sum(col("n")).as("wsum0"), count(lit(1)).as("k0"))
    val mu = col("t").cast("double") / col("nc")
    val m2 = (col("q") - lit(2.0) * mu * col("t") + col("nc") * mu * mu) /
      col("nc")
    val zs = col("n") * col("nc") - col("t")
    val ls = col("wsum") * col("nc") - col("k") * col("t")
    cnt.join(w, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), col("n"),
        coalesce(col("k0"), lit(0L)).as("k"),
        coalesce(col("wsum0"), lit(0L)).as("wsum"))
      .crossJoin(broadcast(g))
      .select(col("cx"), col("cy"), col("n"), col("k"), col("wsum"),
        round((col("n") - mu) * (col("wsum") - col("k") * mu) / m2, 6)
          .as("lisa"),
        when(zs > 0 && ls > 0, "HH").when(zs < 0 && ls < 0, "LL")
          .when(zs > 0 && ls < 0, "HL").when(zs < 0 && ls > 0, "LH")
          .otherwise("NS").as("quad"))
  }
}
