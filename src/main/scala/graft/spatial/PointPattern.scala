package graft.spatial

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-pattern statistics — Ripley's K / L functions (Ripley 1977), the
  * standard multi-scale clumping test that complements the engine's
  * single-scale spatial stats (Gi*, Moran/LISA, DBSCAN): K(r) compared to
  * the Poisson expectation πr² says AT WHICH RADII geotagged pages
  * aggregate beyond chance.
  *
  * Plan shape at 10^12 points: ONE candidate equi-join on r_max-grid cells
  * (the DBSCAN 3×3 replication trick — each ordered pair within r_max
  * appears exactly once) feeds ALL radii: the per-radius pair counts are
  * conditional sums in a single map-side-combined aggregate, so the radius
  * ladder costs one shuffle total, not one per radius. Pair counts are
  * exact 64-bit integers; the K/L normalization is one closed form per
  * radius from (pairs, n, area) — cross-engine bit-stable.
  *
  * Naive (no edge-correction) estimator K̂(r) = A·Σ_{i≠j}1(d_ij≤r)/(n(n−1));
  * at web-corpus extents the boundary band is a vanishing fraction of the
  * domain, which is the regime the uncorrected estimator is exact for.
  */
object PointPattern {

  /** @param points (id: long, x: double, y: double)
    * @param radii  strictly positive, ascending; r_max sets the grid
    * @param area   study-area measure A for the normalization
    * @return one row per radius: (r, pairs, n, k, l) — l(r) = √(K/π),
    *         linear under CSR so deviations read directly. */
  def ripleyK(points: DataFrame, radii: Seq[Double], area: Double): DataFrame = {
    require(radii.nonEmpty && radii.forall(_ > 0) && radii == radii.sorted,
      s"radii must be positive ascending: $radii")
    val rmax = radii.last
    val cx = floor(col("x") / lit(rmax)).cast("long")
    val cy = floor(col("y") / lit(rmax)).cast("long")
    val home = points.select(col("id").as("ib"), col("x").as("bx"),
      col("y").as("by"), cx.as("cx"), cy.as("cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probe = points
      .select(col("id").as("ia"), col("x").as("ax"), col("y").as("ay"),
        cx.as("pcx"), cy.as("pcy"), explode(offsets).as("o"))
      .select(col("ia"), col("ax"), col("ay"),
        (col("pcx") + col("o.dx")).as("cx"), (col("pcy") + col("o.dy")).as("cy"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    val cnts = radii.zipWithIndex.map { case (r, i) =>
      sum(when(d2 <= lit(r * r), 1L).otherwise(0L)).as(s"c$i")
    }
    val pairRow = probe.join(home, Seq("cx", "cy"))
      .where(col("ia") =!= col("ib"))
      .agg(cnts.head, cnts.tail: _*)
    val g = points.agg(count(lit(1)).as("n"))
    val stacked = pairRow.crossJoin(g)
      .select(explode(array(radii.zipWithIndex.map { case (r, i) =>
          struct(lit(r).as("r"), col(s"c$i").as("pairs"))
        }: _*)).as("s"), col("n"))
    val kRaw = lit(area) * col("s.pairs") /
      (col("n") * (col("n") - lit(1.0)))
    stacked.select(col("s.r").as("r"), col("s.pairs").as("pairs"), col("n"),
      round(kRaw, 6).as("k"),
      round(sqrt(kRaw / lit(math.Pi)), 6).as("l"))
  }
}
