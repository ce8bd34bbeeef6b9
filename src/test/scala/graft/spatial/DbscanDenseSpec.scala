package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Dense-cell contraction DBSCAN must be ROW-IDENTICAL to the baseline
  * grid-bucketed dbscan — the contraction is an exact plan rewrite, not an
  * approximation. Checked on the hand fixture, a hotspot-skewed cloud (the
  * regime the contraction exists for), a uniform supercritical cloud, and
  * across partitionings. */
class DbscanDenseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def both(pts: org.apache.spark.sql.DataFrame, eps: Double,
      minPts: Int): (Set[(Long, String, Long)], Set[(Long, String, Long)]) = {
    import spark.implicits._
    val a = Dbscan.dbscan(pts, eps, minPts)
      .as[(Long, String, Long)].collect().toSet
    graft.CacheBin.drain()
    val b = Dbscan.dbscanDense(pts, eps, minPts)
      .as[(Long, String, Long)].collect().toSet
    graft.CacheBin.drain()
    // the contraction machinery itself must ALSO match, even on clouds the
    // cost-model dispatch would route to the plain plan
    val c = Dbscan.dbscanDense(pts, eps, minPts, forceContraction = true)
      .as[(Long, String, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(c === a)
    (a, b)
  }

  test("identical to dbscan on the hand fixture (roles + labels)") {
    import spark.implicits._
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5),
      (4L, 1.4, 0.0),
      (5L, 10.0, 10.0), (6L, 10.5, 10.0),
      (7L, 20.0, 20.0)).toDF("id", "x", "y")
    val (a, b) = both(pts, eps = 1.0, minPts = 3)
    assert(b === a)
    assert(b === Set(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (4L, "border", 1L),
      (5L, "noise", -1L), (6L, "noise", -1L), (7L, "noise", -1L)))
  }

  test("identical on a hotspot-skewed cloud (dense supernodes + sparse fringe)") {
    import spark.implicits._
    // 3 city hotspots of 60 points inside one s-cell each, a thin bridge
    // of sparse points linking hotspots 1-2, isolated fringe + noise
    val hot = for {
      (hx, hy, base) <- Seq((0.0, 0.0, 100L), (3.0, 0.0, 300L), (50.0, 50.0, 500L))
      i <- 0 until 60
    } yield (base + i, hx + (i % 8) * 0.02, hy + (i / 8) * 0.02)
    val bridge = (0 until 10).map(i => (900L + i, 0.3 + i * 0.27, 0.07))
    val fringe = Seq((980L, 70.0, 70.0), (981L, 70.4, 70.0), (990L, 90.0, 90.0))
    val pts = (hot ++ bridge ++ fringe).toDF("id", "x", "y")
    val (a, b) = both(pts, eps = 0.5, minPts = 5)
    assert(b === a)
    // sanity: bridge points have |N|=3 < minPts so the hotspots stay three
    // separate clusters; bridge ends within eps of a hotspot become border
    val labels = a.filter(_._2 == "core").map(_._3)
    assert(labels === Set(100L, 300L, 500L))
    assert(a.contains((902L, "border", 100L)) && a.contains((908L, "border", 300L)))
  }

  test("identical on a uniform supercritical cloud, invariant to partitioning") {
    import spark.implicits._
    val pts = spark.range(0L, 3000L, 1L, 4).select(
      col("id"),
      (pmod(xxhash64(col("id")), lit(100000L)) / 2000.0).as("x"),
      (pmod(xxhash64(col("id"), lit(1L)), lit(100000L)) / 2000.0).as("y"))
    val (a, b) = both(pts, eps = 0.7, minPts = 4)
    assert(b === a)
    import spark.implicits._
    val c = Dbscan.dbscanDense(pts.repartition(13), eps = 0.7, minPts = 4)
      .as[(Long, String, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(c === b)
    assert(a.exists(_._2 == "core") && a.exists(_._2 == "noise"))
  }

  test("pairVolumeEstimates matches brute-force cell-pair volumes") {
    import spark.implicits._
    val eps = 1.0; val minPts = 3; val s = eps / 1.5
    // a dense clump (5 points in one s-cell), a sparse neighborhood, and
    // a far singleton — exercises every estimator term
    val pts = (Seq(
      (1L, 0.1, 0.1), (2L, 0.2, 0.1), (3L, 0.3, 0.2), (4L, 0.15, 0.3),
      (5L, 0.25, 0.25),
      (10L, 0.9, 0.1), (11L, 1.5, 0.4), (12L, 0.8, 1.2),
      (20L, 7.0, 7.0))).toDF("id", "x", "y")
    val combo = pts.groupBy(
      floor(col("x") / lit(s)).cast("long").as("cx"),
      floor(col("y") / lit(s)).cast("long").as("cy"),
      floor(col("x") / lit(eps)).cast("long").as("ex"),
      floor(col("y") / lit(eps)).cast("long").as("ey"))
      .agg(count(lit(1)).as("m"), min(col("id")).as("snid"))
    val (de, pe) = Dbscan.pairVolumeEstimates(combo, minPts)
    graft.CacheBin.drain()
    // brute force over the same grids
    val raw = pts.as[(Long, Double, Double)].collect()
    def cellsOf(side: Double) = raw
      .groupBy { case (_, x, y) =>
        (math.floor(x / side).toLong, math.floor(y / side).toLong) }
      .map { case (k, v) => k -> v.length.toLong }
    val sc = cellsOf(s); val ec = cellsOf(eps)
    val dense = sc.filter(_._2 >= minPts).keySet
    val cheb2 = for { dx <- -2L to 2L; dy <- -2L to 2L } yield (dx, dy)
    val fwd12 = cheb2.filter { case (dx, dy) => dx > 0 || (dx == 0 && dy > 0) }
    val fwd5 = Seq((0L, 0L), (0L, 1L), (1L, -1L), (1L, 0L), (1L, 1L))
    def at(m: Map[(Long, Long), Long], c: (Long, Long), d: (Long, Long)) =
      m.getOrElse((c._1 + d._1, c._2 + d._2), 0L)
    val deBrute = BigInt(sc.collect { case (c, m) if !dense(c) =>
        m * cheb2.map(at(sc, c, _)).sum }.sum) +
      BigInt(sc.collect { case (c, m) if dense(c) =>
        m * fwd12.filter(d => dense((c._1 + d._1, c._2 + d._2)))
          .map(at(sc, c, _)).sum }.sum)
    val peBrute = BigInt(ec.map { case (c, m) =>
      m * fwd5.map(at(ec, c, _)).sum }.sum)
    assert(BigInt(de.toBigInteger) === deBrute)
    assert(BigInt(pe.toBigInteger) === peBrute)
  }

  test("cost dispatch directionality: contraction on hotspot skew, plain grid on sparse uniform") {
    import spark.implicits._
    val eps = 0.5; val minPts = 5; val s = eps / 1.5
    def comboOf(pts: org.apache.spark.sql.DataFrame) = pts.groupBy(
      floor(col("x") / lit(s)).cast("long").as("cx"),
      floor(col("y") / lit(s)).cast("long").as("cy"),
      floor(col("x") / lit(eps)).cast("long").as("ex"),
      floor(col("y") / lit(eps)).cast("long").as("ey"))
      .agg(count(lit(1)).as("m"), min(col("id")).as("snid"))
    // the hotspot cloud from the equality test: 3 tight 60-point clumps —
    // the plain plan's estimate carries their intra-cell 60² mass, the
    // contraction's does not → dense must be estimated cheaper
    val hot = (for {
      (hx, hy, base) <- Seq((0.0, 0.0, 100L), (3.0, 0.0, 300L), (50.0, 50.0, 500L))
      i <- 0 until 60
    } yield (base + i, hx + (i % 8) * 0.02, hy + (i / 8) * 0.02)).toDF("id", "x", "y")
    val (deHot, peHot) = Dbscan.pairVolumeEstimates(comboOf(hot), minPts)
    graft.CacheBin.drain()
    assert(deHot.compareTo(peHot) < 0)
    // a spread-out cloud with no dense cell: the 25-cell s-window strictly
    // dominates the 3×3 ε-window → plain must be estimated cheaper
    val sparse = (0 until 40).map(i => (i.toLong, (i % 8) * 0.9, (i / 8) * 0.9))
      .toDF("id", "x", "y")
    val (deSp, peSp) = Dbscan.pairVolumeEstimates(comboOf(sparse), minPts)
    graft.CacheBin.drain()
    assert(peSp.compareTo(deSp) < 0)
  }

  test("cell-boundary pairs at Chebyshev distance 2 in the s-grid are found") {
    import spark.implicits._
    // eps=1.0, s=2/3: points 0.99 apart on one axis land 2 s-cells apart
    // (x=0.655 -> cell 0, x=1.645 -> cell 2); a third makes them core
    val pts = Seq((1L, 0.655, 0.0), (2L, 1.645, 0.0), (3L, 1.15, 0.05))
      .toDF("id", "x", "y")
    val (a, b) = both(pts, eps = 1.0, minPts = 3)
    assert(b === a)
    assert(b === Set((1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L)))
  }
}
