package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Getis–Ord Gi* on a hand-computed fixture: occupied frame = 3 cells
  * (counts 4, 1, 1), mean 2, variance 2. The adjacent pair shares a
  * neighborhood (wsum 5, k 2); the isolated cell is self-only (wsum 1,
  * k 1). Closed forms: gi(adjacent) = 1/√2, gi(isolated) = −1/√2. */
class HotspotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hand-computed Gi* values on a 3-cell frame") {
    import spark.implicits._
    val cells = (Seq.fill(4)((0L, 0L)) ++ Seq((1L, 0L), (5L, 5L)))
      .toDF("cx", "cy")
    val out = Hotspot.giStar(cells)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    graft.CacheBin.drain()
    assert(out((0L, 0L)) === ((4L, 2L, 5L, 0.707107)))
    assert(out((1L, 0L)) === ((1L, 2L, 5L, 0.707107)))
    assert(out((5L, 5L)) === ((1L, 1L, 1L, -0.707107)))
  }

  test("Moran's I closed form: adjacent high/low pair on a 3-cell frame = -1") {
    import spark.implicits._
    // counts 4,1,1; adjacency only (0,0)<->(1,0): W=2, P=8, S=10, T=6,
    // nc=3, Q=18, mu=2 -> I = (3/2)*(8-20+8)/(18-24+12) = -1.0
    val cells = (Seq.fill(4)((0L, 0L)) ++ Seq((1L, 0L), (5L, 5L)))
      .toDF("cx", "cy")
    val out = Hotspot.moranI(cells).as[(Long, Long, Double)].collect()
    graft.CacheBin.drain()
    assert(out.toSeq === Seq((3L, 2L, -1.0)))
  }

  test("LISA closed form: HL/LH pair + isolated NS on the 3-cell frame") {
    import spark.implicits._
    // counts 4,1,1; mu=2, m2=2. (0,0): z=2, lag-sum=1-2=-1 -> lisa=-1, HL;
    // (1,0): z=-1, lag-sum=4-2=2 -> lisa=-1, LH; (5,5): isolated -> 0, NS.
    val cells = (Seq.fill(4)((0L, 0L)) ++ Seq((1L, 0L), (5L, 5L)))
      .toDF("cx", "cy")
    val out = Hotspot.lisa(cells)
      .as[(Long, Long, Long, Long, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    graft.CacheBin.drain()
    assert(out((0L, 0L)) === ((0L, 0L, 4L, 1L, 1L, -1.0, "HL")))
    assert(out((1L, 0L)) === ((1L, 0L, 1L, 1L, 4L, -1.0, "LH")))
    val iso = out((5L, 5L))
    assert(iso._4 === 0L && iso._5 === 0L && iso._6 == 0.0 && iso._7 === "NS")
  }

  test("result is invariant to input partitioning") {
    import spark.implicits._
    val pts = (0L until 500L).map(i => (i % 7, (i * 3) % 5)).toDF("cx", "cy")
    val a = Hotspot.giStar(pts.repartition(1))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    graft.CacheBin.drain()
    val b = Hotspot.giStar(pts.repartition(13))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    graft.CacheBin.drain()
    assert(a === b)
    assert(a.size === 35) // full 7×5 occupied frame
  }
}
