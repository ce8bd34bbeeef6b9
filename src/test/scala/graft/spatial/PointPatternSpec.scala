package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Ripley's K/L: closed-form pair counts on a hand fixture, cross-cell pair
  * capture at r_max, partitioning invariance. */
class PointPatternSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hand fixture: exact ordered pair counts and closed-form K/L") {
    import spark.implicits._
    // d(1,2)=0.3, d(1,3)=1.0, d(2,3)=0.7; point 4 isolated
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.3, 0.0), (3L, 1.0, 0.0),
      (4L, 5.0, 5.0)).toDF("id", "x", "y")
    val out = PointPattern.ripleyK(pts, Seq(0.5, 1.5), area = 100.0)
      .as[(Double, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def kl(pairs: Long) = {
      val kRaw = 100.0 * pairs / (4L * (4L - 1.0))
      (BigDecimal(kRaw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.sqrt(kRaw / math.Pi))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val (k05, l05) = kl(2L)   // (1,2) both orders
    val (k15, l15) = kl(6L)   // all three close pairs, both orders
    assert(out(0.5) === ((0.5, 2L, 4L, k05, l05)))
    assert(out(1.5) === ((1.5, 6L, 4L, k15, l15)))
  }

  test("pairs straddling r_max-cell boundaries are counted; partitioning-invariant") {
    import spark.implicits._
    // r_max = 1.0 grid: (0.95, 0) and (1.05, 0) sit in different cells
    val pts = Seq((1L, 0.95, 0.0), (2L, 1.05, 0.0)).toDF("id", "x", "y")
    val a = PointPattern.ripleyK(pts.repartition(1), Seq(0.2, 1.0), 10.0)
      .as[(Double, Long, Long, Double, Double)].collect().toSet
    val b = PointPattern.ripleyK(pts.repartition(5), Seq(0.2, 1.0), 10.0)
      .as[(Double, Long, Long, Double, Double)].collect().toSet
    assert(a === b)
    assert(a.map(r => (r._1, r._2)) === Set((0.2, 2L), (1.0, 2L)))
  }

  test("radii validation rejects unsorted or non-positive ladders") {
    import spark.implicits._
    val pts = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      PointPattern.ripleyK(pts, Seq(1.0, 0.5), 1.0)
    }
    intercept[IllegalArgumentException] {
      PointPattern.ripleyK(pts, Seq.empty, 1.0)
    }
  }
}
