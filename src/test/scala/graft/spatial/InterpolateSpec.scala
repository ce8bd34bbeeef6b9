package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** IDW interpolation: hand-computed weights, the exact-hit cap, the
  * radius drop rule, and cross-cell probe completeness. */
class InterpolateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 1000000000000L

  private def run(pts: Seq[(Long, Long, Long)],
      sites: Seq[(Long, Long, Long, Long)],
      cell: Long = 20000L, r: Long = 20000L)
      : Map[Long, (Long, Double)] =
    Interpolate.idwMilli(
        pts.toDF("id", "pxm", "pym"),
        sites.toDF("site_id", "sxm", "sym", "v"), cell, r)
      .as[(Long, Long, Double)].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap

  test("hand-computed two-site weighting") {
    // point at origin; sites at d2 = 100^2 (v=10) and 200^2 (v=40):
    // w1 = W/10000, w2 = W/40000 -> idw = (w1*10 + w2*40)/(w1+w2) = 16.0
    val got = run(
      Seq((1L, 0L, 0L)),
      Seq((1L, 100L, 0L, 10L), (2L, 0L, 200L, 40L)))
    assert(got(1L) == ((2L, 16.0)))
  }

  test("exact hit takes the capped weight, not a pole") {
    // site ON the point (v=100) plus one at distance 1000 (v=0):
    // w_hit = W, w_far = W/10^6 -> idw ~= 100 * (1/(1+1e-6))
    val got = run(
      Seq((1L, 5L, 5L)),
      Seq((1L, 5L, 5L, 100L), (2L, 1005L, 5L, 0L)))
    val (n, v) = got(1L)
    assert(n == 2 && math.abs(v - 100.0) < 0.001 && v < 100.0)
  }

  test("points with no site inside the radius drop; boundary is inclusive") {
    val got = run(
      Seq((1L, 0L, 0L), (2L, 50000L, 50000L)),
      Seq((1L, 20000L, 0L, 7L))) // exactly at radius from point 1
    assert(got.keySet == Set(1L))
    assert(got(1L) == ((1L, 7.0)))
  }

  test("3x3 probe finds sites across cell boundaries") {
    // point near a cell corner; site in the diagonal neighbor cell
    val got = run(
      Seq((1L, 19999L, 19999L)),
      Seq((1L, 20001L, 20001L, 42L)))
    assert(got(1L) == ((1L, 42.0)))
  }
}
