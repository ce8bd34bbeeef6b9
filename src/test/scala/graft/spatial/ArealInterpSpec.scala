package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.Pt

/** Areal interpolation (area-weighted reaggregation): engine output equals
  * an independent closed-form interval-overlap replica on the rect zones,
  * conserves each zone's mass, and handles a CONCAVE zone through the same
  * generic kernel. */
class ArealInterpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val grid = CellGrid(10.0, origin = 0.0, rowWidth = 1000L)

  /** Independent JVM replica: closed-form rectangle∩cell shares. */
  private def rectShares(x0: Long, y0: Long, w: Long, h: Long, v: Double)
      : Map[Long, Double] =
    (for {
      gx <- x0 / 10 to (x0 + w) / 10
      gy <- y0 / 10 to (y0 + h) / 10
      ox = math.min(x0 + w, gx * 10 + 10) - math.max(x0, gx * 10)
      oy = math.min(y0 + h, gy * 10 + 10) - math.max(y0, gy * 10)
      if ox > 0 && oy > 0
    } yield (gy * 1000 + gx, v * ox * oy / (w * h).toDouble))
      .groupMapReduce(_._1)(_._2)(_ + _)

  test("engine equals the closed-form replica on the oracle zones") {
    val got = Interpolate.arealReaggregate(
        spark.createDataset(SynthGeo.arealZones), grid)
      .as[(Long, Double)].collect().toMap
    val want = SynthGeo.arealZoneParams
      .flatMap { case (_, x0, y0, w, h, v) => rectShares(x0, y0, w, h, v.toDouble) }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .map { case (c, s) => c -> BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got.keySet === want.keySet)
    for ((c, s) <- want) assert(math.abs(got(c) - s) < 1e-9, s"cell $c")
  }

  test("mass conservation: cell values sum to the zone-value total") {
    val total = Interpolate.arealReaggregate(
        spark.createDataset(SynthGeo.arealZones), grid)
      .agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    val want = SynthGeo.arealZoneParams.map(_._6).sum.toDouble
    assert(math.abs(total - want) < 1e-3, s"$total vs $want")
  }

  test("concave L-zone: generic kernel splits mass exactly over both arms") {
    // L = (5,5)-(25,15) horizontal arm ∪ (5,15)-(15,35) vertical arm;
    // area 200 + 200 = 400 = 2^4·5^2, v = 4
    val ring = Array(Pt(5, 5), Pt(25, 5), Pt(25, 15), Pt(15, 15),
      Pt(15, 35), Pt(5, 35))
    val got = Interpolate.arealReaggregate(
        spark.createDataset(Seq((0L, ring, 4.0))), grid)
      .as[(Long, Double)].collect().toMap
    val want = (rectShares(5, 5, 20, 10, 4.0 * 200 / 400).toSeq ++
        rectShares(5, 15, 10, 20, 4.0 * 200 / 400).toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
      .map { case (c, s) => c -> BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got.keySet === want.keySet)
    for ((c, s) <- want) assert(math.abs(got(c) - s) < 1e-9, s"cell $c")
    assert(math.abs(got.values.sum - 4.0) < 1e-4)
  }
}
