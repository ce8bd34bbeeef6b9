package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.{Geom, Pt}

/** Specs for the round-2 gap closers: boundary.search_municipality's
  * area-ratio/fuzzy-name selection, export_fixmes' centroid GeoJSON, and
  * difference()'s loud edge-snapped subtraction. */
class BoundarySpec extends AnyFunSuite {
  import Boundary._

  def sq(x0: Double, y0: Double, s: Double): Geom.MultiPolygon =
    Array(Array(Array(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s), Pt(x0, y0 + s))))

  test("area-ratio winner above 0.9 is picked (boundary.py:104-124)") {
    val mun = sq(0, 0, 10)
    val cands = Seq(
      Candidate("1", "Almost", sq(0.2, 0.2, 10)),   // ratio ~0.96 of own area
      Candidate("2", "Half", sq(5, 0, 10)),          // ratio 0.5
      Candidate("3", "Elsewhere", sq(100, 100, 10))) // 0
    assert(searchMunicipality(cands, Some(mun), "whatever") === Some(("1", "Almost")))
  }

  test("no candidate above 0.9 -> dsmatch fuzzy-name fallback (boundary.py:125-135)") {
    val mun = sq(0, 0, 10)
    val cands = Seq(
      Candidate("2", "Santa Cruz de Tenerife", sq(5, 0, 10)),
      Candidate("3", "San Cristobal de La Laguna", sq(100, 100, 10)))
    val got = searchMunicipality(cands, Some(mun), "SANTA CRUZ DE TENERIFE")
    assert(got === Some(("2", "Santa Cruz de Tenerife")))
  }

  test("no municipality polygon -> straight to the fuzzy fallback") {
    val cands = Seq(
      Candidate("a", "Madrid", sq(0, 0, 1)),
      Candidate("b", "Las Rozas de Madrid", sq(2, 2, 1)))
    assert(searchMunicipality(cands, None, "MADRID") === Some(("a", "Madrid")))
  }
}

class FixmeExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("export_fixmes: centroid points with fixme property, empties dropped") {
    import spark.implicits._
    def sq(x0: Double, y0: Double) = Array(Array(Array(
      Pt(x0, y0), Pt(x0 + 2, y0), Pt(x0 + 2, y0 + 2), Pt(x0, y0 + 2))))
    val feats = spark.createDataset(Seq(
      ("This part is bigger than its building", sq(0, 0)),
      ("", sq(10, 10)),
      (null.asInstanceOf[String], sq(20, 20))))
    val rows = graft.sources.CsvGeoJson.fixmesToGeoJson(feats)
      .as[String].collect()
    assert(rows.length === 1)
    assert(rows.head.contains("\"fixme\":\"This part is bigger than its building\""))
    assert(rows.head.contains("\"coordinates\":[1.0,1.0]"))
    assert(rows.head.contains("\"type\":\"Point\""))
  }
}

class DifferenceSpec extends AnyFunSuite {
  def sq(x0: Double, y0: Double, s: Double): Array[Array[Pt]] =
    Array(Array(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s), Pt(x0, y0 + s)))

  test("edge-snapped subtraction: corner cell removed -> L-shape, area conserved") {
    // A = 2x2 of unit cells; subtract the (1,1) cell -> L of area 3
    val a: Geom.MultiPolygon = Array(
      Array(Array(Pt(0, 0), Pt(2, 0), Pt(2, 2), Pt(0, 2))))
    val b: Geom.MultiPolygon = Array(
      Array(Array(Pt(1, 1), Pt(2, 1), Pt(2, 2), Pt(1, 2))))
    // snap: A's ring must contain b's boundary vertices on its edges — build
    // the snapped A explicitly (topology pass output shape)
    val aSnapped: Geom.MultiPolygon = Array(Array(Array(
      Pt(0, 0), Pt(2, 0), Pt(2, 1), Pt(2, 2), Pt(1, 2), Pt(0, 2))))
    val out = ParcelOps.differenceSnapped(aSnapped, Seq(b))
    assert(out.length === 1)
    val area = out.map(p => Geom.ringArea(p.head)).sum
    assert(math.abs(area - 3.0) < 1e-12, s"area $area")
  }

  test("interior subtraction creates a hole") {
    val a: Geom.MultiPolygon = Array(
      Array(Array(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4))))
    val hole: Geom.MultiPolygon = Array(
      Array(Array(Pt(1, 1), Pt(2, 1), Pt(2, 2), Pt(1, 2))))
    val out = ParcelOps.differenceSnapped(a, Seq(hole))
    assert(out.length === 1)
    assert(out.head.length === 2, "outer + hole ring")
    val area = Geom.ringArea(out.head.head) - Geom.ringArea(out.head(1))
    assert(math.abs(area - 15.0) < 1e-12)
  }

  test("reference golden: test_difference (test_polygon.py:106-188) via convex decomposition") {
    import graft.TestSpark
    val spark = TestSpark.spark
    import spark.implicits._
    def rect(x0: Double, y0: Double, x1: Double, y1: Double): Array[Pt] =
      Array(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1))
    val g1 = rect(10, 10, 20, 20)
    val g2 = rect(30, 10, 40, 20)
    val h1 = rect(14, 14, 16, 16)   // interior of g1 -> hole
    val h2 = rect(20, 10, 30, 20)   // touches g1/g2 boundaries only
    val h3 = rect(38, 10, 42, 20)   // clips g2's right strip
    val h4 = rect(30, 30, 40, 40)   // disjoint
    val features = spark.createDataset(Seq(
      (1L, Array(Array(g1)): Geom.MultiPolygon),
      (2L, Array(Array(g2)): Geom.MultiPolygon)))
    val out = ParcelOps.differenceLayer(features, Seq(h1, h2, h3, h4))
      .collect().toMap
    assert(out.size === 2) // featureCount stays 2, like the reference
    def areaOf(mp: Geom.MultiPolygon): Double =
      mp.map(p => Geom.ringArea(p.head) - p.tail.map(Geom.ringArea).sum).sum
    // f1 == g1.difference(h1): area 100 - 4 = 96
    assert(math.abs(areaOf(out(1L)) - 96.0) < 1e-9, s"f1 area ${areaOf(out(1L))}")
    // f2 == g2.difference(h3): area 100 - 20 = 80
    assert(math.abs(areaOf(out(2L)) - 80.0) < 1e-9, s"f2 area ${areaOf(out(2L))}")
    // sampled point-in-polygon agreement with the analytic difference
    def inMp(p: Pt, mp: Geom.MultiPolygon) = Geom.pointInMultiPolygon(p, mp)
    for (x <- BigDecimal(10.25) to BigDecimal(19.75) by 0.5;
         y <- BigDecimal(10.25) to BigDecimal(19.75) by 0.5) {
      val p = Pt(x.toDouble, y.toDouble)
      val expected = !(p.x > 14 && p.x < 16 && p.y > 14 && p.y < 16)
      assert(inMp(p, out(1L)) === expected, s"f1 sample $p")
    }
    for (x <- BigDecimal(30.25) to BigDecimal(39.75) by 0.5;
         y <- BigDecimal(10.25) to BigDecimal(19.75) by 0.5) {
      val p = Pt(x.toDouble, y.toDouble)
      val expected = p.x < 38
      assert(inMp(p, out(2L)) === expected, s"f2 sample $p")
    }
  }

  test("non-snapped input FAILS LOUDLY instead of returning a wrong shape") {
    val a: Geom.MultiPolygon = Array(
      Array(Array(Pt(0, 0), Pt(2, 0), Pt(2, 2), Pt(0, 2))))
    // overlapping but not edge-snapped (vertices not on A's ring)
    val b: Geom.MultiPolygon = Array(
      Array(Array(Pt(1.5, 1.5), Pt(3, 1.5), Pt(3, 3), Pt(1.5, 3))))
    val e = intercept[IllegalArgumentException] {
      ParcelOps.differenceSnapped(a, Seq(b))
    }
    assert(e.getMessage.contains("not edge-snapped"))
  }
}
