package graft.clean

import org.scalatest.funsuite.AnyFunSuite
import graft.geom.{Geom, Pt}

class CleanSpec extends AnyFunSuite {
  val square: Geom.Ring = Array(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10))

  test("mergeCloseVertices removes near-duplicates incl. the ring-closing one") {
    val noisy: Geom.Ring = Array(
      Pt(0, 0), Pt(0.005, 0.0), Pt(10, 0), Pt(10, 10), Pt(0, 10), Pt(0.001, 9.995))
    val merged = PolygonClean.mergeCloseVertices(noisy)
    assert(merged.length === 4)
    assert(merged.head == Pt(0, 0))
  }

  test("simplifyRing drops straight midpoints, keeps corners") {
    val withMids: Geom.Ring = Array(
      Pt(0, 0), Pt(5, 0), Pt(10, 0), Pt(10, 5), Pt(10, 10), Pt(5, 10), Pt(0, 10), Pt(0, 5))
    val out = PolygonClean.simplifyRing(withMids)
    assert(out.toSet === square.toSet)
  }

  test("simplifyRing keeps slightly-bent vertices beyond thresholds") {
    // vertex offset 0.5 from the chord: cath 0.5 > 0.02 and angle well off 180
    val bent: Geom.Ring = Array(Pt(0, 0), Pt(5, 0.5), Pt(10, 0), Pt(10, 10), Pt(0, 10))
    assert(PolygonClean.simplifyRing(bent).length === 5)
  }

  test("removeSpikes deletes a needle spike") {
    val spiky: Geom.Ring = Array(
      Pt(0, 0), Pt(5, 0), Pt(5.01, 4.0), Pt(5.02, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10))
    val out = PolygonClean.removeSpikes(spiky)
    // the needle tip (x≈5, y=4) must be gone; the square's own corners stay
    assert(!out.exists(p => p.y > 3.0 && p.x > 4.0 && p.x < 6.0),
      s"spike survived: ${out.mkString(",")}")
  }

  test("cleanMultiPolygon drops sub-minArea rings") {
    val tiny: Geom.Ring = Array(Pt(0, 0), Pt(0.1, 0), Pt(0.1, 0.1), Pt(0, 0.1)) // 0.01 m2
    val mp: Geom.MultiPolygon = Array(Array(square), Array(tiny))
    val out = PolygonClean.cleanMultiPolygon(mp)
    assert(out.length === 1)
    assert(math.abs(Geom.area(out) - 100.0) < 1e-9)
  }

  test("cleanup is idempotent (second run is a no-op)") {
    val noisy: Geom.Ring = Array(
      Pt(0, 0), Pt(0.005, 0.0), Pt(5, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10))
    val once = PolygonClean.simplifyRing(
      PolygonClean.removeSpikes(PolygonClean.mergeCloseVertices(noisy)))
    val twice = PolygonClean.simplifyRing(
      PolygonClean.removeSpikes(PolygonClean.mergeCloseVertices(once)))
    assert(once.toSeq === twice.toSeq)
  }

  test("explodeParts splits multipolygons") {
    val mp: Geom.MultiPolygon = Array(Array(square), Array(square.map(p => Pt(p.x + 20, p.y))))
    assert(PolygonClean.explodeParts(mp).length === 2)
  }
}
