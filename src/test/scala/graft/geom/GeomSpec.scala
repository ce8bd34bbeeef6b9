package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {
  val unitSquare: Geom.Ring = Array(Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1))

  test("shoelace signed area: CCW positive, CW negative") {
    assert(Geom.signedArea(unitSquare) === 1.0)
    assert(Geom.signedArea(unitSquare.reverse) === -1.0)
  }

  test("polygon area subtracts holes") {
    val hole: Geom.Ring = Array(Pt(0.25, 0.25), Pt(0.75, 0.25), Pt(0.75, 0.75), Pt(0.25, 0.75))
    assert(math.abs(Geom.polyArea(Array(unitSquare, hole)) - 0.75) < 1e-12)
  }

  test("ray-casting PIP: inside / outside / hole") {
    val hole: Geom.Ring = Array(Pt(0.4, 0.4), Pt(0.6, 0.4), Pt(0.6, 0.6), Pt(0.4, 0.6))
    val poly: Geom.Polygon = Array(unitSquare, hole)
    assert(Geom.pointInPolygon(Pt(0.1, 0.1), poly))
    assert(!Geom.pointInPolygon(Pt(1.5, 0.5), poly))
    assert(!Geom.pointInPolygon(Pt(0.5, 0.5), poly)) // inside the hole
    assert(Geom.pointInMultiPolygon(Pt(0.2, 0.8), Array(poly)))
  }

  test("PIP on a diamond matches the |dx|+|dy| < r rule strictly inside") {
    val (cx, cy, r) = (10.0, 20.0, 5.0)
    val d: Geom.Ring = Array(Pt(cx + r, cy), Pt(cx, cy + r), Pt(cx - r, cy), Pt(cx, cy - r))
    for (x <- BigDecimal(5.2) to BigDecimal(14.8) by 0.4; y <- BigDecimal(15.2) to BigDecimal(24.8) by 0.4) {
      val (xd, yd) = (x.toDouble, y.toDouble)
      val expect = math.abs(xd - cx) + math.abs(yd - cy) < r - 1e-9
      val nearEdge = math.abs(math.abs(xd - cx) + math.abs(yd - cy) - r) < 1e-9
      if (!nearEdge)
        assert(Geom.pointInRing(Pt(xd, yd), d) === expect, s"at ($xd,$yd)")
    }
  }

  test("closestSegment projects onto the nearest edge") {
    val mp: Geom.MultiPolygon = Array(Array(unitSquare))
    val (d2, proj, _, _, si) = Geom.closestSegment(Pt(0.5, -1.0), mp)
    assert(math.abs(d2 - 1.0) < 1e-12)
    assert(proj == Pt(0.5, 0.0) && si == 0)
  }

  test("closestVertex finds nearest vertex") {
    val (v, _, _, vi, d2) = Geom.closestVertex(Pt(1.1, 1.1), Array(Array(unitSquare)))
    assert(v == Pt(1, 1) && vi == 2)
    assert(math.abs(d2 - 0.02) < 1e-12)
  }

  test("corner context: right angle is a corner, straight midpoint is not") {
    val withMid: Geom.Ring = Array(Pt(0, 0), Pt(0.5, 0.0), Pt(1, 0), Pt(1, 1), Pt(0, 1))
    val mid = Geom.cornerContext(withMid, 1)
    assert(!mid.isCorner)
    val corner = Geom.cornerContext(withMid, 2) // (1,0): 90 degrees
    assert(corner.isCorner && !corner.isAcute)
    assert(math.abs(math.abs(180 - corner.angle) - 90) < 1e-9)
  }

  test("spike context flags a needle vertex") {
    // base edge with a thin 2-unit spike sticking out near x=0.5
    val spiky: Geom.Ring = Array(
      Pt(0, 0), Pt(0.5, 0), Pt(0.52, 2.0), Pt(0.54, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1))
    val ctx = Geom.spikeContext(spiky, 2, acuteThr = 5.0, threshold = 3.0)
    assert(ctx.isAcute)
    assert(ctx.isZigzag || ctx.isSpike)
  }

  test("azimuth matches compass semantics") {
    assert(math.abs(Pt(0, 0).azimuth(Pt(0, 1)) - 0.0) < 1e-12)   // north
    assert(math.abs(Pt(0, 0).azimuth(Pt(1, 0)) - 90.0) < 1e-12)  // east
    assert(math.abs(math.abs(Pt(0, 0).azimuth(Pt(0, -1))) - 180.0) < 1e-12)
  }

  test("convex clip area: half-overlapping squares") {
    val clip: Geom.Ring = Array(Pt(0.5, 0), Pt(1.5, 0), Pt(1.5, 1), Pt(0.5, 1))
    assert(math.abs(Geom.clipAreaConvex(unitSquare, clip) - 0.5) < 1e-12)
    assert(Geom.isInsideAreaConvex(unitSquare, clip)) // exactly 50% => true
    val clip2: Geom.Ring = Array(Pt(0.6, 0), Pt(1.6, 0), Pt(1.6, 1), Pt(0.6, 1))
    assert(!Geom.isInsideAreaConvex(unitSquare, clip2)) // 40% => false
  }

  test("centroid of square is its center") {
    val c = Geom.centroid(Array(Array(unitSquare)))
    assert(math.abs(c.x - 0.5) < 1e-12 && math.abs(c.y - 0.5) < 1e-12)
  }
}
