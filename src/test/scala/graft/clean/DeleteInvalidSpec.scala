package graft.clean

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.{Geom, Pt}

/** Replays the reference's test_delete_invalid_geometries golden
  * (test/geo/layer/test_cons.py:292-405) — the handcrafted needle / sliver /
  * inner-ring / spike / zig-zag polygons with their exact expected
  * survivors and output rings (2-decimal precision, rotation-invariant). */
class DeleteInvalidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // reference fixtures f1..f5 (closed rings there; open here)
  val f1: Geom.MultiPolygon = Array(Array(Array(
    Pt(358794.000, 3124330.000), Pt(358794.200, 3124329.800),
    Pt(358794.400, 3124330.000), Pt(358794.200, 3124500.000))))
  val f2: Geom.MultiPolygon = Array(Array(Array(
    Pt(358794.000, 3124330.000), Pt(358795.000, 3124331.000),
    Pt(358794.500, 3124500.000))))
  val f3: Geom.MultiPolygon = Array(Array(
    Array(
      Pt(358890.000, 3124329.000), Pt(358900.000, 3124329.000),
      Pt(358900.000, 3124501.000), Pt(358890.000, 3124501.000),
      Pt(358890.000, 3124330.000)),
    Array(
      Pt(358894.000, 3124330.000), Pt(358895.000, 3124331.000),
      Pt(358894.500, 3124500.000))))
  val f4: Geom.MultiPolygon = Array(Array(Array(
    Pt(357400.00, 3124305.00), Pt(357405.00, 3124305.04),
    Pt(357404.99, 3124307.60), Pt(357405.00, 3124307.40),
    Pt(357405.00, 3124313.00), Pt(357405.04, 3124310.00),
    Pt(357407.50, 3124311.00), Pt(357409.96, 3124310.00),
    Pt(357410.00, 3124313.00), Pt(357410.02, 3124306.00),
    Pt(357410.00, 3124305.00))))
  val f5: Geom.MultiPolygon = Array(Array(Array(
    Pt(357400.00, 3124305.00), Pt(357405.00, 3124305.04),
    Pt(357405.00, 3124310.00), Pt(357400.00, 3124310.00))))

  def r2(r: Seq[Pt]): Seq[(Double, Double)] =
    r.map(p => (math.rint(p.x * 100) / 100, math.rint(p.y * 100) / 100))

  /** rotation/direction-invariant ring comparison at 2 decimals */
  def sameRing(a: Seq[Pt], b: Seq[(Double, Double)]): Boolean = {
    val ra = r2(a)
    val rots = ra.indices.map(i => ra.drop(i) ++ ra.take(i))
    val rb = b
    rots.contains(rb) || rots.map(_.reverse).exists(r => r == rb || rots.contains(rb.reverse))
  }

  test("reference golden: survivors, hole removal, exact spike/zigzag output") {
    import spark.implicits._
    val in = spark.createDataset(Seq(
      (1L, f1), (2L, f2), (3L, f3), (4L, f4), (5L, f5)))
    val out = DeleteInvalid.deleteInvalidGeometries(in)
      .collect().toMap
    // f1 (needle) and f2 (sliver triangle) deleted: 3 of 5 survive
    assert(out.keySet === Set(3L, 4L, 5L))
    // f3: inner sliver ring removed
    assert(out(3L).head.length === 1)
    // f4 golden ring (test_cons.py:380-389)
    val golden4 = Seq(
      (357410.00, 3124305.00), (357405.00, 3124305.00), (357405.00, 3124309.98),
      (357407.50, 3124311.00), (357410.01, 3124310.02), (357410.02, 3124306.00))
    assert(sameRing(out(4L).head.head.toSeq, golden4),
      s"f4 got ${r2(out(4L).head.head.toSeq)}")
    // f5 golden: its vertex coincident with f4's moved spike base follows
    val golden5 = Seq(
      (357400.00, 3124305.00), (357405.00, 3124305.00),
      (357405.00, 3124310.00), (357400.00, 3124310.00))
    assert(sameRing(out(5L).head.head.toSeq, golden5),
      s"f5 got ${r2(out(5L).head.head.toSeq)}")
  }
}
