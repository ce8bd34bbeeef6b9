package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.Pt
import graft.spatial.CellGrid
import Cbcn._

/** Replays the reference's cbcn.py behaviors (no test suite exists upstream;
  * the goldens here are the documented semantics of cbcn.py:16-97): the
  * street-type expansion table, the attribute mapping, and get_address's
  * inside-first / nearest-under-1m parcel assignment. */
class CbcnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("highway_types_equiv matches cbcn.py:18-46 (26 entries)") {
    val golden = Seq(
      "Av" -> "Avinguda", "C" -> "Carrer", "G.V." -> "Gran Via",
      "Pg" -> "Passeig", "Pl" -> "Plaça", "Rbla" -> "Rambla",
      "T" -> "Torrent", "Trvs" -> "Travessia", "Viad" -> "Viaducte")
    for ((in, out) <- golden) assert(highwayTypesEquiv(in) === out, in)
    assert(highwayTypesEquiv.size === 26)
  }

  test("get_cat_address: type expansion, literal dot strip, Entrance spec") {
    val attr = getCatAddress(Map("NOM_VIA" -> "C Aragó", "LITERAL" -> "125.b"))
    assert(attr("TN_text") === "Carrer Aragó")
    assert(attr("designator") === "125b")
    assert(attr("spec") === "Entrance")
    // unknown type passes through verbatim
    val attr2 = getCatAddress(Map("NOM_VIA" -> "Via Augusta", "LITERAL" -> "7"))
    assert(attr2("TN_text") === "Via Augusta")
  }

  test("get_address: inside beats nearest, strict 1m cutoff, null NOM_VIA dropped") {
    import spark.implicits._
    def sq(x0: Double, y0: Double, s: Double) =
      Array(Array(Array(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s), Pt(x0, y0 + s))))
    val parcels = spark.createDataset(Seq(
      ParcelGeom("PA", sq(0, 0, 10)),      // contains a1
      ParcelGeom("PB", sq(10.5, 0, 10)),   // 0.5m right of PA
      ParcelGeom("PC", sq(40, 40, 5))))    // far away
    val addrs = spark.createDataset(Seq(
      CbcnAddr(1L, "C Aragó", "12.", "300501", 5.0, 5.0),    // inside PA
      CbcnAddr(2L, "Pg Gràcia", "7", "300502", 10.2, 5.0),   // 0.2m from PA, 0.3m from PB
      CbcnAddr(3L, "Pl Nova", "1", "300503", 25.0, 25.0),    // nothing within 1m
      CbcnAddr(4L, null, "9", "300504", 5.0, 5.0)))          // null street -> dropped
    val grid = CellGrid(8.0, origin = 0.0, rowWidth = 1L << 20)
    val out = Cbcn.getAddress(addrs, parcels, grid)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === (("300501.12.PA", "Carrer Aragó")))
    // nearest under 1m: PA boundary at x=10 is 0.2m away, PB at 10.5 is 0.3m
    assert(out(2L)._1 === "300502.7.PA")
  }

  test("get_address: boundary distance exactly at threshold is excluded (strict <)") {
    import spark.implicits._
    val parcels = spark.createDataset(Seq(
      ParcelGeom("PX", Array(Array(Array(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4)))))))
    val addrs = spark.createDataset(Seq(
      CbcnAddr(1L, "C U", "1", "c", 5.0, 2.0),     // exactly 1.0m from x=4 edge
      CbcnAddr(2L, "C U", "1", "c", 4.999, 2.0)))  // 0.999m -> kept
    val grid = CellGrid(8.0, origin = 0.0, rowWidth = 1L << 20)
    val got = Cbcn.getAddress(addrs, parcels, grid).collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }
}
