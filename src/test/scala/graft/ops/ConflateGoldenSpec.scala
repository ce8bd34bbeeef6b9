package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.{Geom, Pt, Utm}
import graft.sources.Shapefile
import graft.spatial.CellGrid
import Conflate.OsmPoly

/** Replays the start of the reference's test_conflate
  * (test_cons.py:509-548): the real cons.shp block reprojected from UTM 28N
  * to WGS84 via the engine's own Transverse Mercator kernel; of the three
  * documented OSM ways only ref='3' conflicts. */
class ConflateGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("UTM kernel round-trips within a millimeter over the fixture extent") {
    for ((x, y) <- Seq((358000.0, 3124000.0), (359000.0, 3125000.0), (357482.0, 3124110.0))) {
      val (lon, lat) = Utm.utmToWgs84(28, x, y)
      val (x2, y2) = Utm.wgs84ToUtm(28, lon, lat)
      assert(math.abs(x2 - x) < 1e-3 && math.abs(y2 - y) < 1e-3, s"($x,$y)->($x2,$y2)")
    }
  }

  test("reference golden: conflate marks exactly the documented OSM way") {
    import spark.implicits._
    val cons = Shapefile.read("/root/reference/test/fixtures/cons.shp")
      .map(f => Utm.reproject(f.geometry, 28))
    def way(id: Long, ref: String, pts: Seq[(Double, Double)]) =
      OsmPoly(id, Map("building" -> "yes", "ref" -> ref),
        Array(Array(pts.dropRight(1).map { case (lon, lat) => Pt(lon, lat) }.toArray)))
    val ways = Seq( // test_cons.py:512-548 verbatim coordinates
      way(1, "1", Seq(
        (-16.44211325828, 28.23715394977), (-16.44208978895, 28.23714124855),
        (-16.44209884141, 28.23712884271), (-16.44212197546, 28.23714361157),
        (-16.44211325828, 28.23715394977))),
      way(2, "2", Seq(
        (-16.44016295806, 28.23657619128), (-16.43985450402, 28.23641077902),
        (-16.43991753593, 28.23632689127), (-16.44020855561, 28.23648403305),
        (-16.44016295806, 28.23657619128))),
      way(3, "3", Seq(
        (-16.44051231511, 28.23655551417), (-16.44042112, 28.23650529975),
        (-16.4405699826, 28.23631153095), (-16.44065782495, 28.23635288407),
        (-16.44051231511, 28.23655551417))))
    val grid = CellGrid(0.001, origin = -180.0, rowWidth = 1L << 31)
    val marked = Conflate.markConflicts(spark.createDataset(ways), cons, grid)
      .collect().map(p => p.tags("ref") -> p.tags.contains("conflict")).toMap
    assert(marked === Map("1" -> false, "2" -> false, "3" -> true))
  }
}
