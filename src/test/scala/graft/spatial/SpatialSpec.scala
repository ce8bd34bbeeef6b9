package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.{Geom, Pt}

class CellGridSpec extends AnyFunSuite {
  val grid = CellGrid(10.0, origin = 0.0, rowWidth = 1000L)

  test("Scala cellOf mirrors the Catalyst cellCol exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val viaCol = pts.toDF().withColumn("cell", grid.cellCol(col("x"), col("y")))
      .select("id", "cell").as[(Long, Long)].collect().toMap
    val viaScala = pts.collect().map(p => (p.id, grid.cellOf(p.x, p.y))).toMap
    assert(viaCol === viaScala)
  }

  test("bbox cover enumerates the rectangle of cells") {
    val cells = grid.cover(Geom.BBox(5, 5, 25, 15))
    assert(cells.size === 6) // x cells 0,1,2 × y cells 0,1
    assert(cells.contains(grid.pack(0, 0)) && cells.contains(grid.pack(2, 1)))
  }

  test("ring cells: k=0 is self, k=1 is the 8 neighbors") {
    assert(grid.ringCells(5, 5, 0) === Seq((5L, 5L)))
    val r1 = grid.ringCells(5, 5, 1)
    assert(r1.size === 8 && !r1.contains((5L, 5L)))
    assert(grid.ringCells(5, 5, 2).size === 16)
  }
}

class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val pipGrid = CellGrid(8.0, origin = 0.0, rowWidth = 1L << 20)

  test("broadcast and partitioned PIP joins agree") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val zonesDs = spark.createDataset(SynthGeo.zones)
    val a = SpatialJoin.pipJoinBroadcast(pts, SynthGeo.zones, pipGrid)
      .as[(Long, Long)].collect().toSet
    val b = SpatialJoin.pipJoinPartitioned(pts, zonesDs, pipGrid)
      .as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("codegen PIP join agrees with the typed broadcast join") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val a = SpatialJoin.pipJoinBroadcast(pts, SynthGeo.zones, pipGrid)
      .as[(Long, Long)].collect().toSet
    val c = SpatialJoin.pipJoinCodegen(pts.toDF(), "id", "x", "y", SynthGeo.zones, pipGrid)
      .as[(Long, Long)].collect().toSet
    assert(c === a)
    assert(c.nonEmpty)
  }

  test("PIP join matches brute-force ray casting") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001).collect()
    val expected = (for {
      p <- pts
      z <- SynthGeo.zones
      if Geom.pointInMultiPolygon(Pt(p.x, p.y), z.geometry)
    } yield (p.id, z.zone_id)).toSet
    val got = SpatialJoin
      .pipJoinBroadcast(SynthGeo.points(spark, TestSpark.sf001), SynthGeo.zones, pipGrid)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("nearestSiteJoin matches brute-force argmin") {
    import spark.implicits._
    val grid = CellGrid(12.0, origin = 0.0, rowWidth = 1L << 20)
    val pts = SynthGeo.points(spark, TestSpark.sf001).collect()
    val expected = pts.map { p =>
      val best = SynthGeo.sites.minBy(s => ((p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y), s.site_id))
      (p.id, best.site_id)
    }.toMap
    val got = SpatialJoin
      .nearestSiteJoin(SynthGeo.points(spark, TestSpark.sf001), SynthGeo.sites, grid)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("radiusJoin matches brute-force disc probe") {
    import spark.implicits._
    val grid = CellGrid(6.5, origin = 0.0, rowWidth = 1L << 20)
    val pts = SynthGeo.points(spark, TestSpark.sf001).collect()
    val r2 = 6.5 * 6.5
    val expected = (for {
      p <- pts; s <- SynthGeo.sites
      if (p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y) <= r2
    } yield (p.id, s.site_id)).toSet
    val got = SpatialJoin
      .radiusJoin(SynthGeo.points(spark, TestSpark.sf001), SynthGeo.sites, grid, 6.5)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("radiusJoinPartitioned equals the broadcast radiusJoin") {
    import spark.implicits._
    val grid = CellGrid(6.5, origin = 0.0, rowWidth = 1L << 20)
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val expected = SpatialJoin.radiusJoin(pts, SynthGeo.sites, grid, 6.5)
      .as[(Long, Long)].collect().toSet
    val got = SpatialJoin.radiusJoinPartitioned(
      pts, spark.createDataset(SynthGeo.sites), grid, 6.5)
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("nearestSiteJoinPartitioned equals the broadcast nearestSiteJoin") {
    import spark.implicits._
    val grid = CellGrid(12.0, origin = 0.0, rowWidth = 1L << 20)
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val expected = SpatialJoin.nearestSiteJoin(pts, SynthGeo.sites, grid)
      .as[(Long, Long)].collect().toMap
    val got = SpatialJoin.nearestSiteJoinPartitioned(
      pts, spark.createDataset(SynthGeo.sites), baseCell = 12.0)
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("nearestSiteJoinPartitioned resolves far points via granularity doubling") {
    import spark.implicits._
    // one site, points up to ~4000 units away: needs several doubling rounds
    val pts = spark.createDataset(
      (1 to 40).map(i => IdPoint(i.toLong, i * 100.0, i * 97.0)))
    val sites = spark.createDataset(Seq(Site(7L, 50.0, 50.0), Site(9L, 3900.0, 3800.0)))
    val got = SpatialJoin.nearestSiteJoinPartitioned(pts, sites, baseCell = 10.0)
      .as[(Long, Long)].collect().toMap
    val expected = (1 to 40).map { i =>
      val p = (i * 100.0, i * 97.0)
      val best = Seq((7L, 50.0, 50.0), (9L, 3900.0, 3800.0)).minBy { case (id, x, y) =>
        ((p._1 - x) * (p._1 - x) + (p._2 - y) * (p._2 - y), id)
      }
      (i.toLong, best._1)
    }.toMap
    assert(got === expected)
  }

  test("pruned coverPolygon: lossless for interior points, matches closed form on diamonds") {
    val grid = CellGrid(10.0, origin = 0.0, rowWidth = 1000L)
    for ((_, cx, cy, r) <- SynthGeo.zoneParams) {
      val mp = SynthGeo.diamond(cx, cy, r)
      val cov = grid.coverPolygon(mp).toSet
      // closed form: cell square intersects the diamond iff its L1
      // distance to the center is <= r (what the q_rasterize oracle runs)
      val bb = Geom.bbox(mp)
      val expected = (for {
        gy <- grid.cellY(bb.ymin) to grid.cellY(bb.ymax)
        gx <- grid.cellX(bb.xmin) to grid.cellX(bb.xmax)
        dx = math.max(0.0, math.max(gx * 10.0 - cx, cx - gx * 10.0 - 10.0))
        dy = math.max(0.0, math.max(gy * 10.0 - cy, cy - gy * 10.0 - 10.0))
        if dx + dy <= r
      } yield grid.pack(gx, gy)).toSet
      assert(cov === expected)
      // losslessness probe: every interior point's cell is covered
      for (i <- 0 until 200) {
        val t = i / 200.0 * 2 * math.Pi
        val rad = (i % 10) / 10.0 * r * 0.99
        val px = cx + rad * math.cos(t) * 0.7 // inside the L1 ball
        val py = cy + rad * math.sin(t) * 0.7
        if (math.abs(px - cx) + math.abs(py - cy) < r)
          assert(cov.contains(grid.cellOf(px, py)))
      }
    }
  }

  test("pruned coverPolygon: diagonal strip covers far fewer cells than its bbox") {
    // thin strip along the main diagonal: bbox cover is 100x100 cells,
    // the strip itself touches ~3 per row — the plan-quality gap VERDICT
    // r4 item 4 called out
    val grid = CellGrid(10.0, origin = 0.0, rowWidth = 1000L)
    val w = 4.0
    val ring = Array(Pt(0, -w), Pt(1000, 1000 - w), Pt(1000, 1000 + w), Pt(0, w))
    val mp: Geom.MultiPolygon = Array(Array(ring))
    val cov = grid.coverPolygon(mp)
    val bboxCells = grid.cover(Geom.bbox(mp)).size
    assert(bboxCells >= 10000)
    assert(cov.size < bboxCells / 10,
      s"pruned ${cov.size} should be well under bbox $bboxCells")
    assert(cov.toSet.contains(grid.cellOf(500.0, 500.0))) // on the strip
    assert(!cov.toSet.contains(grid.cellOf(900.0, 100.0))) // far off it
  }

  test("zone index covers every zone's own centroid cell") {
    val idx = SpatialJoin.buildZoneIndex(SynthGeo.zones, pipGrid)
    for (z <- SynthGeo.zones) {
      val c = Geom.centroid(z.geometry)
      val zs = idx.getOrElse(pipGrid.cellOf(c.x, c.y), Array.empty)
      assert(zs.exists(_.zone_id == z.zone_id))
    }
  }
}

class SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val grid = CellGrid(8.0, origin = 0.0, rowWidth = 1L << 20)

  test("salted partitioned PIP join equals the broadcast join") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val expected = SpatialJoin.pipJoinBroadcast(pts, SynthGeo.zones, grid)
      .as[(Long, Long)].collect().toSet
    val salted = SpatialJoin.pipJoinPartitionedSalted(
      pts.toDF(), "id", "x", "y", spark.createDataset(SynthGeo.zones), grid, nSalt = 4)
      .as[(Long, Long)].collect().toSet
    assert(salted === expected)
  }
}

class MinHashExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native minhash signature: deterministic, right arity, sensitive to content") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z"))).toDF("id", "sh")
    val sigs = df.select(col("id"),
        graft.dedup.Dedup.minhashSignature(col("sh"), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L).length === 16)
    assert(sigs(1L) === sigs(2L))       // identical shingles -> identical sig
    assert(sigs(1L) !== sigs(3L))
    assert(sigs.values.flatten.forall(_ >= 0))
  }
}

/** Z-order hierarchical cell encoding: column math == scala mirror, and
  * the parent law morton(ix,iy)>>2 == morton(ix>>1,iy>>1) that makes
  * multi-level tile rollups a shift instead of a re-encoding join. */
class MortonSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("bit interleave: known values and axis separation") {
    assert(Morton.morton(0, 0) === 0L)
    assert(Morton.morton(1, 0) === 1L)
    assert(Morton.morton(0, 1) === 2L)
    assert(Morton.morton(3, 5) === 39L) // x=11 y=101 -> 100111
    // full 32-bit axes survive
    assert(Morton.morton(0xFFFFFFFFL, 0) === 0x5555555555555555L)
    assert(Morton.morton(0, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
  }

  test("parent law: shift by 2 halves both axes") {
    val vals = Seq(0L, 1L, 7L, 123L, 9999L, 123456L, (1L << 20) - 3)
    for (ix <- vals; iy <- vals) {
      assert(Morton.morton(ix, iy) >>> 2 === Morton.morton(ix >> 1, iy >> 1))
      assert(Morton.morton(ix, iy) >>> 6 === Morton.morton(ix >> 3, iy >> 3))
    }
  }

  test("Catalyst column matches the scala mirror") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = spark.range(0, 5000)
      .select(col("id"),
        (col("id") * 7919L % 10000L).as("ix"),
        (col("id") * 104729L % 10000L).as("iy"))
      .select(col("ix"), col("iy"),
        Morton.mortonCol(col("ix"), col("iy")).as("m"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (ix, iy, m) =>
      assert(m === Morton.morton(ix, iy), s"($ix,$iy)")
    }
  }
}
