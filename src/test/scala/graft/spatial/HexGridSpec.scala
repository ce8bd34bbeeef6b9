package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HexGridSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // the query-surface sizes (fine ~ "res 9", coarse ~ "res 7")
  private val Fine = 2.5
  private val Coarse = 7.5

  test("Scala cellOf mirrors the Catalyst cellCol exactly (both sizes)") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    for (size <- Seq(Fine, Coarse)) {
      val viaCol = pts.toDF()
        .withColumn("cell", HexGrid.cellCol(col("x"), col("y"), size))
        .select("id", "cell").as[(Long, Long)].collect().toMap
      val viaScala = pts.collect()
        .map(p => (p.id, HexGrid.cellOf(p.x, p.y, size))).toMap
      assert(viaCol === viaScala, s"size=$size")
    }
  }

  test("cube-round invariant: assigned cell is the nearest hex center") {
    // axial distance from point to its cell center must be <= circumradius,
    // and strictly smaller than to any of the 6 neighbor centers (up to fp)
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001).collect().take(2000)
    for (p <- pts) {
      val cell = HexGrid.cellOf(p.x, p.y, Fine)
      val (cx, cy) = HexGrid.centerOf(cell, Fine)
      val d0 = math.hypot(p.x - cx, p.y - cy)
      assert(d0 <= Fine + 1e-9, s"point ${p.id} outside its cell circumradius")
      for (off <- HexGrid.neighborOffsets) {
        val (nx, ny) = HexGrid.centerOf(cell + off, Fine)
        assert(d0 <= math.hypot(p.x - nx, p.y - ny) + 1e-9,
          s"point ${p.id}: neighbor center closer than own center")
      }
    }
  }

  test("neighbor offsets are id-space adds: decode matches axial steps") {
    val cell = HexGrid.cellOf(50.0, 50.0, Fine)
    val (q, r) = HexGrid.axialOf(cell)
    val seen = HexGrid.neighborOffsets.map(off => HexGrid.axialOf(cell + off)).toSet
    val expect = HexGrid.NeighborSteps.map { case (dq, dr) => (q + dq, r + dr) }.toSet
    assert(seen === expect)
    // and each neighbor center is exactly sqrt(3)*size away (hex lattice pitch)
    val (cx, cy) = HexGrid.centerOf(cell, Fine)
    for (off <- HexGrid.neighborOffsets) {
      val (nx, ny) = HexGrid.centerOf(cell + off, Fine)
      assert(math.abs(math.hypot(nx - cx, ny - cy) - math.sqrt(3.0) * Fine) < 1e-9)
    }
  }

  test("parentCol re-encodes the center: column mirror == Scala mirror") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    val viaCol = pts.toDF()
      .withColumn("f", HexGrid.cellCol(col("x"), col("y"), Fine))
      .withColumn("p", HexGrid.parentCol(col("f"), Fine, Coarse))
      .select("id", "p").as[(Long, Long)].collect().toMap
    val viaScala = pts.collect().map { p =>
      val f = HexGrid.cellOf(p.x, p.y, Fine)
      val (cx, cy) = HexGrid.centerOf(f, Fine)
      (p.id, HexGrid.cellOf(cx, cy, Coarse))
    }.toMap
    assert(viaCol === viaScala)
  }

  test("coverDiamond is conservative: cell-join equals brute-force predicate join") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001).collect()
    val brute = (for {
      p <- pts
      (k, cx, cy, r) <- SynthGeo.zoneParams
      if math.abs(p.x - cx) + math.abs(p.y - cy) < r
    } yield (p.id, k)).toSet
    val cover = SynthGeo.zoneParams.flatMap { case (k, cx, cy, r) =>
      HexGrid.coverDiamond(cx, cy, r, Coarse).map(c => (c, (k, cx, cy, r)))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val viaCells = (for {
      p <- pts
      (k, cx, cy, r) <- cover.getOrElse(HexGrid.cellOf(p.x, p.y, Coarse), Nil)
      if math.abs(p.x - cx) + math.abs(p.y - cy) < r
    } yield (p.id, k)).toSet
    assert(viaCells === brute)
    assert(brute.nonEmpty, "fixture must actually hit some zones")
  }

  test("cover size is hex-tight: well under the bbox square count") {
    val (k, cx, cy, r) = SynthGeo.zoneParams.head
    val cells = HexGrid.coverDiamond(cx, cy, r, Fine)
    // diamond area = 2r^2; hex cell area = 3*sqrt(3)/2 * s^2. Inflated
    // conservative cover must stay within ~4x the ideal count, far below
    // the (2r/s)^2-ish bbox grid
    val ideal = 2.0 * r * r / (3.0 * math.sqrt(3.0) / 2.0 * Fine * Fine)
    assert(cells.size < 4.0 * ideal + 16, s"cover=${cells.size} ideal=$ideal (k=$k)")
  }

  test("coverPolygon is conservative and pruned (generic-polygon cover)") {
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001).collect()
    // the diamonds as GENERIC polygons through the PIP path
    for ((k, cx, cy, r) <- SynthGeo.zoneParams.take(4)) {
      val mp = SynthGeo.diamond(cx, cy, r)
      val cover = HexGrid.coverPolygon(mp, Fine).toSet
      // conservative: every point inside the polygon lands in a covered cell
      for (p <- pts if math.abs(p.x - cx) + math.abs(p.y - cy) < r)
        assert(cover.contains(HexGrid.cellOf(p.x, p.y, Fine)),
          s"zone $k missed point ${p.id}")
    }
    // pruned: at cell sizes well below the zone radius the cover beats the
    // bbox blanket (a diamond fills half its bbox; the conservative
    // boundary band is 3 hexes wide, so the win needs r/size >> 1)
    val (k, cx, cy, r) = SynthGeo.zoneParams(4) // the largest diamond
    val s = 0.5
    val cover = HexGrid.coverPolygon(SynthGeo.diamond(cx, cy, r), s)
    val bboxCells = (2.0 * r) * (2.0 * r) / (3.0 * math.sqrt(3.0) / 2.0 * s * s)
    assert(cover.size < 0.8 * bboxCells,
      s"zone $k cover ${cover.size} vs bbox blanket ~$bboxCells")
  }

  test("SQL mirror parity: DuckDB-identical arithmetic reproduced via Spark SQL") {
    // The oracle gate proves Spark-vs-DuckDB; this spec pins the cheaper
    // invariant that the SQL text itself (run by Spark's own parser)
    // reproduces cellCol bit-exactly — catching any mirror drift before
    // the round driver does.
    import spark.implicits._
    val pts = SynthGeo.points(spark, TestSpark.sf001)
    pts.toDF().createOrReplaceTempView("hex_pts_src")
    val viaSql = spark.sql(
      s"""WITH src AS (SELECT id, x, y FROM hex_pts_src),
         |${HexGrid.cellSqlCtes(Fine)}
         |SELECT id, cell FROM hexcell""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val viaCol = pts.toDF()
      .withColumn("cell", HexGrid.cellCol(col("x"), col("y"), Fine))
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(viaSql === viaCol)
  }
}
