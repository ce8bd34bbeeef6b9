package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.Pt
import BuildingParts.ConsRow

class BuildingPartsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def sq(x0: Double, y0: Double, s: Double): Array[Array[Array[Pt]]] =
    Array(Array(Array(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s), Pt(x0, y0 + s))))

  def run(rows: Seq[ConsRow]): Map[String, ConsRow] = {
    import spark.implicits._
    BuildingParts.mergeBuildingParts(spark.createDataset(rows))
      .collect().map(r => r.localId -> r).toMap
  }

  test("levels translate to the outline: max above, max below") {
    val out = run(Seq(
      ConsRow("B1", "R1", "building", 0, 0, 0, "", sq(0, 0, 20)),
      ConsRow("B1_part1", "R1", "part", 3, 1, 0, "", sq(0, 0, 10)),
      ConsRow("B1_part2", "R1", "part", 5, 2, 0, "", sq(10, 0, 10))))
    assert(out("B1").levAbove === 5)
    assert(out("B1").levBelow === 2)
  }

  test("single-level parts merge into the outline (deleted)") {
    val out = run(Seq(
      ConsRow("B1", "R1", "building", 0, 0, 0, "", sq(0, 0, 20)),
      ConsRow("B1_part1", "R1", "part", 2, 0, 0, "", sq(0, 0, 10)),
      ConsRow("B1_part2", "R1", "part", 2, 0, 0, "", sq(10, 0, 10))))
    assert(!out.contains("B1_part1") && !out.contains("B1_part2"))
    assert(out("B1").levAbove === 2)
  }

  test("multi-level: adjacent parts of one level union, distinct level survives") {
    val out = run(Seq(
      ConsRow("B1", "R1", "building", 0, 0, 0, "", sq(0, 0, 30)),
      ConsRow("B1_part1", "R1", "part", 2, 0, 0, "", sq(0, 0, 10)),
      ConsRow("B1_part2", "R1", "part", 2, 0, 0, "", sq(10, 0, 10)), // adjacent to part1
      ConsRow("B1_part3", "R1", "part", 4, 0, 0, "", sq(0, 20, 10))))
    // level (2,0): two adjacent squares union into one -> part2 deleted
    assert(out.contains("B1_part1") && !out.contains("B1_part2"))
    assert(math.abs(graft.geom.Geom.area(out("B1_part1").geometry) - 200.0) < 1e-9)
    assert(out.contains("B1_part3"))
    assert(out("B1").levAbove === 4)
  }

  test("part bigger than its building gets a fixme and is kept") {
    val out = run(Seq(
      ConsRow("B1", "R1", "building", 0, 0, 0, "", sq(0, 0, 10)),
      ConsRow("B1_part1", "R1", "part", 1, 0, 0, "", sq(0, 0, 10)),
      ConsRow("B1_part2", "R1", "part", 2, 0, 0, "", sq(2, 2, 30)))) // bigger
    assert(out("B1_part2").fixme.nonEmpty)
  }

  test("pool inside a building moves to layer=1; coincident building deleted") {
    val out = run(Seq(
      ConsRow("B1", "R1", "building", 0, 0, 0, "", sq(0, 0, 20)),
      ConsRow("B1_PI.1", "R1", "pool", 0, 0, 0, "", sq(5, 5, 4)),
      ConsRow("B2", "R2", "building", 0, 0, 0, "", sq(100, 100, 6)),
      ConsRow("B2_PI.1", "R2", "pool", 0, 0, 0, "", sq(100, 100, 6)))) // same ring
    assert(out("B1_PI.1").layer === 1)
    assert(!out.contains("B2"), "building coincident with pool must be deleted")
  }

  test("parts underfilling the outline replace its geometry with their union") {
    val out = run(Seq(
      ConsRow("B1", "R1", "building", 0, 0, 0, "", sq(0, 0, 30)), // area 900
      ConsRow("B1_part1", "R1", "part", 1, 0, 0, "", sq(0, 0, 10)),
      ConsRow("B1_part2", "R1", "part", 2, 0, 0, "", sq(10, 0, 10)))) // 200 < 900
    assert(math.abs(graft.geom.Geom.area(out("B1").geometry) - 200.0) < 1e-9)
  }
}
