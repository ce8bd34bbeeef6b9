package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Grid-bucketed DBSCAN: hand-computed fixture (core/border/noise roles,
  * min-core-id labels), pair-generation exactness across cell boundaries,
  * and partitioning invariance. */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // eps = 1.0, minPts = 3 (the point itself counts):
  //   A-clump: (0,0), (0.5,0), (0,0.5)  — mutual neighbors, all core
  //   border:  (1.4,0)  — within eps of (0.5,0) only → 1 core neighbor,
  //            |N| = 2 < 3 → border of A
  //   B-pair:  (10,10), (10.5,10) — |N| = 2 each → not core, no core
  //            neighbor → noise
  //   lone:    (20,20) — noise
  private val fixture = Seq(
    (1L, 0.0, 0.0), (2L, 0.5, 0.0), (3L, 0.0, 0.5),
    (4L, 1.4, 0.0),
    (5L, 10.0, 10.0), (6L, 10.5, 10.0),
    (7L, 20.0, 20.0))

  test("roles and min-core-id labels on the hand-computed fixture") {
    import spark.implicits._
    val pts = fixture.toDF("id", "x", "y")
    val out = Dbscan.dbscan(pts, eps = 1.0, minPts = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (4L, "border", 1L),
      (5L, "noise", -1L), (6L, "noise", -1L), (7L, "noise", -1L)))
    graft.CacheBin.drain()
  }

  test("pairs across cell boundaries are found; results invariant to partitioning") {
    import spark.implicits._
    // two core clumps straddling the eps-cell boundary at x = eps
    val pts = Seq(
      (1L, 0.95, 0.0), (2L, 1.05, 0.0), (3L, 1.0, 0.08),
      (11L, 4.95, 4.95), (12L, 5.05, 5.05), (13L, 5.0, 5.0)).toDF("id", "x", "y")
    val a = Dbscan.dbscan(pts.repartition(1), eps = 1.0, minPts = 3)
      .as[(Long, String, Long)].collect().toSet
    val b = Dbscan.dbscan(pts.repartition(7), eps = 1.0, minPts = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(a === b)
    assert(a === Set(
      (1L, "core", 1L), (2L, "core", 1L), (3L, "core", 1L),
      (11L, "core", 11L), (12L, "core", 11L), (13L, "core", 11L)))
    graft.CacheBin.drain()
  }

  test("border point adopts the MIN label when two clusters are in reach") {
    import spark.implicits._
    // minPts = 4: two tight 4-point core clumps 1.9 apart (no bridge);
    // point 50 at x=1.28 sees exactly ONE core of each (d 0.98 / 0.92) —
    // 2 neighbors + self = 3 < 4 keeps it border, label = min(1, 20) = 1
    val pts = (Seq(
      (1L, 0.0), (2L, 0.1), (3L, 0.2), (4L, 0.3),
      (20L, 2.2), (21L, 2.3), (22L, 2.4), (23L, 2.5),
      (50L, 1.28)).map { case (id, x) => (id, x, 0.0) }).toDF("id", "x", "y")
    val out = Dbscan.dbscan(pts, eps = 1.0, minPts = 4)
      .as[(Long, String, Long)].collect()
      .map { case (id, r, c) => id -> ((r, c)) }.toMap
    assert(out(50L) === (("border", 1L)))
    assert(out(1L) === (("core", 1L)) && out(20L) === (("core", 20L)))
    assert(out(4L) === (("core", 1L)) && out(23L) === (("core", 20L)))
    graft.CacheBin.drain()
  }
}
