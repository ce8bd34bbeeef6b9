package graft.clean

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.Pt
import graft.layers.Building
import graft.ops.Adjacency

class TopologySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def sq(fid: Long, x0: Double, y0: Double, s: Double = 10.0): Feature =
    Feature(fid, Array(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s), Pt(x0, y0 + s)))

  test("snapVertices merges cross-feature near-duplicate corners deterministically") {
    import spark.implicits._
    // square 1 exact; square 2's shared corners perturbed by 0.004 < dupThr
    val f2 = Feature(2L, Array(
      Pt(10.004, 0.003), Pt(20, 0), Pt(20, 10), Pt(10.002, 9.996)))
    val fs = spark.createDataset(Seq(sq(1, 0, 0), f2))
    val snapped = Topology.snapVertices(fs).collect().map(f => f.fid -> f.ring).toMap
    // feature 1 has the smaller (fid, vidx): its corners win
    assert(snapped(2L)(0) === Pt(10, 0))
    assert(snapped(2L)(3) === Pt(10, 10))
    assert(snapped(1L).toSeq === sq(1, 0, 0).ring.toSeq) // untouched
  }

  test("snap restores adjacency detection on perturbed shared walls") {
    import spark.implicits._
    val perturbed = spark.createDataset(Seq(
      sq(1, 0, 0),
      Feature(2L, Array(Pt(10.004, 0.003), Pt(20, 0), Pt(20, 10), Pt(10.002, 9.996)))))
    def toBuildings(fs: org.apache.spark.sql.Dataset[Feature]) =
      fs.map(f => Building(f.fid, 0L, 0L, f.ring))
    assert(Adjacency.adjacentPairs(toBuildings(perturbed)).count() === 0)
    val snapped = Topology.snapVertices(perturbed)
    assert(Adjacency.adjacentPairs(toBuildings(snapped)).count() === 1)
  }

  test("addTopologicalPoints splits a wall at a foreign mid-edge vertex") {
    import spark.implicits._
    // square 2 sits half-offset: its corners (10,5) and (10,15) lie on /near
    // square 1's right wall x=10 (but 1's corners are at y=0,10)
    val fs = spark.createDataset(Seq(sq(1, 0, 0), sq(2, 10, 5)))
    val out = Topology.addTopologicalPoints(fs, distThr = 0.02)
      .collect().map(f => f.fid -> f.ring.toSeq).toMap
    // square 1's right wall (10,0)->(10,10) gains the point (10,5)
    assert(out(1L).contains(Pt(10, 5)), s"got ${out(1L)}")
    // square 2's left wall (10,15)->(10,5) gains (10,10)
    assert(out(2L).contains(Pt(10, 10)), s"got ${out(2L)}")
    // and now they share the segment (10,5)-(10,10): adjacency holds
    val bs = spark.createDataset(out.toSeq.map { case (fid, r) =>
      Building(fid, 0L, 0L, r.toArray)
    })
    assert(Adjacency.adjacentPairs(bs).count() === 1)
  }

  test("repair is idempotent on already-clean data") {
    import spark.implicits._
    val fs = spark.createDataset(Seq(sq(1, 0, 0), sq(2, 10, 0)))
    val once = Topology.repair(fs).collect().map(f => f.fid -> f.ring.toSeq).toMap
    val twice = Topology.repair(Topology.repair(fs)).collect().map(f => f.fid -> f.ring.toSeq).toMap
    assert(once === twice)
  }
}
