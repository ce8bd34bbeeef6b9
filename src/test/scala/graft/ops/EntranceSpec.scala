package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.geom.Pt
import graft.layers.Building
import Conjoin.{Entrance, EntranceOut}

class EntranceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ref 7: two wall-sharing squares [0,10]x[0,10] and [10,20]x[0,10]
  def buildings = {
    import spark.implicits._
    spark.createDataset(Seq(
      Building(1L, 7L, 0L, Array(Pt(0, 0), Pt(10, 0), Pt(10, 10), Pt(0, 10))),
      Building(2L, 7L, 0L, Array(Pt(10, 0), Pt(20, 0), Pt(20, 10), Pt(10, 10)))))
  }

  def run(ads: Seq[Entrance]): (Map[Long, EntranceOut], Map[Long, Seq[Pt]]) = {
    import spark.implicits._
    val (a, b) = Conjoin.moveEntrances(spark.createDataset(ads), buildings)
    (a.as[EntranceOut].collect().map(e => e.ad_id -> e).toMap,
      b.collect().map(x => x.bid -> x.ring.toSeq).toMap)
  }

  test("classification: remote / corner / shared / moved") {
    val (out, rings) = run(Seq(
      Entrance(1L, 7L, "Entrance", -15.0, 5.0),   // 15 m away -> remote
      Entrance(2L, 7L, "Entrance", -1.0, 0.2),    // projects near corner (0,0)
      Entrance(3L, 7L, "Entrance", 9.7, 5.0),     // nearest wall x=10 is shared
      Entrance(4L, 7L, "Entrance", -2.0, 4.0)))   // clean: moves to (0,4)
    assert(out(1L).spec === "remote")
    assert(out(2L).spec === "corner")
    assert(out(3L).spec === "shared")
    assert(out(4L).spec === "Entrance")
    assert((out(4L).x, out(4L).y) === ((0.0, 4.0)))
    // the moved entrance vertex was inserted into building 1's ring
    assert(rings(1L).contains(Pt(0.0, 4.0)))
    assert(!rings(2L).contains(Pt(0.0, 4.0)))
  }

  test("non-entrance specs pass through untouched") {
    val (out, _) = run(Seq(Entrance(9L, 7L, "Parcel", -2.0, 4.0)))
    assert(out(9L).spec === "Parcel")
    assert((out(9L).x, out(9L).y) === ((-2.0, 4.0)))
  }
}
