package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Co-citation projection vs a brute-force replay: exact weights, the
  * fanout cap, duplicate-link collapse, and the weight floor. */
class CoCitationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(links: Seq[(Long, Long)], maxFanout: Int, minWeight: Long)
      : Map[(Long, Long), Long] = {
    val bySrc = links.distinct.groupBy(_._1)
      .filter(_._2.size <= maxFanout)
      .map { case (_, es) => es.map(_._2).sorted }
    bySrc.toSeq
      .flatMap(ds => for (i <- ds.indices; j <- i + 1 until ds.size)
        yield (ds(i), ds(j)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= minWeight)
  }

  test("weights match brute force; the fanout cap drops directory pages") {
    // sources 0..19 each cite (src*3+j) % 12 for j <= src % 7: sources
    // with src % 7 >= 4 exceed the cap of 4 and must not contribute
    val links = (0L until 20L).flatMap(s =>
      (0L to s % 7).map(j => (s, (s * 3 + j) % 12)))
    val dupd = links ++ links.take(10) // duplicates must not inflate weights
    val got = WebGraph.coCitation(dupd.toDF("src", "dst"), 4, 1L)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == replay(dupd, 4, 1L))
    assert(got.nonEmpty)
  }

  test("minWeight floors the pair set") {
    val links = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 12L))
    val got = WebGraph.coCitation(links.toDF("src", "dst"), 10, 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 11L, 2L)))
  }
}
