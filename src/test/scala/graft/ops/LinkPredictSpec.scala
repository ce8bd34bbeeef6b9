package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Common-neighbor link-prediction features vs a brute-force set replay:
  * exact counts/degrees, canonicalization, isolated-vertex candidates. */
class LinkPredictSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("features match the brute-force neighbor-set replay") {
    val edges = (0L until 50L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 40), (i % 17, (i * 3 + 2) % 40)))
    // vertex 100 appears in no edge: its pair must come back with zeros
    val cands = (0L until 50L).map(i => (i % 45, (i * 13 + 1) % 45)) :+ (100L, 5L)
    val got = WebGraph.linkPredict(edges.toDF("src", "dst"), cands.toDF("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    val nbrs = edges.filter { case (x, y) => x != y }
      .flatMap { case (x, y) => Seq(x -> y, y -> x) }.distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val want = cands.filter { case (x, y) => x != y }
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }.distinct
      .map { case (a, b) =>
        val (na, nb) = (nbrs.getOrElse(a, Set.empty), nbrs.getOrElse(b, Set.empty))
        (a, b) -> ((na & nb).size.toLong, na.size.toLong, nb.size.toLong)
      }.toMap
    assert(got == want)
    assert(got((5L, 100L)) == ((0L, nbrs(5L).size.toLong, 0L)))
  }
}
