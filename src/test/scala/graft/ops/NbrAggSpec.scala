package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** 2-hop neighborhood aggregation vs an in-JVM path-sum replay: exact
  * sums/counts, zero rows for sink vertices, partitioning invariance. */
class NbrAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(
      edges: Seq[(Long, Long)], feats: Map[Long, Long]): Map[Long, (Long, Long, Long, Long)] = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val h1 = out.map { case (v, ns) =>
      v -> (ns.map(feats).sum, ns.size.toLong)
    }
    feats.keys.map { v =>
      val (s1, c1) = h1.getOrElse(v, (0L, 0L))
      val twoHop = out.getOrElse(v, Seq.empty).flatMap(h1.get)
      v -> (s1, c1, twoHop.map(_._1).sum, twoHop.map(_._2).sum)
    }.toMap
  }

  test("sums and counts match the path-sum replay; sinks get zeros") {
    val edges = (0L until 30L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 25), (i % 13, (i * 3 + 2) % 25)))
    // vertices 25..29 have out-edges but features exist for 0..29;
    // vertex 29 with no out-edges at all must appear with zeros
    val feats = (0L until 30L).map(v => v -> (v * v % 17)).toMap
    val e = edges.filter { case (_, b) => b < 30 }
    val got = WebGraph.neighborhoodAgg(
        e.toDF("src", "dst"),
        feats.toSeq.toDF("v", "f"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == replay(e, feats))
    assert(got.size == 30)
  }

  test("result is invariant to input partitioning") {
    val edges = (0L until 40L).map(i => (i % 20, (i * 17 + 3) % 20))
    val feats = (0L until 20L).map(v => v -> (v + 1))
    val a = WebGraph.neighborhoodAgg(
      edges.toDF("src", "dst").repartition(11), feats.toDF("v", "f"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = WebGraph.neighborhoodAgg(
      edges.toDF("src", "dst").repartition(1), feats.toDF("v", "f").repartition(5))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
