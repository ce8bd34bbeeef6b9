package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class WebGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synthEdges(n: Long): Seq[(Long, Long)] =
    (0L until n).flatMap(id =>
      (0L to id % 4).map(j => id -> (id * 131 + 7 * j) % n))

  test("linkEdges recovers the exact synthesized edge set from html bytes") {
    val n = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet").count()
    val pages = graft.sources.Pages.fromDocumentsLinked(spark, TestSpark.sf001, n)
    val got = WebGraph.linkEdges(pages)
      .select($"src_id", $"dst_id").as[(Long, Long)].collect().sorted
    assert(got.toSeq === synthEdges(n).sorted)
    // host columns are pure functions of the ids
    val badHost = WebGraph.linkEdges(pages)
      .filter($"src_host" =!= concat(lit("h"), $"src_id" % 16, lit(".example")) ||
        $"dst_host" =!= concat(lit("h"), $"dst_id" % 16, lit(".example")))
      .count()
    assert(badHost === 0)
  }

  test("hostGraph conserves total link count = sum of out-degrees") {
    val n = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet").count()
    val pages = graft.sources.Pages.fromDocumentsLinked(spark, TestSpark.sf001, n)
    val total = WebGraph.hostGraph(pages).agg(sum("n_links")).as[Long].head()
    assert(total === (0L until n).map(_ % 4 + 1).sum)
  }

  test("anchorText zips hrefs with their inner texts and rolls up per target") {
    val n = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet").count()
    val pages = graft.sources.Pages.fromDocumentsLinked(spark, TestSpark.sf001, n)
    val got = WebGraph.anchorText(pages)
      .select($"dst_id", $"n_anchors", $"anchors")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exp = (0L until n)
      .flatMap(id => (0L to id % 4).map(j => ((id * 131 + 7 * j) % n, s"a${id}x$j")))
      .groupBy(_._1)
      .map { case (d, as) =>
        d -> (as.size.toLong, as.map(_._2).sorted.mkString(" ")) }
    assert(got === exp)
  }

  test("pageRank matches an in-JVM reference on the synthetic graph") {
    val n = 20L
    val edges = synthEdges(n)
    // independent dense reference (same iteration order of operations not
    // required — compare at 1e-9 which fp sum reordering cannot breach)
    var ref = Array.fill(n.toInt)(1.0 / n)
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    for (_ <- 1 to 3) {
      val mass = Array.fill(n.toInt)(0.0)
      for ((s, d) <- edges) mass(d.toInt) += ref(s.toInt) / outDeg(s)
      ref = mass.map(m => 0.15 / n + 0.85 * m)
    }
    val got = WebGraph.pageRank(edges.toDF("src", "dst"), n, iters = 3)
      .orderBy("id").select("rank").as[Double].collect()
    graft.CacheBin.drain()
    assert(got.length === n.toInt)
    for (i <- got.indices)
      assert(math.abs(got(i) - ref(i)) < 1e-9, s"node $i: ${got(i)} vs ${ref(i)}")
    // total rank mass is conserved (no dangling nodes by construction)
    assert(math.abs(got.sum - 1.0) < 1e-9)
  }

  test("pageRank on a directed ring stays uniform; a hub node dominates") {
    val n = 12L
    val ring = (0L until n).map(i => i -> (i + 1) % n)
    val r = WebGraph.pageRank(ring.toDF("src", "dst"), n, iters = 3)
      .select("rank").as[Double].collect()
    graft.CacheBin.drain()
    assert(r.forall(x => math.abs(x - 1.0 / n) < 1e-12))
    // every node also links to node 0 -> node 0 must outrank all others
    val star = ring ++ (1L until n).map(i => i -> 0L)
    val s = WebGraph.pageRank(star.toDF("src", "dst"), n, iters = 3)
      .orderBy("id").select("rank").as[Double].collect()
    graft.CacheBin.drain()
    assert(s(0) > s.tail.max)
  }

  test("streaming host windows == the identical batch aggregation") {
    val n = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet").count()
    val streamed = graft.streaming.EventStream
      .runHostWindowsOnce(spark, TestSpark.sf001, n)
      .as[(Long, String, String, Long)].collect().sorted
    val batch = WebGraph
      .hostWindowCounts(graft.sources.Pages.fromDocumentsLinked(spark, TestSpark.sf001, n))
      .as[(Long, String, String, Long)].collect().sorted
    assert(streamed.nonEmpty && streamed.toSeq === batch.toSeq)
  }

  test("hits matches an in-JVM reference exactly (integer scores)") {
    val n = 20L
    val edges = synthEdges(n)
    var auth = Array.fill(n.toInt)(1.0)
    var hub = Array.fill(n.toInt)(1.0)
    for (_ <- 1 to 2) {
      val a = Array.fill(n.toInt)(0.0)
      for ((s, d) <- edges) a(d.toInt) += hub(s.toInt)
      auth = a
      val h = Array.fill(n.toInt)(0.0)
      for ((s, d) <- edges) h(s.toInt) += auth(d.toInt)
      hub = h
    }
    val got = WebGraph.hits(edges.toDF("src", "dst"), n, iters = 2)
      .orderBy("id").select("auth", "hub").as[(Double, Double)].collect()
    graft.CacheBin.drain()
    // unnormalized integer-valued scores: equality must be EXACT
    assert(got.map(_._1).toSeq === auth.toSeq)
    assert(got.map(_._2).toSeq === hub.toSeq)
  }

  test("hits on a star: the center is the sole authority, leaves are hubs") {
    val n = 6L
    val star = (1L until n).map(i => i -> 0L)
    val r = WebGraph.hits(star.toDF("src", "dst"), n, iters = 2)
      .orderBy("id").select("auth", "hub").as[(Double, Double)].collect()
    graft.CacheBin.drain()
    assert(r(0)._1 > 0 && r.tail.forall(_._1 == 0.0)) // only 0 has in-links
    assert(r(0)._2 == 0.0 && r.tail.forall(_._2 > 0)) // 0 has no out-links
  }

  test("degreeDistribution matches a hand histogram incl. zero-degree nodes") {
    // star + one isolate: node 0 in-deg 5, leaves 1..5 in-deg 0, node 6
    // isolated both sides; out-deg: leaves 1, others 0
    val edges = (1L to 5L).map(i => i -> 0L).toDF("src", "dst")
    val ids = (0L to 6L).toDF("id")
    val got = WebGraph.degreeDistribution(edges, ids)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // bin = bit_length(deg+1) - 1: deg0->0, deg1->1, deg5->2
    assert(got(("in", 0L)) === ((6L, 0L, 0L)))  // nodes 1..6 at deg 0
    assert(got(("in", 2L)) === ((1L, 5L, 5L)))  // node 0 at deg 5
    assert(got(("out", 0L)) === ((2L, 0L, 0L))) // nodes 0 and 6
    assert(got(("out", 1L)) === ((5L, 1L, 1L))) // leaves
    assert(got.size === 4)
  }

  test("degreeDistribution conserves node count per side and bins exactly at powers of two") {
    val n = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet").count()
    val edges = synthEdges(n).toDF("src", "dst")
    val ids = spark.range(0, n).toDF("id")
    val dist = WebGraph.degreeDistribution(edges, ids)
    val perSide = dist.groupBy("side").agg(sum("n_docs").as("t"))
      .as[(String, Long)].collect().toMap
    assert(perSide("in") === n && perSide("out") === n)
    // exact-power-of-two degrees must land in their own bin (the float-log
    // failure mode the bit-length formulation exists to avoid)
    val probe = Seq((0L, 9L), (1L, 9L), (2L, 9L)).toDF("src", "dst") // deg 3
    val p2 = WebGraph.degreeDistribution(probe, Seq(9L).toDF("id"))
      .filter($"side" === "in").select("bin").as[Long].head()
    assert(p2 === 2L) // bit_length(4) - 1 = 2, never floor(1.9999…)
  }
}
