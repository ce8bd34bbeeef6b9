package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Deterministic random walks vs an in-JVM simulation using the same
  * md5-48 pick rule: exact path equality, dead-end truncation, and
  * partitioning invariance. */
class RandomWalkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the engine's hash48: first 12 hex chars of md5, parsed base-16
  private def hash48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  private def simulate(
      edges: Seq[(Long, Long)], starts: Seq[Long], len: Int): Set[(Long, Int, Long)] = {
    val nbrs = edges.filter { case (a, b) => a != b }.distinct
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }
    starts.flatMap { s =>
      var v = s
      var path = List((s, 0, s))
      var t = 1
      var alive = true
      while (alive && t <= len) {
        nbrs.get(v) match {
          case Some(out) =>
            v = out((hash48(s"$s:$v:$t") % out.size).toInt)
            path ::= ((s, t, v)); t += 1
          case None => alive = false
        }
      }
      path
    }.toSet
  }

  test("walks match the in-JVM md5-48 simulation exactly") {
    val edges = (0L until 60L).flatMap { i =>
      Seq((i, (i * 7 + 1) % 60), (i, (i * 13 + 5) % 60), (i % 11, (i * 3) % 60))
    }
    val starts = (0L until 60L by 5L)
    val got = WebGraph.randomWalks(
        edges.toDF("src", "dst"), starts.toDF("v"), walkLen = 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == simulate(edges, starts, 4))
    // every surviving walk is a chain: one row per (start, step)
    assert(got.size == got.map(r => (r._1, r._2)).size)
  }

  test("dead ends truncate the walk instead of dropping it") {
    // 0 -> 1 -> 2, and 2 has no out-edges: the walk from 0 stops at step 2
    val edges = Seq((0L, 1L), (1L, 2L))
    val got = WebGraph.randomWalks(
        edges.toDF("src", "dst"), Seq(0L).toDF("v"), walkLen = 5)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == Set((0L, 0, 0L), (0L, 1, 1L), (0L, 2, 2L)))
  }

  test("result is invariant to input partitioning") {
    val edges = (0L until 40L).map(i => (i, (i * 17 + 3) % 40))
    val starts = (0L until 40L by 4L)
    val a = WebGraph.randomWalks(
        edges.toDF("src", "dst").repartition(13), starts.toDF("v"), 3)
      .as[(Long, Int, Long)].collect().toSet
    val b = WebGraph.randomWalks(
        edges.toDF("src", "dst").repartition(1), starts.toDF("v").repartition(7), 3)
      .as[(Long, Int, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
