package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** WebGraph.scc vs an in-JVM Tarjan reference: hand shapes that exercise
  * trim, coloring, and the in-class settle; then a pseudo-random graph
  * where the whole labeling must match Tarjan component-for-component. */
class SccSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    WebGraph.scc(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  /** Iterative Tarjan (explicit stack — no JVM recursion limits). */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.filter(e => e._1 != e._2).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).distinct.sorted }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.Stack.empty[Long]
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    var counter = 0
    for (root <- verts if !index.contains(root)) {
      // frames: (vertex, iterator over remaining successors)
      val frames = scala.collection.mutable.Stack((root, adj.getOrElse(root, Seq.empty).iterator))
      index(root) = counter; low(root) = counter; counter += 1
      stack.push(root); onStack += root
      while (frames.nonEmpty) {
        val (v, it) = frames.top
        if (it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack.push(w); onStack += w
            frames.push((w, adj.getOrElse(w, Seq.empty).iterator))
          } else if (onStack.contains(w)) low(v) = math.min(low(v), index(w))
        } else {
          frames.pop()
          if (frames.nonEmpty) {
            val p = frames.top._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val members = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = 0L
            do { w = stack.pop(); onStack -= w; members += w } while (w != v)
            val id = members.min
            members.foreach(m => comp(m) = id)
          }
        }
      }
    }
    comp.toMap
  }

  test("two cycles joined one-way stay separate SCCs") {
    val e = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4))
    assert(run(e) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("a DAG chain is all singletons (trim path)") {
    val e = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4))
    assert(run(e) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("one big ring is one SCC labeled by its min") {
    val e = (0L until 10L).map(i => (i, (i + 1) % 10))
    assert(run(e) == (0L until 10L).map(_ -> 0L).toMap)
  }

  test("self-loop-only vertex is a singleton, not dropped") {
    val e = Seq[(Long, Long)]((7, 7), (1, 2), (2, 1))
    assert(run(e) == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("cycle hanging off a cycle via a 2-path bridge (mid-bridge trims)") {
    // 0<->1 -> 5 -> 6 -> 3<->4 : 5 and 6 are singletons, two 2-SCCs
    val e = Seq[(Long, Long)]((0, 1), (1, 0), (1, 5), (5, 6), (6, 3), (3, 4), (4, 3))
    assert(run(e) == Map(0L -> 0L, 1L -> 0L, 5L -> 5L, 6L -> 6L, 3L -> 3L, 4L -> 3L))
  }

  test("pseudo-random 80-vertex graph matches Tarjan exactly") {
    val n = 80L
    val e = (0L until n).flatMap { i =>
      Seq((i, (i * 7 + 3) % n), (i, (i * 13 + 5) % n)) ++
        (if (i % 3 == 0) Seq((i, (i + 11) % n)) else Seq.empty)
    }
    assert(run(e) == tarjan(e))
  }

  test("blocks-plus-one-way-cross shape (the q_scc fixture) matches Tarjan") {
    val n = 200L
    val ring = (0L until n).map(i => (i, (i / 50) * 50 + (i % 50 + 1) % 50))
    val chord = (0L until n).map(i => (i, (i / 50) * 50 + (i % 50 + 7) % 50))
    val cross = (0L until 50L).map(i => (i, i * 131 % n))
    val e = ring ++ chord ++ cross
    val got = run(e)
    assert(got == tarjan(e))
    // and the intended shape: every block is its own SCC
    assert(got == (0L until n).map(i => i -> (i / 50) * 50).toMap)
  }

  test("round guard fails loudly instead of returning partial labels") {
    // chain of 2-cycles has SCC-DAG depth 4 -> cannot finish in 1 round
    val e = (0L until 4L).flatMap { k =>
      Seq((2 * k, 2 * k + 1), (2 * k + 1, 2 * k)) ++
        (if (k < 3) Seq((2 * k, 2 * k + 2)) else Seq.empty)
    }
    intercept[IllegalArgumentException] {
      WebGraph.scc(e.toDF("src", "dst"), maxRounds = 1).collect()
    }
  }
}
