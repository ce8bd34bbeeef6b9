package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Count-Min sketch vs a plain-Scala replica: the upper-bound guarantee,
  * exact cell parity (collision overestimates included), and weighted
  * streams.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }
  private def cell(k: String, r: Int, width: Long): Long = h48(s"$k|cm$r") % width

  // zipf-ish stream: key i appears 200/(i+1) times — heavy head, long tail
  private val stream = (0 until 50).flatMap(i => Seq.fill(200 / (i + 1))(s"tok$i"))
  private val depth = 3
  private val width = 16L // narrow on purpose: collisions guaranteed

  private def replica(items: Seq[(String, Long)]): Map[(Int, Long), Long] =
    (0 until depth).flatMap { r =>
      items.groupBy(kv => cell(kv._1, r, width))
        .map { case (c, kvs) => (r, c) -> kvs.map(_._2).sum }
    }.toMap

  test("estimate >= truth always, and equals the replica exactly") {
    val sk = CountMin.build(stream.toDF("w"), "w", depth, width)
    val truth = stream.groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val got = CountMin.estimate(sk, truth.keys.toSeq.toDF("w"), "w", depth, width)
      .as[(String, Long)].collect().toMap
    val cellsR = replica(stream.map(_ -> 1L))
    truth.foreach { case (k, n) =>
      val want = (0 until depth).map(r => cellsR((r, cell(k, r, width)))).min
      assert(got(k) === want, s"key $k")
      assert(got(k) >= n, s"CM lower-bounded truth for $k")
    }
    // the narrow sketch must actually overestimate somewhere
    assert(truth.exists { case (k, n) => got(k) > n },
      "test sketch too wide to exercise collisions")
  }

  test("unseen keys estimate 0 unless they collide on every row") {
    val sk = CountMin.build(stream.toDF("w"), "w", depth, width)
    val probes = (100 until 110).map(i => s"unseen$i")
    val got = CountMin.estimate(sk, probes.toDF("w"), "w", depth, width)
      .as[(String, Long)].collect().toMap
    val cellsR = replica(stream.map(_ -> 1L))
    probes.foreach { k =>
      val want = (0 until depth)
        .map(r => cellsR.getOrElse((r, cell(k, r, width)), 0L)).min
      assert(got(k) === want, s"key $k")
    }
  }

  test("weighted build sums weights, not rows") {
    val items = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("w", "n")
    val sk = CountMin.build(items, "w", depth, width, weight = col("n"))
    val got = CountMin.estimate(sk, Seq("a", "b").toDF("w"), "w", depth, width)
      .as[(String, Long)].collect().toMap
    val cellsR = replica(Seq(("a", 12L), ("b", 1L)))
    Seq("a", "b").foreach { k =>
      val want = (0 until depth).map(r => cellsR((r, cell(k, r, width)))).min
      assert(got(k) === want)
    }
  }

  test("merge law: sketch of a concatenated stream = cell-wise sum of parts") {
    val (s1, s2) = (stream.take(300), stream.drop(300))
    val merged = CountMin.merge(
      CountMin.build(s1.toDF("w"), "w", depth, width),
      CountMin.build(s2.toDF("w"), "w", depth, width))
    val direct = CountMin.build(stream.toDF("w"), "w", depth, width)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    val d = direct.as[(Int, Long, Long)].collect().toSet
    assert(m === d)
  }

  test("build output is sketch-bounded: at most depth*width rows") {
    val sk = CountMin.build(stream.toDF("w"), "w", depth, width)
    assert(sk.count() <= depth * width)
  }
}
