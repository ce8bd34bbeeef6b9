package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.dedup.EditDedup

class EditDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("segments: tau+1 contiguous pieces covering the string, widths differ by <= 1") {
    for (tau <- 1 to 6; l <- (tau + 1) to 40) {
      val segs = EditDedup.segments(l, tau)
      assert(segs.size === tau + 1, s"l=$l tau=$tau")
      assert(segs.head._1 === 0)
      segs.sliding(2).foreach {
        case Seq((p1, w1), (p2, _)) => assert(p1 + w1 === p2)
        case _ =>
      }
      assert(segs.last._1 + segs.last._2 === l)
      val ws = segs.map(_._2)
      assert(ws.max - ws.min <= 1)
      assert(ws.min >= 1)
    }
  }

  test("shifts: exactly the window where edits before + after fit in tau") {
    for (tau <- 1 to 6; d <- -tau to tau; s <- -2 * tau to 2 * tau) {
      val in = EditDedup.shifts(100, 100 + d, tau).contains(s)
      assert(in === (math.abs(s) + math.abs(d - s) <= tau), s"tau=$tau d=$d s=$s")
    }
  }

  test("lossless filter: nearDups == brute force on an adversarial corpus (tau=2)") {
    val tau = 2
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh"
    def randStr(l: Int) = Seq.fill(l)(alpha(rnd.nextInt(alpha.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits) {
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur.patch(p, randStr(1), 1) // substitute
          case 1                 => cur.patch(p, randStr(1), 0) // insert
          case _ if cur.nonEmpty => cur.patch(p, "", 1)         // delete
          case _                 => cur + randStr(1)
        }
      }
      cur
    }
    // bases + 0/1/2/3-edit variants, plus shorts (len <= tau) that exercise
    // the trivial-pair path and len == tau+1 minimum-segment strings
    val bases = Seq.tabulate(12)(i => randStr(8 + 3 * i))
    val docs = (bases.flatMap(b => Seq(b, b, mutate(b, 1), mutate(b, 2), mutate(b, 3))) ++
      Seq("", "a", "ab", "xy", randStr(tau + 1), randStr(tau + 1)))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }

    def lev(a: String, b: String) = TextFns.levenshteinDist(a, b)
    val expected = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib
      d = lev(sa, sb)
      if d <= tau
    } yield (ia, ib, d.toLong)).sortBy(x => (x._1, x._2))

    val got = EditDedup.nearDups(
        docs.toDF("doc_id", "text"), "doc_id", "text", tau = tau)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // the corpus actually exercises the filter: real near-dups exist and
    // most pairs are NOT candidates
    assert(expected.size > 20)
    assert(expected.size < docs.size * (docs.size - 1) / 4)
  }

  test("nearDups at tau=6 finds the sf0.001 documents near-dup pairs symmetrically") {
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
    val pairs = EditDedup.nearDups(docs, "doc_id", "text", tau = 6)
      .as[(Long, Long, Long)].collect()
    // id_a < id_b, d within threshold, verified distance matches an
    // independent JVM levenshtein
    val text = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    pairs.foreach { case (a, b, d) =>
      assert(a < b)
      assert(d >= 0 && d <= 6)
      assert(TextFns.levenshteinDist(text(a), text(b)) === d)
    }
  }

  test("hot-bucket cap is a left_anti on aggregated keys, not a driver set") {
    // boilerplate: many identical strings — with maxBucket below the
    // cluster size every segment key is hot, so the seg path yields
    // nothing, but pairs are still found iff short path applies (here
    // it doesn't: strings are long) — documents the documented lossy cap
    val docs = Seq.tabulate(10)(i => (i.toLong, "the same boilerplate line"))
      .toDF("doc_id", "text")
    val capped = EditDedup.nearDups(docs, "doc_id", "text", tau = 2, maxBucket = 4)
    assert(capped.count() === 0)
    val uncapped = EditDedup.nearDups(docs, "doc_id", "text", tau = 2, maxBucket = 64)
    assert(uncapped.count() === 45) // all C(10,2) identical pairs
  }
}
