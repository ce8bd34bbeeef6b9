package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Skip-gram pair counts vs a brute-force window replay: exact counts,
  * boundary windows, empty-token filtering, degenerate docs. */
class SkipGramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(docs: Seq[String], w: Int): Map[(String, String), Long] =
    docs.flatMap { text =>
      val l = text.split(" ").filter(_.nonEmpty)
      l.indices.flatMap { i =>
        (math.max(i - w, 0) to math.min(i + w, l.length - 1))
          .filter(_ != i).map(j => (l(i), l(j)))
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("pair counts match the brute-force window replay") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a",
      "  double  spaced   tokens ",
      "single",
      "",
      "x y")
    val got = SkipGram.pairCounts(docs.toDF("text"), col("text"), window = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == replay(docs, 2))
    // symmetric by construction: count(a→b) == count(b→a)
    got.foreach { case ((a, b), n) => assert(got((b, a)) == n) }
  }

  test("window=1 keeps only adjacent pairs") {
    val got = SkipGram.pairCounts(Seq("p q r").toDF("text"), col("text"), 1)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("p", "q", 1L), ("q", "p", 1L), ("q", "r", 1L), ("r", "q", 1L)))
  }

  test("negatives replay the md5-48 rank draw exactly") {
    // freq ranks: b(4) > a(3) > c(2) > d(1) -> rank 1..4 = b,a,c,d
    val docs = Seq("a b c b", "b a d a", "b c")
    val got = SkipGram.negatives(docs.toDF("text"), col("text"), k = 2)
      .as[(String, Int, String)].collect().toSet

    def hash48(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val byRank = Vector("b", "a", "c", "d")
    val want = (for {
      c <- byRank; j <- 0 until 2
    } yield (c, j, byRank((hash48(s"$c:$j") % 4).toInt))).toSet
    assert(got == want)
  }
}
