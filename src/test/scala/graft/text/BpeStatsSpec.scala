package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BpeStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topPairs matches a hand count (frequency-weighted, overlapping)") {
    val docs = Seq(
      (0L, "aaab ab"),
      (1L, "aaab x")
    ).toDF("doc_id", "text")
    // vocab: aaab f=2, ab f=1, x dropped (len<2)
    // pairs: aaab -> aa, aa, ab (overlapping); ab -> ab
    // counts: aa = 2*2 = 4; ab = 2*1 + 1 = 3
    val got = BpeStats.topPairs(docs, col("text"), 10)
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "aa", 4L), (2, "ab", 3L)))
  }

  test("ties rank lexicographically; k caps the output") {
    val docs = Seq((0L, "ab cd ab cd ef")).toDF("doc_id", "text")
    val got = BpeStats.topPairs(docs, col("text"), 2)
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "ab", 2L), (2, "cd", 2L)))
  }

  test("pair work is vocabulary-sized: repeated words count once via f") {
    val many = (0L until 50L).map(i => (i, "zz zz zz")).toDF("doc_id", "text")
    val vocab = BpeStats.wordFreqs(many, col("text")).collect()
    assert(vocab.length === 1 && vocab.head.getLong(1) === 150L)
    val got = BpeStats.topPairs(many, col("text"), 5)
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "zz", 150L)))
  }
}
