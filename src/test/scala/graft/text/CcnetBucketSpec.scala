package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** CCNet tercile bucketing: per-language LM isolation, data-derived
  * tercile cuts, and the unscored-language drop rule. */
class CcnetBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, Boolean)])
      : Map[Long, (String, String)] =
    LangModel.ccnetBuckets(
        rows.toDF("doc_id", "text", "lang", "is_ref"),
        "doc_id", "text", "lang", col("is_ref"))
      .select("doc_id", "lang", "bucket")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("terciles split a 6-doc language into 2 head / 2 middle / 2 tail") {
    // ref slice: "x x" is the likely bigram and the vocabulary holds 5
    // head words (V=5), so unseen bigrams cost more than seen ones and
    // each extra y strictly raises a doc's average cost
    val ref = Seq(
      (100L, "x x x x x x x x", "aa", true),
      (101L, "u v u v u v u v", "aa", true),
      (102L, "p q p q p q p q", "aa", true))
    val docs = Seq(
      (1L, "x x x x x x", "aa", false), // same avg as ref doc 100 -> head
      (2L, "x x x x x y", "aa", false),
      (3L, "x x x x y y", "aa", false),
      (4L, "x x x y y y", "aa", false),
      (5L, "x x y y y y", "aa", false),
      (6L, "x y y y y y", "aa", false))
    val got = run(ref ++ docs)
    // 9 scored docs in lang aa: q333 lands on the shared cheapest value
    // (3 ref + doc 1 -> head), q667 on doc 4 -> docs 2-4 middle, 5-6 tail
    val buckets = (1L to 6L).map(got(_)._2)
    assert(buckets == Seq("head", "middle", "middle", "middle",
      "tail", "tail"), s"got $buckets")
  }

  test("languages are scored under their OWN LM; unscored langs drop") {
    // 'q z' is a trained bigram in lang aa's ref but alien to lang bb's;
    // identical text must therefore score differently per language.
    val rows = Seq(
      (1L, "q z q z q z", "aa", true),
      (2L, "m n m n m n", "bb", true),
      (3L, "q z q z q z", "aa", false),
      (4L, "q z q z q z", "bb", false),
      (5L, "hello there", "cc", false)) // no ref slice for cc
    val out = LangModel.ccnetBuckets(
        rows.toDF("doc_id", "text", "lang", "is_ref"),
        "doc_id", "text", "lang", col("is_ref"))
      .select("doc_id", "lang", "cost_unats")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(!out.contains(5L), "lang without a trusted slice must drop")
    assert(out(3L) < out(4L),
      "the aa-trained bigrams must be cheaper under aa's LM than bb's")
  }
}
