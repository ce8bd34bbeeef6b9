package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bigram-LM cross-entropy scoring: parity against an independent plain-
  * Scala replica of the add-one-smoothed model on a hand-sized corpus,
  * plus the degenerate single-token and unseen-head edges. */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // independent replica: train on ref docs, cost a doc in micro-nats
  private def replica(ref: Seq[String], doc: String): (Long, Long) = {
    def pairs(s: String): Seq[(String, String)] = {
      val w = s.split(" ").toSeq
      if (w.length < 2) Seq((w.head, null)) else w.zip(w.tail)
    }
    val refPairs = ref.flatMap(pairs)
    val c1 = refPairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val c2 = refPairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = refPairs.map(_._1).distinct.size.toLong
    val dp = pairs(doc)
    val cost = dp.map { p =>
      val num = c2.getOrElse(p, 0L) + 1.0
      val den = c1.getOrElse(p._1, 0L) + v
      math.round(-math.log(num / den) * 1e6)
    }.sum
    (dp.size.toLong, cost)
  }

  private val refDocs = Seq(
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log")

  private def run(all: Seq[(Long, String, Boolean)]) =
    LangModel.perplexityBuckets(
      all.toDF("doc_id", "text", "is_ref"), "doc_id", "text", col("is_ref"),
      headMaxUnats = 1500000L, middleMaxUnats = 1800000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cost matches the independent replica, for in-ref and unseen docs") {
    val docs = refDocs.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } ++ Seq(
      (10L, "the cat sat on a log", false),   // all heads seen, mixed bigrams
      (11L, "zebra quark the cat", false),    // unseen heads -> 1/V floor
      (12L, "fish", false))                   // single token -> (w1, null)
    val got = run(docs)
    for ((id, text, _) <- docs) {
      val (n, cost) = replica(refDocs, text)
      assert(got(id)._1 === n, s"n_bigrams of '$text'")
      assert(got(id)._2 === cost, s"cost_unats of '$text'")
    }
  }

  test("buckets split at the integer thresholds; seen text scores cheaper") {
    val docs = refDocs.zipWithIndex.map { case (t, i) => (i.toLong, t, true) } :+
      ((20L, "quux corge grault zzz", false))
    val got = run(docs)
    // a reference doc is cheaper per bigram than the all-unseen doc
    val avg0 = got(0L)._2.toDouble / got(0L)._1
    val avg20 = got(20L)._2.toDouble / got(20L)._1
    assert(avg0 < avg20)
    for ((id, (n, cost, bucket)) <- got) {
      val expect = if (cost <= n * 1500000L) "head"
      else if (cost <= n * 1800000L) "middle" else "tail"
      assert(bucket === expect, s"bucket of doc $id")
    }
    // thresholds actually separate this corpus (not one degenerate bucket)
    assert(got.values.map(_._3).toSet.size >= 2)
  }
}
