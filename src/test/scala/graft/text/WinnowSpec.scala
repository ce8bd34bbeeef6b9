package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Winnowing fingerprints vs an in-JVM replay of the same packed-min
  * rule, plus the shared-substring guarantee and coverage density. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val HMod = 1099511627776L // 2^40

  private def hash48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  private def replay(docs: Seq[(Long, String)], k: Int, w: Int)
      : Set[(Long, Long, Long)] =
    docs.flatMap { case (id, text) =>
      val l = text.split(" ").filter(_.nonEmpty)
      if (l.length < k) Seq.empty
      else {
        val packed = (0 to l.length - k).map { i =>
          hash48(l.slice(i, i + k).mkString(" ")) % HMod * 32768L + (32767L - i)
        }
        packed.indices.map { p =>
          packed.slice(math.max(0, p - w + 1), p + 1).min
        }.distinct.map(s => (id, 32767L - s % 32768L, s / 32768L))
      }
    }.toSet

  test("selection matches the packed-min replay") {
    val docs = Seq(
      1L -> "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11",
      2L -> "a b c d",         // exactly one gram: one fingerprint
      3L -> "x y z",           // fewer tokens than k: no rows
      4L -> "a b c d a b c d a b c d") // repeated grams dedupe per doc
    val got = Winnow.fingerprints(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), k = 4, w = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == replay(docs, 4, 5))
    assert(got.exists(_._1 == 2L) && !got.exists(_._1 == 3L))
  }

  test("shared run of >= w+k-1 tokens yields an identical selected hash") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8" // 8 tokens = w+k-1 with k=4,w=5
    val docs = Seq(
      10L -> s"p1 p2 p3 $shared q1 q2",
      20L -> s"r1 $shared t1 t2 t3 t4")
    val fps = Winnow.fingerprints(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 4, 5)
      .as[(Long, Long, Long)].collect()
    val h10 = fps.filter(_._1 == 10L).map(_._3).toSet
    val h20 = fps.filter(_._1 == 20L).map(_._3).toSet
    assert((h10 & h20).nonEmpty)
  }

  test("near-dup pairs find planted shared prefixes and honor the cap") {
    val shared = (0 until 20).map(i => s"sh$i").mkString(" ")
    val boiler = (0 until 20).map(i => s"bp$i").mkString(" ")
    // docs 1-3 share a 20-token run; docs 4-5 are unrelated; ALL docs
    // carry the same boilerplate run, which the cap must neutralize
    val docs = Seq(
      1L -> s"$boiler $shared a1 a2 a3",
      2L -> s"b1 $boiler $shared b2",
      3L -> s"c1 c2 $shared $boiler",
      4L -> s"$boiler d1 d2 d3 d4 d5 d6 d7 d8",
      5L -> s"e1 e2 e3 e4 e5 e6 e7 e8 $boiler")
    val got = Winnow.nearDupPairs(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 4, 5, minShared = 2L, maxHashDocs = 4L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("every w-window of gram positions contains a selection") {
    val text = (0 until 60).map(i => s"t${i % 17}").mkString(" ")
    val sel = Winnow.fingerprints(Seq(5L -> text).toDF("doc_id", "text"),
        col("doc_id"), col("text"), 4, 5)
      .as[(Long, Long, Long)].collect().map(_._2).toSet
    val m = 60 - 4 + 1
    (0 until m).foreach { p =>
      val win = (math.max(0, p - 4) to p)
      assert(win.exists(sel.contains(_)), s"window ending at $p uncovered")
    }
  }
}
