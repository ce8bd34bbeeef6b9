package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Exact duplicate-span detection: shared-gram marking, self-repeat
  * periodicity, the touch-vs-gap merge boundary (next.pos ≤ prev.pos + k),
  * and partitioning invariance. k = 8 throughout. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docs = Seq(
    // shared 8-gram "a b c d e f g h" at pos 0 / pos 2
    (1L, "a b c d e f g h x y z"),
    (2L, "q r a b c d e f g h w"),
    // pure period-8 self-repeat: every window duplicated -> one full span
    (3L, ("m n o p s t u v " * 3).trim),
    // no duplicated 8-gram at all
    (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"),
    // two dup windows 9 apart -> gap (9 > 8): two spans
    (5L, "a b c d e f g h J a b c d e f g h"),
    // two dup windows 8 apart -> touch (8 <= 8): one merged span
    (6L, "x a b c d e f g h a b c d e f g h"))

  test("spans on the hand fixture: sharing, self-repeat, merge boundary") {
    import spark.implicits._
    val out = SpanDedup.dupSpans(docs.toDF("doc_id", "text"), k = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(out === Set(
      (1L, 0L, 7L, 8L),
      (2L, 2L, 9L, 8L),
      (3L, 0L, 23L, 24L),
      (5L, 0L, 7L, 8L), (5L, 9L, 16L, 8L),
      (6L, 1L, 16L, 16L)))
  }

  test("dupProfile rolls the span stream up per doc") {
    import spark.implicits._
    val out = SpanDedup.dupProfile(docs.toDF("doc_id", "text"), k = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(out === Set(
      (1L, 1L, 8L, 8L), (2L, 1L, 8L, 8L), (3L, 1L, 24L, 24L),
      (5L, 2L, 16L, 8L), (6L, 1L, 16L, 16L)))
  }

  test("docs shorter than k produce no gram rows; result partitioning-invariant") {
    import spark.implicits._
    val withShort = (docs :+ (9L, "one two three")).toDF("doc_id", "text")
    val a = SpanDedup.dupSpans(withShort.repartition(1), k = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.CacheBin.drain()
    val b = SpanDedup.dupSpans(withShort.repartition(11), k = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(a === b)
    assert(!a.exists(_._1 == 9L))
  }
}
