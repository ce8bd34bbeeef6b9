package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bucketOf(id: Long): Long = TestSpark.md5Bucket(id)

  private def tokensOf(i: Long): Long = 5L + i % 13

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, tokensOf(i))).toDF("doc_id", "n_tokens")
  }

  /** Global single-stream packing: the definition seqPack must reproduce. */
  private def brute(n: Int, L: Long): Map[Long, (Long, Long, Long)] = {
    val ordered = (0 until n).map(i => (i.toLong, tokensOf(i)))
      .sortBy { case (id, _) => (bucketOf(id), id) }
    var cum = 0L
    ordered.map { case (id, t) =>
      val first = cum / L
      val nSeqs = if (t > 0) (cum + t - 1) / L - first + 1 else 0L
      cum += t
      id -> ((t, first, nSeqs))
    }.toMap
  }

  test("seqPack equals the global-stream brute force at several seq lengths") {
    import spark.implicits._
    val n = 500
    for (l <- Seq(1L, 7L, 128L, 100000L)) {
      val got = Packing.seqPack(corpus(n), "doc_id", col("n_tokens"), l)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, t, f, s) => id -> ((t, f, s)) }.toMap
      assert(got === brute(n, l), s"seqLen=$l")
    }
  }

  test("packing laws: dense sequence ids, boundary-spanning docs, totals") {
    import spark.implicits._
    val n = 500
    val l = 64L
    val rows = Packing.seqPack(corpus(n), "doc_id", col("n_tokens"), l)
      .as[(Long, Long, Long, Long)].collect()
    val total = (0 until n).map(i => tokensOf(i.toLong)).sum
    // the stream fills exactly ceil(total/L) sequences, 0-based and dense
    val lastSeq = rows.map { case (_, _, f, s) => f + s - 1 }.max
    assert(lastSeq === (total - 1) / l)
    val covered = rows.flatMap { case (_, _, f, s) => f until (f + s) }.toSet
    assert(covered === (0L to lastSeq).toSet)
    // per-sequence token mass is exactly L for every non-final sequence:
    // clip each doc's span to each sequence it touches
    val ordered = rows.sortBy { case (id, _, _, _) => (bucketOf(id), id) }
    var cum = 0L
    val perSeq = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    ordered.foreach { case (_, t, f, s) =>
      var pos = cum
      val end = cum + t
      (f until (f + s)).foreach { q =>
        val hi = math.min(end, (q + 1) * l)
        perSeq(q) += hi - math.max(pos, q * l)
        pos = hi
      }
      cum = end
    }
    (0L until lastSeq).foreach(q => assert(perSeq(q) === l, s"seq=$q"))
    assert(perSeq(lastSeq) === total - lastSeq * l)
    // docs longer than L always span at least 2 sequences... given they
    // exist at this L in the corpus shape (max doc = 17 tokens < 64), use
    // L=7 to exercise real spanning
    val spans = Packing.seqPack(corpus(n), "doc_id", col("n_tokens"), 7L)
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.count { case (_, t, _, s) => t > 7 && s < 2 } === 0)
    assert(spans.exists { case (_, _, _, s) => s >= 2 })
  }

  test("zero-token documents occupy no sequence and shift nothing") {
    import spark.implicits._
    val docs = Seq((0L, 3L), (1L, 0L), (2L, 5L), (3L, 0L), (4L, 4L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.seqPack(docs, "doc_id", col("n_tokens"), 4L)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, t, f, s) => id -> ((t, f, s)) }.toMap
    val ordered = Seq((0L, 3L), (1L, 0L), (2L, 5L), (3L, 0L), (4L, 4L))
      .sortBy { case (id, _) => (bucketOf(id), id) }
    var cum = 0L
    val expect = ordered.map { case (id, t) =>
      val f = cum / 4
      val s = if (t > 0) (cum + t - 1) / 4 - f + 1 else 0L
      cum += t
      id -> ((t, f, s))
    }.toMap
    assert(got === expect)
    assert(got.collect { case (_, (0, _, s)) => s }.forall(_ === 0L))
  }
}
