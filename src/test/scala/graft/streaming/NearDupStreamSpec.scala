package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming near-dup filter == batch minhash verdicts: documents streamed
  * against a static corpus drop exactly when the BATCH minhash pipeline
  * finds a >= threshold corpus match. */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def doc(seed: Int, n: Int = 60): String =
    (0 until n).map(i => s"w${seed}_${(i * 7) % 23}_$i").mkString(" ")

  test("stream survives exactly the docs without a corpus near-dup") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // corpus: 4 docs; stream: 2 near-copies (1-word edit) + 2 fresh docs
    val corpus = Seq((100L, doc(1)), (101L, doc(2)), (102L, doc(3)), (103L, doc(4)))
      .toDF("doc_id", "text")
    def edited(s: String) = s.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 30) "EDITED" else w }.mkString(" ")
    val streamDocs = Seq(
      (1L, edited(doc(1))), // near-dup of corpus 100 -> dropped
      (2L, doc(2)),         // exact dup of corpus 101 -> dropped
      (3L, doc(50)),        // fresh -> survives
      (4L, doc(51)))        // fresh -> survives
    val input = MemoryStream[(Long, String)]
    val q = EventStream.nearDupFilter(
        input.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("append").format("memory")
      .queryName("near_dup_stream").start()
    input.addData(streamDocs.take(2): _*)
    q.processAllAvailable()
    input.addData(streamDocs.drop(2): _*) // second batch: static index reused
    q.processAllAvailable()
    q.stop()
    val survived = spark.table("near_dup_stream")
      .as[(Long, String)].collect().map(_._1).toSet

    // batch ground truth: union corpus+stream, minhash pairs, a stream doc
    // dies iff it pairs with a corpus doc at the same threshold
    val union = corpus.union(streamDocs.toDF("doc_id", "text"))
    val pairs = graft.dedup.Dedup
      .minhashNearDups(union, "doc_id", "text", threshold = 0.6)
      .as[(Long, Long, Double)].collect()
    graft.CacheBin.drain()
    val dropped = pairs.collect {
      case (a, b, _) if a >= 100 && b < 100 => b
      case (a, b, _) if b >= 100 && a < 100 => a
    }.toSet
    val expect = streamDocs.map(_._1).toSet -- dropped
    assert(survived === expect)
    assert(survived.contains(3L) && survived.contains(4L))
    assert(!survived.contains(1L) && !survived.contains(2L))
  }
}
