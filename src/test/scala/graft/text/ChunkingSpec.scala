package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Stride chunking vs a brute-force sliding replay: exact windows,
  * ragged tails, overlap, empty docs, stride == size (no overlap). */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replay(docs: Seq[(Long, String)], size: Int, stride: Int)
      : Set[(Long, Int, String, Int)] =
    docs.flatMap { case (id, text) =>
      val l = text.split(" ").filter(_.nonEmpty)
      (0 until l.length by stride).zipWithIndex.map { case (s, ci) =>
        val c = l.slice(s, math.min(s + size, l.length))
        (id, ci, c.mkString(" "), c.length)
      }
    }.toSet

  test("chunks match the sliding replay (overlap + ragged tail)") {
    val docs = Seq(
      1L -> "a b c d e f g h i j",   // 10 tokens: starts 0,4,8 → sizes 8,6,2
      2L -> "x",                      // single token: one 1-token chunk
      3L -> "",                       // no tokens: no rows
      4L -> " p  q ")                 // whitespace noise filtered
    val got = Chunking.chunk(docs.toDF("doc_id", "text"), col("text"), 8, 4)
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(got == replay(docs, 8, 4))
    assert(!got.exists(_._1 == 3L))
    // every token of doc 1 is covered by at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered == "a b c d e f g h i j".split(" ").toSet)
  }

  test("stride == size gives disjoint exact partitioning") {
    val docs = Seq(1L -> "t0 t1 t2 t3 t4 t5")
    val got = Chunking.chunk(docs.toDF("doc_id", "text"), col("text"), 3, 3)
      .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Int, String, Int)].collect().toSet
    assert(got == Set((1L, 0, "t0 t1 t2", 3), (1L, 1, "t3 t4 t5", 3)))
  }
}
