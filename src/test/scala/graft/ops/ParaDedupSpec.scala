package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.dedup.ParaDedup

class ParaDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w10 = (1 to 10).map(i => s"w$i").mkString(" ")

  test("paragraphs: non-overlapping 10-word chunks, ragged tail kept") {
    val docs = Seq((0L, s"$w10 tail one two")).toDF("doc_id", "text")
    val ps = ParaDedup.paragraphs(docs).orderBy("chunk_i")
      .select("chunk_i", "para").as[(Int, String)].collect()
    assert(ps.toSeq === Seq((0, w10), (1, "tail one two")))
  }

  test("first occurrence wins; later duplicates dropped; docs reassembled") {
    val docs = Seq(
      (3L, s"$w10 alpha beta"), // first occurrence of w10 (lowest doc wins,
      (7L, s"$w10 gamma"),      //  not input order)
      (9L, "gamma")             // 'gamma' already taken by doc 7 chunk 1
    ).toDF("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(docs).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    graft.CacheBin.drain()
    assert(out === Seq(
      (3L, 2L, 2L, s"$w10 alpha beta"),
      (7L, 2L, 1L, "gamma"), // its w10 chunk lost to doc 3
      (9L, 1L, 0L, "")))     // fully deduplicated away
  }

  test("corpus law: kept paragraphs == distinct paragraphs; partitioning-invariant") {
    val docs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet")
      .select("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(docs)
    val (kept, paras) = out.agg(sum("n_kept"), sum("n_paras"))
      .as[(Long, Long)].head()
    val distinctParas = ParaDedup.paragraphs(docs).select("para").distinct().count()
    assert(kept === distinctParas)
    assert(paras >= kept)
    val a = out.orderBy("doc_id").collect().toSeq
    val b = ParaDedup.dedupParagraphs(docs.repartition(7)).orderBy("doc_id")
      .collect().toSeq
    graft.CacheBin.drain()
    assert(a === b)
  }
}
