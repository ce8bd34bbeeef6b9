package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.dedup.Dedup
import graft.sources.Bucketed

/** Incremental ingestion dedup against the bucketed corpus-key index:
  * exact anti-join semantics, min-id in-batch survivor, and the plan
  * contract — the corpus-sized index side joins with ZERO exchange, the
  * whole ingest is ONE shuffle (batch side; the groupBy reuses it). */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keeps only unseen keys, one min-id survivor per in-batch key") {
    val corpus = Seq((100L, "A"), (101L, "B")).toDF("doc_id", "k0")
    val incoming = Seq((1L, "B"), (2L, "C"), (3L, "C"), (4L, "D"))
      .toDF("doc_id", "k0")
    Dedup.writeDedupIndex(corpus, col("k0"), "dedup_idx_spec", 4)
    val out = Dedup.incrementalNew(incoming, "doc_id", col("k0"), "dedup_idx_spec")
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("C", 2L, 2L), ("D", 4L, 1L)))
  }

  test("rolling ingest: appended keys dedup the next batch") {
    val corpus = Seq((100L, "A")).toDF("doc_id", "k0")
    Dedup.writeDedupIndex(corpus, col("k0"), "dedup_idx_roll", 4)
    val batch1 = Seq((1L, "B"), (2L, "B"), (3L, "C")).toDF("doc_id", "k0")
    val kept1 = Dedup.incrementalNew(batch1, "doc_id", col("k0"), "dedup_idx_roll")
    assert(kept1.count() === 2) // B, C
    Dedup.appendDedupIndex(kept1, "dedup_idx_roll")
    // batch2 re-sends B and C (now indexed) plus a genuinely new D
    val batch2 = Seq((10L, "B"), (11L, "C"), (12L, "D")).toDF("doc_id", "k0")
    val kept2 = Dedup.incrementalNew(batch2, "doc_id", col("k0"), "dedup_idx_roll")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(kept2.toSeq.sorted === Seq(("D", 12L)))
  }

  test("one exchange total: the bucketed index never shuffles or sorts") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast: the claim is about the sort-merge path the
      // bucketing exists for (a broadcast anti would hide the exchange)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val corpus = (0L until 200L).map(i => (i, s"k${i % 50}")).toDF("doc_id", "k0")
      val incoming = (1000L until 1100L).map(i => (i, s"k${i % 80}")).toDF("doc_id", "k0")
      Dedup.writeDedupIndex(corpus, col("k0"), "dedup_idx_spec2", 4)
      val out = Dedup.incrementalNew(incoming, "doc_id", col("k0"), "dedup_idx_spec2")
      out.collect()
      assert(Bucketed.shuffleCount(out) === 1,
        s"plan:\n${out.queryExecution.executedPlan}")
      // exactness: same rows as the logical anti-join + groupBy
      val expect = incoming.join(corpus.select(col("k0")).distinct(), Seq("k0"), "left_anti")
        .groupBy("k0").agg(min("doc_id"), count(lit(1)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val got = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq === expect.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
