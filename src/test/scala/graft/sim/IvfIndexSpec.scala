package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Bucketed

/** Persisted IVF index: a query-batch probe must rank exactly like the
  * one-shot ivfTopK restricted to the batch (per-query results are
  * independent), and the corpus-sized lists table must reach its join
  * without an exchange. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic synthetic embeddings: 3 well-separated directions + noise
  private def mkEmb(n: Int) = {
    (0 until n).map { i =>
      val base = Array.fill(8)(0.05f * ((i * 7919) % 11 - 5))
      base(i % 3) = 1.0f + 0.01f * (i % 17)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
  }

  test("probe == one-shot ivfTopK restricted to the query batch") {
    val emb = mkEmb(120)
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", "ivf_spec_idx", 4,
      nlist = 8, iters = 2)
    val queries = emb.filter(col("vec_id") % 5 === 0)
    val got = Similarity.ivfProbeIndex(queries, "vec_id", "embedding",
        "ivf_spec_idx", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val expect = Similarity.ivfTopK(emb, "vec_id", "embedding", 3,
        nlist = 8, iters = 2)
      .filter(col("vec_id") % 5 === 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("zero shuffle above the corpus lists scan") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val emb = mkEmb(150)
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", "ivf_spec_idx2", 4,
        nlist = 8, iters = 1)
      val out = Similarity.ivfProbeIndex(emb.filter(col("vec_id") < 20L),
        "vec_id", "embedding", "ivf_spec_idx2", 3)
      out.collect()
      assert(Bucketed.shufflesAboveScan(out, "ivf_spec_idx2_lists") === 0,
        s"plan:\n${out.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
