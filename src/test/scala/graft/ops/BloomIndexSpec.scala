package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.dedup.Bloom
import graft.sources.Bucketed

/** Persisted bucketed Bloom index: probe parity with the in-session
  * filter, append-then-probe exactness (bit_or merge of appended rows),
  * and the zero-index-exchange plan contract.
  */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nWords = 32L

  test("probeIndex equals probe against the in-session filter") {
    val corpus = (0 until 300).map(i => s"key-$i").toDF("k")
    val probes = (0 until 600).map(i => (i.toLong, s"key-$i")).toDF("id", "k")
    Bloom.writeIndex(corpus, "k", nWords, "bloom_idx_spec", 4)
    val direct = Bloom.probe(Bloom.build(corpus, "k", nWords), probes, "k", nWords)
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    val viaIdx = Bloom.probeIndex(probes, "k", nWords, "bloom_idx_spec")
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    assert(viaIdx === direct)
  }

  test("append merges at probe time: membership = union of both writes") {
    val first = (0 until 100).map(i => s"a-$i").toDF("k")
    val more = (0 until 100).map(i => s"b-$i").toDF("k")
    Bloom.writeIndex(first, "k", nWords, "bloom_idx_app", 4)
    Bloom.appendIndex(more, "k", nWords, "bloom_idx_app")
    val probes = ((0 until 100).map(i => s"a-$i") ++
      (0 until 100).map(i => s"b-$i")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = Bloom.probeIndex(probes, "k", nWords, "bloom_idx_app")
      .select("maybe_seen").as[Boolean].collect()
    assert(got.forall(identity), "false negative after append")
    // and the merged index equals a single-shot build over the union
    val union = ((0 until 100).map(i => s"a-$i") ++
      (0 until 100).map(i => s"b-$i")).toDF("k")
    val direct = Bloom.probe(Bloom.build(union, "k", nWords),
        probes, "k", nWords)
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    val viaIdx = Bloom.probeIndex(probes, "k", nWords, "bloom_idx_app")
      .select("id", "maybe_seen").as[(Long, Boolean)].collect().toMap
    assert(viaIdx === direct)
  }

  test("the bucketed index side reaches its join with zero exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val corpus = (0 until 500).map(i => s"key-$i").toDF("k")
      val probes = (0 until 100).map(i => (i.toLong, s"key-${i * 7}")).toDF("id", "k")
      Bloom.writeIndex(corpus, "k", nWords, "bloom_idx_plan", 4)
      val out = Bloom.probeIndex(probes, "k", nWords, "bloom_idx_plan")
      out.collect()
      assert(Bucketed.shufflesAboveScan(out, "bloom_idx_plan") === 0,
        s"plan:\n${out.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
