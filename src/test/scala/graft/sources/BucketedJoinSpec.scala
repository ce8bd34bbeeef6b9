package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bucketing = the write-once shuffle: two tables bucketed+sorted on the
  * join key must join with ZERO ShuffleExchange operators and produce the
  * same rows as the plain shuffled join. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-located bucketed join is exchange-free and row-identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang")
    val scores = docs.select(col("doc_id"), (col("doc_id") % 97).as("score"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the co-location claim is tested against the
      // shuffle path it replaces
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketed.writeBucketed(docs, "bkt_docs", "doc_id", 8)
      Bucketed.writeBucketed(scores, "bkt_scores", "doc_id", 8)
      val joined = Bucketed.coLocatedJoin(spark, "bkt_docs", "bkt_scores", "doc_id")
      val rows = joined.collect()
      assert(rows.length === docs.count())
      assert(Bucketed.shuffleCount(joined) === 0,
        s"plan shuffles:\n${joined.queryExecution.executedPlan}")
      // the plain (non-bucketed) join DOES shuffle — the baseline bucketing removes
      val plain = docs.join(scores, "doc_id")
      plain.collect()
      assert(Bucketed.shuffleCount(plain) > 0)
      // values identical
      val a = joined.select("doc_id", "lang", "score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      val b = plain.select("doc_id", "lang", "score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(a.toSeq === b.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS bkt_docs")
      spark.sql("DROP TABLE IF EXISTS bkt_scores")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange either") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    try {
      Bucketed.writeBucketed(docs, "bkt_docs2", "doc_id", 8)
      val agg = spark.table("bkt_docs2").groupBy("doc_id")
        .agg(count(lit(1)).as("n"))
      agg.collect()
      assert(Bucketed.shuffleCount(agg) === 0,
        s"plan shuffles:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_docs2")
    }
  }
}
