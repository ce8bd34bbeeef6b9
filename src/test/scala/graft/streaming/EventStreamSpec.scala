package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals the batch q_event_windows result") {
    import spark.implicits._
    val streamed = EventStream.runOnce(spark, TestSpark.sf001, "stream_windows")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = graft.Queries.queries("q_event_windows")(spark, TestSpark.sf001)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stateful streaming dedup equals batch exactDedup keep_ids (single batch)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val streamed = EventStream.runDedupOnce(spark, TestSpark.sf001, "stream_dedup")
      .as[(String, Long)].collect().toMap
    val batch = graft.dedup.Dedup.exactDedup(
        spark.read.parquet(s"${TestSpark.sf001}/documents.parquet"),
        substring(col("text"), 1, 30), col("doc_id"))
      .select("k", "keep_id").as[(String, Long)].collect().toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup state swallows re-sent keys across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = EventStream.streamingDedup(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("dedup_two_batches").start()
    input.addData(("a", 5L), ("a", 3L), ("b", 7L))
    q.processAllAvailable()
    input.addData(("a", 1L), ("c", 9L)) // 'a' already seen -> swallowed
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_two_batches").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 7L, "c" -> 9L))
  }
}
