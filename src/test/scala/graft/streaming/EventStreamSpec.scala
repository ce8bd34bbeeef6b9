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
}
