package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Temporal.retentionCohorts + Temporal.funnel. */
class RetentionFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("retention: cohort = first day, ages deduped per user within a day") {
    import spark.implicits._
    // u1 first day 10, active 10,10,12 (dup on 10 collapses)
    // u2 first day 10, active 10,11 ; u3 first day 11, active 11
    val e = Seq((1L, 10L), (1L, 10L), (1L, 12L), (2L, 10L), (2L, 11L), (3L, 11L))
      .toDF("user_id", "day")
    val got = Temporal.retentionCohorts(e, "user_id", col("day"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 0L, 2L), (10L, 1L, 1L), (10L, 2L, 1L), (11L, 0L, 1L)))
  }

  test("funnel: strictly-after chaining, out-of-order steps don't count") {
    import spark.implicits._
    // u1: a@1 b@2 c@3        -> reaches 3
    // u2: b@1 a@2 b@5 c@4    -> a@2, b@5 after it, but c@4 NOT after b@5 -> 2
    // u3: a@1                -> 1
    // u4: b@1 c@2 (no a)     -> 0
    val e = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "b"), (2L, 2L, "a"), (2L, 5L, "b"), (2L, 4L, "c"),
      (3L, 1L, "a"),
      (4L, 1L, "b"), (4L, 2L, "c"))
      .toDF("user_id", "t", "event_type")
    val got = Temporal.funnel(e, "user_id", "t", "event_type", Seq("a", "b", "c"))
      .as[(Long, String, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(got === Set((1L, "a", 3L), (2L, "b", 2L), (3L, "c", 1L)))
  }

  test("funnel: equal timestamps do NOT chain (strict inequality)") {
    import spark.implicits._
    val e = Seq((1L, 5L, "a"), (1L, 5L, "b")).toDF("user_id", "t", "event_type")
    val got = Temporal.funnel(e, "user_id", "t", "event_type", Seq("a", "b"))
      .as[(Long, String, Long)].collect().toSet
    graft.CacheBin.drain()
    assert(got === Set((1L, "a", 1L), (2L, "b", 0L)))
  }
}
