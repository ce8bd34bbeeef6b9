package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** Burst detection vs a hand-built window series: the integer threshold
  * rule, explicit warm-up (no burst without a full trailing history),
  * non-empty-window frame semantics, and partitioning invariance. */
class BurstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one event row per (key, win) unit of count
  private def ev(rows: (String, Long, Int)*): Seq[(String, Long)] =
    rows.flatMap { case (k, w, n) => Seq.fill(n)((k, w)) }

  test("threshold rule with warm-up and gap-skipping frames") {
    // key a: counts 2,2,2 then 10 -> burst at win 4 (10 > 1.5*avg(2,2,2));
    // win 5 count 3 vs trailing (2,2,10): 3*2=6 vs mean*... 3*3*2=18 >
    // 14*3=42? no -> not a burst. Wins 1..3 have no full history.
    // key b: empty win 3 is ABSENT, so win 10's trailing frame is
    // (1,1,1) from wins 0,1,2 -> 5 bursts across the gap.
    val rows = ev(
      ("a", 1L, 2), ("a", 2L, 2), ("a", 3L, 2), ("a", 4L, 10), ("a", 5L, 3),
      ("b", 0L, 1), ("b", 1L, 1), ("b", 2L, 1), ("b", 10L, 5))
    val got = Temporal.bursts(rows.toDF("k", "w"), "k", col("w"),
        baseline = 3, num = 3L, den = 2L)
      .select("k", "win", "n", "trail", "trail_w", "burst")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    val want = Set(
      ("a", 1L, 2L, 0L, 0L, false),
      ("a", 2L, 2L, 2L, 1L, false),
      ("a", 3L, 2L, 4L, 2L, false),
      ("a", 4L, 10L, 6L, 3L, true),
      ("a", 5L, 3L, 14L, 3L, false),
      ("b", 0L, 1L, 0L, 0L, false),
      ("b", 1L, 1L, 1L, 1L, false),
      ("b", 2L, 1L, 2L, 2L, false),
      ("b", 10L, 5L, 3L, 3L, true))
    assert(got == want)
  }

  test("result is invariant to input partitioning") {
    val rows = (0L until 400L).map(i => (s"k${i % 5}", i % 40))
    val a = Temporal.bursts(rows.toDF("k", "w").repartition(13), "k", col("w"), 2, 2L, 1L)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    val b = Temporal.bursts(rows.toDF("k", "w").repartition(1), "k", col("w"), 2, 2L, 1L)
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
