package graft.spatial

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** AQE runtime re-planning on skew (the brief's "salting for skew, AQE for
  * runtime re-plan"): a join where one key owns half the rows must get its
  * skewed partition SPLIT by OptimizeSkewedJoin — no manual salting — and
  * produce the same result as the unskewed plan. Salting remains the lever
  * for skew AQE cannot see (broadcast-side hot cells, pipJoinSalted). */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits the skewed partition and keeps the answer exact") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      import spark.implicits._
      // 200k rows, half of them on key 0; payload pads bytes so the skewed
      // partition crosses the threshold
      val left = spark.range(200000)
        .select(
          when(col("id") % 2 === 0, 0L).otherwise(col("id") % 1000).as("k"),
          concat(lit("x"), col("id")).as("payload"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 7).as("v"))
      val joined = left.join(right, "k")
      // execute THIS plan (a count() would plan a different query and leave
      // this adaptive plan unfinalized)
      val n = joined.collect().length
      assert(n === 200000)
      // stringify the FINAL adaptive plan (the wrapper's toString stays
      // "isFinalPlan=false" until unwrapped)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true") || finalPlan.contains("isSkew=true") ||
        finalPlan.toLowerCase.contains("skewed"),
        s"OptimizeSkewedJoin did not trigger:\n${finalPlan.take(3000)}")
      // exactness: per-key counts match the closed form
      val byK = joined.groupBy("k").count().as[(Long, Long)].collect().toMap
      assert(byK(0L) === 100000L)
      assert(byK(1L) === 200L) // ids ≡ 1 (mod 1000) are all odd -> 200 of them
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
