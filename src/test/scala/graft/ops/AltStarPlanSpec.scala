package graft.ops
import org.scalatest.funsuite.AnyFunSuite
/** Plan-shape guard for the alternating-star round (r06 form): each star
  * phase computes its neighborhood minimum as an UNORDERED WINDOW over the
  * partitioning the phase needs anyway, so one round is exactly THREE
  * exchanges — hash(a) for the large star, hash(u) for the small star, and
  * the canonical distinct — with no aggregate+re-attach join pair left
  * anywhere (the pre-r06 shape paid ~6 exchanges per round). */
class AltStarPlanSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  test("one alternating-star round is exactly three exchanges, no joins") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val e = (0L until 99L).map(i => (i + 1, i)).toDF("u", "v").localCheckpoint()
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
    val e1 = sym
      .withColumn("m", least(col("a"),
        min(col("b")).over(Window.partitionBy("a"))))
      .where(col("b") > col("a"))
      .select(col("b").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
    val e2 = e1
      .withColumn("m", min(col("v")).over(Window.partitionBy("u")))
      .select(explode(array(
        struct(col("v").as("n"), col("m").as("m")),
        struct(col("u").as("n"), col("m").as("m")))).as("s"))
      .select(col("s.n").as("n"), col("s.m").as("m"))
      .where(col("n") =!= col("m"))
      .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
      .distinct()
    e2.collect()
    val plan = e2.queryExecution.executedPlan.toString
    // AQE prints initial AND final plans: count executed shuffle stages
    val nExchanges = "ShuffleQueryStage".r.findAllIn(plan).size
    assert(nExchanges == 3, s"expected 3 shuffle stages, got $nExchanges:\n$plan")
    assert(!plan.contains("Join"), s"no join should remain in a star round:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2, plan)
  }
}
