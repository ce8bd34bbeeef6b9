package graft.ops
import org.scalatest.funsuite.AnyFunSuite
/** Plan-shape guard for the alternating-star round: the large-star output
  * e1 is NOT checkpointed — it feeds both small-star consumers (the
  * per-node min aggregate and the re-attach join), and Spark must REUSE
  * its distinct's exchange rather than compute the large-star subplan
  * twice — the property the in-code comment in
  * Adjacency.connectedComponentsWithRounds relies on. */
class AltStarPlanSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  test("small-star consumers reuse the large-star distinct exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = (0L until 99L).map(i => (i + 1, i)).toDF("u", "v").localCheckpoint()
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
    val mL = sym.groupBy(col("a")).agg(least(min(col("b")), first(col("a"))).as("m"))
    val e1 = sym.where(col("b") > col("a"))
      .join(mL, Seq("a"))
      .select(col("b").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val mS = e1.groupBy(col("u")).agg(min(col("v")).as("m"))
    val withM = e1.join(mS, Seq("u"))
    val e2 = withM
      .select(col("v").as("n"), col("m"))
      .union(withM.select(col("u").as("n"), col("m")))
      .where(col("n") =!= col("m"))
      .select(greatest(col("n"), col("m")).as("u"), least(col("n"), col("m")).as("v"))
      .distinct()
    e2.collect()
    val plan = e2.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty, plan)
  }
}
