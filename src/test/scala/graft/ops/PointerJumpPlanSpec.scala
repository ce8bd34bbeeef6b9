package graft.ops
import org.scalatest.funsuite.AnyFunSuite
/** Plan-shape guard for the pointer-jump round: the hop subplan feeds both
  * sides of the shortcut self-join, and Spark must REUSE its aggregate
  * exchange rather than recompute it — the property the in-code comment in
  * Adjacency.connectedComponentsWithRounds relies on. */
class PointerJumpPlanSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  test("pointer-jump round plan reuses the nbrMin aggregate exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val labels = (0L until 100L).map(i => (i, i)).toDF("bid", "comp").localCheckpoint()
    val edges = (0L until 99L).map(i => (i, i + 1)).toDF("a", "b")
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b"))).localCheckpoint()
    val nbrMin = sym.join(labels, sym("b") === labels("bid"))
      .groupBy(sym("a").as("bid")).agg(min("comp").as("nbr_comp"))
    val hop = labels.join(nbrMin, Seq("bid"), "left")
      .select(col("bid"), col("comp").as("old"),
        least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("c1"))
    val jump = hop.select(col("bid").as("jbid"), col("c1").as("jc"))
    val next = hop.join(jump, hop("c1") === jump("jbid"), "left")
      .select(col("bid"), col("old"),
        least(col("c1"), coalesce(col("jc"), col("c1"))).as("comp"))
    next.collect()
    val plan = next.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty, plan)
  }
}
