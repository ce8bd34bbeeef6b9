package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Vocabulary drift: hand-computed integer cross-product deltas, tie
  * order, and the empty-token filter. */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("delta = c_a*N_b - c_b*N_a, ranked by |delta| then word") {
    // slice A: "x x y" (N_a=3: x=2, y=1); slice B: "y y z" (N_b=3: y=2, z=1)
    val docs = Seq((1L, "x x y", false), (2L, "y y z", true))
      .toDF("id", "text", "b")
    val got = Drift.vocabDrift(docs, "text", col("b"), topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // x: 2*3 - 0*3 = 6; y: 1*3 - 2*3 = -3; z: 0*3 - 1*3 = -3
    assert(got == Seq(("x", 2L, 0L, 6L), ("y", 1L, 2L, -3L),
      ("z", 0L, 1L, -3L)))
  }

  test("double spaces yield no empty-word rows; topK truncates") {
    val docs = Seq((1L, "a  b", false), (2L, "c", true))
      .toDF("id", "text", "b")
    val got = Drift.vocabDrift(docs, "text", col("b"), topK = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.forall(_._1.nonEmpty))
    assert(got.size == 2)
  }
}
