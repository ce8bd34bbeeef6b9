package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Bucketed

/** Scan-only token entropy: parity with a plain-Scala histogram replica
  * (including all-same and all-distinct edges), and the plan contract —
  * zero shuffles, the whole computation happens inside the row. */
class EntropySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def replica(text: String): (Long, Long, Double) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val n = toks.length
    val hist = toks.groupBy(identity).map(_._2.length)
    val ent = hist.map { c =>
      c * math.round(-math.log(c.toDouble / n) * 1e6)
    }.sum
    val ttr = BigDecimal(hist.size.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (n.toLong, ent, ttr)
  }

  private val docs = Seq(
    (1L, "a b c d e f g h"),             // all distinct: entropy = n*ln(n)
    (2L, "x x x x x x"),                 // all same: entropy = 0
    (3L, "the cat the dog the fish"),    // mixed multiplicities
    (4L, "w"),                           // single token
    (5L, "a a b b b c d d d d"))

  private def run() = {
    val toks = filter(split(col("text"), " "), x => length(x) > lit(0))
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        size(toks).cast("long").as("n"),
        TextFns.tokenEntropyUnats(toks).as("ent"),
        TextFns.typeTokenRatio(toks).as("ttr"))
  }

  test("matches the histogram replica on every edge") {
    val got = run().collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for ((id, text) <- docs) {
      assert(got(id) === replica(text), s"doc $id: '$text'")
    }
  }

  test("zero shuffles: the histogram never leaves the row") {
    val out = run()
    out.collect()
    assert(Bucketed.shuffleCount(out) === 0,
      s"plan:\n${out.queryExecution.executedPlan}")
  }
}
