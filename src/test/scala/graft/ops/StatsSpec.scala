package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Bucketed

/** Sort-free exact quantiles: parity with the plain sorted-sequence
  * type-1 definition on random data, and the plan contract — the only
  * shuffles are the histogram aggregate and the per-group window over it
  * (no corpus-wide range exchange). */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // type-1 discrete quantile on a sorted seq: smallest x with rank >= ceil(q*n)
  private def q1(sorted: Seq[Long], p: Int): Long = {
    val n = sorted.length
    val rank = (p * n + 999) / 1000 // ceil
    sorted(math.max(rank, 1) - 1)
  }

  test("matches the sorted-sequence definition, incl. ties and tiny groups") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ => ("g" + rnd.nextInt(3), rnd.nextInt(40).toLong)) ++
      Seq(("solo", 99L)) // 1-element group: every quantile = the element
    val got = Stats.exactQuantiles(
        rows.toDF("g", "v"), "g", "v", Seq(250, 500, 900, 990, 1000))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted
      val (n, a, b, c, d, e) = got(g)
      assert(n === sorted.length.toLong, s"n of $g")
      assert((a, b, c, d, e) ===
        ((q1(sorted, 250), q1(sorted, 500), q1(sorted, 900),
          q1(sorted, 990), q1(sorted, 1000))), s"quantiles of $g")
    }
  }

  test("two shuffles total: histogram agg + per-group window, no global range sort") {
    val rows = (1 to 2000).map(i => ("g" + (i % 4), (i % 57).toLong))
    val out = Stats.exactQuantiles(rows.toDF("g", "v"), "g", "v", Seq(500, 990))
    out.collect()
    assert(Bucketed.shuffleCount(out) === 2,
      s"plan:\n${out.queryExecution.executedPlan}")
  }
}
