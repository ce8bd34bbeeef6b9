package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every inventory query runs at sf0.001 and returns rows; flagship
  * entry() contract. Value-level correctness is covered by the driver's
  * DuckDB oracle (oracleSql) and the per-operator suites. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry (flagship zone-tile count) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- Queries.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is non-empty at sf0.001") {
      val df = fn(spark, TestSpark.sf001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
