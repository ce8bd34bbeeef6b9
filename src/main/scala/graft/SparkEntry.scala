package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in graft.Queries; this object just exposes it.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the spatial cell-join + PIP
    * + per-zone-tile count (the BASELINE metric's query shape). */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q_zone_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
