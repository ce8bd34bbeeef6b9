package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-pruning data layout — the write-side half of "push down and
  * prune". A 100 TB table is only as fast as what a query can SKIP:
  *
  *  - a coarse DIRECTORY partition column gives file-level partition
  *    pruning (Catalyst's `PartitionFilters` never opens non-matching
  *    directories);
  *  - RANGE-repartitioning + an in-partition sort on the fine cluster key
  *    gives tight parquet row-group min/max stats, so the pushed-down
  *    range predicate skips row groups inside the files that do match
  *    (the Z-order/OPTIMIZE discipline — for a single key a plain range
  *    cluster IS the optimal order; for multi-column locality callers
  *    pass a Morton/Hilbert code from `spatial.CellGrid.mortonCol`).
  *
  * Reference analog: the reference splits work by cadastral zone and
  * reads one zone's features at a time (app.py task splitting); here the
  * zone key is baked into the STORAGE layout so the engine's zone-scoped
  * queries never touch the rest of the corpus. */
object Layout {

  /** Write `df` clustered: directory-partitioned by `partCol` (coarse,
    * bounded cardinality — e.g. cell >> k), range-clustered and sorted by
    * `clusterCol` within each of `n` output slices. Deterministic layout:
    * range boundaries come from the data, the in-file order from the
    * sort. */
  def writeClustered(df: DataFrame, clusterCol: String, partCol: String,
                     path: String, n: Int): Unit =
    df.repartitionByRange(n, col(partCol), col(clusterCol))
      .sortWithinPartitions(partCol, clusterCol)
      .write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** The matching read: partition + pushed-filter pruning happen in the
    * scan when the caller filters on `partCol` / `clusterCol` — this
    * helper only centralizes the path so specs can assert the plan. */
  def readClustered(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path)
}
