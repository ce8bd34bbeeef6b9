package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location (the brief's "repartition()/bucketing for
  * co-located joins"): writing both sides of a recurring equi-join bucketed
  * AND sorted by the join key stores the shuffle once at write time — every
  * later join on that key is exchange-free (SortMergeJoin with zero
  * ShuffleExchange on either side), the single biggest lever for iterative
  * 100 TB pipelines that re-join the same keyed tables per run. */
object Bucketed {

  /** Persist `df` into the session catalog bucketed+sorted by `key`.
    * Drops any prior table AND its warehouse directory first: with the
    * default in-memory catalog a previous JVM's table survives only as a
    * stale `spark-warehouse/<table>` directory that this session's catalog
    * does not know about, and CREATE TABLE AS refuses a pre-existing
    * location even in overwrite mode. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // repartition on the bucket key FIRST: bucketBy writes one file per
    // (task, bucket) pair, so an unaligned input fans out to
    // partitions × buckets small files; hash-repartitioning to the bucket
    // count uses the same murmur hash as the bucket-id assignment, so
    // each task holds exactly its own bucket — `buckets` full-size files
    // total (guide §6 output sizing), and the shuffle it costs IS the
    // write-time shuffle the bucketed layout exists to pay once
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Append rows to an EXISTING bucketed table, reusing its stored bucket
    * spec (count + columns) so the layout stays join-ready. Appends add
    * new files per bucket; Spark then no longer assumes per-bucket
    * sortedness, so later sort-merge joins re-sort WITHIN partitions — a
    * cheap, spillable, exchange-free sort. The zero-EXCHANGE contract
    * (the thing that scales) survives every append. */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
      .getOrElse(throw new IllegalArgumentException(s"$table is not bucketed"))
    val w = df.repartition(spec.numBuckets,
        spec.bucketColumnNames.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("append").format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — co-located, so
    * the plan contains no shuffle for either side. */
  def coLocatedJoin(
      spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of ShuffleExchange operators in a frame's executed plan —
    * the plan-shape assertion bucketing exists to make zero. Descends into
    * AQE wrappers and materialized query stages (their children lists are
    * empty, so a plain collect would see nothing). */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Number of ShuffleExchange nodes sitting BETWEEN a scan of `table` and
    * that scan's first join — 0 means the bucketed table reaches its join
    * un-exchanged (shuffles above the join output belong to later stages
    * and don't violate the index contract). The spec-side assertion for
    * every incremental-index operator. */
  def shufflesAboveScan(df: DataFrame, table: String): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    // the scan is reachable below `p` without crossing a join boundary
    def preJoinScan(p: SparkPlan): Boolean = p match {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(table))
      case _: BaseJoinExec => false
      case other => kids(other).exists(preJoinScan)
    }
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case e: ShuffleExchangeLike if kids(e).exists(preJoinScan) => 1
        case _ => 0
      }
      self + kids(p).map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
