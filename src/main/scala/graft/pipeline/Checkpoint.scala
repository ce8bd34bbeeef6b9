package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-boundary checkpointing with per-partition lineage + metrics —
  * the engine's resume story (north rule: "resumable from checkpoint with
  * per-partition lineage + metrics; resumes idempotently").
  *
  * Mirrors the reference's two-pass resume (stop_address/resume_address,
  * catatom2osm/app.py:581-624: state = files on disk keyed by existence)
  * generalized to content-addressed stages: a stage is (name, input
  * fingerprint); its output parquet carries a `_lineage_partition` column
  * (spark_partition_id at write time) and a manifest json with row count and
  * fingerprint. Re-running the pipeline skips any stage whose manifest
  * matches — so a spark-submit retry resumes exactly where it died, and a
  * changed upstream fingerprint invalidates exactly the downstream stages.
  *
  * Metrics append to `<root>/_metrics` (stage, metric, value) — the
  * report.json analog (reference report.py:438-452) — and `validate`
  * asserts conservation laws over them (report.validate, report.py:299-379).
  */
class CheckpointedPipeline(spark: SparkSession, rootDir: String) {
  Files.createDirectories(Paths.get(rootDir))

  /** Stage-table root — versioned state readers (GeoPipeline.append) join
    * new batches against prior stages by path. */
  def root: String = rootDir

  private def manifestPath(name: String) = Paths.get(s"$rootDir/$name.manifest.json")
  private def dataDir(name: String) = s"$rootDir/$name.parquet"

  /** Count of stages actually computed (not resumed) — test observability. */
  var computedStages: Int = 0

  def stage(name: String, fingerprint: String)(f: => DataFrame): DataFrame = {
    val mp = manifestPath(name)
    if (Files.exists(mp) && Files.readString(mp).contains(s""""fingerprint":"$fingerprint"""")) {
      spark.read.parquet(dataDir(name)).drop("_lineage_partition")
    } else {
      computedStages += 1
      val out = f.withColumn("_lineage_partition", spark_partition_id())
      out.write.mode("overwrite").parquet(dataDir(name))
      val persisted = spark.read.parquet(dataDir(name))
      val nRows = persisted.count()
      val nParts = persisted.select("_lineage_partition").distinct().count()
      Files.writeString(mp,
        s"""{"stage":"$name","fingerprint":"$fingerprint","rows":$nRows,"source_partitions":$nParts}""")
      addMetric(name, "rows", nRows)
      addMetric(name, "source_partitions", nParts)
      persisted.drop("_lineage_partition")
    }
  }

  def addMetric(stage: String, metric: String, value: Long): Unit = {
    import spark.implicits._
    Seq((stage, metric, value)).toDF("stage", "metric", "value")
      .write.mode("append").parquet(s"$rootDir/_metrics")
  }

  def metrics(): Map[(String, String), Long] = {
    import spark.implicits._
    spark.read.parquet(s"$rootDir/_metrics")
      .as[(String, String, Long)].collect()
      .groupBy(t => (t._1, t._2)).map { case (k, vs) => (k, vs.last._3) }
  }

  /** Conservation laws over the metrics table (report.validate analog).
    * Returns the failing law names (empty = valid). */
  def validate(laws: Seq[(String, Map[(String, String), Long] => Boolean)]): Seq[String] = {
    val m = metrics()
    laws.collect { case (name, law) if !law(m) => name }
  }
}
