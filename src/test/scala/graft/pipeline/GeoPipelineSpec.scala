package graft.pipeline

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Resume contract of the web-geo pipeline: fresh run computes all 6
  * stages and passes every conservation law; a rerun computes ZERO stages
  * with an identical report; a mid-DAG kill (deleted manifest) recomputes
  * exactly the missing stage. */
class GeoPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def report(r: GeoPipeline.Result): Seq[(Long, String, Long, Long)] = {
    import spark.implicits._
    r.report.as[(Long, String, Long, Long)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("fresh run: 6 stages, laws hold, report nonempty; rerun: 0 stages, identical") {
    val dir = Files.createTempDirectory("graft_geo").toString
    val cp1 = new CheckpointedPipeline(spark, dir)
    val r1 = GeoPipeline.run(spark, TestSpark.sf001, cp1, "v1")
    val rep1 = report(r1)
    assert(cp1.computedStages === 6, s"fresh run computed ${cp1.computedStages}")
    assert(r1.failedLaws === Seq.empty)
    assert(rep1.nonEmpty)
    assert(rep1.map(_._3).sum > 0)

    val cp2 = new CheckpointedPipeline(spark, dir)
    val r2 = GeoPipeline.run(spark, TestSpark.sf001, cp2, "v1")
    assert(cp2.computedStages === 0, s"rerun computed ${cp2.computedStages}")
    assert(r2.failedLaws === Seq.empty)
    assert(report(r2) === rep1)

    // mid-DAG kill: drop the geotag manifest — resume recomputes exactly it
    Files.delete(Paths.get(s"$dir/geotag.manifest.json"))
    val cp3 = new CheckpointedPipeline(spark, dir)
    val r3 = GeoPipeline.run(spark, TestSpark.sf001, cp3, "v1")
    assert(cp3.computedStages === 1, s"resume computed ${cp3.computedStages}")
    assert(r3.failedLaws === Seq.empty)
    assert(report(r3) === rep1)

    // version bump invalidates everything downstream of the fingerprint
    val cp4 = new CheckpointedPipeline(spark, dir)
    GeoPipeline.run(spark, TestSpark.sf001, cp4, "v2")
    assert(cp4.computedStages === 6, s"v2 recomputed ${cp4.computedStages}")
  }

  test("canonical collapse does real work: 4 revisions per page, blocked hosts gone") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_geo2").toString
    val cp = new CheckpointedPipeline(spark, dir)
    GeoPipeline.run(spark, TestSpark.sf001, cp, "v1")
    val canonical = spark.read.parquet(s"$dir/canonical.parquet")
    val nDocs = spark.read.parquet(s"${TestSpark.sf001}/documents.parquet").count()
    // every surviving canonical url collapsed >= 1 and <= 4 revisions,
    // and the total surviving revisions + blocked ones == corpus
    val m = cp.metrics()
    assert(m(("canonical", "rows")) === canonical.count())
    val revs = canonical.agg(sum("n_revisions")).head().getLong(0)
    assert(revs < nDocs, "blocklist must drop some revisions")
    assert(canonical.filter(col("n_revisions") > 4).count() === 0)
    val hosts = canonical
      .select(graft.ops.UrlOps.hostOf(col("url_norm")).as("h"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(hosts.intersect(graft.ops.UrlOps.BlockedHosts.toSet) === Set.empty)
  }
}
