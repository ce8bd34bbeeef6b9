package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Pages
import graft.spatial.{S2Grid, SynthGeo}

/** The WEB-side operational pipeline of the north rule, checkpointed:
  * Common-Crawl-shaped pages → URL canonicalization + host blocklist +
  * revision collapse → per-page geotag + S2 encode → tile-assignment
  * rollup → admin-boundary join → per-(region, lang) report. Every stage
  * is a fingerprinted parquet table with per-partition lineage
  * (CheckpointedPipeline), so a spark-submit retry resumes at the first
  * missing/invalidated stage and recomputes nothing else — the same
  * resume contract RunPipeline proves for the cadastre side, here on the
  * input_hint table shape (url, warc_ts, html, text, lang).
  *
  * Conservation laws (report.validate analog, reference report.py:299-379)
  * ride the metrics table:
  *  - extract_match == pages rows: `text` is byte-identical to the
  *    deterministic extraction of `html` for EVERY page (the input_hint
  *    per-row invariant — a lossy re-encode anywhere upstream fails the
  *    law, not just a spot check);
  *  - tile_points == geotag rows: the tile rollup conserves pages;
  *  - report_docs == regions rows: the final rollup conserves matches.
  */
object GeoPipeline {

  final case class Result(report: DataFrame, failedLaws: Seq[String])

  def run(spark: SparkSession, sfDir: String, cp: CheckpointedPipeline,
      ver: String): Result = {
    val fp = s"$ver:$sfDir"

    // 1. pages at the input_hint shape; messy-url synthesis gives the
    // canonicalize stage real 4:1 work (page identity = doc_id div 4)
    var before = cp.computedStages
    val pages = cp.stage("pages", fp) {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(
          col("doc_id"),
          graft.ops.UrlOps.messyUrl(expr("doc_id div 4"), col("doc_id")).as("url"),
          // epoch 2024-01-01 + jitter: strictly increasing within a
          // canonical group, so the revision collapse has a unique newest
          timestamp_seconds(lit(1704067200L) + col("doc_id") % 1000L).as("warc_ts"),
          encode(concat(lit("<html><head><title>"), col("lang"),
            lit("</title></head><body><p>"), col("text"),
            lit("</p></body></html>")), "utf-8").as("html"),
          col("text"), col("lang"))
    }
    // per-row invariant law: extraction of html is byte-identical to text.
    // Metrics are computed only when the stage actually ran — a resume
    // must not re-scan the corpus (laws read the persisted metrics table).
    if (cp.computedStages > before) cp.addMetric("pages", "extract_match",
      pages.filter(Pages.extractText(col("html")) === col("text")).count())

    // 2. canonicalize + blocklist + collapse (newest revision per
    // canonical url, min doc_id as the stable survivor identity)
    val canonical = cp.stage("canonical", s"$fp:canonical") {
      pages
        .withColumn("url_norm", graft.ops.UrlOps.normalize(col("url")))
        .filter(!graft.ops.UrlOps.hostOf(col("url_norm"))
          .isin(graft.ops.UrlOps.BlockedHosts: _*))
        .groupBy("url_norm")
        .agg(min("doc_id").as("doc_id"), max("warc_ts").as("warc_ts"),
          min_by(col("lang"), col("doc_id")).as("lang"),
          min_by(length(col("text")), col("doc_id")).as("n_chars"),
          count(lit(1)).as("n_revisions"))
    }

    // 3. geotag + spherical encode (level 13, tile = level-6 parent)
    val geotag = cp.stage("geotag", s"$fp:geotag") {
      canonical.select(
        col("doc_id"), col("url_norm"), col("lang"), col("n_chars"),
        SynthGeo.latColOf(col("doc_id")).as("lat"),
        SynthGeo.lonColOf(col("doc_id")).as("lon"))
        .withColumn("cell13", S2Grid.cellCol(col("lat"), col("lon"), 13))
        .withColumn("cell6", S2Grid.parentCol(col("cell13"), 13, 6))
    }

    // 4. tile assignment rollup (exchange width = occupied tiles)
    before = cp.computedStages
    val tiles = cp.stage("tiles", s"$fp:tiles") {
      geotag.groupBy("cell6").agg(count(lit(1)).as("n_pages"))
    }
    if (cp.computedStages > before) cp.addMetric("tiles", "tile_points",
      tiles.agg(coalesce(sum("n_pages"), lit(0L))).head().getLong(0))

    // 5. admin-boundary join: broadcast cover probe + exact refinement
    val regions = cp.stage("regions", s"$fp:regions") {
      val regionSide = spark.createDataFrame(
        SynthGeo.geoRegionParams.flatMap { case (k, clat, clon, r) =>
          S2Grid.coverDiamond(clat, clon, r, 6).map(c => (c, k, clat, clon, r))
        }).toDF("cell6", "region_id", "clat", "clon", "rr")
      geotag.join(broadcast(regionSide), "cell6")
        .where(abs(col("lat") - col("clat")) + abs(col("lon") - col("clon")) < col("rr"))
        .select(col("doc_id"), col("region_id"), col("lang"), col("n_chars"))
    }

    // 6. per-(region, lang) report
    before = cp.computedStages
    val report = cp.stage("report", s"$fp:report") {
      regions.groupBy("region_id", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("tot_chars"))
    }
    if (cp.computedStages > before) cp.addMetric("report", "report_docs",
      report.agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0))

    val fails = cp.validate(Seq(
      ("extract_byte_identical", m =>
        m(("pages", "extract_match")) == m(("pages", "rows"))),
      ("tiles_conserve_pages", m =>
        m(("tiles", "tile_points")) == m(("geotag", "rows"))),
      ("report_conserves_matches", m =>
        m(("report", "report_docs")) == m(("regions", "rows")))))
    Result(report, fails)
  }

  /** spark-submit entry: `--class graft.pipeline.GeoPipeline <jar>
    * <sfDir> <outDir>`. Rerun with the same args resumes from manifests
    * (zero stages recomputed). Prints ONE JSON summary line. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_geo_pipeline"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val cp = new CheckpointedPipeline(spark, outDir)
    val r = run(spark, sfDir, cp, "v1")
    val rows = r.report.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"job":"geo_pipeline","sf":"$sfDir","out":"$outDir",""" +
      s""""stages_computed":${cp.computedStages},"report_rows":$rows,""" +
      s""""failed_laws":${r.failedLaws.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""sec":${f"$sec%.2f"}}""")
    spark.stop()
  }
}
