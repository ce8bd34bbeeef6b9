package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.layers.SynthCadastre
import graft.ops.{Adjacency, Conjoin}
import graft.sources.{OsmOut, Pages}
import graft.spatial.{CellGrid, SpatialJoin, SynthGeo}

/** The full run lifecycle (reference CatAtom2Osm.run, app.py:118-165) as
  * checkpointed Dataset stages: ingest (+ extraction invariant) → spatial
  * zone assignment → building topology/components → tile packing → address
  * conjoining → OSM output. Every arrow is a stage table with fingerprint,
  * per-partition lineage and metrics; a re-run resumes idempotently
  * (reference two-pass resume, app.py:581-624, generalized).
  */
object CatPipeline {
  final case class Result(
      pages: DataFrame, zoned: DataFrame, components: DataFrame,
      tiles: DataFrame, conjoined: DataFrame, osmNodes: DataFrame,
      pipeline: CheckpointedPipeline)

  def run(spark: SparkSession, sfDir: String, rootDir: String): Result = {
    val p = new CheckpointedPipeline(spark, rootDir)
    val fp = sfDir // input fingerprint: the dataset path (content is static)

    val pages = p.stage("pages", fp) {
      // ingest with the byte-identical extraction invariant enforced:
      // rows failing text == extract(html) are quarantined (dropped here)
      Pages.fromDocuments(spark, sfDir)
        .where(Pages.extractText(col("html")) === col("text"))
        .withColumn("doc_id", regexp_extract(col("url"), "([0-9]+)$", 1).cast("long"))
        .withColumn("x", col("doc_id") * 7919 % 10000 / lit(100.0))
        .withColumn("y", col("doc_id") * 104729 % 10000 / lit(100.0))
    }

    val zoned = p.stage("zone_assign", fp) {
      SpatialJoin.pipJoinCodegen(
        pages.select(col("doc_id").as("id"), col("x"), col("y")),
        "id", "x", "y", SynthGeo.zones,
        CellGrid(8.0, origin = 0.0, rowWidth = 1L << 20))
    }

    val components = p.stage("components", fp) {
      Adjacency.components(SynthCadastre.buildings(spark, sfDir))
    }

    val tiles = p.stage("tiles", fp) {
      Adjacency.greedyPack(SynthCadastre.parcels(spark, sfDir))
    }

    val conjoined = p.stage("conjoin", fp) {
      Conjoin.moveAddress(
        SynthCadastre.addresses(spark, sfDir),
        SynthCadastre.buildings(spark, sfDir))
    }

    val osmNodes = p.stage("osm_nodes", fp) {
      OsmOut.mergeDuplicated(
        OsmOut.addressNodes(
          SynthCadastre.addresses(spark, sfDir),
          "bid", "px", "py", Map("addr:housenumber" -> "bid")))
    }

    p.addMetric("zone_assign", "pages_in_zones", zoned.select("id").distinct().count())
    Result(pages, zoned, components, tiles, conjoined, osmNodes, p)
  }

  /** Conservation laws over the run's metrics (report.validate analog). */
  def laws: Seq[(String, Map[(String, String), Long] => Boolean)] = Seq(
    "every building labeled" -> (m =>
      m(("components", "rows")) == m(("conjoin", "rows"))),
    "tiles cover parcels" -> (m =>
      m(("tiles", "rows")) == m(("components", "rows"))),
    "osm nodes unique" -> (m =>
      m(("osm_nodes", "rows")) <= m(("conjoin", "rows"))),
    "zoned pages bounded by pages" -> (m =>
      m(("zone_assign", "pages_in_zones")) <= m(("pages", "rows"))))
}
