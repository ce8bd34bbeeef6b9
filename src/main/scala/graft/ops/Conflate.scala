package graft.ops

import org.apache.spark.sql.Dataset
import graft.geom.{Geom, Pt}
import graft.geom.Geom.MultiPolygon
import graft.spatial.CellGrid

/** Building conflation against current OSM data (reference
  * ConsLayer.conflate, cons.py:524-578): every closed OSM building/pool way
  * probes the cadastre layer's spatial index; overlap or containment in
  * either direction is a conflict. delete=false marks conflicted OSM
  * elements; delete=true drops the non-conflicting ones (they need no
  * import review). Candidate prune = bbox covering-cell join against a
  * broadcast index — the same cell shuffle as the flagship PIP join.
  */
object Conflate {
  final case class OsmPoly(id: Long, tags: Map[String, String], geometry: MultiPolygon)

  def isCandidate(p: OsmPoly): Boolean =
    p.tags.get("building").isDefined ||
      p.tags.get("leisure").contains("swimming_pool")

  /** Conflict = interiors intersect (contains either way ∨ overlaps). */
  def conflicts(a: MultiPolygon, b: MultiPolygon): Boolean =
    BuildingParts.isInside(a, b)

  /** Mark conflicted OSM polygons (delete=false flavor). */
  def markConflicts(
      osm: Dataset[OsmPoly], cons: Seq[MultiPolygon], grid: CellGrid): Dataset[OsmPoly] = {
    val spark = osm.sparkSession
    import spark.implicits._
    val index: Map[Long, Array[Int]] = cons.zipWithIndex
      .flatMap { case (g, i) => grid.cover(Geom.bbox(g)).map(c => (c, i)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray).toMap
    val bIdx = spark.sparkContext.broadcast(index)
    val bGeoms = spark.sparkContext.broadcast(cons.toArray)
    osm.map { p =>
      if (!isCandidate(p)) p
      else {
        val cand = grid.cover(Geom.bbox(p.geometry))
          .flatMap(c => bIdx.value.getOrElse(c, Array.empty[Int])).distinct
        val hit = cand.exists(i => conflicts(p.geometry, bGeoms.value(i)))
        if (hit) p.copy(tags = p.tags + ("conflict" -> "yes")) else p
      }
    }
  }

  /** Drop non-conflicting OSM polygons (delete=true flavor). */
  def deleteNonConflicting(
      osm: Dataset[OsmPoly], cons: Seq[MultiPolygon], grid: CellGrid): Dataset[OsmPoly] = {
    val spark = osm.sparkSession
    import spark.implicits._
    markConflicts(osm, cons, grid)
      .filter((p: OsmPoly) => !isCandidate(p) || p.tags.contains("conflict"))
      .map((p: OsmPoly) => p.copy(tags = p.tags - "conflict"))
  }
}
