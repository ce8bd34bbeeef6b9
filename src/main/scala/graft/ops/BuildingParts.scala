package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.Dataset
import graft.geom.{Geom, Pt}

/** Building ⋈ parts ⋈ pools merge (reference ConsLayer.merge_building_parts
  * + merge_adjacent_parts + remove_inner_rings, geo/layer/cons.py:175-354),
  * re-expressed as one parcel-key cogroup: all rows of a cadastral ref land
  * in one group (hash shuffle on ref), and the per-group walk follows the
  * reference's semantics exactly, in deterministic localId order:
  *
  *  - pool inside building          -> pool.layer = 1 ("pool on roof")
  *  - building/part ring == pool    -> delete feature (outer) / strip ring
  *  - outline levels               <- max(lev_above), max(lev_below) of its
  *                                    contained parts
  *  - part bigger than building    -> fixme, level skipped
  *  - single-level part set        -> parts merged into the outline (deleted)
  *  - multi-part level             -> adjacent parts unioned (fewer parts out)
  *  - parts underfill the outline  -> outline geometry := union(parts)
  *    (SIMPLIFY_BUILDING_PARTS=False per reference geo/__init__.py:3)
  */
object BuildingParts {

  final case class ConsRow(
      localId: String, ref: String, kind: String, // building | part | pool
      levAbove: Int, levBelow: Int, layer: Int, fixme: String,
      geometry: Array[Array[Array[Pt]]])

  /** Canonical ring form: rotation- and direction-invariant. */
  def canonicalRing(r: Array[Pt]): Seq[Pt] = {
    if (r.isEmpty) return Seq.empty
    def rotations(x: Seq[Pt]) = x.indices.map(i => x.drop(i) ++ x.take(i))
    val fwd = rotations(r.toSeq)
    val bwd = rotations(r.reverse.toSeq)
    implicit val ord: Ordering[Seq[Pt]] =
      Ordering.by((s: Seq[Pt]) => s.map(p => (p.x, p.y)).toIterable)(
        Ordering.Implicits.seqOrdering(Ordering.Tuple2[Double, Double]))
    (fwd ++ bwd).min
  }

  def ringEquals(a: Array[Pt], b: Array[Pt]): Boolean =
    a.length == b.length && canonicalRing(a) == canonicalRing(b)

  /** is_inside (contains ∨ overlaps, geo/tools.py:5-9): hole-aware
    * centroid-in test for containment plus mutual strict vertex probes for
    * partial overlap. Boundary-sharing-only neighbors stay excluded (their
    * vertices are never STRICTLY inside). */
  def isInside(f1: Array[Array[Array[Pt]]], f2: Array[Array[Array[Pt]]]): Boolean = {
    if (f1.isEmpty || f2.isEmpty || f1.head.isEmpty || f2.head.isEmpty) return false
    def strictIn(p: Pt, mp: Array[Array[Array[Pt]]]): Boolean =
      Geom.pointInMultiPolygon(p, mp) &&
        Geom.closestSegment(p, mp)._1 > 1e-16 // not on the boundary
    strictIn(Geom.interiorPoint(f1), f2) ||
      strictIn(Geom.interiorPoint(f2), f1) ||
      f1.flatMap(_.headOption).flatten.exists(p => strictIn(p, f2)) ||
      f2.flatMap(_.headOption).flatten.exists(p => strictIn(p, f1))
  }

  /** Union adjacent polygons (edge-snapped) -> multipolygon of boundary
    * rings. Orientation-aware: outer rings keep the INPUT rings'
    * orientation (cadastre sources store CW outers), holes the opposite. */
  private def unionParts(polys: Seq[Array[Array[Pt]]]): Array[Array[Array[Pt]]] =
    ParcelOps.unionOuterRings(polys.map(p => Array(p.head)))

  /** get_parts (cons.py:175-192): of the given parts, those inside the
    * outline grouped by (lev_above, lev_below), plus the max of each. */
  def getParts(
      outline: ConsRow, parts: Seq[ConsRow])
      : (Map[(Int, Int), Seq[ConsRow]], Int, Int) = {
    val inside = parts.filter(p => isInside(p.geometry, outline.geometry))
    val byLevel = inside.groupBy(p => (p.levAbove, p.levBelow))
    val maxLevel = (0 +: inside.map(_.levAbove)).max
    val minLevel = (0 +: inside.map(_.levBelow)).max
    (byLevel, maxLevel, minLevel)
  }

  def mergeBuildingParts(rows: Dataset[ConsRow]): Dataset[ConsRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.ref).flatMapGroups { (_, it) =>
      val group = it.toSeq.sortBy(_.localId)
      val buildings = group.filter(_.kind == "building")
      val pools = mutable.ArrayBuffer(group.filter(_.kind == "pool"): _*)
      var parts = mutable.ArrayBuffer(group.filter(_.kind == "part"): _*)
      val deleted = mutable.Set[String]()
      val updated = mutable.Map[String, ConsRow]()
      def cur(r: ConsRow): ConsRow = updated.getOrElse(r.localId, r)

      for (b <- buildings if !deleted(b.localId)) {
        // --- pool pass ---------------------------------------------------
        // (reference cons.py:292-320: `break` out of the pool loop when the
        // building is coincident with a pool — later pools are not applied)
        val poolIt = pools.iterator
        var broke = false
        while (poolIt.hasNext && !broke) {
          val p = poolIt.next()
          val pool = cur(p)
          if (pool.layer != 1 && isInside(pool.geometry, cur(b).geometry))
            updated(p.localId) = pool.copy(layer = 1)
          val bld = cur(b)
          // building outer equals pool outer -> delete building, break
          if (bld.geometry.nonEmpty && pool.geometry.nonEmpty &&
              ringEquals(bld.geometry.head.head, pool.geometry.head.head)) {
            deleted += b.localId
            broke = true
          } else {
            // strip inner rings equal to the pool
            val g = cur(b).geometry
            if (g.nonEmpty && g.head.length > 1) {
              val kept = g.head.head +: g.head.tail.filterNot(r =>
                ringEquals(r, pool.geometry.head.head))
              if (kept.length != g.head.length)
                updated(b.localId) = cur(b).copy(geometry = Array(kept) ++ g.tail)
            }
            // parts equal to the pool -> delete / strip rings
            parts.filterNot(x => deleted(x.localId)).foreach { pt =>
              val pg = cur(pt).geometry
              if (pg.nonEmpty && ringEquals(pg.head.head, pool.geometry.head.head))
                deleted += pt.localId
              else if (pg.nonEmpty && pg.head.length > 1) {
                val kept = pg.head.head +: pg.head.tail.filterNot(r =>
                  ringEquals(r, pool.geometry.head.head))
                if (kept.length != pg.head.length)
                  updated(pt.localId) = cur(pt).copy(geometry = Array(kept) ++ pg.tail)
              }
            }
          }
        }
        // --- merge_adjacent_parts -----------------------------------------
        // Runs even for a pool-deleted building (cons.py:321 is unconditional
        // after the pool loop): its parts still get level merges/deletions;
        // only the outline row itself is dropped at emit time.
        locally {
          val bld = cur(b)
          val liveParts = parts.filterNot(x => deleted(x.localId)).map(cur)
          val inParts = liveParts.filter(p => isInside(p.geometry, bld.geometry))
          val byLevel = inParts.groupBy(p => (p.levAbove, p.levBelow))
          val maxLevel = (0 +: inParts.map(_.levAbove).toSeq).max
          val minLevel = (0 +: inParts.map(_.levBelow).toSeq).max // max of below, per reference
          updated(b.localId) = cur(b).copy(levAbove = maxLevel, levBelow = minLevel)
          val buildingArea = math.rint(Geom.area(bld.geometry))
          var partsArea = 0.0
          for ((level, lps) <- byLevel.toSeq.sortBy(_._1)) {
            var checkArea = false
            for (p <- lps) {
              val a = Geom.area(p.geometry)
              partsArea += a
              if (math.rint(a) > buildingArea) {
                updated(p.localId) = cur(p).copy(fixme = "This part is bigger than its building")
                checkArea = true
              }
            }
            if (!checkArea) {
              if (byLevel.size == 1) {
                lps.foreach(p => deleted += p.localId) // merged to outline
              } else {
                val merged = unionParts(lps.map(_.geometry.head).toSeq)
                if (merged.length < lps.length) {
                  lps.zipWithIndex.foreach { case (p, i) =>
                    if (i < merged.length)
                      updated(p.localId) = cur(p).copy(geometry = Array(merged(i)))
                    else deleted += p.localId
                  }
                }
              }
            }
          }
          if (partsArea > 0 && math.rint(partsArea) < buildingArea) {
            // reference merges ALL the ref's surviving parts here
            // (merge_adjacent_features(parts), cons.py:236-242), not only
            // the inside-outline subset
            val g = unionParts(liveParts.map(_.geometry.head).toSeq)
            if (g.nonEmpty) updated(b.localId) = cur(b).copy(geometry = g)
          }
        }
      }
      group.filterNot(r => deleted(r.localId)).map(cur)
    }
  }
}
