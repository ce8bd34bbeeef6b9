package graft.clean

import scala.collection.mutable
import org.apache.spark.sql.Dataset
import graft.geom.{Geom, Pt}
import graft.geom.Geom.{MultiPolygon, Ring}

/** Faithful delete_invalid_geometries (reference
  * catatom2osm/geo/layer/polygon.py:296-460):
  *
  *  - polygon parts below min_area are dropped;
  *  - at every ACUTE vertex (acute_inv = 5°), a deletion probe decides
  *    whether the ring survives: if the ring minus that vertex is invalid
  *    (self-intersecting / degenerate) or below min_area, an inner ring is
  *    deleted, an outer ring kills the whole feature;
  *  - zig-zag vertices: both the vertex and its closest adjacent are
  *    deleted; spike vertices: the closest adjacent moves to the projection
  *    vx and the acute vertex is deleted (geo/point.py:84-162 math);
  *  - every vertex move is recorded and PROPAGATED to coincident vertices
  *    of every other feature (the cross-feature to_move pass) — the part
  *    that forces a second, layer-wide stage in Spark.
  *
  * The per-feature walk follows the reference exactly: iterate the ORIGINAL
  * ring snapshot, evaluate the spike context against the CURRENT (mutated)
  * ring at the vertex closest to the snapshot vertex, honor the skip flag.
  */
object DeleteInvalid {

  /** Segment self-intersection test for ring validity (GEOS stand-in). */
  def selfIntersects(r: Ring): Boolean = {
    val n = r.length
    if (n < 4) return false
    def segInt(a: Pt, b: Pt, c: Pt, d: Pt): Boolean = {
      def cross(o: Pt, p: Pt, q: Pt) = (p.x - o.x) * (q.y - o.y) - (p.y - o.y) * (q.x - o.x)
      val d1 = cross(c, d, a); val d2 = cross(c, d, b)
      val d3 = cross(a, b, c); val d4 = cross(a, b, d)
      ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
    }
    for (i <- 0 until n; j <- i + 2 until n) {
      // skip adjacent segments (share a vertex), incl. the wrap pair
      if (!(i == 0 && j == n - 1)) {
        if (segInt(r(i), r((i + 1) % n), r(j), r((j + 1) % n))) return true
      }
    }
    false
  }

  def ringValid(r: Ring): Boolean =
    r.length >= 3 && !selfIntersects(r) && Geom.ringArea(r) >= Geom.MinArea

  final case class FeatureResult(
      geometry: Option[MultiPolygon], moves: Seq[(Pt, Pt)])

  /** Per-feature pass. Returns None when the feature must be deleted, plus
    * the va→vx moves to propagate layer-wide. `querySmall` mirrors the
    * reference's query_small_area guard: when false, area-based part/feature
    * deletion is skipped (bad-geometry deletion always applies). */
  def cleanFeature(mp: MultiPolygon, querySmall: Boolean = true): FeatureResult = {
    val moves = mutable.ArrayBuffer[(Pt, Pt)]()
    val outPolys = mutable.ArrayBuffer[mutable.ArrayBuffer[Ring]]()
    for (polygon <- mp) {
      if (Geom.polyArea(polygon) < Geom.MinArea && querySmall) {
        // drop the whole part (deletePart)
      } else {
        val rings = mutable.ArrayBuffer(polygon: _*)
        var ringIdx = 0
        var badgeom = false
        while (ringIdx < rings.length && !badgeom) {
          val snapshot = rings(ringIdx) // original ring, like `ring` in ref
          var cur = rings(ringIdx)
          var skip = false
          var deletedRing = false
          var n = 0
          while (n < snapshot.length && !badgeom && !deletedRing) {
            val v = snapshot(n)
            // closest vertex in the CURRENT ring to the snapshot vertex
            val ndx = cur.indices.minBy(i => cur(i).sqrDist(v))
            val ctx = Geom.spikeContext(cur, ndx,
              acuteThr = Geom.AcuteInv, threshold = Geom.DistInv)
            if (skip || !ctx.isAcute) {
              skip = false
            } else {
              // validity probe on the SNAPSHOT ring minus this vertex
              val probe = snapshot.zipWithIndex.filter(_._2 != n).map(_._1)
              if (!ringValid(probe)) {
                if (ringIdx > 0) { rings.remove(ringIdx); deletedRing = true }
                else badgeom = true
              } else if (cur.length > 3) { // len(closed ring) > 4
                val ndxa = ctx.ndxa
                if (ctx.isZigzag) {
                  val del = Seq(ndx, ndxa).sorted.reverse
                  val next = del.foldLeft(cur)((r, i) =>
                    r.zipWithIndex.filter(_._2 != i).map(_._1))
                  if (ringValid(next)) {
                    cur = next
                    skip = ndxa > ndx
                  }
                } else if (ctx.isSpike && ctx.vx.isDefined) {
                  val vx = ctx.vx.get
                  val va = cur(ndxa)
                  moves += ((va, vx)) // recorded unconditionally, like the ref
                  val moved = cur.clone()
                  moved(ndxa) = vx
                  val next = moved.zipWithIndex.filter(_._2 != ndx).map(_._1)
                  if (ringValid(next)) {
                    cur = next
                    skip = ndxa > ndx
                  }
                }
              }
            }
            n += 1
          }
          if (!deletedRing) {
            rings(ringIdx) = cur
            ringIdx += 1
          }
        }
        if (badgeom) return FeatureResult(None, moves.toSeq)
        outPolys += rings
      }
    }
    val result = outPolys.map(_.toArray).toArray
    if (Geom.area(result) < Geom.MinArea && querySmall) FeatureResult(None, moves.toSeq)
    else if (result.isEmpty) FeatureResult(None, moves.toSeq)
    else FeatureResult(Some(result), moves.toSeq)
  }

  /** Apply recorded moves to coincident vertices of a geometry (the
    * reference's post-pass, polygon.py:418-437). */
  def applyMoves(mp: MultiPolygon, moves: Map[Pt, Pt]): MultiPolygon =
    if (moves.isEmpty) mp
    else mp.map(_.map { ring =>
      val next = ring.map(v => moves.getOrElse(v, v))
      if (ringValid(next)) next else ring
    })

  /** Distributed layer-wide move propagation: from per-feature cleanup
    * results, compute each feature's RELEVANT move submap as a vertex-keyed
    * join — no driver collect, so driver memory stays flat however many
    * features (or municipalities) are unioned through the stage.
    *
    * Winner per source vertex is the move recorded LATEST in
    * (fid, move-index) order — the reference's to_move dict last-write-wins
    * over its layer iteration (polygon.py:418-437), reproduced as a total
    * order instead of partition order.
    *
    * Returns (fid, mv: array<struct sx,sy,tx,ty>) only for features that
    * actually contain a moved vertex; everything else left-joins to null.
    */
  def perFeatureMoves(
      cleaned: Dataset[(Long, Option[MultiPolygon], Seq[(Pt, Pt)])]): org.apache.spark.sql.DataFrame = {
    val spark = cleaned.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val moves = cleaned.flatMap { case (fid, _, mv) =>
      mv.zipWithIndex.map { case ((va, vx), i) => (va.x, va.y, fid, i, vx.x, vx.y) }
    }.toDF("sx", "sy", "fid", "midx", "tx", "ty")
      .groupBy("sx", "sy")
      .agg(max(struct(col("fid"), col("midx"), col("tx"), col("ty"))).as("m"))
      .select(col("sx"), col("sy"), col("m.tx").as("tx"), col("m.ty").as("ty"))
    val verts = cleaned.flatMap { case (fid, g, _) =>
      g.iterator.flatMap(mp =>
        mp.iterator.flatMap(_.iterator.flatMap(_.iterator)).map(p => (fid, p.x, p.y)))
    }.toDF("fid", "sx", "sy")
    verts.join(moves, Seq("sx", "sy"))
      .groupBy("fid")
      .agg(collect_set(struct(col("sx").as("_1"), col("sy").as("_2"),
        col("tx").as("_3"), col("ty").as("_4"))).as("mv"))
  }

  /** Layer-level operator: clean every feature, then propagate the moved
    * vertices to coincident vertices of every surviving feature via a
    * vertex-keyed join (zero driver state; the moves table is ∝ spike
    * count and lives entirely on executors). */
  def deleteInvalidGeometries(
      features: Dataset[(Long, MultiPolygon)]): Dataset[(Long, MultiPolygon)] = {
    val spark = features.sparkSession
    import spark.implicits._
    val cleaned = graft.CacheBin.persist(features
      .map { case (fid, mp) =>
        val r = cleanFeature(mp)
        (fid, r.geometry, r.moves)
      })
    val perFid = perFeatureMoves(cleaned)
    cleaned.map { case (fid, g, _) => (fid, g) }.toDF("fid", "g")
      .join(perFid, Seq("fid"), "left")
      .as[(Long, Option[MultiPolygon], Option[Array[(Double, Double, Double, Double)]])]
      .flatMap { case (fid, g, mvOpt) =>
        val m = mvOpt.getOrElse(Array.empty)
          .map(t => Pt(t._1, t._2) -> Pt(t._3, t._4)).toMap
        g.map(mp => (fid, applyMoves(mp, m)))
      }
  }
}
