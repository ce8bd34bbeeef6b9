package graft.clean

import scala.collection.mutable.ArrayBuffer
import graft.geom.{Geom, Pt}
import graft.geom.Geom.{MultiPolygon, Polygon, Ring}

/** Polygon cleanup pipeline — per-feature stage of the reference's
  * PolygonLayer.clean (catatom2osm/geo/layer/polygon.py:598-607):
  * delete_invalid_geometries (spike/zig-zag removal, polygon.py:296-460) →
  * topology vertex snap (polygon.py:161-272) → simplify (corner rule,
  * polygon.py:462-524).
  *
  * This module holds the order-deterministic per-ring algorithms; the
  * cross-feature stages (shared-vertex grouping, adjacency components) are in
  * graft.clean.Topology and run as vertex-keyed shuffles around these
  * kernels. All loops iterate in ascending vertex index — the deterministic
  * order SURVEY §7.4 requires so results are identical at any parallelism.
  */
object PolygonClean {

  /** Merge consecutive vertices closer than dupThr (duplicate-vertex merge,
    * keeps the earlier vertex — reference topology() dup merge semantics). */
  def mergeCloseVertices(r: Ring, dupThr: Double = Geom.DupThr): Ring = {
    if (r.length < 2) return r
    val t2 = dupThr * dupThr
    val out = ArrayBuffer[Pt](r(0))
    var i = 1
    while (i < r.length) {
      if (r(i).sqrDist(out.last) >= t2) out += r(i)
      i += 1
    }
    // close the loop: last vs first
    while (out.length > 1 && out.last.sqrDist(out.head) < t2) out.remove(out.length - 1)
    out.toArray
  }

  /** One spike/zig-zag sweep: delete zig-zag vertices, delete spike vertices
    * and move their closest adjacent onto the projection vx
    * (reference delete_invalid_geometries, polygon.py:296-460). Returns the
    * ring plus whether anything changed. */
  def removeSpikesOnce(r: Ring): (Ring, Boolean) = {
    val n = r.length
    if (n < 4) return (r, false)
    var i = 0
    while (i < n) {
      val ctx = Geom.spikeContext(r, i)
      if (ctx.isZigzag) {
        return (r.zipWithIndex.filter(_._2 != i).map(_._1), true)
      }
      if (ctx.isSpike && ctx.vx.isDefined) {
        val out = r.clone()
        out(ctx.ndxa) = ctx.vx.get
        return (out.zipWithIndex.filter(_._2 != i).map(_._1), true)
      }
      i += 1
    }
    (r, false)
  }

  def removeSpikes(r: Ring, maxIter: Int = 64): Ring = {
    var cur = r
    var changed = true
    var it = 0
    while (changed && it < maxIter) {
      val (next, c) = removeSpikesOnce(cur)
      cur = next; changed = c; it += 1
    }
    cur
  }

  /** Simplify: delete vertices that are not corners (deviation from straight
    * <= straightThr AND cathetus < cathThr) — the single-parent case of the
    * reference's topology-preserving simplify (polygon.py:462-524). The
    * shared-boundary-safe variant (vertex deleted only if non-corner in ALL
    * parents) is applied by Topology.simplifyShared. */
  def simplifyRing(
      r: Ring,
      straightThr: Double = Geom.StraightThr,
      cathThr: Double = Geom.DistThr,
      keep: Pt => Boolean = _ => false,
      maxIter: Int = 64): Ring = {
    var cur = r
    var changed = true
    var it = 0
    while (changed && it < maxIter && cur.length > 3) {
      changed = false
      var i = 0
      while (i < cur.length && !changed) {
        val ctx = Geom.cornerContext(cur, i, cathThr = cathThr, straightThr = straightThr)
        if (!ctx.isCorner && !keep(cur(i))) {
          cur = cur.zipWithIndex.filter(_._2 != i).map(_._1)
          changed = true
        }
        i += 1
      }
      it += 1
    }
    cur
  }

  /** Full per-feature clean: per ring dedupe → spikes → simplify, then drop
    * degenerate rings (< 3 vertices) and rings below minArea. */
  def cleanMultiPolygon(
      mp: MultiPolygon,
      dupThr: Double = Geom.DupThr,
      minArea: Double = Geom.MinArea): MultiPolygon =
    mp.map { poly =>
      poly
        .map(r => simplifyRing(removeSpikes(mergeCloseVertices(r, dupThr))))
        .filter(r => r.length >= 3 && Geom.ringArea(r) >= minArea)
    }.filter(p => p.nonEmpty && Geom.ringArea(p.head) >= minArea)
      .filter(_.nonEmpty)

  /** Explode a multipolygon into single-polygon parts
    * (reference explode_multi_parts, polygon.py:51-84). */
  def explodeParts(mp: MultiPolygon): Seq[MultiPolygon] = mp.map(p => Array(p)).toSeq
}
