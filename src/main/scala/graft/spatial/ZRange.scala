package graft.spatial

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) range decomposition of axis-aligned bbox queries —
  * the READ-side half of the `sources.Layout` clustering discipline.
  *
  * A 100 TB table laid out in Morton order (Layout.writeClustered with a
  * `Morton.mortonCol` cluster key) stores spatially-near rows in the same
  * parquet row groups. A bbox query then wants to touch only the key
  * ranges the bbox intersects: this module turns the bbox into a bounded
  * list of `[lo, hi]` Morton intervals (classic quadtree decomposition —
  * the BIGMIN/LITMAX family, Tropf & Herzog 1981) that the caller applies
  * as plain comparisons on the stored key column, so they reach the scan
  * as `PushedFilters` and prune row groups via parquet min/max stats.
  * False positives from the range budget are fine — callers always refine
  * with the exact per-axis predicate; false negatives are impossible (the
  * decomposition only ever COARSENS a straddling quad, never drops one).
  *
  * Reference analog: the reference scopes every operation to one
  * cadastral zone's bbox when it loads a layer (catatom.py zone filters);
  * here the bbox becomes storage-key ranges so the scan itself skips the
  * rest of the corpus.
  */
object ZRange {

  /** Gather the even bits of m into the low half — inverse of
    * [[Morton.spread]] (so `compact(morton(ix,iy)) == ix` and
    * `compact(morton(ix,iy) >> 1) == iy`). */
  def compact(m0: Long): Long = {
    var x = m0 & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Morton-key intervals (inclusive, sorted, disjoint, coalesced)
    * covering the inclusive integer bbox [x0..x1] × [y0..y1] on a
    * 2^bits × 2^bits grid.
    *
    * Level-order quadtree descent: a quad fully inside the bbox emits its
    * (contiguous by construction) Morton interval; a disjoint quad is
    * dropped; a straddling quad splits into its 4 children. `maxRanges`
    * bounds the interval count — once the budget would be exceeded,
    * remaining straddlers are emitted whole (false positives only; the
    * level-order queue makes the cut happen at a uniform depth, so
    * overshoot is balanced around the bbox perimeter, not concentrated in
    * one corner). At `maxRanges = Int.MaxValue` the cover is EXACT: a key
    * is inside some interval iff its cell is inside the bbox.
    *
    * bits <= 30 keeps every emitted bound below 2^60 (wrap-free in any
    * engine, same bound [[Morton.mortonSql]] documents). */
  def bboxRanges(x0: Long, x1: Long, y0: Long, y1: Long, bits: Int,
                 maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(bits >= 1 && bits <= 30, s"bits must be in [1,30], got $bits")
    require(maxRanges >= 4, s"maxRanges must be >= 4, got $maxRanges")
    val side0 = 1L << bits
    require(0 <= x0 && x0 <= x1 && x1 < side0 && 0 <= y0 && y0 <= y1 && y1 < side0,
      s"bbox [$x0,$x1]x[$y0,$y1] outside [0,${side0 - 1}]^2")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val queue = scala.collection.mutable.Queue((0L, 0)) // (morton prefix, depth)
    while (queue.nonEmpty) {
      val (p, d) = queue.dequeue()
      val shift = bits - d
      val side = 1L << shift
      val qx0 = compact(p) << shift
      val qy0 = compact(p >> 1) << shift
      val lo = p << (2 * shift)
      val hi = lo + (side * side - 1)
      val disjoint = qx0 + side - 1 < x0 || qx0 > x1 || qy0 + side - 1 < y0 || qy0 > y1
      val inside = qx0 >= x0 && qx0 + side - 1 <= x1 && qy0 >= y0 && qy0 + side - 1 <= y1
      if (!disjoint) {
        if (inside) out += ((lo, hi))
        // a 1-cell quad (d == bits) is always inside or disjoint, so
        // reaching here implies d < bits and the quad splits
        else if (out.size + queue.size + 4 > maxRanges) out += ((lo, hi))
        else (0 until 4).foreach(c => queue.enqueue((p * 4 + c, d + 1)))
      }
    }
    val sorted = out.sortBy(_._1)
    val res = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (lo, hi) =>
      if (res.nonEmpty && lo <= res.last._2 + 1) {
        val (l, h) = res.remove(res.length - 1)
        res += ((l, math.max(h, hi)))
      } else res += ((lo, hi))
    }
    res.toSeq
  }

  /** OR-of-interval predicate on a Morton key column — plain >=/<=
    * comparisons on a stored column, so the whole disjunction reaches the
    * parquet scan as one pushed filter (row-group min/max pruning on a
    * Layout-clustered table). */
  def rangesPredicate(m: Column, ranges: Seq[(Long, Long)]): Column = {
    require(ranges.nonEmpty, "empty range cover")
    ranges.map { case (lo, hi) => m >= lit(lo) && m <= lit(hi) }
      .reduceLeft(_ || _)
  }

  /** The coarse quad keys (top 2*quadBits Morton bits) the ranges touch —
    * the matching DIRECTORY-partition predicate when the table was written
    * `Layout.writeClustered(clusterCol = morton, partCol = morton >> s)`:
    * `partCol IN coarseQuads(...)` prunes whole directories before any
    * file is opened. */
  def coarseQuads(ranges: Seq[(Long, Long)], bits: Int, quadBits: Int): Seq[Long] = {
    require(quadBits >= 1 && quadBits <= bits, s"quadBits in [1,$bits], got $quadBits")
    val shift = 2 * (bits - quadBits)
    ranges.flatMap { case (lo, hi) => (lo >> shift) to (hi >> shift) }
      .distinct.sorted
  }
}
