package graft.geom

import scala.collection.mutable.ArrayBuffer

/** 2-D point. Coordinates are planar (projected CRS or synthetic plane). */
final case class Pt(x: Double, y: Double) {
  def sqrDist(o: Pt): Double = { val dx = x - o.x; val dy = y - o.y; dx * dx + dy * dy }
  def dist(o: Pt): Double = math.sqrt(sqrDist(o))
  /** Azimuth in degrees from north, clockwise, range (-180, 180].
    * Mirrors QgsPointXY.azimuth used by the reference corner/spike math
    * (reference: catatom2osm/geo/point.py:40-44). */
  def azimuth(o: Pt): Double = math.toDegrees(math.atan2(o.x - x, o.y - y))
}

/** Geometry kernel: pure Scala re-derivation of the predicates the reference
  * evaluates through GEOS/QGIS. Rings are OPEN (last vertex != first); a
  * polygon is outer ring + inner rings; a multipolygon is a list of polygons.
  *
  * Reference semantics re-created (not ported code):
  *  - ray-casting point-in-polygon (used by is_inside / set_zones,
  *    catatom2osm/geo/layer/parcel.py:91-114)
  *  - shoelace signed area (catatom2osm/osm.py:350-358 Way.shoelace)
  *  - closest segment with projection (QgsGeometry.closestSegmentWithContext,
  *    used by move_entrance, geo/layer/cons.py:371-426)
  *  - corner / spike / zig-zag angle math (geo/point.py:27-162)
  */
object Geom {
  type Ring = Array[Pt]
  type Polygon = Array[Ring]          // head = outer, tail = holes
  type MultiPolygon = Array[Polygon]

  // Thresholds mirroring reference defaults (catatom2osm/config.py:41-53).
  val DupThr      = 0.012  // meters: merge vertices closer than this
  val DistThr     = 0.02   // meters: topological-point insertion radius
  val StraightThr = 2.0    // degrees: deviation from 180 considered straight
  val AcuteThr    = 10.0   // degrees: acute angle (corner test)
  val AcuteInv    = 5.0    // degrees: acute angle (invalid-geometry spike test)
  val DistInv     = 0.1    // meters: spike/zig-zag projection distance filter
  val MinArea     = 0.05   // m^2: drop smaller rings/features

  /** Signed shoelace area of an open ring (>0 counter-clockwise). */
  def signedArea(r: Ring): Double = {
    var s = 0.0
    var i = 0
    val n = r.length
    while (i < n) {
      val a = r(i); val b = r((i + 1) % n)
      s += a.x * b.y - b.x * a.y
      i += 1
    }
    s / 2.0
  }

  def ringArea(r: Ring): Double = math.abs(signedArea(r))

  /** Polygon area = outer minus holes. */
  def polyArea(p: Polygon): Double =
    if (p.isEmpty) 0.0
    else ringArea(p.head) - p.tail.map(ringArea).sum

  def area(mp: MultiPolygon): Double = mp.map(polyArea).sum

  /** Ring centroid (area-weighted; falls back to vertex mean for degenerate rings). */
  def ringCentroid(r: Ring): Pt = {
    val a = signedArea(r)
    if (math.abs(a) < 1e-12) {
      Pt(r.map(_.x).sum / r.length, r.map(_.y).sum / r.length)
    } else {
      var cx = 0.0; var cy = 0.0
      var i = 0
      val n = r.length
      while (i < n) {
        val p = r(i); val q = r((i + 1) % n)
        val cross = p.x * q.y - q.x * p.y
        cx += (p.x + q.x) * cross
        cy += (p.y + q.y) * cross
        i += 1
      }
      Pt(cx / (6.0 * a), cy / (6.0 * a))
    }
  }

  /** Multipolygon centroid, hole-aware: per polygon, the signed-area-
    * weighted sum over its rings (holes carry the opposite orientation, so
    * they subtract); polygons combine by |area| weight. */
  def centroid(mp: MultiPolygon): Pt = {
    var ax = 0.0; var ay = 0.0; var aw = 0.0
    for (p <- mp if p.nonEmpty) {
      var sx = 0.0; var sy = 0.0; var sw = 0.0
      for (r <- p) {
        val w = signedArea(r)
        val c = ringCentroid(r)
        sx += c.x * w; sy += c.y * w; sw += w
      }
      if (math.abs(sw) > 1e-12) {
        val w = math.abs(sw)
        ax += (sx / sw) * w; ay += (sy / sw) * w; aw += w
      }
    }
    if (aw <= 0) {
      val vs = mp.flatMap(_.headOption).flatten
      Pt(vs.map(_.x).sum / vs.length, vs.map(_.y).sum / vs.length)
    } else Pt(ax / aw, ay / aw)
  }

  /** A point guaranteed STRICTLY inside the multipolygon (unlike the
    * centroid, which falls outside concave shapes): scan ear-triangle
    * centroids of the outer rings until one tests strictly interior.
    * Falls back to the centroid if every probe fails (degenerate ring). */
  def interiorPoint(mp: MultiPolygon): Pt = {
    for (poly <- mp; ring = poly.head; n = ring.length; if n >= 3; i <- 0 until n) {
      val a = ring((i - 1 + n) % n); val b = ring(i); val c = ring((i + 1) % n)
      val cand = Pt((a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3)
      if (pointInPolygon(cand, poly) && closestSegment(cand, Array(poly))._1 > 1e-16)
        return cand
    }
    centroid(mp)
  }

  final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
    def intersects(o: BBox): Boolean =
      xmin <= o.xmax && o.xmin <= xmax && ymin <= o.ymax && o.ymin <= ymax
    def contains(p: Pt): Boolean =
      p.x >= xmin && p.x <= xmax && p.y >= ymin && p.y <= ymax
    def grow(d: Double): BBox = BBox(xmin - d, ymin - d, xmax + d, ymax + d)
  }

  def bbox(mp: MultiPolygon): BBox = {
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = Double.MinValue; var ymax = Double.MinValue
    for (p <- mp; r <- p; v <- r) {
      if (v.x < xmin) xmin = v.x
      if (v.x > xmax) xmax = v.x
      if (v.y < ymin) ymin = v.y
      if (v.y > ymax) ymax = v.y
    }
    BBox(xmin, ymin, xmax, ymax)
  }

  /** Ray-casting: is point strictly inside ring (boundary counts as inside
    * for the even-odd rule on the left-open edges; callers guarantee points
    * off-boundary for determinism). */
  def pointInRing(p: Pt, r: Ring): Boolean = {
    var inside = false
    var i = 0
    val n = r.length
    var j = n - 1
    while (i < n) {
      val a = r(i); val b = r(j)
      if ((a.y > p.y) != (b.y > p.y)) {
        val xInt = (b.x - a.x) * (p.y - a.y) / (b.y - a.y) + a.x
        if (p.x < xInt) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  def pointInPolygon(p: Pt, poly: Polygon): Boolean =
    poly.nonEmpty && pointInRing(p, poly.head) && !poly.tail.exists(h => pointInRing(p, h))

  def pointInMultiPolygon(p: Pt, mp: MultiPolygon): Boolean =
    mp.exists(poly => pointInPolygon(p, poly))

  /** Distance² from p to segment a-b plus the projected point. */
  def sqrDistToSegment(p: Pt, a: Pt, b: Pt): (Double, Pt) = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 <= 0.0) 0.0
      else math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / len2))
    val proj = Pt(a.x + t * dx, a.y + t * dy)
    (p.sqrDist(proj), proj)
  }

  /** Closest segment over all rings of a multipolygon:
    * (sqrDist, projectedPoint, polyIdx, ringIdx, segment start idx).
    * Mirrors QgsGeometry.closestSegmentWithContext semantics. */
  def closestSegment(p: Pt, mp: MultiPolygon): (Double, Pt, Int, Int, Int) = {
    var best = (Double.MaxValue, Pt(0, 0), -1, -1, -1)
    var pi = 0
    while (pi < mp.length) {
      val poly = mp(pi)
      var ri = 0
      while (ri < poly.length) {
        val ring = poly(ri)
        val n = ring.length
        var si = 0
        while (si < n) {
          val (d2, proj) = sqrDistToSegment(p, ring(si), ring((si + 1) % n))
          if (d2 < best._1) best = (d2, proj, pi, ri, si)
          si += 1
        }
        ri += 1
      }
      pi += 1
    }
    best
  }

  /** Closest vertex: (vertex, polyIdx, ringIdx, vertexIdx, sqrDist). */
  def closestVertex(p: Pt, mp: MultiPolygon): (Pt, Int, Int, Int, Double) = {
    var best: (Pt, Int, Int, Int, Double) = (Pt(0, 0), -1, -1, -1, Double.MaxValue)
    var pi = 0
    while (pi < mp.length) {
      val poly = mp(pi)
      var ri = 0
      while (ri < poly.length) {
        val ring = poly(ri)
        var vi = 0
        while (vi < ring.length) {
          val d2 = p.sqrDist(ring(vi))
          if (d2 < best._5) best = (ring(vi), pi, ri, vi, d2)
          vi += 1
        }
        ri += 1
      }
      pi += 1
    }
    best
  }

  /** Angle (degrees) at ring vertex i = |azimuth(v→prev) − azimuth(v→next)|,
    * exactly the reference's get_angle (geo/point.py:27-45). Range [0, 360). */
  def vertexAngle(ring: Ring, i: Int): Double = {
    val n = ring.length
    val v = ring(i)
    val va = ring((i - 1 + n) % n)
    val vb = ring((i + 1) % n)
    math.abs(v.azimuth(va) - v.azimuth(vb))
  }

  final case class CornerContext(angle: Double, isAcute: Boolean, isCorner: Boolean, cath: Double)

  /** Corner test at ring vertex i (reference get_corner_context,
    * geo/point.py:46-82): corner iff deviation from straight > straightThr
    * AND perpendicular distance (cathetus) of v from chord prev→next > cathThr. */
  def cornerContext(
      ring: Ring, i: Int,
      acuteThr: Double = AcuteThr,
      straightThr: Double = StraightThr,
      cathThr: Double = DistThr): CornerContext = {
    val n = ring.length
    val v = ring(i)
    val va = ring((i - 1 + n) % n)
    val vb = ring((i + 1) % n)
    val angle = math.abs(v.azimuth(va) - v.azimuth(vb))
    val a = math.abs(va.azimuth(v) - va.azimuth(vb))
    val h = va.dist(v)
    val c = math.abs(h * math.sin(math.toRadians(a)))
    val isCorner = math.abs(180 - angle) > straightThr && c > cathThr
    val isAcute = if (angle < 180) angle < acuteThr else 360 - angle < acuteThr
    CornerContext(angle, isAcute, isCorner, c)
  }

  final case class SpikeContext(
      angleV: Double, angleA: Double, ndx: Int, ndxa: Int,
      isAcute: Boolean, isZigzag: Boolean, isSpike: Boolean, vx: Option[Pt])

  /** Spike / zig-zag test at ring vertex i (reference get_spike_context,
    * geo/point.py:84-162). `vx` is the projection of the acute vertex onto
    * the far adjacent segment (where a spike vertex gets moved). */
  def spikeContext(
      ring: Ring, i: Int,
      acuteThr: Double = AcuteInv,
      straightThr: Double = StraightThr,
      threshold: Double = DistInv): SpikeContext = {
    val n = ring.length
    val v = ring(i)
    var va = ring((i - 1 + n) % n)
    var vb = ring((i + 1) % n)
    var ndxa = (i - 1 + n) % n
    val ndxb = (i + 1) % n
    val angleV = math.abs(v.azimuth(va) - v.azimuth(vb))
    val na = if (angleV < 180) angleV else 360 - angleV
    val isAcute = na < acuteThr
    if (!isAcute)
      return SpikeContext(angleV, Double.NaN, i, -1, isAcute = false, isZigzag = false, isSpike = false, None)
    var distA = va.dist(v)
    var distB = vb.dist(v)
    if (distA > distB) { // make va the closest adjacent
      val vc = va; val dc = distA
      va = vb; distA = distB
      ndxa = ndxb
      vb = vc; distB = dc
    }
    val angleA = vertexAngle(ring, ndxa)
    val c = math.abs(math.sin(math.toRadians(angleV))) * distA
    val isZigzag = angleA < acuteThr && c < threshold
    val isSpike = math.abs(180 - angleA) > straightThr && c < threshold
    if (isZigzag)
      return SpikeContext(angleV, angleA, i, ndxa, isAcute, isZigzag = true, isSpike, None)
    val gamma = math.abs(90 + angleV - angleA)
    val dx = math.abs(
      distA * (math.cos(math.toRadians(angleV)) +
        math.tan(math.toRadians(gamma)) * math.sin(math.toRadians(angleV))))
    val vx = Pt(v.x + (vb.x - v.x) * dx / distB, v.y + (vb.y - v.y) * dx / distB)
    SpikeContext(angleV, angleA, i, ndxa, isAcute, isZigzag, isSpike, Some(vx))
  }

  /** Drop consecutive duplicate vertices of an open ring. */
  def dedupeRing(r: Ring): Ring = {
    if (r.length < 2) return r
    val out = ArrayBuffer[Pt](r(0))
    var i = 1
    while (i < r.length) {
      if (r(i) != out.last) out += r(i)
      i += 1
    }
    if (out.length > 1 && out.head == out.last) out.remove(out.length - 1)
    out.toArray
  }

  /** Exact polygon-overlap area via Sutherland–Hodgman clip — only valid for
    * CONVEX clip polygons; used for the ≥50%-area containment rule
    * (reference is_inside_area, geo/tools.py:11-19) on convex zone shapes. */
  def clipAreaConvex(subject: Ring, clip: Ring): Double = {
    // ensure clip is counter-clockwise
    val c = if (signedArea(clip) < 0) clip.reverse else clip
    var poly = subject.toIndexedSeq
    var i = 0
    val n = c.length
    while (i < n && poly.nonEmpty) {
      val a = c(i); val b = c((i + 1) % n)
      val out = ArrayBuffer[Pt]()
      val m = poly.length
      var j = 0
      def side(p: Pt): Double = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
      while (j < m) {
        val p = poly(j); val q = poly((j + 1) % m)
        val sp = side(p); val sq = side(q)
        if (sp >= 0) out += p
        if ((sp < 0) != (sq < 0)) {
          val t = sp / (sp - sq)
          out += Pt(p.x + (q.x - p.x) * t, p.y + (q.y - p.y) * t)
        }
        j += 1
      }
      poly = out.toIndexedSeq
      i += 1
    }
    if (poly.length < 3) 0.0 else ringArea(poly.toArray)
  }

  /** Exact subject∩clip overlap area for a SIMPLE (possibly concave) clip
    * ring, via signed triangle-fan decomposition: for any fan origin o, the
    * characteristic function of a simple CCW polygon equals
    * Σ_i sign_i · 1_{tri(o, v_i, v_{i+1})} (overlapping fan triangles cancel
    * outside the polygon). Hence
    * area(S ∩ clip) = Σ_i sign_i · area(S ∩ tri_i), each term a convex
    * Sutherland–Hodgman clip — exact, and robust to collinear vertices
    * (zero-area fan triangles contribute nothing). Extends the ≥50 % rule
    * (geo/tools.py:11-19) to arbitrary admin boundaries (the -s split). */
  def clipAreaSimple(subject: Ring, clip: Ring): Double = {
    val ccw = if (signedArea(clip) < 0) clip.reverse else clip
    val o = ccw(0)
    var acc = 0.0
    var i = 1
    while (i + 1 < ccw.length) {
      val a = ccw(i); val b = ccw(i + 1)
      val s = (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
      if (s > 0) acc += clipAreaConvex(subject, Array(o, a, b))
      else if (s < 0) acc -= clipAreaConvex(subject, Array(o, b, a))
      i += 1
    }
    acc
  }

  /** is_inside_area: fully contained, or overlap area ratio >= 0.5
    * (reference geo/tools.py:11-19). Convex zones only (diamond/rect). */
  def isInsideAreaConvex(subject: Ring, zone: Ring): Boolean = {
    val aSub = ringArea(subject)
    if (aSub <= 0) return false
    clipAreaConvex(subject, zone) / aSub >= 0.5
  }

  /** One Sutherland–Hodgman step: clip `poly` against the halfplane LEFT of
    * the directed line a→b (side(p) >= 0 kept). */
  def clipRingHalfplane(poly: IndexedSeq[Pt], a: Pt, b: Pt): IndexedSeq[Pt] = {
    if (poly.isEmpty) return poly
    def side(p: Pt): Double = (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)
    val out = ArrayBuffer[Pt]()
    val m = poly.length
    var j = 0
    while (j < m) {
      val p = poly(j); val q = poly((j + 1) % m)
      val sp = side(p); val sq = side(q)
      if (sp >= 0) out += p
      if ((sp < 0) != (sq < 0)) {
        val t = sp / (sp - sq)
        out += Pt(p.x + (q.x - p.x) * t, p.y + (q.y - p.y) * t)
      }
      j += 1
    }
    out.toIndexedSeq
  }

  /** EXACT difference ring − CONVEX ring, by halfplane decomposition:
    * subject − B = ⋃ᵢ (subject ∩ in(e₀..eᵢ₋₁) ∩ out(eᵢ)) over B's CCW edges —
    * the pieces are disjoint by construction and each is one clip chain.
    * Returns CCW pieces (possibly empty); the union of the pieces IS the
    * difference, represented unmerged (no boolean-op seam stitching needed).
    * This is the general case the reference's PolygonLayer.difference
    * (polygon.py:576-596) needs for its pool/part rectangles; non-convex
    * subtrahends remain out of scope by design. */
  def differenceConvexOne(subject: Ring, bRaw: Ring): Seq[Ring] = {
    val b = if (signedArea(bRaw) < 0) bRaw.reverse else bRaw // CCW
    var inside: IndexedSeq[Pt] =
      (if (signedArea(subject) < 0) subject.reverse else subject).toIndexedSeq
    val pieces = ArrayBuffer[Ring]()
    val n = b.length
    var i = 0
    while (i < n && inside.nonEmpty) {
      val p = b(i); val q = b((i + 1) % n)
      // out(eᵢ) = RIGHT of the CCW edge p→q = LEFT of q→p
      val piece = clipRingHalfplane(inside, q, p)
      if (piece.length >= 3 && math.abs(ringArea(piece.toArray)) > 1e-12)
        pieces += dedupeRing(piece.toArray)
      inside = clipRingHalfplane(inside, p, q)
      i += 1
    }
    pieces.toSeq.filter(_.length >= 3)
  }

  /** subject − ⋃(convex subtrahends): sequential subtraction (exactly the
    * union subtraction: (A−B₁)−B₂ = A−(B₁∪B₂)), with a bbox skip. Output
    * pieces carry the subject's original ring orientation. */
  def differenceConvex(subject: Ring, bs: Seq[Ring]): Seq[Ring] = {
    val cw = signedArea(subject) < 0
    val bb = bbox(Array(Array(subject)))
    val relevant = bs.filter { b =>
      val b2 = bbox(Array(Array(b)))
      b2.xmin <= bb.xmax && b2.xmax >= bb.xmin && b2.ymin <= bb.ymax && b2.ymax >= bb.ymin
    }
    val pieces = relevant.foldLeft(Seq(
      if (cw) subject.reverse else subject)) { (ps, b) =>
      ps.flatMap(p => differenceConvexOne(p, b))
    }
    if (cw) pieces.map(_.reverse) else pieces
  }
}
