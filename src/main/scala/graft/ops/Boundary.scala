package graft.ops

import graft.geom.{Geom, Pt}
import graft.geom.Geom.MultiPolygon
import graft.text.TextFns

/** Municipality-boundary selection (reference catatom2osm/boundary.py:
  * 84-142). The overpass download itself is out of scope (zero egress, by
  * design); this is the SELECTION the reference applies to the downloaded
  * admin_level=8 candidates:
  *
  *  1. when the municipality polygon is known, the candidate covering it
  *     best wins if intersection(mun)/candidate_area > 0.9
  *     (boundary.py:104-124);
  *  2. otherwise fall back to the hgwnames.dsmatch fuzzy-name argmax over
  *     the candidates' name tags (boundary.py:125-135).
  *
  * Overlap areas use the engine's convex-clip kernel per candidate outer
  * ring (sum over parts); candidates must be convex per ring — the same
  * documented precondition as is_inside_area.
  */
object Boundary {
  final case class Candidate(id: String, name: String, geometry: MultiPolygon)

  /** Sum of clipped areas of `mun`'s outer rings against each of the
    * candidate's outer rings (disjoint-parts assumption: parts of one
    * multipolygon don't overlap, so the sum is the intersection area). */
  def intersectionArea(mun: MultiPolygon, cand: MultiPolygon): Double =
    (for (mp <- mun; cp <- cand)
      yield Geom.clipAreaConvex(mp.head, cp.head)).sum

  def area(mp: MultiPolygon): Double = mp.map(p => Geom.ringArea(p.head)).sum

  /** get_municipality via the fuzzy fallback / area-ratio pick
    * (boundary.py:93-142). Returns (id, name) or None. */
  def searchMunicipality(
      candidates: Seq[Candidate], mun: Option[MultiPolygon],
      name: String): Option[(String, String)] = {
    val byArea = mun.flatMap { m =>
      val scored = candidates
        .map(c => (c, intersectionArea(m, c.geometry) / math.max(area(c.geometry), 1e-300)))
        .filter(_._2 > 0)
      scored.sortBy { case (c, ratio) => (-ratio, c.id) }.headOption
        .collect { case (c, ratio) if ratio > 0.9 && c.name.nonEmpty => (c.id, c.name) }
    }
    byArea.orElse {
      TextFns.dsMatch(name, candidates, (c: Candidate) => c.name)
        .map(c => (c.id, c.name))
    }
  }
}
