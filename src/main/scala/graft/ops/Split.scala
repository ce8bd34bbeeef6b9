package graft.ops

import graft.geom.{Geom, Pt}
import graft.geom.Geom.{MultiPolygon, Ring}

/** The `-s SPLIT` boundary filter (app.py:214-258 get_split + the
  * `split.is_inside_area(f)` zone/parcel query at app.py:255-258): read a
  * GeoJSON FeatureCollection of admin-boundary polygons and keep only the
  * features having ≥50 % of their area inside one of them
  * (geo/tools.py:11-19 pairwise rule — per split feature, not summed).
  * Concave boundaries are exact via ear-clip triangulation
  * ([[Geom.clipAreaSimple]]); holes subtract their overlap.
  *
  * The reader is driver-side (one small boundary file, same as the
  * reference's ogr load); the FILTER runs distributed — a broadcastable
  * Seq of rings against a typed Dataset.
  */
object Split {

  /** One split polygon: outer ring + holes (no closing duplicate vertex). */
  final case class SplitPoly(outer: Ring, holes: Seq[Ring])

  /** Minimal GeoJSON FeatureCollection reader for Polygon / MultiPolygon
    * geometries (the only types get_split keeps — app.py:242-243's
    * WKBMultiPolygon query). Tiny recursive-descent parse of the
    * coordinates arrays; properties are ignored. */
  def read(path: String): Seq[SplitPoly] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val geom = """"geometry"\s*:\s*\{\s*"type"\s*:\s*"(MultiPolygon|Polygon)"\s*,\s*"coordinates"\s*:""".r
    geom.findAllMatchIn(text).flatMap { m =>
      val (tree, _) = parseArray(text, text.indexOf('[', m.end))
      m.group(1) match {
        case "Polygon" => Seq(toPoly(tree.asInstanceOf[Seq[Any]]))
        case "MultiPolygon" =>
          tree.asInstanceOf[Seq[Any]].map(p => toPoly(p.asInstanceOf[Seq[Any]]))
      }
    }.toSeq
  }

  private def toPoly(rings: Seq[Any]): SplitPoly = {
    val rs = rings.map { r =>
      val pts = r.asInstanceOf[Seq[Any]].map { pt =>
        val xy = pt.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double])
        Pt(xy(0), xy(1))
      }.toArray
      if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    }
    SplitPoly(rs.head, rs.tail)
  }

  /** Parse a nested JSON array of numbers starting at `text(i)` == '['.
    * Returns (tree, next index). Leaves are Double. */
  private def parseArray(text: String, i0: Int): (Any, Int) = {
    var i = i0 + 1
    val items = scala.collection.mutable.ArrayBuffer[Any]()
    while (text(i) != ']') {
      text(i) match {
        case '[' =>
          val (child, next) = parseArray(text, i)
          items += child
          i = next
        case c if c == ',' || c.isWhitespace => i += 1
        case _ =>
          val start = i
          while ("+-.eE0123456789".indexOf(text(i)) >= 0) i += 1
          items += text.substring(start, i).toDouble
      }
    }
    (items.toSeq, i + 1)
  }

  /** Overlap area of a (multi)polygon subject with one split polygon, by
    * inclusion–exclusion over BOTH ring sets: Σ parts of
    * (outer∩sp − outer∩spHoles) − (holes∩sp − holes∩spHoles) — subject
    * holes are subtracted too, so a holey parcel near the 50 % line is
    * measured on its true area (geo/tools.py:11-19 intersects the real
    * geometries, holes and all). */
  def overlapArea(subject: MultiPolygon, poly: SplitPoly): Double =
    subject.iterator.map { part =>
      def ringOv(r: Geom.Ring): Double =
        Geom.clipAreaSimple(r, poly.outer) -
          poly.holes.iterator.map(h => Geom.clipAreaSimple(r, h)).sum
      ringOv(part.head) - part.tail.iterator.map(ringOv).sum
    }.sum

  /** Hole-subtracted area of one split polygon. */
  def polyArea(sp: SplitPoly): Double =
    Geom.ringArea(sp.outer) - sp.holes.iterator.map(Geom.ringArea).sum

  /** geo/tools.py is_inside_area over the split layer: true when SOME split
    * polygon contains the subject or ≥50 % of its (hole-subtracted) area.
    * The ratio is rounded to 1e-6 before the threshold test so a
    * geometrically-exact 50 % overlap (reachable on gridded data) is
    * classified identically to closed-form arithmetic — the clip kernel's
    * fp error is ~1e-12, far inside the rounding guard.
    *
    * A split polygon strictly INSIDE the subject is NOT a keep: the
    * reference's `contains(g1)` and `overlaps(g1)` both return False there
    * (overlaps excludes the contains relation), so is_inside_area falls
    * through to False even when the inner polygon covers ≥50 % of the
    * subject's area. */
  def keep(subject: MultiPolygon, polys: Seq[SplitPoly]): Boolean = {
    val area = Geom.area(subject)
    area > 0 && polys.exists { sp =>
      val ov = overlapArea(subject, sp)
      val ratio = math.round(ov / area * 1e6) / 1e6
      val spA = polyArea(sp)
      val strictlyInside =
        ratio < 1.0 && spA > 0 && ov >= spA * (1 - 1e-9)
      !strictlyInside && ratio >= 0.5
    }
  }

  /** Distributed flavor: typed filter with the (small) boundary broadcast
    * by the closure — the Dataset never collects. */
  def filterD[T](ds: org.apache.spark.sql.Dataset[T], polys: Seq[SplitPoly],
      geomOf: T => MultiPolygon): org.apache.spark.sql.Dataset[T] =
    ds.filter((t: T) => keep(geomOf(t), polys))
}
