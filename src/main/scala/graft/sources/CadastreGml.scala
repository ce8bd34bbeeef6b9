package graft.sources

import java.nio.file.{Files, Paths}
import graft.geom.Pt

/** OGR-flavored Cadastre building GML reader — the reference's
  * building.gml / buildingpart.gml / othercons.gml fixture format
  * (ogr:FeatureCollection members with gml:Polygon outer/innerBoundaryIs
  * coordinate lists). Covers the ConsLayer.append source mappings the
  * reference tests assert (test_cons.py:96-150):
  * conditionOfConstruction→condition, currentUse, numberOfFloorsAbove/
  * BelowGround→lev_above/lev_below, constructionNature→nature. */
object CadastreGml {

  final case class CadFeature(
      attrs: Map[String, String], geometry: Array[Array[Array[Pt]]])

  private def ring(coords: String): Array[Pt] = {
    val pts = coords.trim.split("\\s+").filter(_.nonEmpty).map { pair =>
      val xy = pair.split(",")
      Pt(xy(0).toDouble, xy(1).toDouble)
    }
    if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
  }

  private val FieldTags = Seq(
    "localId", "conditionOfConstruction", "currentUse",
    "numberOfFloorsAboveGround", "numberOfFloorsBelowGround",
    "constructionNature", "reference", "nature", "documentLink")

  private def posRing(posList: String): Array[Pt] = {
    val nums = posList.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
    val pts = nums.grouped(2).map(a => Pt(a(0), a(1))).toArray
    if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
  }

  /** Reads BOTH Cadastre GML flavors in the reference fixtures: the
    * OGR-converted one (ogr:* fields, gml:coordinates "x,y" rings —
    * building.gml / buildingpart.gml) and the native INSPIRE bu-ext2d one
    * (namespaced fields, posList rings — othercons.gml). */
  def read(path: String): Seq[CadFeature] = {
    val xml = GmlText.load(path)
    "(?s)<gml:featureMember>(.*?)</gml:featureMember>".r
      .findAllMatchIn(xml).map(_.group(1)).map { m =>
        val ogrAttrs = FieldTags.flatMap { t =>
          s"(?s)<ogr:$t>([^<]*)</ogr:$t>".r.findFirstMatchIn(m)
            .map(x => t -> x.group(1).trim)
        }.toMap
        val attrs =
          if (ogrAttrs.nonEmpty) ogrAttrs
          else FieldTags.flatMap { t => // namespaced INSPIRE flavor
            s"(?s)<[\\w-]+:$t[^>]*>([^<]*)</[\\w-]+:$t>".r.findFirstMatchIn(m)
              .map(x => t -> x.group(1).trim)
          }.toMap
        // polygon containers: <gml:Polygon> (both flavors) or the Surface/
        // PolygonPatch nesting (bu-ext2d BuildingPart geometry)
        val ogrPolys = ("(?s)<gml:Polygon[^>]*>(.*?)</gml:Polygon>".r
          .findAllMatchIn(m).map(_.group(1)).toSeq) ++
          ("(?s)<gml:PolygonPatch[^>]*>(.*?)</gml:PolygonPatch>".r
            .findAllMatchIn(m).map(_.group(1)).toSeq)
        val polys = ogrPolys.map { poly =>
          val outer = "(?s)<gml:outerBoundaryIs>.*?<gml:coordinates>(.*?)</gml:coordinates>".r
            .findFirstMatchIn(poly).map(x => ring(x.group(1)))
            .orElse("(?s)<gml:exterior>.*?<gml:posList[^>]*>(.*?)</gml:posList>".r
              .findFirstMatchIn(poly).map(x => posRing(x.group(1))))
            .getOrElse(Array.empty[Pt])
          val inners =
            "(?s)<gml:innerBoundaryIs>.*?<gml:coordinates>(.*?)</gml:coordinates>.*?</gml:innerBoundaryIs>".r
              .findAllMatchIn(poly).map(x => ring(x.group(1))).toSeq ++
            "(?s)<gml:interior>.*?<gml:posList[^>]*>(.*?)</gml:posList>.*?</gml:interior>".r
              .findAllMatchIn(poly).map(x => posRing(x.group(1))).toSeq
          (outer +: inners).toArray
        }.toArray
        CadFeature(attrs, polys)
      }.toSeq
  }

  /** catatom.Reader.get_metadata (catatom.py:54-78): ISO-19139 source
    * metadata — (src_date, cat_mun, crs_ref) from the dateStamp Date, the
    * municipality name embedded in the title (split on '-' then '('), and
    * the EPSG code at the tail of the crs code URI. Replays the
    * reference's own test_get_metadata golden (2017-02-25 / TAZ / 32628).
    * Returns Left(CatIOError message) when any field is missing, like the
    * reference raise. */
  def getMetadata(path: String): Either[String, (String, String, Int)] = {
    val err = Left(s"Could not read metadata from '$path'")
    val xml = try {
      val bytes = GmlText.loadBytes(path)
      val head = new String(bytes, 0, math.min(100, bytes.length),
        java.nio.charset.StandardCharsets.US_ASCII)
      val cs = if (head.toUpperCase.contains("ISO-8859-1"))
        java.nio.charset.StandardCharsets.ISO_8859_1
      else java.nio.charset.StandardCharsets.UTF_8
      new String(bytes, cs)
    } catch { case _: Exception => return err }
    // two bounded steps: isolate the <gmd:tag> ELEMENT first, then find the
    // gco child inside it — an unbounded `.*?<gco:` would scan past the
    // closing tag and steal the next element's text (e.g. a dateStamp
    // holding gco:DateTime would silently yield the title string, where
    // the reference's find('gmd:x/gco:y') returns None and raises)
    def str(tag: String): Option[String] =
      s"(?s)<gmd:$tag>(.*?)</gmd:$tag>".r.findFirstMatchIn(xml)
        .map(_.group(1))
        .flatMap(inner =>
          "(?s)<gco:(?:Date|CharacterString)>\\s*([^<]+?)\\s*</gco:".r
            .findFirstMatchIn(inner).map(_.group(1)))
    (str("dateStamp"), str("title"), str("code")) match {
      case (Some(d), Some(t), Some(c)) =>
        scala.util.Try(c.split("/").last.toInt).toOption match {
          case Some(epsg) =>
            Right((d, t.split("-").last.split("\\(")(0).trim, epsg))
          case None => err
        }
      case _ => err
    }
  }

  /** The ConsLayer.append field mapping (cons.py rename table): source
    * Cadastre tags → layer schema names. */
  def toConsAttrs(f: CadFeature): Map[String, String] = {
    def get(k: String) = f.attrs.getOrElse(k, "")
    Map(
      "localId" -> get("localId"),
      "condition" -> get("conditionOfConstruction"),
      "currentUse" -> get("currentUse"),
      "lev_above" -> get("numberOfFloorsAboveGround"),
      "lev_below" -> get("numberOfFloorsBelowGround"),
      "nature" -> get("constructionNature"))
  }
}
