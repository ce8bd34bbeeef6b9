package graft.sources

import java.nio.file.{Files, Paths}
import scala.util.chaining._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal INSPIRE Addresses GML reader — enough to load the reference's
  * address.gml fixture with its four layers (Address, ThoroughfareName,
  * PostalDescriptor, AdminUnitName), so the engine replays the reference's
  * own join_field / resolve golden tests. Pure text extraction of a public
  * XML schema; not a general GML parser.
  */
object InspireGml {

  private def members(xml: String, element: String): Seq[String] =
    s"(?s)<$element\\b.*?</$element>".r.findAllIn(xml).toSeq

  private def field(m: String, tag: String): String =
    s"(?s)<$tag>\\s*([^<]*?)\\s*</$tag>".r.findFirstMatchIn(m).map(_.group(1)).getOrElse("")

  private def attr(m: String, tag: String, a: String): String =
    s"""<$tag [^>]*$a="([^"]+)"""".r.findFirstMatchIn(m).map(_.group(1)).getOrElse("")

  /** Address layer: gml_id, localId, spec, designator, x, y, and the raw
    * component hrefs concatenated (resolved downstream by regexp_extract —
    * the reference's resolve mechanism, address.py:42-46). */
  def addresses(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val xml = GmlText.load(path)
    members(xml, "AD:Address").map { m =>
      // point appears as <gml:pos>x y</> or <gml:coordinates>x,y</>
      val raw = field(m, "gml:pos") match {
        case "" => field(m, "gml:coordinates")
        case v => v
      }
      val pos = raw.split("[\\s,]+").filter(_.nonEmpty)
      val hrefs = """<AD:component xlink:href="#([^"]+)"""".r
        .findAllMatchIn(m).map(_.group(1)).mkString(" ")
      (attr(m, "AD:Address", "gml:id"),
        field(m, "base:localId"),
        field(m, "AD:specification"),
        field(m, "AD:designator"),
        pos.headOption.map(_.toDouble).getOrElse(0.0),
        pos.lift(1).map(_.toDouble).getOrElse(0.0),
        hrefs)
    }.toDF("gml_id", "localId", "spec", "designator", "x", "y", "component_href")
  }

  /** Named side layers joined onto addresses by the reference. */
  def thoroughfareNames(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val xml = GmlText.load(path)
    members(xml, "AD:ThoroughfareName").map { m =>
      // street text nests under GN:GeographicalName -> GN:text
      (attr(m, "AD:ThoroughfareName", "gml:id"), field(m, "GN:text"))
    }.toDF("gml_id", "text")
  }

  def postalDescriptors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val xml = GmlText.load(path)
    members(xml, "AD:PostalDescriptor").map { m =>
      (attr(m, "AD:PostalDescriptor", "gml:id"),
        field(m, "AD:postCode") match { case "" => 0; case v => v.toInt })
    }.toDF("gml_id", "postCode")
  }

  def adminUnitNames(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val xml = GmlText.load(path)
    members(xml, "AD:AdminUnitName").map { m =>
      (attr(m, "AD:AdminUnitName", "gml:id"), field(m, "GN:text"))
    }.toDF("gml_id", "text")
  }

  /** INSPIRE CadastralZoning reader — the reference's zoning.gml layer
    * (ZoningLayer, geo/layer/zoning.py): per cp:CadastralZoning member,
    * (localId, label, level, geometry) where level is the first character
    * of the localised level name ('M' urban manzana / 'P' rustic poligono,
    * zoning.py:52-61) and geometry collects every gml:Surface's
    * PolygonPatch (exterior ring + interior holes, posList pairs). */
  def cadastralZonings(
      path: String): Seq[(String, String, String, Array[Array[Array[graft.geom.Pt]]])] = {
    val xml = GmlText.load(path)
    def ring(posList: String): Array[graft.geom.Pt] = {
      val nums = posList.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
      // collect only complete pairs: a truncated/odd posList must not throw
      val pts = nums.grouped(2).collect { case Array(x, y) => graft.geom.Pt(x, y) }.toArray
      if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    }
    members(xml, "cp:CadastralZoning").map { m =>
      val localId = field(m, "localId")
      val label = field(m, "cp:label")
      val level = "(?s)<gmd:LocalisedCharacterString[^>]*>\\s*(.)".r
        .findFirstMatchIn(m).map(_.group(1)).getOrElse("")
      val polys = "(?s)<gml:PolygonPatch>.*?</gml:PolygonPatch>".r.findAllIn(m).map { pp =>
        // bound the search to the exterior ELEMENT: an exterior without a
        // posList (curve-encoded ring) must yield an empty outer, not
        // steal the first interior's coordinates
        val ext = "(?s)<gml:exterior>(.*?)</gml:exterior>".r
          .findFirstMatchIn(pp).map(_.group(1)).getOrElse("")
          .pipe(e => "(?s)<gml:posList[^>]*>(.*?)</gml:posList>".r
            .findFirstMatchIn(e).map(_.group(1)).getOrElse(""))
        val ints = "(?s)<gml:interior>.*?<gml:posList[^>]*>(.*?)</gml:posList>.*?</gml:interior>".r
          .findAllMatchIn(pp).map(_.group(1)).toSeq
        (ring(ext) +: ints.map(ring)).toArray
      }.toArray
      (localId, label, level, polys)
    }
  }

  /** INSPIRE CadastralParcel reader (the reference's `cadastralparcel`
    * layer, catatom.py:216-264 read + app.py:248-273 get_parcel): per
    * cp:CadastralParcel member, (localId, geometry) where localId is the
    * 14-char refcat and geometry collects every PolygonPatch (exterior +
    * interior posList rings) — the same surface nesting as the zoning
    * layer. */
  def cadastralParcels(
      path: String): Seq[(String, Array[Array[Array[graft.geom.Pt]]])] = {
    val xml = GmlText.load(path)
    def ring(posList: String): Array[graft.geom.Pt] = {
      val nums = posList.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)
      // collect only complete pairs: a truncated/odd posList must not throw
      val pts = nums.grouped(2).collect { case Array(x, y) => graft.geom.Pt(x, y) }.toArray
      if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
    }
    members(xml, "cp:CadastralParcel").map { m =>
      val localId = field(m, "base:localId") match {
        case "" => field(m, "localId")
        case v => v
      }
      val polys = "(?s)<gml:PolygonPatch>.*?</gml:PolygonPatch>".r.findAllIn(m).map { pp =>
        // bound the search to the exterior ELEMENT: an exterior without a
        // posList (curve-encoded ring) must yield an empty outer, not
        // steal the first interior's coordinates
        val ext = "(?s)<gml:exterior>(.*?)</gml:exterior>".r
          .findFirstMatchIn(pp).map(_.group(1)).getOrElse("")
          .pipe(e => "(?s)<gml:posList[^>]*>(.*?)</gml:posList>".r
            .findFirstMatchIn(e).map(_.group(1)).getOrElse(""))
        val ints = "(?s)<gml:interior>.*?<gml:posList[^>]*>(.*?)</gml:posList>.*?</gml:interior>".r
          .findAllMatchIn(pp).map(_.group(1)).toSeq
        (ring(ext) +: ints.map(ring)).toArray
      }.toArray
      (localId, polys)
    }
  }

  /** The reference's resolve step (xlink → id columns via regex) followed by
    * its three join_field denormalizations (app.py:556-559) — all broadcast
    * hash joins here. */
  def resolvedAddresses(spark: SparkSession, path: String): DataFrame = {
    val ad = addresses(spark, path)
      .withColumn("PD_id", regexp_extract(col("component_href"), "[\\w\\.]+PD[\\.0-9]+", 0))
      .withColumn("TN_id", regexp_extract(col("component_href"), "[\\w\\.]+TN[\\.0-9]+", 0))
      .withColumn("AU_id", regexp_extract(col("component_href"), "[\\w\\.]+AU[\\.0-9]+", 0))
    ad
      .join(broadcast(thoroughfareNames(spark, path)
        .withColumnRenamed("gml_id", "TN_id").withColumnRenamed("text", "TN_text")),
        Seq("TN_id"), "left")
      .join(broadcast(adminUnitNames(spark, path)
        .withColumnRenamed("gml_id", "AU_id").withColumnRenamed("text", "AU_text")),
        Seq("AU_id"), "left")
      .join(broadcast(postalDescriptors(spark, path)
        .withColumnRenamed("gml_id", "PD_id")),
        Seq("PD_id"), "left")
  }
}
