package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row → OSM tag-map translation (reference catatom2osm/translate.py):
  * the decision tables that turn layer attributes into tag dictionaries.
  * All pure Catalyst `map(...)`/`when(...)` expressions — MapType output.
  */
object Translate {

  /** Place-type first words that switch addr:street -> addr:place
    * (reference translate.py:16-43 + config place_types). */
  val PlaceTypes: Seq[String] = Seq("Barrio", "Caserio", "Diseminado", "Lugar", "Poblado")

  /** Address row -> tags (translate.address_tags semantics):
    * addr:street vs addr:place by first word; zero-padded postcode;
    * ref from the cadastral tail of localId; entrance flag. */
  def addressTags(streetName: Column, designator: Column, postCode: Column,
      localId: Column, isEntrance: Column): Column = {
    val firstWord = split(streetName, " ").getItem(0)
    val isPlace = firstWord.isin(PlaceTypes: _*)
    val base = map(
      lit("addr:housenumber"), designator,
      lit("addr:postcode"), format_string("%05d", postCode),
      lit("ref"), substring(localId, -14, 14))
    val street = when(isPlace,
      map(lit("addr:place"), streetName))
      .otherwise(map(lit("addr:street"), streetName))
    val entrance = when(isEntrance, map(lit("entrance"), lit("yes")))
      .otherwise(map().cast("map<string,string>"))
    map_concat(base, street, entrance)
  }

  /** Building row -> tags (translate.building_tags semantics):
    * condition/currentUse decision table; building:part roof rule
    * (lev_above == 0 -> roof); levels; layer. */
  def buildingTags(condition: Column, currentUse: Column,
      levAbove: Column, levBelow: Column, isPart: Column): Column = {
    val building = when(condition === "ruin", lit("ruins"))
      .when(currentUse === "1_residential", lit("residential"))
      .when(currentUse === "2_agriculture", lit("barn"))
      .when(currentUse === "3_industrial", lit("industrial"))
      .when(currentUse === "4_1_office", lit("office"))
      .when(currentUse === "4_2_retail", lit("retail"))
      .when(currentUse === "4_3_publicServices", lit("public"))
      .otherwise(lit("yes"))
    val key = when(isPart && levAbove === 0, lit("roof"))
      .otherwise(building)
    val base = when(isPart, map(lit("building:part"), key))
      .otherwise(map(lit("building"), key))
    val levels = when(levAbove > 0,
      map(lit("building:levels"), levAbove.cast("string")))
      .otherwise(map().cast("map<string,string>"))
    val below = when(levBelow > 0,
      map(lit("building:levels:underground"), levBelow.cast("string")))
      .otherwise(map().cast("map<string,string>"))
    map_concat(base, levels, below)
  }

  /** Faithful scalar address_tags (reference translate.py:16-43): empty
    * street -> no tags; 'Lugar ' prefix stripped from the name; place-type
    * (or squareplaza-marked) names become addr:place with the 'square'
    * marker removed; zero-padded postcode only when parseable; ref = the
    * cadastral tail of localId. */
  def addressTagsRow(
      localId: String, tnText: String, designator: String,
      postCode: String, spec: String, image: String): Map[String, String] = {
    val tags = scala.collection.mutable.LinkedHashMap[String, String]()
    val name0 = Option(tnText).getOrElse("").trim
    if (name0.isEmpty) return Map.empty
    val hgwType = name0.split(" ")(0).toLowerCase
    val name = if (RemovePlaceFromName.contains(hgwType))
      name0.split(" ").drop(1).mkString(" ") else name0
    if (graft.ops.AddressNames.PlaceTypes.contains(hgwType))
      tags("addr:place") = name.replaceFirst("^square", "")
    else tags("addr:street") = name
    tags("addr:housenumber") = designator
    scala.util.Try(postCode.trim.toInt).toOption
      .foreach(pc => tags("addr:postcode") = f"$pc%05d")
    if (spec == "Entrance") tags("entrance") = "yes"
    tags("ref") = localId.split("\\.").last
    if (image != null && image.nonEmpty) tags("image") = image
    tags.toMap
  }

  val RemovePlaceFromName: Set[String] = Set("lugar")

  /** Faithful scalar building_tags (translate.py:46-90): condition/use
    * decision table keyed by the condition-dependent building key,
    * abandoned ruins, part roof rule, levels, pool layer/location, fixme. */
  def buildingTagsRow(
      localId: String, condition: String, currentUse: String, nature: String,
      levAbove: Int, levBelow: Int, layer: Int, fixme: String): Map[String, String] = {
    val tags = scala.collection.mutable.LinkedHashMap[String, String]()
    val buildingKey = condition match {
      case "declined" => "disused:building"
      case "ruin" => "abandoned:building"
      case _ => "building"
    }
    if (!localId.contains("_")) {
      tags("building") = "yes"
      tags("ref") = localId
    }
    condition match {
      case "declined" => tags("building") = "yes"
      case "ruin" => tags("building") = "ruins"
      case _ =>
    }
    val useMap = Map(
      "1_residential" -> "residential", "2_agriculture" -> "barn",
      "3_industrial" -> "industrial", "4_1_office" -> "office",
      "4_2_retail" -> "retail", "4_3_publicServices" -> "public")
    useMap.get(Option(currentUse).getOrElse(""))
      .foreach(v => tags(buildingKey) = v)
    if (nature == "openAirPool") tags("leisure") = "swimming_pool"
    if (condition == "ruin" && currentUse == null)
      tags("abandoned:building") = "yes"
    if (localId.contains("_part"))
      tags("building:part") = if (levAbove == 0) "roof" else "yes"
    if (levAbove != 0) tags("building:levels") = levAbove.toString
    if (levBelow != 0) tags("building:levels:underground") = levBelow.toString
    if (layer == 1) { tags("layer") = "1"; tags("location") = "roof" }
    if (fixme != null && fixme.nonEmpty) tags("fixme") = fixme
    tags.toMap
  }

  /** All fields stringified (translate.all_tags, translate.py:8-13). */
  def allTags(cols: Map[String, Column]): Column =
    map(cols.toSeq.sortBy(_._1).flatMap { case (k, c) =>
      Seq(lit(k), c.cast("string"))
    }: _*)

  /** Render a tag map deterministically (sorted "k=v|k=v") for comparison. */
  def renderTags(tags: Column): Column =
    array_join(
      array_sort(transform(map_entries(tags),
        e => concat(e.getField("key"), lit("="), e.getField("value")))),
      "|")
}
