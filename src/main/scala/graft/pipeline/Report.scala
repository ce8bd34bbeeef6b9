package graft.pipeline

import scala.collection.mutable

/** The run report with its conservation-law validation (reference
  * catatom2osm/report.py:299-381): dataset-independent equations that must
  * reconcile inputs, outputs and deletions of every pipeline run. Values
  * live in a plain map (fed from the metrics table of
  * CheckpointedPipeline); validate() returns the reference's error
  * sentences for every violated law. */
class Report {
  val values: mutable.Map[String, Long] = mutable.Map()
  var buildingCounter: Map[String, Long] = Map.empty
  val errors: mutable.ArrayBuffer[String] = mutable.ArrayBuffer()

  def set(k: String, v: Long): Report = { values(k) = v; this }
  def get(k: String): Long = values.getOrElse(k, 0L)
  def sum(ks: String*): Long = ks.map(get).sum

  def validate(): Seq[String] = {
    errors.clear()
    if (sum("tasks_u", "tasks_r") != get("tasks"))
      errors += "Sum of rustic and urban tasks should be equal to number of tasks in the project"
    if (sum("inp_address_entrance", "inp_address_parcel") != get("inp_address"))
      errors += "Sum of address types should be equal to the input addresses"
    if (sum("addresses_without_number", "not_unique_addresses", "multiple_addresses",
        "refused_addresses", "ignored_addresses", "out_address", "pool_addresses",
        "orphaned_addresses") != get("inp_address"))
      errors += "Sum of output and deleted addresses should be equal to the input addresses"
    // The reference writes `(A > 0 and A) != out_address` (report.py:330-333)
    // — a precedence bug: the comparison binds the whole parenthesized
    // boolean, so when A == 0 Python evaluates `False != out_address`, which
    // is true whenever out_address != 0. Net observable behavior: a PLAIN
    // inequality check (the A==0/out==0 case passes because False == 0).
    // We replicate that observable behavior, not the intended guard.
    if (sum("out_address_entrance", "out_address_parcel") != get("out_address"))
      errors += "Sum of entrance and parcel addresses should be equal to output addresses"
    if (sum("out_addr_str", "out_addr_plc") != get("out_address"))
      errors += "Sum of street and place addresses should be equal to output addresses"
    if (sum("inp_buildings", "inp_parts", "inp_pools") != get("inp_features"))
      errors += "Sum of buildings, parts and pools should be equal to the feature count"
    if (sum("out_features", "outside_parts", "underground_parts",
        "multipart_geoms_building", "parts_to_outline", "parts_wo_building",
        "adjacent_parts", "geom_invalid_building", "buildings_in_pools")
        - get("exploded_parts_building") != get("inp_features"))
      errors += "Sum of output and deleted minus created building features should be equal to input features"
    if (buildingCounter.nonEmpty &&
        buildingCounter.values.sum != get("out_buildings"))
      errors += "Sum of building types should be equal to the number of buildings"
    errors.toSeq
  }

  /** -d (address-only) report surface: when source='address' the reference
    * skips building processing, so its report carries no building metrics.
    * The engine still runs the chain (task geometry needs it) but strips
    * every Buildings-group key — derived from the Titles table between
    * group_buildings and group_tasks — plus the building-type counter,
    * before validation/export. */
  def suppressBuildingGroup(): Report = {
    Report.Titles.map(_._1)
      .dropWhile(_ != "group_buildings").takeWhile(_ != "group_tasks")
      .foreach { k => values.remove(k); strings.remove(k) }
    buildingCounter = Map.empty
    this
  }

  /** String-valued display fields (mun_name, date, ...) for to_string. */
  val strings: mutable.Map[String, String] = mutable.Map()
  /** Per-feature fixme sentences (report.fixmes). The reference appends
    * the fixme documentation link whenever the list was TRACKED (set by
    * fixme_stats), even while empty — mirrored by the flag. */
  val fixmes: mutable.ArrayBuffer[String] = mutable.ArrayBuffer()
  var fixmesTracked: Boolean = false

  /** report.to_string (report.py:381-441): the human report — section
    * headers emitted only when some key of the (sub)group is present,
    * titles in the reference's declaration order, `TAB`-indented sub-rows,
    * thousands-grouped integers, list values with their count, and the
    * fixme documentation link when fixmes were tracked. */
  def toDisplayString(): String = {
    import Report._
    val present: String => Boolean = k =>
      values.contains(k) || strings.contains(k) ||
        (k == "errors" && errors.nonEmpty) || (k == "fixmes" && fixmes.nonEmpty)
    // which group/subgroup headers have at least one present member
    val groups = mutable.Set[String]()
    var g = ""; var sg = ""
    for ((key, _) <- Titles) {
      if (key.startsWith("group_")) { g = key; sg = "" }
      else if (key.startsWith("subgroup_")) sg = key
      else if (present(key)) { if (g.nonEmpty) groups += g; if (sg.nonEmpty) groups += sg }
    }
    val sb = new StringBuilder
    for ((key, title) <- Titles if title != null) {
      if (key.startsWith("group_") && groups(key)) sb ++= s"$Eol=$title=$Eol"
      else if (key.startsWith("subgroup_") && groups(key)) sb ++= s"$Eol==$title==$Eol"
      else if (key == "errors" && errors.nonEmpty) {
        sb ++= s"$title ${intFormat(errors.size)}$Eol"
        errors.foreach(e => sb ++= s"$Tab$e$Eol")
      } else if (key == "fixmes" && fixmes.nonEmpty) {
        fixmes.foreach(f => sb ++= s"$Tab$f$Eol")
      } else if (strings.contains(key)) sb ++= s"$title$Sep${strings(key)}$Eol"
      else if (values.contains(key)) sb ++= s"$title$Sep${intFormat(values(key))}$Eol"
    }
    if (fixmesTracked || fixmes.nonEmpty || values.contains("fixme_count"))
      sb ++= Eol + FixmeDocUrl
    sb.toString
  }
}

object Report {
  val Tab = "  "
  val Sep = ": "
  val Eol = "\n"
  val FixmeDocUrl: String =
    "https://wiki.openstreetmap.org/wiki/ES:Catastro_espa%C3%B1ol/" +
      "Importaci%C3%B3n_de_edificios/Gesti%C3%B3n_de_proyectos#" +
      "Generar_y_corregir_los_archivos_a_importar"

  /** Thousands-grouped integer (report.py int_format, C/en grouping). */
  def intFormat(v: Long): String = "%,d".formatLocal(java.util.Locale.US, v)

  /** The reference's ordered titles table (report.py:23-150), English
    * msgids; null-titled keys are internal and never displayed. */
  val Titles: Seq[(String, String)] = Seq(
    "mun_name" -> "Municipality", "cat_mun" -> "Cadastre name",
    "mun_code" -> "Code", "split_id" -> "Split ID",
    "split_name" -> "Split name", "split_file" -> "Split file",
    "date" -> "Date", "options" -> "Options", "language" -> "Language",
    "group_system_info" -> "System info",
    "app_version" -> "Application version", "platform" -> "Platform",
    "cpu_count" -> "CPU count", "ex_time" -> "Execution time",
    "group_address" -> "Addresses",
    "subgroup_ad_cdau" -> "CDAU",
    "inp_address_cdau" -> "Feature count",
    "rep_address_cdau" -> "Replaced addresses",
    "add_address_cdau" -> "Added addresses",
    "subgroup_ad_input" -> "Input data",
    "address_date" -> "Source date", "inp_address" -> "Feature count",
    "inp_address_entrance" -> (Tab + "Type entrance"),
    "inp_address_parcel" -> (Tab + "Type parcel"),
    "inp_zip_codes" -> "Postal codes", "inp_street_names" -> "Street names",
    "subgroup_ad_process" -> "Process",
    "orphaned_addresses" -> "Addresses without associated building excluded",
    "ignored_addresses" -> "Addresses deleted by street name",
    "addresses_without_number" -> "Addresses without house number deleted",
    "multiple_addresses" -> "Addresses belonging to multiple buildings deleted",
    "not_unique_addresses" -> "'Parcel' addresses not unique for its building deleted",
    "subgroup_ad_conflation" -> "Conflation",
    "osm_addresses" -> "OSM addresses ",
    "osm_addresses_without_number" -> (Tab + "Without house number"),
    "refused_addresses" -> "Addresses rejected because they exist in OSM",
    "subgroup_ad_output" -> "Output data",
    "out_address" -> "Addresses",
    "out_address_entrance" -> (Tab + "In entrance nodes"),
    "out_address_parcel" -> (Tab + "In parcels"),
    "out_addr_str" -> (Tab + "Type addr:street"),
    "out_addr_plc" -> (Tab + "Type addr:place"),
    "group_buildings" -> "Buildings",
    "subgroup_bu_input" -> "Input data",
    "building_date" -> "Source date", "inp_features" -> "Feature count",
    "inp_buildings" -> (Tab + "Buildings"),
    "inp_parts" -> (Tab + "Building parts"),
    "inp_pools" -> (Tab + "Swimming pools"),
    "orphaned_parts" -> "Parts without associated building excluded",
    "subgroup_bu_process" -> "Process",
    "parts_wo_building" -> "Parts without building deleted",
    "outside_parts" -> "Parts outside outline deleted",
    "underground_parts" -> "Parts with no floors above ground",
    "multipart_geoms_building" -> "Buildings with multipart geometries",
    "exploded_parts_building" -> "Buildings resulting from splitting multiparts",
    "parts_to_outline" -> "Parts merged to the outline",
    "adjacent_parts" -> "Adjacent parts merged",
    "buildings_in_pools" -> "Buildings coincidents with a swimming pool deleted",
    "geom_parts_building" -> "Invalid geometry parts deleted",
    "geom_rings_building" -> "Invalid geometry rings deleted",
    "geom_invalid_building" -> "Invalid geometries deleted",
    "vertex_zigzag_building" -> "Zig-zag vertices deleted",
    "vertex_spike_building" -> "Spike vertices deleted",
    "vertex_close_building" -> "Close vertices merged",
    "vertex_topo_building" -> "Topological points created",
    "vertex_simplify_building" -> "Simplified vertices",
    "subgroup_bu_conflation" -> "Conflation",
    "osm_buildings" -> "Buildings/pools in OSM",
    "osm_building_conflicts" -> (Tab + "With conflict"),
    "subgroup_bu_output" -> "Output data",
    "nodes" -> "Nodes", "ways" -> "Ways", "relations" -> "Relations",
    "out_features" -> "Feature count",
    "out_buildings" -> (Tab + "Buildings"),
    "out_parts" -> (Tab + "Buildings parts"),
    "out_pools" -> (Tab + "Swimming pools"),
    "pools_on_roofs" -> (Tab + Tab + "Over buildings"),
    "group_tasks" -> "Project",
    "parcel_parts" -> "Building parts threshold",
    "parcel_dist" -> "Distance threshold",
    "tasks" -> "Tasks files",
    "tasks_r" -> (Tab + "Rustic"), "tasks_u" -> (Tab + "Urban"),
    "group_problems" -> "Problems",
    "errors" -> "Report validation:",
    "fixme_count" -> "Fixmes", "fixmes" -> "",
    "warnings" -> "Warnings:")
}
