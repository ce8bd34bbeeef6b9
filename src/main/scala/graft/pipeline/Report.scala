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
}
