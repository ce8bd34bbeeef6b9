package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.ops._
import graft.ops.ParcelOps.{ConsF, Parcel}
import graft.sources.OsmOut
import graft.text.Translate

/** End-to-end orchestration of the reference's app.run() DAG
  * (catatom2osm/app.py:118-165, non-resume path):
  *
  *   get_building → process_building (remove_outside → explode → clean:
  *   delete_invalid → topology → merge_building_parts → simplify →
  *   delete_small) → process_parcel (delete_void → create_missing →
  *   count_parts → merge_by_adjacent_buildings → merge_by_parts_count,
  *   task map composed exactly like app.process_parcel) → process_address
  *   (move_address) → get_tasks/process_tasks (per-task OSM documents with
  *   building ways/relations + address nodes) → report.validate().
  *
  * Stage deletions are tallied into the report equations as they happen, so
  * validate() closes the books on the same run. The tiling merges route
  * through the DISTRIBUTED per-municipality wrappers; the whole run is one
  * municipality, exactly like a reference invocation.
  */
object AppRun {

  final case class Result(
      prepared: Seq[ConsF],
      parcels: Seq[Parcel],
      tasks: Map[String, String],
      addressesOut: Array[(String, String, String, Double, Double)],
      taskDocs: Map[String, String],
      report: Report)

  /** process_building via the Seq chain, tallying stage deletions. */
  private def runChainSeq(
      spark: SparkSession, consRaw: Seq[ConsF], report: Report): Seq[ConsF] = {
    val underground = consRaw.count(f => f.kind == "part" &&
      f.levAbove == 0 && f.levBelow != 0 && f.levBelow != -1)
    val afterOutside = ConsChain.removeOutsideParts(consRaw)
    report.set("underground_parts", underground)
    report.set("outside_parts", consRaw.length - afterOutside.length - underground)
    val afterExplode = ConsChain.explode(afterOutside)
    report.set("exploded_parts_building", afterExplode.length - afterOutside.length)
    val afterInvalid = ConsChain.deleteInvalid(spark, afterExplode)
    val afterTopo = ConsChain.topology(spark, afterInvalid)
    val afterMerge = ConsChain.mergeParts(spark, afterTopo)
    // merge deletions: buildings lost are pool-coincident, parts lost are
    // merged-to-outline/adjacent (lumped into parts_to_outline)
    val bLost = afterTopo.count(_.kind == "building") - afterMerge.count(_.kind == "building")
    report.set("buildings_in_pools", bLost)
    report.set("parts_to_outline", afterTopo.length - afterMerge.length - bLost)
    val afterSimplify = ConsChain.simplify(spark, afterMerge)
    val prepared = ConsChain.deleteSmall(afterSimplify)
    // small/degenerate deletions land in the invalid-geometry bucket
    report.set("geom_invalid_building",
      (afterExplode.length - afterInvalid.length) +
        (afterSimplify.length - prepared.length))
    prepared
  }

  /** process_building via the fully-distributed staged chain; the same
    * metrics come from Dataset counts between stages. */
  private def runChainDistributed(
      spark: SparkSession, consRaw: Seq[ConsF], report: Report): Seq[ConsF] = {
    import spark.implicits._
    val underground = consRaw.count(f => f.kind == "part" &&
      f.levAbove == 0 && f.levBelow != 0 && f.levBelow != -1)
    val ordered = spark.createDataset(
      consRaw.zipWithIndex.map { case (f, i) => ConsChain.FidCons(i.toLong, f) })
    val afterOutside = ConsChain.removeOutsidePartsD(ordered).persist()
    val nOutside = afterOutside.count()
    report.set("underground_parts", underground)
    report.set("outside_parts", consRaw.length - nOutside - underground)
    val afterExplode = ConsChain.explodeD(afterOutside).persist()
    val nExplode = afterExplode.count()
    report.set("exploded_parts_building", nExplode - nOutside)
    val afterInvalid = ConsChain.deleteInvalidD(afterExplode).persist()
    val nInvalid = afterInvalid.count()
    val afterTopo = ConsChain.topologyD(afterInvalid).persist()
    val afterMerge = ConsChain.mergePartsD(afterTopo).persist()
    val bLost = afterTopo.filter(_.f.kind == "building").count() -
      afterMerge.filter(_.f.kind == "building").count()
    report.set("buildings_in_pools", bLost)
    report.set("parts_to_outline", afterTopo.count() - afterMerge.count() - bLost)
    val afterSimplify = ConsChain.simplifyD(afterMerge).persist()
    val preparedDs = ConsChain.deleteSmallD(afterSimplify).persist()
    val nPrepared = preparedDs.count()
    report.set("geom_invalid_building",
      (nExplode - nInvalid) + (afterSimplify.count() - nPrepared))
    preparedDs.collect().sortBy(_.fid).map(_.f).toSeq
  }

  def run(
      spark: SparkSession,
      consRaw: Seq[ConsF],
      parcelsRaw: Seq[Parcel],
      addrs: Dataset[MoveAddress.Addr],
      munCode: String,
      maxParts: Int = 20,
      buffer: Double = 30.0,
      distributedChain: Boolean = false,
      addrTags: Map[String, Map[String, String]] = Map.empty): Result = {
    import spark.implicits._
    val report = new Report

    // ---- get_building --------------------------------------------------
    report.set("inp_features", consRaw.length)
    report.set("inp_buildings", consRaw.count(_.kind == "building"))
    report.set("inp_parts", consRaw.count(_.kind == "part"))
    report.set("inp_pools", consRaw.count(_.kind == "pool"))

    // ---- process_building (app.py:241-263) ------------------------------
    val prepared =
      if (distributedChain) runChainDistributed(spark, consRaw, report)
      else runChainSeq(spark, consRaw, report)
    report.set("out_features", prepared.length)

    // ---- process_address (move_address over the prepared layer) ---------
    val consFeat = spark.createDataset(prepared.zipWithIndex.map { case (f, i) =>
      MoveAddress.ConsFeature(s"${f.localId}#$i", f.ref, f.kind, f.geometry)
    })
    val addrRows = addrs.collect()
    report.set("inp_address", addrRows.length)
    report.set("inp_address_entrance", addrRows.count(_.spec == "Entrance"))
    report.set("inp_address_parcel", addrRows.count(_.spec != "Entrance"))
    val addressesOut = MoveAddress.moveAddressFull(addrs, consFeat)
      .as[(String, String, String, Double, Double)].collect()
    report.set("out_address", addressesOut.length)
    report.set("out_address_entrance", addressesOut.count(_._3 == "Entrance"))
    report.set("out_address_parcel", addressesOut.count(_._3 != "Entrance"))
    report.set("out_addr_str", addressesOut.length) // all street-typed here
    report.set("out_addr_plc", 0)
    // deleted addresses: no building for the refcat -> orphaned; the rest
    // (non-Entrance with several buildings) -> multiple
    val buildingRefs = prepared.filter(_.kind == "building").map(_.ref).toSet
    val orphaned = addrRows.count(a => !buildingRefs.contains(a.ref))
    report.set("orphaned_addresses", orphaned)
    report.set("multiple_addresses",
      addrRows.length - addressesOut.length - orphaned)

    // ---- process_parcel (app.py:286-308) --------------------------------
    val preparedDs = spark.createDataset(prepared)
    val pcl1 = ParcelOps.deleteVoidParcels(spark.createDataset(parcelsRaw), preparedDs)
    val pcl2 = ParcelOps.createMissingParcels(pcl1, preparedDs)
    val counted = ParcelOps.countParts(pcl2, preparedDs).collect().toSeq
      .sortBy(_.localId)
    var tasks: Map[String, String] = counted.map(p => p.localId -> p.localId).toMap
    def compose(m: Map[String, String]): Unit =
      tasks = tasks.map { case (k, v) => k -> m.getOrElse(v, v) }
    // distributed per-municipality merge drivers
    val mp1 = spark.createDataset(counted.zipWithIndex.map { case (p, i) =>
      ParcelOps.MunParcel(munCode, i.toLong, p) })
    val mc1 = spark.createDataset(prepared.map(c => ParcelOps.MunCons(munCode, c)))
    val rows1 = ParcelOps.mergeByAdjacentBuildingsByMun(mp1, mc1).collect()
    val parcels1 = rows1.filter(_.parcel != null).sortBy(_.seq).map(_.parcel).toSeq
    compose(rows1.filter(_.taskFrom != null).map(r => r.taskFrom -> r.taskTo).toMap)
    val mp2 = spark.createDataset(parcels1.zipWithIndex.map { case (p, i) =>
      ParcelOps.MunParcel(munCode, i.toLong, p) })
    val rows2 = ParcelOps.mergeByPartsCountByMun(mp2, maxParts, buffer).collect()
    val parcels2 = rows2.filter(_.parcel != null).sortBy(_.seq).map(_.parcel).toSeq
    compose(rows2.filter(_.taskFrom != null).map(r => r.taskFrom -> r.taskTo).toMap)

    // ---- get_tasks / process_tasks (app.py:310-389) ----------------------
    def labelOf(ref: String): String = tasks.getOrElse(ref, ref)
    val labels = (prepared.map(f => labelOf(f.ref)) ++
      addressesOut.map(a => labelOf(a._2))).distinct.sorted
    val labelId = labels.zipWithIndex.map { case (l, i) => l -> i.toLong }.toMap
    report.set("tasks", labels.length)
    report.set("tasks_u", labels.count(_.length > 9)) // urban refcat labels
    report.set("tasks_r", labels.count(_.length <= 9))
    val taskFeats = spark.createDataset(prepared.zipWithIndex.map { case (f, i) =>
      OsmOut.TaskFeature(labelId(labelOf(f.ref)), s"${f.localId}#$i", f.geometry,
        Translate.buildingTagsRow(f.localId, null, null,
          if (f.kind == "pool") "openAirPool" else null,
          math.max(0, f.levAbove), math.max(0, f.levBelow), 0, ""))
    })
    // node tags: the caller supplies the translate.address_tags output per
    // localId (Translate.addressTagsRow over the resolved layer); addr:ref
    // is always added so task docs stay self-describing
    // entrance=yes follows the spec RESOLVED by move_address (the reference
    // computes address_tags after move_address): an address demoted from
    // Entrance drops the tag, one classified Entrance gains it
    val addrNodes = spark.createDataset(addressesOut.toSeq.map { a =>
      val base0 = addrTags.getOrElse(a._1, Map.empty[String, String])
      val base = if (a._3 == "Entrance") base0 + ("entrance" -> "yes")
        else base0 - "entrance"
      (labelId(labelOf(a._2)), a._4, a._5, base + ("addr:ref" -> a._1))
    })
    val docs = OsmOut.perTaskOsmXml(taskFeats, addrNodes).collect().toMap
    val byLabel = labels.map(l => l -> docs(labelId(l))).toMap

    Result(prepared, parcels2, tasks, addressesOut, byLabel, report)
  }
}
