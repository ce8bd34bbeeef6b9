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

  /** Single-municipality entry over the DATASET path: builds the Dataset
    * inputs, delegates to runMulti (zero feature collects between stages),
    * and collects the small outputs into the Seq-shaped Result — so the
    * reference-fixture goldens exercise the same orchestration that runs N
    * municipalities at scale. */
  /** Shared single-municipality prologue: wrap the Seq inputs as one-mun
    * Datasets, run the Dataset-native DAG, extract the per-mun report. */
  private def runSingle(
      spark: SparkSession,
      consRaw: Seq[ConsF], parcelsRaw: Seq[Parcel],
      addrs: Dataset[MoveAddress.Addr], munCode: String,
      maxParts: Int, buffer: Double,
      addrTags: Map[String, Map[String, String]],
      taskSource: String): (MultiResult, Report) = {
    import spark.implicits._
    val consDs = spark.createDataset(consRaw.zipWithIndex.map { case (f, i) =>
      MunSeqCons(munCode, i.toLong, f) })
    val parcelsDs = spark.createDataset(parcelsRaw.zipWithIndex.map { case (p, i) =>
      ParcelOps.MunParcel(munCode, i.toLong, p) })
    val addrDs = addrs.map(a => MunAddr(munCode, a.localId, a.ref, a.spec, a.x, a.y))
    val tagsDs = spark.createDataset(addrTags.toSeq)
    val mc = munCode
    val mr = runMulti(spark, consDs, parcelsDs, addrDs, (_: String) => mc,
      maxParts, buffer, Some(tagsDs), taskSource = taskSource)
    val report = new Report
    mr.metrics.filter(_._1 == munCode).foreach { case (_, k, v) => report.set(k, v) }
    (mr, report)
  }

  private def runViaMulti(
      spark: SparkSession,
      consRaw: Seq[ConsF], parcelsRaw: Seq[Parcel],
      addrs: Dataset[MoveAddress.Addr], munCode: String,
      maxParts: Int, buffer: Double,
      addrTags: Map[String, Map[String, String]],
      taskSource: String): Result = {
    import spark.implicits._
    val (mr, report) = runSingle(spark, consRaw, parcelsRaw, addrs, munCode,
      maxParts, buffer, addrTags, taskSource)
    val prepared = mr.prepared.collect().sortBy(_.fid).map(_.f).toSeq
    val parcels2 = mr.parcels.collect().sortBy(_.seq).map(_.parcel).toSeq
    val tasks = mr.taskMap.as[(String, String)].collect().toMap
    val addressesOut = mr.addressesOut
      .select("localId", "ref", "spec", "x", "y")
      .as[(String, String, String, Double, Double)].collect()
    val docs = mr.taskDocs.collect().map(d => d.label -> d.xml).toMap
    graft.CacheBin.drain()
    Result(prepared, parcels2, tasks, addressesOut, docs, report)
  }

  /** Single-municipality run that KEEPS the task documents distributed:
    * the CLI sink writes them through OsmOut.writeTaskFiles (a distributed
    * file writer), so output volume never serializes through the driver —
    * even a mega-municipality's task XML stays on executors. Returns the
    * (checkpoint-materialized) task-doc Dataset plus the per-mun report;
    * use [[run]] only when the reference-equivalence Seq surfaces
    * (prepared features, parcels, task map) are actually needed. */
  def runDocs(
      spark: SparkSession,
      consRaw: Seq[ConsF], parcelsRaw: Seq[Parcel],
      addrs: Dataset[MoveAddress.Addr], munCode: String,
      maxParts: Int = 20, buffer: Double = 30.0,
      addrTags: Map[String, Map[String, String]] = Map.empty,
      taskSource: String = "building"): (Dataset[TaskDoc], Report) = {
    val (mr, report) = runSingle(spark, consRaw, parcelsRaw, addrs, munCode,
      maxParts, buffer, addrTags, taskSource)
    // taskDocs is a checkpoint-materialized stage — safe to read after the
    // operator-internal persists are released
    graft.CacheBin.drain()
    (mr.taskDocs, report)
  }

  /** Single-municipality entry — delegates to the Dataset-native
    * [[runMulti]] (the only orchestration path; the Seq chain was retired
    * once every golden rode the D forms). */
  def run(
      spark: SparkSession,
      consRaw: Seq[ConsF],
      parcelsRaw: Seq[Parcel],
      addrs: Dataset[MoveAddress.Addr],
      munCode: String,
      maxParts: Int = 20,
      buffer: Double = 30.0,
      addrTags: Map[String, Map[String, String]] = Map.empty,
      taskSource: String = "building"): Result =
    runViaMulti(spark, consRaw, parcelsRaw, addrs, munCode,
      maxParts, buffer, addrTags, taskSource)

  // ------------------------------------------------------------------
  // Dataset-native, multi-municipality orchestration: N municipalities'
  // features flow stage-to-stage in Dataset land with NO feature collect
  // between stages — the chain runs globally (cadastral refs and
  // coordinates are municipality-disjoint), the greedy tiling merges run
  // per-municipality through the cogroup wrappers, the task-relabel map is
  // composed as Dataset joins, and task documents are emitted by a
  // label-keyed cogroup ready for `.write`. Only per-mun AGGREGATES are
  // collected (the metrics rows, O(muns × keys)).
  // ------------------------------------------------------------------

  /** One municipality's construction feature with its within-mun layer
    * order (seq) — cadastral refs must be globally unique, as Spanish
    * refcats are. */
  final case class MunSeqCons(mun: String, seq: Long, f: ConsF)
  final case class MunAddr(mun: String, localId: String, ref: String,
      spec: String, x: Double, y: Double)
  final case class TaskDoc(mun: String, label: String, xml: String)

  final case class MultiResult(
      prepared: Dataset[ConsChain.FidCons],
      parcels: Dataset[ParcelOps.MunParcel],
      taskMap: DataFrame, // (ref, label)
      addressesOut: DataFrame, // (mun, localId, ref, spec, x, y)
      taskDocs: Dataset[TaskDoc],
      metrics: Seq[(String, String, Long)]) // (mun, key, value)

  def runMulti(
      spark: SparkSession,
      cons: Dataset[MunSeqCons],
      parcels: Dataset[ParcelOps.MunParcel],
      addrs: Dataset[MunAddr],
      munOfRef: String => String,
      maxParts: Int = 20,
      buffer: Double = 30.0,
      addrTags: Option[Dataset[(String, Map[String, String])]] = None,
      checkpoint: Option[(CheckpointedPipeline, String)] = None,
      taskSource: String = "building"): MultiResult = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val munOf = munOfRef

    // Stage boundary: with a CheckpointedPipeline each stage is a
    // fingerprinted parquet table (manifest hit -> the stage is read back,
    // not recomputed — the reference's stop/resume lifecycle,
    // app.py:581-624, generalized to content-addressed stages); without
    // one, an eager localCheckpoint caches rows and truncates lineage.
    def ckDs[T](name: String)(ds: => Dataset[T])(
        implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] =
      checkpoint match {
        case Some((cp, fp)) => cp.stage(name, fp)(ds.toDF()).as[T]
        case None => ds.localCheckpoint()
      }
    def ckDf(name: String)(df: => DataFrame): DataFrame =
      checkpoint match {
        case Some((cp, fp)) => cp.stage(name, fp)(df)
        case None => df.localCheckpoint()
      }

    val metrics = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    // Per-stage metric counts are DEFERRED: each stage registers a tagged
    // (tag, mun, n) aggregate frame here, and ONE union job collects the
    // whole rollup after the last stage — a single action over the already
    // checkpointed stage tables instead of ~18 small collect jobs.
    val countDfs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def deferCons(tag: String, ds: Dataset[ConsChain.FidCons],
        pred: ConsF => Boolean = _ => true): Unit =
      countDfs += ds.filter(fc => pred(fc.f)).map(fc => munOf(fc.f.ref)).toDF("mun")
        .groupBy("mun").agg(count(lit(1)).as("n")).withColumn("tag", lit(tag))
    def deferMuns(tag: String, munRows: DataFrame): Unit =
      countDfs += munRows.groupBy("mun").agg(count(lit(1)).as("n"))
        .withColumn("tag", lit(tag))
    def addDiff(key: String, terms: (Map[String, Long], Long)*): Unit = {
      val muns = terms.flatMap(_._1.keys).distinct.sorted
      muns.foreach { m =>
        metrics += ((m, key, terms.map { case (c, s) => s * c(m) }.sum))
      }
    }

    // ---- get_building: fid = global rank over (mun, within-mun seq) ------
    val keyed = cons.map(m => (f"${m.mun}|${m.seq}%019d", m.f)).toDF("k", "f")
    // every stage boundary is an EAGER localCheckpoint: it caches the rows
    // AND truncates the logical plan, so downstream stages (which reference
    // their input several times inside joins/cogroups) never build
    // multiplicatively growing plans
    val ordered = ckDs("s00_ordered") {
      OsmOut.withGlobalRank(keyed, "k", "fid")
        .select(col("fid"), col("f")).as[(Long, ConsF)]
        .map { case (fid, f) => ConsChain.FidCons(fid, f) }
    }
    deferCons("inp_all", ordered)
    deferCons("inp_b", ordered, _.kind == "building")
    deferCons("inp_p", ordered, _.kind == "part")
    deferCons("inp_pool", ordered, _.kind == "pool")
    deferCons("underground", ordered, f => f.kind == "part" &&
      f.levAbove == 0 && f.levBelow != 0 && f.levBelow != -1)

    // ---- process_building: the distributed chain, globally --------------
    val afterOutside = ckDs("s01_outside")(ConsChain.removeOutsidePartsD(ordered))
    deferCons("n_outside", afterOutside)
    val afterExplode = ckDs("s02_explode")(ConsChain.explodeD(afterOutside))
    deferCons("n_explode", afterExplode)
    val afterInvalid = ckDs("s03_invalid")(ConsChain.deleteInvalidD(afterExplode))
    deferCons("n_invalid", afterInvalid)
    val afterTopo = ckDs("s04_topology")(ConsChain.topologyD(afterInvalid))
    val afterMerge = ckDs("s05_mergeparts")(ConsChain.mergePartsD(afterTopo))
    deferCons("n_topo", afterTopo)
    deferCons("topo_b", afterTopo, _.kind == "building")
    deferCons("n_merge", afterMerge)
    deferCons("merge_b", afterMerge, _.kind == "building")
    val afterSimplify = ckDs("s06_simplify")(ConsChain.simplifyD(afterMerge))
    val prepared = ckDs("s07_prepared")(ConsChain.deleteSmallD(afterSimplify))
    deferCons("n_simplify", afterSimplify)
    deferCons("n_prepared", prepared)

    // ---- process_address: move_address over the prepared layer ----------
    val consFeat = prepared.map(fc =>
      MoveAddress.ConsFeature(s"${fc.f.localId}#${fc.fid}", fc.f.ref, fc.f.kind,
        fc.f.geometry))
    deferMuns("inp_addr", addrs.map(_.mun).toDF("mun"))
    deferMuns("inp_addr_e", addrs.filter(_.spec == "Entrance").map(_.mun).toDF("mun"))
    val plainAddrs = addrs.map(a => MoveAddress.Addr(a.localId, a.ref, a.spec, a.x, a.y))
    val addressesOut = ckDf("s08_addresses") {
      MoveAddress.moveAddressFull(plainAddrs, consFeat)
        .as[(String, String, String, Double, Double)]
        .map(t => (munOf(t._2), t._1, t._2, t._3, t._4, t._5))
        .toDF("mun", "localId", "ref", "spec", "x", "y")
    }
    deferMuns("out_addr", addressesOut.select("mun"))
    deferMuns("out_addr_e", addressesOut.filter(col("spec") === "Entrance").select("mun"))
    // orphaned = no building for the refcat (left_anti on ref, no driver set)
    val buildingRefs = prepared.filter(_.f.kind == "building")
      .map(_.f.ref).distinct().toDF("ref")
    deferMuns("orphaned",
      addrs.toDF().join(buildingRefs, Seq("ref"), "left_anti").select("mun"))

    // ---- process_parcel (app.py:286-308) ---------------------------------
    val preparedCons = prepared.map(_.f)
    val pcl1 = ParcelOps.deleteVoidParcels(parcels.map(_.parcel), preparedCons)
    val pcl2 = ParcelOps.createMissingParcels(pcl1, preparedCons)
    val counted = ParcelOps.countParts(pcl2, preparedCons)
    // per-mun layer order = localId rank within the municipality (the
    // single-mun driver sorts counted parcels by localId the same way)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("mun").orderBy("localId")
    val mp1 = counted
      .map(p => (munOf(p.localId), p))
      .toDF("mun", "parcel")
      .withColumn("localId", col("parcel.localId"))
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
      .select(col("mun"), col("seq"), col("parcel"))
      .as[ParcelOps.MunParcel]
    val mp1ck = ckDs("s09_counted")(mp1)
    val mc1 = preparedCons.map(c => ParcelOps.MunCons(munOf(c.ref), c))
    val rows1 = ckDs("s10_mergeadj")(ParcelOps.mergeByAdjacentBuildingsByMun(mp1ck, mc1))
    val mp2 = rows1.filter(_.parcel != null)
      .map(r => ParcelOps.MunParcel(r.mun, r.seq, r.parcel))
    val rows2 = ckDs("s11_mergecnt")(ParcelOps.mergeByPartsCountByMun(mp2, maxParts, buffer))
    val parcelsOut = rows2.filter(_.parcel != null)
      .map(r => ParcelOps.MunParcel(r.mun, r.seq, r.parcel))

    // ---- task map composed as Dataset joins (no driver Map) --------------
    val t1 = rows1.filter(_.taskFrom != null)
      .map(r => (r.taskFrom, r.taskTo)).toDF("from1", "to1")
    val t2 = rows2.filter(_.taskFrom != null)
      .map(r => (r.taskFrom, r.taskTo)).toDF("from2", "to2")
    val taskMap = counted.map(_.localId).toDF("ref")
      .join(t1, col("ref") === col("from1"), "left")
      .select(col("ref"), coalesce(col("to1"), col("ref")).as("mid"))
      .join(t2, col("mid") === col("from2"), "left")
      .select(col("ref"), coalesce(col("to2"), col("mid")).as("label"))
    val taskMapCk = ckDf("s12_taskmap")(taskMap)

    // ---- get_tasks / process_tasks: label-keyed document cogroup ---------
    // the task SOURCE layer mirrors app.py:144-146/161: 'building' (default
    // and -b) emits the prepared construction features into the task docs;
    // 'address' (-d, address-only) emits no building geometry — the docs
    // carry the moved address nodes alone, split by the same task map
    val buildingFeats = prepared.toDF().as("p")
      .join(taskMapCk.as("t"), col("p.f.ref") === col("t.ref"), "left")
      .select(coalesce(col("t.label"), col("p.f.ref")).as("task"),
        col("p.fid"), col("p.f"))
      .as[(String, Long, ConsF)]
      .map { case (task, fid, f) =>
        OsmOut.TaskFeatureS(task, s"${f.localId}#$fid", f.geometry,
          Translate.buildingTagsRow(f.localId, null, null,
            if (f.kind == "pool") "openAirPool" else null,
            math.max(0, f.levAbove), math.max(0, f.levBelow), 0, ""))
      }
    val taskFeats =
      if (taskSource == "address") spark.emptyDataset[OsmOut.TaskFeatureS]
      else buildingFeats
    val tagsDs = addrTags.getOrElse(
      spark.emptyDataset[(String, Map[String, String])]).toDF("localId", "btags")
    val addrNodes = addressesOut.as("a")
      .join(taskMapCk.as("t"), col("a.ref") === col("t.ref"), "left")
      .join(tagsDs.as("g"), Seq("localId"), "left")
      .select(coalesce(col("t.label"), col("a.ref")).as("task"),
        col("a.localId"), col("a.spec"), col("a.x"), col("a.y"), col("g.btags"))
      .as[(String, String, String, Double, Double, Option[Map[String, String]])]
      .map { case (task, lid, spec, x, y, tags) =>
        // entrance=yes follows the spec RESOLVED by move_address
        val base0 = tags.getOrElse(Map.empty)
        val base = if (spec == "Entrance") base0 + ("entrance" -> "yes")
          else base0 - "entrance"
        (task, x, y, base + ("addr:ref" -> lid))
      }
    val taskDocs = ckDs("s13_taskdocs") {
      OsmOut.perTaskOsmXmlS(taskFeats, addrNodes)
        .map { case (label, xml) => TaskDoc(munOf(label), label, xml) }
    }
    deferMuns("n_tasks", taskDocs.map(_.mun).toDF("mun"))
    deferMuns("n_tasks_u", taskDocs.filter(_.label.length > 9).map(_.mun).toDF("mun"))

    // ---- ONE metrics rollup job over all deferred stage counts -----------
    val rolled = countDfs.reduce(_ unionByName _)
      .select(col("tag"), col("mun"), col("n"))
      .as[(String, String, Long)].collect()
    val byTag: Map[String, Map[String, Long]] = rolled.groupBy(_._1)
      .map { case (t, rs) => t -> rs.map(r => r._2 -> r._3).toMap }
    def m(tag: String): Map[String, Long] =
      byTag.getOrElse(tag, Map.empty).withDefaultValue(0L)
    addDiff("inp_features", (m("inp_all"), 1L))
    addDiff("inp_buildings", (m("inp_b"), 1L))
    addDiff("inp_parts", (m("inp_p"), 1L))
    addDiff("inp_pools", (m("inp_pool"), 1L))
    addDiff("underground_parts", (m("underground"), 1L))
    addDiff("outside_parts",
      (m("inp_all"), 1L), (m("n_outside"), -1L), (m("underground"), -1L))
    addDiff("exploded_parts_building", (m("n_explode"), 1L), (m("n_outside"), -1L))
    addDiff("buildings_in_pools", (m("topo_b"), 1L), (m("merge_b"), -1L))
    addDiff("parts_to_outline",
      (m("n_topo"), 1L), (m("n_merge"), -1L), (m("topo_b"), -1L), (m("merge_b"), 1L))
    addDiff("geom_invalid_building",
      (m("n_explode"), 1L), (m("n_invalid"), -1L),
      (m("n_simplify"), 1L), (m("n_prepared"), -1L))
    addDiff("out_features", (m("n_prepared"), 1L))
    addDiff("inp_address", (m("inp_addr"), 1L))
    addDiff("inp_address_entrance", (m("inp_addr_e"), 1L))
    addDiff("inp_address_parcel", (m("inp_addr"), 1L), (m("inp_addr_e"), -1L))
    addDiff("out_address", (m("out_addr"), 1L))
    addDiff("out_address_entrance", (m("out_addr_e"), 1L))
    addDiff("out_address_parcel", (m("out_addr"), 1L), (m("out_addr_e"), -1L))
    addDiff("out_addr_str", (m("out_addr"), 1L))
    addDiff("out_addr_plc", (m("out_addr"), 0L))
    addDiff("orphaned_addresses", (m("orphaned"), 1L))
    addDiff("multiple_addresses",
      (m("inp_addr"), 1L), (m("out_addr"), -1L), (m("orphaned"), -1L))
    addDiff("tasks", (m("n_tasks"), 1L))
    addDiff("tasks_u", (m("n_tasks_u"), 1L))
    addDiff("tasks_r", (m("n_tasks"), 1L), (m("n_tasks_u"), -1L))

    // densify: every (mun, key) pair present, 0 where a stage saw no rows —
    // so per-mun Reports have the full key set regardless of data shape
    val allMuns = (m("inp_all").keySet ++ m("inp_addr").keySet).toSeq.sorted
    val byMk = metrics.map(t => (t._1, t._2) -> t._3).toMap
    val keys = Seq("inp_features", "inp_buildings", "inp_parts", "inp_pools",
      "underground_parts", "outside_parts", "exploded_parts_building",
      "buildings_in_pools", "parts_to_outline", "geom_invalid_building",
      "out_features", "inp_address", "inp_address_entrance",
      "inp_address_parcel", "out_address", "out_address_entrance",
      "out_address_parcel", "out_addr_str", "out_addr_plc",
      "orphaned_addresses", "multiple_addresses", "tasks", "tasks_u", "tasks_r")
    val dense = for (m <- allMuns; k <- keys) yield (m, k, byMk.getOrElse((m, k), 0L))
    MultiResult(prepared, parcelsOut, taskMapCk, addressesOut, taskDocs, dense)
  }
}
