package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.Dataset
import graft.geom.{Geom, Pt}
import graft.geom.Geom.MultiPolygon

/** Parcel-layer operators (reference ParcelLayer, geo/layer/parcel.py) —
  * the tiling side of the pipeline. Keyed work is Dataset joins; the
  * group-merging algorithms run per municipality partition (the reference's
  * whole world IS one municipality run, so a groupByKey(muncode) wraps these
  * at scale; here they execute inside one group).
  */
object ParcelOps {
  final case class Parcel(localId: String, zone: String, parts: Int,
      geometry: MultiPolygon)
  final case class ConsF(localId: String, ref: String, kind: String,
      levAbove: Int, levBelow: Int, geometry: MultiPolygon)

  def kindOf(localId: String): String =
    if (localId.contains("_part")) "part"
    else if (localId.contains("_PI.")) "pool"
    else "building"

  def refOf(localId: String): String = localId.split("_")(0).split("\\.").last

  /** get_zone (parcel.py:244-251): localId[0:5], or [6:9] when it equals
    * the municipality code. */
  def zoneOf(localId: String, munCode: String): String = {
    val z = localId.substring(0, 5)
    if (z == munCode) localId.substring(6, 9) else z
  }

  /** delete_void_parcels (parcel.py:44-54): keep parcels whose ref appears. */
  def deleteVoidParcels(parcels: Dataset[Parcel], cons: Dataset[ConsF]): Dataset[Parcel] = {
    val spark = parcels.sparkSession
    import spark.implicits._
    val refs = cons.map(_.ref).distinct().toDF("localId")
    parcels.join(refs, Seq("localId"), "left_semi").as[Parcel]
  }

  /** create_missing_parcels (parcel.py:56-80): for refs with no parcel,
    * union the OUTER RINGS of their features into a synthetic parcel.
    * Fully distributed: the "ref has no parcel" test is a left_anti join
    * (shuffle on ref), never a driver-side id set. */
  def createMissingParcels(parcels: Dataset[Parcel], cons: Dataset[ConsF]): Dataset[Parcel] = {
    val spark = parcels.sparkSession
    import spark.implicits._
    val parcelIds = parcels.select(org.apache.spark.sql.functions.col("localId").as("ref"))
    val added = cons
      .join(parcelIds, Seq("ref"), "left_anti").as[ConsF]
      .groupByKey(_.ref)
      .mapGroups { (ref, it) =>
        val outers = it.toSeq.sortBy(_.localId)
          .flatMap(_.geometry.toSeq.map(p => Array(p.head)))
        Parcel(ref, null, 0, unionOuterRings(outers))
      }
    parcels.union(added)
  }

  /** Union polygons via edge cancellation (valid for edge-snapped inputs,
    * which cadastre parts of one reference are); disjoint parts concatenate. */
  def unionOuterRings(polys: Seq[Array[Array[Pt]]]): MultiPolygon = {
    val counted = mutable.Map[(Pt, Pt), Int]().withDefaultValue(0)
    for (p <- polys; ring = p.head; i <- ring.indices) {
      val a = ring(i); val b = ring((i + 1) % ring.length)
      if (counted((b, a)) > 0) counted((b, a)) -= 1 else counted((a, b)) += 1
    }
    val boundary = counted.toSeq.filter(_._2 > 0)
      .flatMap { case (e, n) => Seq.fill(n)(e) }
    val rings = Adjacency.assembleRings(boundary)
    val (outers, holes) = rings.partition(r => math.abs(Geom.signedArea(r)) > 0 &&
      Geom.signedArea(r) > 0 == (Geom.signedArea(polys.head.head) > 0))
    outers.map { o =>
      (o +: holes.filter(h => Geom.pointInRing(h.head, o))).toArray
    }.toArray
  }

  /** difference(layer) (polygon.py:576-596), restricted BY DESIGN to
    * edge-snapped inputs (cadastre parts tile their parcel): subtracting
    * the `bs` polygons from `a` adds A's directed outer-ring edges plus each
    * B's edges REVERSED, cancels opposite pairs (the shared walls), and
    * re-chains the remainder. Chaining doubles as the validity check: if
    * any surviving edge fails to close into a ring the inputs were NOT
    * edge-snapped, and the operator throws instead of returning a
    * silently-wrong shape (general CSG is out of scope, SURVEY §2.5). */
  def differenceSnapped(a: MultiPolygon, bs: Seq[MultiPolygon]): MultiPolygon = {
    val counted = mutable.Map[(Pt, Pt), Int]().withDefaultValue(0)
    def addEdge(u: Pt, v: Pt): Unit =
      if (counted((v, u)) > 0) counted((v, u)) -= 1 else counted((u, v)) += 1
    for (poly <- a; ring = poly.head; i <- ring.indices)
      addEdge(ring(i), ring((i + 1) % ring.length))
    for (b <- bs; poly <- b; ring = poly.head; i <- ring.indices)
      addEdge(ring((i + 1) % ring.length), ring(i)) // reversed: subtraction
    val boundary = counted.toSeq.filter(_._2 > 0)
      .flatMap { case (e, n) => Seq.fill(n)(e) }
    val rings = Adjacency.assembleRings(boundary)
    val chained = rings.map(_.length).sum
    require(chained == boundary.length,
      s"difference: inputs are not edge-snapped (${boundary.length - chained} " +
        "boundary edges could not be chained into closed rings)")
    if (rings.isEmpty) Array.empty
    else {
      val aOrient = Geom.signedArea(a.head.head) > 0
      val (outers, holes) = rings.partition(r => Geom.signedArea(r) > 0 == aOrient)
      // second snap check: a surviving subtracted boundary must be a hole
      // ENTIRELY inside (or on) one outer — a ring with vertices outside
      // means B crossed A's boundary without sharing its edges
      def inOrOn(v: Pt, o: Array[Pt]): Boolean =
        Geom.pointInRing(v, o) || Geom.closestSegment(v, Array(Array(o)))._1 < 1e-18
      val assigned = holes.map { h =>
        val owner = outers.find(o => h.forall(v => inOrOn(v, o)))
        require(owner.nonEmpty,
          "difference: inputs are not edge-snapped (a subtracted boundary " +
            "crosses the subject boundary instead of sharing its edges)")
        (owner.get, h)
      }
      outers.map { o =>
        (o +: assigned.collect { case (own, h) if own eq o => h }).toArray
      }.toArray
    }
  }

  /** PolygonLayer.difference (polygon.py:576-596), the general CONVEX-
    * subtrahend case: every feature loses the union of the intersecting
    * subtrahend rings via exact halfplane decomposition
    * (Geom.differenceConvex) — sequential subtraction equals union
    * subtraction. Subtrahends broadcast (the reference's layer side is one
    * municipality's pools/parts); the feature side never shuffles. Each
    * input polygon's outer ring becomes 0..n disjoint pieces; existing
    * holes reattach to the piece containing their first vertex. */
  def differenceLayer(
      features: Dataset[(Long, MultiPolygon)],
      subtrahends: Seq[Array[Pt]]): Dataset[(Long, MultiPolygon)] = {
    val spark = features.sparkSession
    import spark.implicits._
    val bSub = spark.sparkContext.broadcast(subtrahends)
    features.map { case (fid, mp) =>
      val out = mp.flatMap { poly =>
        val pieces = Geom.differenceConvex(poly.head, bSub.value)
        pieces.map { piece =>
          val holes = poly.tail.filter(h => Geom.pointInRing(h.head, piece))
          (piece +: holes.toSeq).toArray
        }
      }
      (fid, out)
    }
  }

  /** count_parts (parcel.py:232-242): features per ref, written to parcels.
    * Distributed: map-side partial count on ref, then an equi-join back onto
    * parcels (same key → AQE can co-locate; no driver map). */
  def countParts(parcels: Dataset[Parcel], cons: Dataset[ConsF]): Dataset[Parcel] = {
    val spark = parcels.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, coalesce}
    val counts = cons.groupBy(col("ref").as("localId"))
      .agg(count(lit(1)).cast("int").as("__n_parts"))
    parcels.join(counts, Seq("localId"), "left")
      .withColumn("parts", coalesce(col("__n_parts"), lit(0)))
      .drop("__n_parts")
      .as[Parcel]
  }

  /** merge_groups (geo/tools.py:26-41): transitive merge of overlapping
    * sets = connected components over shared membership. */
  def mergeGroups[T](adjs: Seq[Set[T]]): Seq[Set[T]] = {
    val remaining = mutable.ArrayBuffer(adjs: _*)
    val out = mutable.ArrayBuffer[Set[T]]()
    while (remaining.nonEmpty) {
      var group = remaining.remove(remaining.length - 1)
      var changed = true
      while (changed) {
        changed = false
        val (hit, miss) = remaining.partition(s => s.exists(group.contains))
        if (hit.nonEmpty) {
          group = hit.foldLeft(group)(_ ++ _)
          remaining.clear(); remaining ++= miss
          changed = true
        }
      }
      out += group
    }
    out.toSeq
  }

  final case class MergeResult(parcels: Seq[Parcel], tasks: Map[String, String])

  /** get_groups_by_parts_count (parcel.py:214-264): greedy distance packing
    * — iterate parcels in layer order; each unvisited seed collects, from
    * its zone's parcels within `buffer` of its centroid sorted by distance,
    * as many unvisited parcels as fit under maxParts. Sequential within a
    * zone by construction (SURVEY §7.4 order-sensitivity contract). */
  def groupsByPartsCount(
      parcels: Seq[Parcel], maxParts: Int, buffer: Double, munCode: String): Seq[Seq[String]] = {
    val cent = parcels.map(p => p.localId -> Geom.centroid(p.geometry)).toMap
    def zone(p: Parcel) = if (p.zone != null) p.zone else zoneOf(p.localId, munCode)
    val zoning = parcels.groupBy(zone).view.mapValues(_.map(_.localId)).toMap
    val partsOf = parcels.map(p => p.localId -> p.parts).toMap
    val visited = mutable.Set[String]()
    val groups = mutable.ArrayBuffer[Seq[String]]()
    for (pa <- parcels if !visited(pa.localId)) {
      val pc = partsOf(pa.localId)
      val c = cent(pa.localId)
      def dist(lid: String) = c.dist(cent(lid))
      val candidates = zoning(zone(pa))
        .filter(lid => partsOf(lid) <= maxParts - pc && dist(lid) < buffer)
        .sortBy(dist)
      val group = mutable.ArrayBuffer[String]()
      var pcsum = 0
      for (lid <- candidates) {
        val k = partsOf(lid)
        if (pcsum + k <= maxParts && !visited(lid)) {
          visited += lid
          group += lid
          pcsum += k
        }
      }
      if (group.nonEmpty) groups += group.toSeq
    }
    groups.toSeq
  }

  /** merge_by_parts_count (parcel.py:266-273): union each group into its
    * SEED parcel (merge_geometries sort=None keeps group order), parts
    * summed, task relabel map (self-maps for singletons). */
  def mergeByPartsCount(
      parcels: Seq[Parcel], maxParts: Int, buffer: Double, munCode: String): MergeResult = {
    val byId = parcels.map(p => p.localId -> p).toMap
    val groups = groupsByPartsCount(parcels, maxParts, buffer, munCode)
    val tasks = mutable.Map[String, String]()
    val deleted = mutable.Set[String]()
    val updated = mutable.Map[String, Parcel]()
    for (g <- groups) {
      val target = g.head
      val pcSum = g.map(r => byId(r).parts).sum
      if (g.length > 1) {
        val geomUnion = unionOuterRings(
          g.flatMap(r => byId(r).geometry.toSeq.map(p => Array(p.head))))
        updated(target) = byId(target).copy(parts = pcSum, geometry = geomUnion)
        g.tail.foreach(deleted += _)
      } else updated(target) = byId(target).copy(parts = pcSum)
      g.foreach(r => tasks(r) = target)
    }
    MergeResult(
      parcels.filterNot(p => deleted(p.localId)).map(p => updated.getOrElse(p.localId, p)),
      tasks.toMap)
  }

  /** get_groups_by_adjacent_buildings (parcel.py:130-162): buildings (and
    * pools — anything without 'part' in the id) sharing at least one VERTEX
    * form parcel-ref groups, keyed by zone combination; cross-zone keys and
    * every zone they touch merge transitively; remaining zones keep their
    * groups (merged within the zone when more than one). Singleton groups
    * are kept, exactly like the reference. */
  def groupsByAdjacentBuildings(
      parcels: Seq[Parcel], cons: Seq[ConsF], munCode: String): Seq[Set[String]] = {
    val bus = cons.filterNot(_.localId.contains("part"))
    val parents = mutable.Map[Pt, mutable.Set[String]]()
    for (b <- bus; poly <- b.geometry; ring <- poly; v <- ring)
      parents.getOrElseUpdate(v, mutable.Set()) += b.localId
    val contactGroups = parents.values.filter(_.size > 1).map(_.toSet).toSeq
    val byId = parcels.map(p => p.localId -> p).toMap
    def zoneOfParcel(p: Parcel) =
      if (p.zone != null) p.zone else zoneOf(p.localId, munCode)
    val adjs = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Set[String]]]()
    for (g <- contactGroups.sortBy(_.toSeq.min)) {
      val prefs = g.map(refOf).filter(byId.contains)
      if (prefs.nonEmpty) {
        val k = prefs.map(r => zoneOfParcel(byId(r))).toSeq.distinct.sorted.mkString("-")
        adjs.getOrElseUpdate(k, mutable.ArrayBuffer()) += prefs
      }
    }
    val mzKeys = adjs.keySet.filter(_.contains("-")).toSet
    val mzZones = mzKeys ++ mzKeys.flatMap(_.split("-"))
    val crossGroups = mergeGroups(mzZones.toSeq.sorted.flatMap(z => adjs.getOrElse(z, Seq.empty)))
    val sameZone = adjs.toSeq.filterNot(t => mzZones.contains(t._1))
      .flatMap { case (_, gs) => if (gs.length == 1) gs.toSeq else mergeGroups(gs.toSeq) }
    crossGroups ++ sameZone
  }

  // ------------------------------------------------------------------
  // Distributed drivers for the tiling merges.
  //
  // The reference's greedy merge algorithms are order-sensitive within one
  // municipality run (SURVEY §7.4), so the unit of distribution is the
  // municipality: groupByKey(mun) + cogroup runs the golden-exact kernels
  // per group, and groups parallelize across the cluster. Per-group work is
  // bounded by the domain (largest reference municipality ≈ 1.2e5
  // buildings), so no group exceeds one executor's memory at any scale.
  // `seq` carries layer order through the shuffle.
  // ------------------------------------------------------------------
  final case class MunParcel(mun: String, seq: Long, parcel: Parcel)
  final case class MunCons(mun: String, cons: ConsF)
  /** One output row of a distributed merge: either a surviving parcel (in
    * post-merge layer order) or a task-relabel edge taskFrom -> taskTo. */
  final case class MunMergeRow(mun: String, seq: Long, parcel: Parcel,
      taskFrom: String, taskTo: String)

  def distributedMerge(
      parcels: Dataset[MunParcel], cons: Dataset[MunCons],
      kernel: (Seq[Parcel], Seq[ConsF], String) => MergeResult): Dataset[MunMergeRow] = {
    val spark = parcels.sparkSession
    import spark.implicits._
    parcels.groupByKey(_.mun).cogroup(cons.groupByKey(_.mun)) { (mun, ps, cs) =>
      val ordered = ps.toSeq.sortBy(_.seq).map(_.parcel)
      val res = kernel(ordered, cs.map(_.cons).toSeq, mun)
      val parcelRows = res.parcels.iterator.zipWithIndex.map { case (p, i) =>
        MunMergeRow(mun, i.toLong, p, null, null)
      }
      val taskRows = res.tasks.toSeq.sorted.iterator.map { case (f, t) =>
        MunMergeRow(mun, -1L, null, f, t)
      }
      parcelRows ++ taskRows
    }
  }

  /** merge_by_adjacent_buildings, distributed per municipality. */
  def mergeByAdjacentBuildingsByMun(
      parcels: Dataset[MunParcel], cons: Dataset[MunCons]): Dataset[MunMergeRow] =
    distributedMerge(parcels, cons, (ps, cs, mun) => mergeByAdjacentBuildings(ps, cs, mun))

  /** merge_by_parts_count, distributed per municipality. */
  def mergeByPartsCountByMun(
      parcels: Dataset[MunParcel], maxParts: Int, buffer: Double): Dataset[MunMergeRow] = {
    val spark = parcels.sparkSession
    import spark.implicits._
    val noCons = spark.emptyDataset[MunCons]
    distributedMerge(parcels, noCons,
      (ps, _, mun) => mergeByPartsCount(ps, maxParts, buffer, mun))
  }

  /** merge_by_adjacent_buildings (parcel.py:179-230): each group unions
    * into its largest-area parcel (merge_geometries sort=area desc,
    * split=False), parts counts summed (update_parts_count), task relabel
    * map emitted (self-map for singletons, like the reference). */
  def mergeByAdjacentBuildings(
      parcels: Seq[Parcel], cons: Seq[ConsF], munCode: String): MergeResult = {
    val byId = parcels.map(p => p.localId -> p).toMap
    val groups = groupsByAdjacentBuildings(parcels, cons, munCode)
    val tasks = mutable.Map[String, String]()
    val deleted = mutable.Set[String]()
    val updated = mutable.Map[String, Parcel]()
    for (g <- groups) {
      val sorted = g.toSeq.sortBy(r => (-Geom.area(byId(r).geometry), r))
      val target = sorted.head
      val pcSum = sorted.map(r => byId(r).parts).sum
      if (sorted.length > 1) {
        val geomUnion = unionOuterRings(
          sorted.flatMap(r => byId(r).geometry.toSeq.map(p => Array(p.head))))
        updated(target) = byId(target).copy(parts = pcSum, geometry = geomUnion)
        sorted.tail.foreach(deleted += _)
      } else {
        updated(target) = byId(target).copy(parts = pcSum)
      }
      sorted.foreach(r => tasks(r) = target)
    }
    val out = parcels.filterNot(p => deleted(p.localId))
      .map(p => updated.getOrElse(p.localId, p))
    MergeResult(out, tasks.toMap)
  }
}
