package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.geom.{Geom, Pt}

/** Full move_address semantics over real multipolygon layers (reference
  * ConsLayer.move_address + move_entrance, cons.py:371-490):
  *
  *  - address with no building for its refcat         -> deleted
  *  - spec 'Entrance': classified against the nearest building segment
  *      remote (> addr_thr) / inner (segment not on the first outer ring) /
  *      corner (within entrance_thr of an endpoint) / shared (wall shared
  *      by ≥2 buildings) — or MOVED onto the projection
  *  - after classification, a non-'Entrance' address with >1 building for
  *      its refcat                                     -> deleted
  *
  * Fully distributed: the refcat cogroup classifies each address and emits
  * its chosen wall segment; the shared-wall test is a left join of those
  * rows against the ≥2-owner canonical-segment table (shuffle on the
  * segment key, never a driver set); moved-vertex insertion is a cogroup
  * of the construction features with the moved points on the refcat key.
  */
object MoveAddress {
  /** kind ∈ building | part | pool (ConsF's field, carried explicitly —
    * never inferred from the id string). */
  final case class ConsFeature(localId: String, ref: String, kind: String,
      geometry: Array[Array[Array[Pt]]]) {
    def isBuilding: Boolean = kind == "building"
  }
  final case class Addr(localId: String, ref: String, spec: String, x: Double, y: Double)

  /** Classification row before the shared-wall join: `pending` rows carry
    * the projected target (mx,my) and the canonical chosen segment. */
  final case class Prov(localId: String, ref: String, spec: String,
      px: Double, py: Double, mx: Double, my: Double,
      segA: Pt, segB: Pt, nb: Int)

  private def canonicalSeg(a: Pt, b: Pt): (Pt, Pt) =
    if (a.x < b.x || (a.x == b.x && a.y <= b.y)) (a, b) else (b, a)

  /** Canonical building-ring segments owned by ≥2 buildings, as a joinable
    * four-double-key table (sax,say,sbx,sby). */
  private def sharedSegTable(buildings: Dataset[ConsFeature]): DataFrame = {
    val spark = buildings.sparkSession
    import spark.implicits._
    buildings
      .flatMap { b =>
        for (poly <- b.geometry.toSeq; ring <- poly.toSeq; i <- ring.indices) yield {
          val (a, c) = canonicalSeg(ring(i), ring((i + 1) % ring.length))
          (a.x, a.y, c.x, c.y, b.localId)
        }
      }
      .toDF("sax", "say", "sbx", "sby", "lid").distinct()
      .groupBy("sax", "say", "sbx", "sby").count().filter(col("count") > 1)
      .select(col("sax"), col("say"), col("sbx"), col("sby"), lit(true).as("isShared"))
  }

  /** Classification + shared-wall resolution, keeping the chosen segment so
    * the insert pass can split exactly that wall (building AND parts). */
  private[ops] def moveAddressResolved(
      addresses: Dataset[Addr], cons: Dataset[ConsFeature]): DataFrame = {
    val spark = cons.sparkSession
    import spark.implicits._
    val buildings = cons.filter(_.isBuilding)
    val shared = sharedSegTable(buildings)

    val byRef = buildings.map(b => (b.ref, b)).toDF("ref", "b")
    val prov = addresses.toDF().as("a")
      .join(byRef.as("r"), col("a.ref") === col("r.ref"), "left")
      .select(col("a.localId"), col("a.ref"), col("a.spec"), col("a.x"), col("a.y"), col("b"))
      .as[(String, String, String, Double, Double, Option[ConsFeature])]
      .groupByKey(_._1)
      .flatMapGroups { (lid, it) =>
        val rows = it.toSeq
        val (_, ref, spec0, px, py, _) = rows.head
        val bs = rows.flatMap(_._6).sortBy(_.localId)
        val p = Pt(px, py)
        if (bs.isEmpty) Seq.empty // deleted: no building
        else if (spec0 != "Entrance")
          Seq(Prov(lid, ref, spec0, px, py, px, py, null, null, bs.length))
        else {
          val scored = bs.map { b =>
            val (d2, proj, pi, ri, si) = Geom.closestSegment(p, b.geometry)
            (d2, proj, pi, ri, si, b)
          }
          val (d2, proj, pi, ri, si, b) = scored.minBy(t => (t._1, t._6.localId))
          val ring = b.geometry(pi)(ri)
          val va = ring(si); val vb = ring((si + 1) % ring.length)
          val (sa, sb) = canonicalSeg(va, vb)
          val spec =
            if (d2 > Conjoin.AddrThr * Conjoin.AddrThr) "remote"
            else if (pi > 0 || ri > 0) "inner"
            else if (proj.sqrDist(va) < Conjoin.EntranceThr * Conjoin.EntranceThr ||
                     proj.sqrDist(vb) < Conjoin.EntranceThr * Conjoin.EntranceThr) "corner"
            else "PENDING" // moved unless the wall turns out shared
          Seq(Prov(lid, ref, spec, px, py, proj.x, proj.y, sa, sb, bs.length))
        }
      }
      .toDF()

    prov
      .join(shared,
        prov("segA.x") === shared("sax") && prov("segA.y") === shared("say") &&
        prov("segB.x") === shared("sbx") && prov("segB.y") === shared("sby"), "left")
      .select(
        col("localId"), col("ref"),
        when(col("spec") =!= "PENDING", col("spec"))
          .when(col("isShared").isNotNull, lit("shared"))
          .otherwise(lit("Entrance")).as("spec"),
        when(col("spec") === "PENDING" && col("isShared").isNull, col("mx"))
          .otherwise(col("px")).as("x"),
        when(col("spec") === "PENDING" && col("isShared").isNull, col("my"))
          .otherwise(col("py")).as("y"),
        col("segA"), col("segB"), col("nb"))
      .filter(col("spec") === "Entrance" || col("nb") === 1)
  }

  def moveAddressFull(
      addresses: Dataset[Addr], cons: Dataset[ConsFeature]): DataFrame =
    moveAddressResolved(addresses, cons)
      .select("localId", "ref", "spec", "x", "y")

  /** moveAddressFull + the building-side mutation: moved entrance points are
    * inserted as vertices into every ring segment (building outline AND its
    * parts — cons.py move_entrance's part loop) whose canonical endpoints
    * equal the chosen wall, so a SECOND pass sees them as corners —
    * reproducing the reference's documented two-pass behavior. */
  def moveAddressWithInsert(
      addresses: Dataset[Addr], cons: Dataset[ConsFeature]): (DataFrame, Dataset[ConsFeature]) = {
    val spark = cons.sparkSession
    import spark.implicits._
    // persisted via CacheBin (two consumers: the address output and the
    // vertex-insert cogroup); the session driver drains after its action
    val resolved = graft.CacheBin.persist(moveAddressResolved(addresses, cons).toDF())
    val out = resolved.select("localId", "ref", "spec", "x", "y")
    val moved = resolved
      .filter(col("spec") === "Entrance" && col("segA").isNotNull)
      .select(col("ref"), col("x"), col("y"), col("segA"), col("segB"))
      .as[(String, Double, Double, Pt, Pt)]
    val consOut = cons.groupByKey(_.ref)
      .cogroup(moved.groupByKey(_._1)) { (_, cIt, mIt) =>
        val pts = mIt.map(t => (Pt(t._2, t._3), t._4, t._5)).toSeq
        if (pts.isEmpty) cIt
        else cIt.map { c =>
          if (!c.isBuilding && c.kind != "part") c
          else insertAtSegments(c, pts)
        }
      }
    (out, consOut)
  }

  /** Insert each moved point into ring segments whose canonical endpoints
    * match its chosen wall (multiple points on one wall sort by distance
    * from the segment start). */
  private def insertAtSegments(
      c: ConsFeature, pts: Seq[(Pt, Pt, Pt)]): ConsFeature = {
    var changed = false
    val newGeom = c.geometry.map(_.map { ring =>
      val outRing = scala.collection.mutable.ArrayBuffer[Pt]()
      val n = ring.length
      for (i <- 0 until n) {
        val a = ring(i); val b = ring((i + 1) % n)
        outRing += a
        val key = canonicalSeg(a, b)
        val onSeg = pts.collect {
          case (q, sa, sb) if (sa, sb) == key && q != a && q != b => q
        }
        if (onSeg.nonEmpty) {
          changed = true
          outRing ++= onSeg.distinct.sortBy(q => a.sqrDist(q))
        }
      }
      outRing.toArray
    })
    if (changed) c.copy(geometry = newGeom) else c
  }
}
