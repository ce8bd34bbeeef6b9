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
  * The cogroup key is the refcat; the shared-wall set is the canonical
  * building-segment shuffle (broadcast — a key join at planet scale).
  */
object MoveAddress {
  final case class ConsFeature(localId: String, ref: String, isBuilding: Boolean,
      geometry: Array[Array[Array[Pt]]])
  final case class Addr(localId: String, ref: String, spec: String, x: Double, y: Double)

  /** moveAddressFull + the building-side mutation: moved entrance points are
    * inserted as vertices into the nearest building ring (reference
    * move_entrance's insertVertex), so a SECOND pass sees them as corners —
    * reproducing the reference's documented two-pass behavior. */
  def moveAddressWithInsert(
      addresses: Dataset[Addr], cons: Dataset[ConsFeature]): (DataFrame, Dataset[ConsFeature]) = {
    val spark = cons.sparkSession
    import spark.implicits._
    val out = moveAddressFull(addresses, cons)
    val moved: Map[String, Seq[Pt]] = out
      .as[(String, String, String, Double, Double)].collect()
      .filter(_._3 == "Entrance").map(t => (t._2, Pt(t._4, t._5)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val bMoved = spark.sparkContext.broadcast(moved)
    val consOut = cons.map { c =>
      val pts = if (c.isBuilding) bMoved.value.getOrElse(c.ref, Seq.empty)
        else Seq.empty[Pt]
      if (pts.isEmpty) c
      else {
        val newGeom = c.geometry.map(_.map { ring =>
          val outRing = scala.collection.mutable.ArrayBuffer[Pt]()
          val n = ring.length
          for (i <- 0 until n) {
            val a = ring(i); val b = ring((i + 1) % n)
            outRing += a
            val len2 = a.sqrDist(b)
            val onSeg = pts.filter { q =>
              val (d2, _) = Geom.sqrDistToSegment(q, a, b)
              d2 < 1e-12 && q != a && q != b
            }
            outRing ++= onSeg.sortBy(q => a.sqrDist(q) / math.max(len2, 1e-30))
          }
          outRing.toArray
        })
        c.copy(geometry = newGeom)
      }
    }
    (out, consOut)
  }

  def moveAddressFull(
      addresses: Dataset[Addr], cons: Dataset[ConsFeature]): DataFrame = {
    val spark = cons.sparkSession
    import spark.implicits._
    val buildings = cons.filter(_.isBuilding)
    // canonical segments of building outer+inner rings owned by >=2 buildings
    val sharedSegs: Set[(Pt, Pt)] = buildings
      .flatMap { b =>
        for (poly <- b.geometry.toSeq; ring <- poly.toSeq; i <- ring.indices) yield {
          val a = ring(i); val c = ring((i + 1) % ring.length)
          val key = if (a.x < c.x || (a.x == c.x && a.y <= c.y)) (a, c) else (c, a)
          (key, b.localId)
        }
      }
      .toDF("seg", "lid").distinct()
      .groupBy("seg").count().filter(col("count") > 1)
      .select(col("seg._1"), col("seg._2")).as[(Pt, Pt)].collect().toSet
    val bShared = spark.sparkContext.broadcast(sharedSegs)

    val byRef = buildings.map(b => (b.ref, b)).toDF("ref", "b")
    addresses.toDF().as("a")
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
        else {
          var spec = spec0
          var x = px; var y = py
          if (spec == "Entrance") {
            val scored = bs.map { b =>
              val (d2, proj, pi, ri, si) = Geom.closestSegment(p, b.geometry)
              (d2, proj, pi, ri, si, b)
            }
            val (d2, proj, pi, ri, si, b) = scored.minBy(t => (t._1, t._6.localId))
            val ring = b.geometry(pi)(ri)
            val va = ring(si); val vb = ring((si + 1) % ring.length)
            val segKey = if (va.x < vb.x || (va.x == vb.x && va.y <= vb.y)) (va, vb) else (vb, va)
            if (d2 > Conjoin.AddrThr * Conjoin.AddrThr) spec = "remote"
            else if (pi > 0 || ri > 0) spec = "inner"
            else if (proj.sqrDist(va) < Conjoin.EntranceThr * Conjoin.EntranceThr ||
                     proj.sqrDist(vb) < Conjoin.EntranceThr * Conjoin.EntranceThr)
              spec = "corner"
            else if (bShared.value.contains(segKey)) spec = "shared"
            else { x = proj.x; y = proj.y } // moved, stays 'Entrance'
          }
          if (spec != "Entrance" && bs.length > 1) Seq.empty // deleted
          else Seq((lid, ref, spec, x, y))
        }
      }
      .toDF("localId", "ref", "spec", "x", "y")
  }
}
