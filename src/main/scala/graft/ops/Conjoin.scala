package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.geom.{Geom, Pt}
import graft.layers.Building

/** Address→building conjoining: key-join the address to its building, then
  * snap the point onto the nearest building edge (the reference's
  * move_address / move_entrance nearest-segment probe,
  * catatom2osm/geo/layer/cons.py:371-490). The per-pair refinement uses the
  * generic closestSegment kernel; the join itself is a plain hash equi-join
  * on the parcel key, so the operator shuffles only on the key — the
  * cell-local kNN (SpatialJoin.nearestSiteJoin) covers the keyless variant.
  */
object Conjoin {
  // thresholds mirroring reference config.py:47,51
  val AddrThr = 10.0      // max distance to move an address to the outline
  val EntranceThr = 0.4   // min distance from an entrance to a corner

  final case class Entrance(ad_id: Long, ref: Long, spec: String, px: Double, py: Double)
  final case class EntranceOut(ad_id: Long, ref: Long, spec: String, x: Double, y: Double)

  /** Entrance snapping with classification (reference move_entrance,
    * cons.py:371-426): for each Entrance address, the nearest segment over
    * its ref's buildings decides:
    *  - 'remote'  : nearest point farther than AddrThr
    *  - 'inner'   : nearest segment on an inner ring
    *  - 'corner'  : projection within EntranceThr of a segment endpoint
    *  - 'shared'  : segment is a wall shared with ANOTHER building
    *  - otherwise : address moves onto the projection and the vertex is
    *                inserted into the building ring (and any part ring
    *                sharing that wall — handled by Topology.addTopologicalPoints
    *                downstream, which inserts the new vertex everywhere).
    * Shared walls are detected by the same canonical-segment shuffle as
    * Adjacency (broadcast here; a key join at cluster scale).
    * Returns (addresses out, building rings with inserted vertices).
    */
  final case class ProvE(ad_id: Long, ref: Long, spec: String,
      px: Double, py: Double, mx: Double, my: Double,
      sax: Double, say: Double, sbx: Double, sby: Double)

  def moveEntrances(
      addresses: Dataset[Entrance],
      buildings: Dataset[Building]): (DataFrame, Dataset[Building]) = {
    val spark = buildings.sparkSession
    import spark.implicits._
    // canonical segments owned by >=2 buildings — kept distributed as a
    // joinable key table, never a driver set
    val shared = buildings.flatMap { b =>
        val n = b.ring.length
        (0 until n).map { i =>
          val a = b.ring(i); val c = b.ring((i + 1) % n)
          val (s, e) = if (a.x < c.x || (a.x == c.x && a.y <= c.y)) (a, c) else (c, a)
          (s.x, s.y, e.x, e.y, b.bid)
        }
      }.toDF("kax", "kay", "kbx", "kby", "bid").distinct()
      .groupBy("kax", "kay", "kbx", "kby").count().filter(col("count") > 1)
      .select(col("kax"), col("kay"), col("kbx"), col("kby"), lit(true).as("isShared"))

    val bByRef = buildings.map(b => (b.cluster, b)).toDF("ref", "b")
    val prov = addresses.toDF()
      .join(bByRef, addresses("ref") === bByRef("ref"))
      .select(col("ad_id"), addresses("ref"), col("spec"), col("px"), col("py"), col("b"))
      .as[(Long, Long, String, Double, Double, Building)]
      .groupByKey(_._1)
      .mapGroups { (adId, it) =>
        val rows = it.toSeq.sortBy(_._6.bid)
        val (_, ref, spec, px, py, _) = rows.head
        val p = Pt(px, py)
        if (spec != "Entrance") {
          ProvE(adId, ref, spec, px, py, px, py, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
        } else {
          // nearest building by closest segment
          val scored = rows.map { r =>
            val b = r._6
            val (d2, proj, _, _, si) = Geom.closestSegment(p, Array(Array(b.ring)))
            (d2, proj, si, b)
          }
          val (d2, proj, si, b) = scored.minBy(t => (t._1, t._4.bid))
          val n = b.ring.length
          val va = b.ring(si); val vb = b.ring((si + 1) % n)
          val (sa, sb) =
            if (va.x < vb.x || (va.x == vb.x && va.y <= vb.y)) (va, vb) else (vb, va)
          if (d2 > AddrThr * AddrThr)
            ProvE(adId, ref, "remote", px, py, px, py,
              Double.NaN, Double.NaN, Double.NaN, Double.NaN)
          // ring model here is outer-only; 'inner' handled when rings carry
          // holes (closestSegment reports ringIdx > 0)
          else if (proj.sqrDist(va) < EntranceThr * EntranceThr ||
                   proj.sqrDist(vb) < EntranceThr * EntranceThr)
            ProvE(adId, ref, "corner", px, py, px, py,
              Double.NaN, Double.NaN, Double.NaN, Double.NaN)
          else // moved unless the wall turns out shared
            ProvE(adId, ref, "PENDING", px, py, proj.x, proj.y, sa.x, sa.y, sb.x, sb.y)
        }
      }.toDF()

    val resolved = prov
      .join(shared,
        prov("sax") === shared("kax") && prov("say") === shared("kay") &&
        prov("sbx") === shared("kbx") && prov("sby") === shared("kby"), "left")
      .select(
        col("ad_id"), col("ref"),
        when(col("spec") =!= "PENDING", col("spec"))
          .when(col("isShared").isNotNull, lit("shared"))
          .otherwise(lit("Entrance")).as("spec"),
        when(col("spec") === "PENDING" && col("isShared").isNull, col("mx"))
          .otherwise(col("px")).as("x"),
        when(col("spec") === "PENDING" && col("isShared").isNull, col("my"))
          .otherwise(col("py")).as("y"))
    // persisted via CacheBin (two consumers); the session driver drains
    val resolvedP = graft.CacheBin.persist(resolved)

    // insert moved entrance vertices into their building rings: cogroup the
    // buildings with the moved points on the cluster key (reference
    // move_entrance's insertVertex), no driver map
    val moved = resolvedP.filter(col("spec") === "Entrance")
      .select(col("ref"), col("x"), col("y")).as[(Long, Double, Double)]
    val buildingsOut = buildings.groupByKey(_.cluster)
      .cogroup(moved.groupByKey(_._1)) { (_, bIt, mIt) =>
        val pts = mIt.map(t => Pt(t._2, t._3)).toSeq
        if (pts.isEmpty) bIt
        else bIt.map { b =>
          val out = scala.collection.mutable.ArrayBuffer[Pt]()
          val n = b.ring.length
          for (i <- 0 until n) {
            val a = b.ring(i); val c = b.ring((i + 1) % n)
            out += a
            val onSeg = pts.filter { q =>
              val (d2, _) = Geom.sqrDistToSegment(q, a, c)
              d2 < 1e-18 && q != a && q != c
            }
            val len2 = a.sqrDist(c)
            out ++= onSeg.sortBy(q => a.sqrDist(q) / len2)
          }
          b.copy(ring = out.toArray)
        }
      }
    (resolvedP, buildingsOut)
  }

  /** (bid, px, py) addresses × buildings → snapped projection + distance².
    * Output rounded to 6 decimals: the true projections are exact decimals,
    * rounding removes ulp noise from the parametric projection arithmetic. */
  def moveAddress(addresses: DataFrame, buildings: Dataset[Building]): DataFrame = {
    val spark = buildings.sparkSession
    import spark.implicits._
    val b = buildings.map(x => (x.bid, x.ring)).toDF("bid", "ring")
    addresses.join(b, "bid")
      .select(col("bid"), col("px"), col("py"), col("ring"))
      .as[(Long, Double, Double, Array[Pt])]
      .map { case (bid, px, py, ring) =>
        val (d2, proj, _, _, _) = Geom.closestSegment(Pt(px, py), Array(Array(ring)))
        def r6(v: Double) =
          BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (bid, r6(proj.x), r6(proj.y), r6(d2))
      }
      .toDF("bid", "proj_x", "proj_y", "d2")
  }
}
