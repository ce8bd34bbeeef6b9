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
