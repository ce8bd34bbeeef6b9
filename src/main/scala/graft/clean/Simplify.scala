package graft.clean

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.geom.{Geom, Pt}

/** Shared-boundary-safe simplification (reference PolygonLayer.simplify,
  * catatom2osm/geo/layer/polygon.py:462-524): a vertex is deleted only if it
  * is NOT a corner in ANY of the features that own it — the decision needs
  * every parent of a vertex, so it is a vertex-keyed shuffle:
  *
  *   1. explode (vertex → owning fid) pairs;
  *   2. join pairs back to ring geometry by fid and evaluate the corner
  *      context of the vertex IN THAT PARENT (angle/cathetus rule,
  *      geo/point.py:46-82);
  *   3. group by vertex: deletable iff no parent says corner;
  *   4. per feature, delete its deletable vertices (ascending index,
  *      validity-guarded) — deterministic at any parallelism, replacing the
  *      reference's dict-order interleaved mutation.
  */
object Simplify {

  def simplifyShared(fs: Dataset[Feature]): Dataset[Feature] = {
    val spark = fs.sparkSession
    import spark.implicits._
    val pairs = fs.flatMap { f =>
      f.ring.indices.map { i =>
        val ctx = Geom.cornerContext(f.ring, i)
        (f.ring(i).x, f.ring(i).y, f.fid, ctx.isCorner)
      }
    }.toDF("x", "y", "fid", "is_corner")
    // vertex deletable iff not a corner in ANY parent
    val deletable = pairs
      .groupBy("x", "y")
      .agg(max(when(col("is_corner"), 1).otherwise(0)).as("any_corner"))
      .filter(col("any_corner") === 0)
      .select(col("x"), col("y"))
    val delByFid = pairs.as("p")
      .join(deletable.as("d"), Seq("x", "y"))
      .select(col("fid"), col("x"), col("y"))
      .as[(Long, Double, Double)]
      .groupByKey(_._1)
      .mapGroups((fid, it) => (fid, it.map(t => Pt(t._2, t._3)).toSet.toSeq))
      .toDF("fid", "dels")
    fs.toDF().join(delByFid, Seq("fid"), "left")
      .as[(Long, Array[Pt], Option[Seq[Pt]])]
      .map { case (fid, ring, delsOpt) =>
        val dels = delsOpt.getOrElse(Seq.empty).toSet
        var cur = ring
        // ascending-index deletion with validity guard (reference checks
        // GEOS validity + degenerate-ring refusal per deletion)
        var i = 0
        while (i < cur.length) {
          if (dels.contains(cur(i)) && cur.length > 3) {
            val next = cur.zipWithIndex.filter(_._2 != i).map(_._1)
            if (!DeleteInvalid.selfIntersects(next)) {
              cur = next
            } else i += 1
          } else i += 1
        }
        Feature(fid, cur)
      }
  }
}
