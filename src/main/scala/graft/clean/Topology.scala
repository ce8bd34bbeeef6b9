package graft.clean

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.geom.{Geom, Pt}
import graft.spatial.CellGrid

/** A polygon feature for cross-feature topology (outer ring only — the
  * reference snaps outer vertices, polygon.py:167-169). */
final case class Feature(fid: Long, ring: Array[Pt])

/** Cross-feature topology repair — the reference's topology(dup_thr) stage
  * (catatom2osm/geo/layer/polygon.py:161-272) re-expressed as cell-keyed
  * shuffles:
  *
  *  - snapVertices: vertices of DIFFERENT features closer than dupThr merge
  *    onto one representative — the vertex with the smallest (fid, vidx) in
  *    the neighborhood (deterministic at any parallelism; the reference's
  *    sequential iteration order is replaced by this total order per
  *    SURVEY §7.4). Candidates come from a 3×3 halo cell join so pairs
  *    crossing cell borders are never missed.
  *
  *  - addTopologicalPoints: a vertex lying within distThr of another
  *    feature's SEGMENT (but not near its endpoints) is inserted into that
  *    segment, so partially-shared walls become exactly shared segment
  *    chains — the precondition for adjacency detection and
  *    shared-boundary-safe simplification.
  */
object Topology {

  private def vertices(fs: Dataset[Feature]): DataFrame = {
    val spark = fs.sparkSession
    import spark.implicits._
    fs.flatMap(f => f.ring.zipWithIndex.map { case (p, i) => (f.fid, i, p.x, p.y) })
      .toDF("fid", "vidx", "x", "y")
  }

  /** Snap near-duplicate vertices across features onto a deterministic
    * representative. One-hop snapping: every vertex adopts the coordinates
    * of the minimal (fid, vidx) vertex within dupThr (clusters within the
    * threshold of their minimum collapse exactly; the reference's
    * sequential merge has the same effect on data that respects the
    * threshold contract). */
  def snapVertices(fs: Dataset[Feature], dupThr: Double = Geom.DupThr): Dataset[Feature] = {
    val spark = fs.sparkSession
    import spark.implicits._
    val grid = CellGrid(dupThr * 2, origin = -1e7, rowWidth = 1L << 31)
    val vs = vertices(fs)
    // probe side: each vertex emitted to its 3×3 neighborhood (halo)
    val probe = vs.as[(Long, Int, Double, Double)]
      .flatMap { case (fid, vidx, x, y) =>
        grid.neighborhood(x, y).map(c => (c, fid, vidx, x, y))
      }
      .toDF("cell", "fid", "vidx", "x", "y")
    // target side: vertices in their own cell
    val target = vs.as[(Long, Int, Double, Double)]
      .map { case (fid, vidx, x, y) => (grid.cellOf(x, y), fid, vidx, x, y) }
      .toDF("cell", "tfid", "tvidx", "tx", "ty")
    val thr2 = dupThr * dupThr
    val reps = probe.join(target, "cell")
      .where(
        (col("x") - col("tx")) * (col("x") - col("tx")) +
          (col("y") - col("ty")) * (col("y") - col("ty")) <= thr2)
      .groupBy(col("fid"), col("vidx"))
      .agg(min(struct(col("tfid"), col("tvidx"), col("tx"), col("ty"))).as("rep"))
      .select(col("fid"), col("vidx"),
        col("rep.tx").as("nx"), col("rep.ty").as("ny"))
    rebuild(fs, reps)
  }

  private def rebuild(fs: Dataset[Feature], newCoords: DataFrame): Dataset[Feature] = {
    val spark = fs.sparkSession
    import spark.implicits._
    vertices(fs).join(newCoords, Seq("fid", "vidx"), "left")
      .select(col("fid"), col("vidx"),
        coalesce(col("nx"), col("x")).as("x"),
        coalesce(col("ny"), col("y")).as("y"))
      .as[(Long, Int, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (fid, it) =>
        val ring = it.toArray.sortBy(_._2).map(t => Pt(t._3, t._4))
        Feature(fid, Geom.dedupeRing(ring))
      }
  }

  /** Insert foreign vertices lying on (within distThr of) a feature's
    * segments. Insertions per segment are ordered by the projection
    * parameter t — deterministic ring output. */
  def addTopologicalPoints(
      fs: Dataset[Feature], distThr: Double = Geom.DistThr): Dataset[Feature] = {
    val spark = fs.sparkSession
    import spark.implicits._
    val grid = CellGrid(math.max(distThr * 2, 16.0), origin = -1e7, rowWidth = 1L << 31)
    val segs = fs.flatMap { f =>
      val n = f.ring.length
      (0 until n).flatMap { i =>
        val a = f.ring(i); val b = f.ring((i + 1) % n)
        val bb = Geom.BBox(math.min(a.x, b.x), math.min(a.y, b.y),
          math.max(a.x, b.x), math.max(a.y, b.y)).grow(distThr)
        grid.cover(bb).map(c => (c, f.fid, i, a.x, a.y, b.x, b.y))
      }
    }.toDF("cell", "sfid", "sidx", "ax", "ay", "bx", "by")
    val vs = vertices(fs).as[(Long, Int, Double, Double)]
      .map { case (fid, vidx, x, y) => (grid.cellOf(x, y), fid, x, y) }
      .toDF("cell", "vfid", "x", "y")
    val inserts = segs.join(vs, "cell")
      .where(col("sfid") =!= col("vfid"))
      .as[(Long, Long, Int, Double, Double, Double, Double, Long, Double, Double)]
      .flatMap { case (_, sfid, sidx, ax, ay, bx, by, _, x, y) =>
        val a = Pt(ax, ay); val b = Pt(bx, by); val p = Pt(x, y)
        val (d2, proj) = Geom.sqrDistToSegment(p, a, b)
        val len2 = a.sqrDist(b)
        val t = if (len2 <= 0) 0.0
          else ((p.x - a.x) * (b.x - a.x) + (p.y - a.y) * (b.y - a.y)) / len2
        val nearEndpoint = proj.sqrDist(a) < 1e-18 || proj.sqrDist(b) < 1e-18
        // reference angle gate (polygon.py:243-245): the vertex must sit on
        // the near-straight line of the segment: |180 - angle(p: a..b)| <= 2°
        val angle = math.abs(p.azimuth(b) - p.azimuth(a))
        val nearStraight = math.abs(180.0 - angle) <= Geom.StraightThr
        if (d2 < distThr * distThr && t > 1e-9 && t < 1 - 1e-9 &&
            !nearEndpoint && nearStraight)
          // the inserted point is the foreign vertex itself (reference
          // addTopologicalPoints semantics: share the exact vertex)
          Some((sfid, sidx, t, x, y))
        else None
      }
      .toDF("fid", "sidx", "t", "ix", "iy")
      .distinct()
    val insertsByFid = inserts
      .groupBy("fid")
      .agg(collect_list(struct(col("sidx").as("_1"), col("t").as("_2"),
        col("ix").as("_3"), col("iy").as("_4"))).as("ins"))
    fs.toDF().join(insertsByFid, fs("fid") === insertsByFid("fid"), "left")
      .select(fs("fid"), col("ring"), col("ins"))
      .as[(Long, Array[Pt], Option[Array[(Int, Double, Double, Double)]])]
      .map { case (fid, ring, insOpt) =>
        val byseg = insOpt.getOrElse(Array.empty)
          .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => Pt(t._3, t._4)).toSeq).toMap
        val out = ring.indices.flatMap { i =>
          ring(i) +: byseg.getOrElse(i, Seq.empty)
        }
        Feature(fid, Geom.dedupeRing(out.toArray))
      }
  }

  /** Full cross-feature topology pass: snap then insert. */
  def repair(fs: Dataset[Feature],
      dupThr: Double = Geom.DupThr, distThr: Double = Geom.DistThr): Dataset[Feature] =
    addTopologicalPoints(snapVertices(fs, dupThr), distThr)
}
