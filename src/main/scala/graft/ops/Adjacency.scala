package graft.ops

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{Geom, Pt}
import graft.layers.Building

/** Shared-segment adjacency + connected components + polygon union —
  * the reference's get_adjacents_and_geometries / merge_groups /
  * merge_geometries pipeline (catatom2osm/geo/layer/polygon.py:134-159,
  * 526-574; geo/tools.py:26-41), re-expressed as shuffles:
  *
  *  1. every ring edge is emitted under a canonical (undirected) segment key
  *     — the "shared-vertex shuffle" of SURVEY §2.5;
  *  2. segment keys with ≥2 owners become adjacency edges;
  *  3. components form by iterative min-label propagation (join + groupBy
  *     per round; rounds = component diameter, tiny for wall-sharing
  *     buildings, and each round is a plain shuffle — scales to any count);
  *  4. union per component = interior-edge cancellation (adjacent CCW rings
  *     traverse a shared wall in opposite directions → the pair cancels)
  *     followed by per-component boundary chaining.
  */
object Adjacency {

  /** Directed edges of every building ring: (bid, ax, ay, bx, by). */
  def directedEdges(bs: Dataset[Building]): DataFrame = {
    val spark = bs.sparkSession
    import spark.implicits._
    bs.flatMap { b =>
      val n = b.ring.length
      (0 until n).map { i =>
        val a = b.ring(i); val c = b.ring((i + 1) % n)
        (b.bid, a.x, a.y, c.x, c.y)
      }
    }.toDF("bid", "ax", "ay", "bx", "by")
  }

  /** Canonical segment key columns (order-independent endpoint sort).
    * The key is xxhash64 of the canonical endpoint order — an 8-byte
    * shuffle key instead of a ~40-byte string; a 64-bit collision within
    * one municipality's edge set is ~impossible and the oracle-gated
    * queries guard the output. */
  private def withSegKey(edges: DataFrame): DataFrame =
    edges.withColumn("seg",
      when(struct(col("ax"), col("ay")) < struct(col("bx"), col("by")),
        xxhash64(col("ax"), col("ay"), col("bx"), col("by")))
        .otherwise(xxhash64(col("bx"), col("by"), col("ax"), col("ay"))))

  /** Adjacency pairs: buildings sharing a full segment
    * (is_shared_segment, polygon.py:86-97). */
  def adjacentPairs(bs: Dataset[Building]): DataFrame = {
    val e = withSegKey(directedEdges(bs)).select("seg", "bid")
    e.as("l").join(e.as("r"),
        col("l.seg") === col("r.seg") && col("l.bid") < col("r.bid"))
      .select(col("l.bid").as("a"), col("r.bid").as("b"))
      .distinct()
  }

  /** Connected components by min-label propagation. Returns (bid, comp)
    * where comp = min bid of the component. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame =
    connectedComponentsWithRounds(vertices, edges, maxIter)._1

  /** Eager localCheckpoint + STATS reset. `Dataset.localCheckpoint`
    * truncates lineage but PRESERVES the child plan's sizeInBytes
    * estimate, and the propagation loop's join estimates multiply the
    * label plan's stats ~4× per round — a double-exponential BigInteger
    * that overflows Catalyst's stats visitor near round 14 (hit at
    * 2M-point DBSCAN scale, where the giant component needs that many
    * pointer-jump rounds). Rebuilding the frame from the checkpointed RDD
    * resets to the conservative default estimate each round (runtime join
    * strategy stays AQE-decided, so no planning quality is lost). */
  private def ckFresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Min-label propagation with POINTER JUMPING: each round does one
    * neighbor-min hop (c1 = min(comp, neighbors' comp)) and then one path
    * shortcut (comp' = c1's own c1). The shortcut more than doubles the
    * label's reach per round — on a path graph the distance-to-minimum
    * after round k is 2^(k+1) − 2 — so rounds drop from O(diameter) to
    * O(log diameter), the property the spec pins. Returns (labels, rounds
    * incl. the final no-change detection round). */
  def connectedComponentsWithRounds(
      vertices: DataFrame, edges: DataFrame, maxIter: Int = 30): (DataFrame, Int) = {
    val spark = vertices.sparkSession
    import spark.implicits._
    // localCheckpoint (eager) per round truncates the lineage — without it
    // every convergence check replays all previous rounds, turning an
    // O(log d) loop into O(log² d) plan growth
    var labels = ckFresh(vertices.select(col("bid"), col("bid").as("comp")))
    val sym = ckFresh(edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b"))))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("bid"))
        .groupBy(sym("a").as("bid")).agg(min("comp").as("nbr_comp"))
      val hop = labels.join(nbrMin, Seq("bid"), "left")
        .select(col("bid"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("c1"))
      // pointer jump: comp = c1(c1(bid)). Labels are always vertex ids of
      // the same component (hop adopts a neighbor's label, the jump adopts
      // that vertex's label), so the shortcut never crosses components.
      // The hop subplan feeds both sides of this self-join; its aggregate
      // exchange is reused (ReusedExchange), not recomputed.
      val jump = hop.select(col("bid").as("jbid"), col("c1").as("jc"))
      // the convergence signal rides the checkpoint's own materialization
      // job as an accumulator side effect — no separate probe action per
      // round. Task retries can only inflate a NONZERO count, never turn a
      // converged (zero) round nonzero, so the zero-test stays exact.
      val changedAcc = spark.sparkContext.longAccumulator(s"cc_changed_$it")
      // ckFresh's inner localCheckpoint is the eager materialization the
      // accumulator rides; the stats reset happens after it
      val next = ckFresh(hop.join(jump, hop("c1") === jump("jbid"), "left")
        .select(col("bid"), col("old"),
          least(col("c1"), coalesce(col("jc"), col("c1"))).as("comp"))
        .as[(Long, Long, Long)]
        .map { r => if (r._2 != r._3) changedAcc.add(1L); (r._1, r._3) }
        .toDF("bid", "comp"))
      labels = next
      converged = changedAcc.value == 0L
      it += 1
    }
    (labels, it)
  }

  def components(bs: Dataset[Building]): DataFrame = {
    import bs.sparkSession.implicits._
    connectedComponents(
      bs.map(b => b.bid).toDF("bid"),
      adjacentPairs(bs))
  }

  /** Chain a set of boundary directed edges into closed ring(s). */
  def assembleRings(edges: Seq[(Pt, Pt)]): Seq[Array[Pt]] = {
    val next = mutable.Map[Pt, Pt]()
    edges.foreach { case (a, b) => next(a) = b }
    val visited = mutable.Set[Pt]()
    val rings = mutable.ArrayBuffer[Array[Pt]]()
    // deterministic chain starts (min vertex first) so ring vertex order is
    // reproducible at any parallelism — SURVEY §7.4 order-sensitivity rule
    for (start <- next.keys.toSeq.sortBy(p => (p.x, p.y)) if !visited(start)) {
      val ring = mutable.ArrayBuffer[Pt]()
      var cur = start
      var guard = 0
      while (!visited(cur) && guard <= edges.size) {
        visited += cur
        ring += cur
        cur = next(cur)
        guard += 1
      }
      if (ring.size >= 3) rings += ring.toArray
    }
    rings.toSeq
  }

  /** Union geometries per component: interior-edge cancellation + chaining
    * + collinear-vertex simplification. Returns
    * (comp, n_buildings, union_area, n_vertices). */
  def unionByComponent(bs: Dataset[Building]): DataFrame = {
    val spark = bs.sparkSession
    import spark.implicits._
    val comps = components(bs)
    val edges = directedEdges(bs).join(comps, "bid")
    // interior walls: the same undirected segment owned by 2 buildings of
    // one component -> drop both directions; boundary edges survive alone.
    // groupBy + filter(cnt=1), not count-over-window: same shuffle key but
    // map-side partial aggregation and no per-partition sort — first() is
    // well-defined because only single-row groups survive the filter
    val boundary = withSegKey(edges)
      .groupBy(col("comp"), col("seg"))
      .agg(count(lit(1)).as("cnt"),
        first(col("ax")).as("ax"), first(col("ay")).as("ay"),
        first(col("bx")).as("bx"), first(col("by")).as("by"))
      .filter(col("cnt") === 1)
      .select(col("comp"), col("ax"), col("ay"), col("bx"), col("by"))
    val nPer = comps.groupBy("comp").agg(count(lit(1)).as("n_buildings"))
    boundary
      .as[(Long, Double, Double, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (comp, it) =>
        val es = it.map(t => (Pt(t._2, t._3), Pt(t._4, t._5))).toSeq
        val rings = assembleRings(es)
          .map(r => graft.clean.PolygonClean.simplifyRing(r))
        val area = rings.map(Geom.ringArea).sum
        val nVerts = rings.map(_.length).sum
        (comp, area, nVerts.toLong)
      }
      .toDF("comp", "union_area", "n_vertices")
      .join(nPer, "comp")
      .select("comp", "n_buildings", "union_area", "n_vertices")
  }

  /** Greedy parts-count packing per zone (merge_by_parts_count semantics,
    * parcel.py:214-264): zones are independent (parallel); within a zone the
    * greedy walk is sequential in deterministic parcel_id order — exactly
    * the order-sensitivity contract of SURVEY §7.4. */
  def greedyPack(parcels: DataFrame, cap: Long = 20L): DataFrame = {
    val spark = parcels.sparkSession
    import spark.implicits._
    parcels.select(col("parcel_id").cast("long"), col("zone").cast("long"), col("parts").cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroups { (zone, it) =>
        val sorted = it.toSeq.sortBy(_._1)
        var tile = 0L
        var acc = 0L
        sorted.map { case (pid, _, parts) =>
          if (acc + parts > cap && acc > 0) { tile += 1; acc = 0L }
          acc += parts
          (pid, zone, tile)
        }
      }
      .toDF("parcel_id", "zone", "tile")
  }
}
