package graft.spatial

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed grid-bucketed DBSCAN over a point table — density clustering
  * of geotagged pages (the reference's zoning groups buildings by adjacency,
  * `cons.py` get_groups_by_adjacent_buildings; DBSCAN is the same
  * "component over a proximity graph" shape generalized from shared-segment
  * adjacency to an ε-ball, which is what clustering page geotags at corpus
  * scale needs).
  *
  * Plan shape, built for 10^12 points:
  *  - candidate pairs come from ONE equi-join on ε-grid cells: the probe
  *    side replicates each point into its 3×3 neighbor cells (a constant
  *    9× explode — literal offsets, stays in codegen), the build side keeps
  *    each point in its home cell, so every ordered pair within ε appears
  *    EXACTLY once (the neighbor's home cell is unique) — no distinct, and
  *    per-cell width is density-bounded, constant at fixed point density.
  *  - neighbor counts are one map-side-combined groupBy on the pair stream.
  *  - core flags never leave the executors; the ε-graph restricted to core
  *    points feeds the alternating-star components
  *    ([[graft.ops.Adjacency.connectedComponentsWithRounds]], O(log² n)
  *    rounds INDEPENDENT of graph diameter — an ε-percolation cluster is
  *    exactly the high-diameter snake that defeats label propagation), so
  *    cluster ids are min-core-id — deterministic at any parallelism.
  *  - border points take the MIN cluster among their core neighbors (the
  *    textbook algorithm is first-toucher-wins, i.e. scan-order-dependent;
  *    min is the deterministic refinement a reproducible pipeline needs).
  *
  * Output: (id, role core|border|noise, cluster; noise = -1).
  */
object Dbscan {

  /** @param points (id: long, x: double, y: double)
    * @param eps     ε neighborhood radius (euclidean)
    * @param minPts  core iff |N_ε(p)| >= minPts, the point itself included
    */
  def dbscan(points: DataFrame, eps: Double, minPts: Int): DataFrame = {
    val spark = points.sparkSession
    val eps2 = eps * eps
    val cx = floor(col("x") / lit(eps)).cast("long")
    val cy = floor(col("y") / lit(eps)).cast("long")
    val home = points.select(col("id").as("ib"), col("x").as("bx"),
      col("y").as("by"), cx.as("cx"), cy.as("cy"))
    // 3×3 replication as a literal-array explode (codegen-safe, same trick
    // as the SimHash combination blocks)
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    // window prune (r06): a probe row whose MINIMUM possible distance to
    // the target cell's rectangle already exceeds ε cannot produce a pair
    // — point-to-interval distance per axis is two subtractions, and for
    // corner cells it drops ~a third of probe rows before the join
    // (exactness: only provably-empty candidates are dropped)
    val probe = points
      .select(col("id").as("ia"), col("x").as("ax"), col("y").as("ay"),
        cx.as("pcx"), cy.as("pcy"), explode(offsets).as("o"))
      .select(col("ia"), col("ax"), col("ay"),
        (col("pcx") + col("o.dx")).as("cx"), (col("pcy") + col("o.dy")).as("cy"))
      .where {
        val dxm = greatest(lit(0.0), col("cx") * lit(eps) - col("ax"),
          col("ax") - (col("cx") + 1) * lit(eps))
        val dym = greatest(lit(0.0), col("cy") * lit(eps) - col("ay"),
          col("ay") - (col("cy") + 1) * lit(eps))
        dxm * dxm + dym * dym <= lit(eps2)
      }
    val dist2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    // ordered pairs (ia, ib), each exactly once; persisted — three
    // consumers (degree agg, core-core edges, border assignment)
    val pairs = graft.CacheBin.persist(
      probe.join(home, Seq("cx", "cy"))
        .where(col("ia") =!= col("ib") && dist2 <= lit(eps2))
        .select(col("ia"), col("ib")))
    val deg = pairs.groupBy(col("ia").as("id")).agg(count(lit(1)).as("nn"))
    val core = points.select(col("id"))
      .join(deg, Seq("id"), "left")
      .where(coalesce(col("nn"), lit(0L)) + lit(1L) >= lit(minPts.toLong))
      .select(col("id"))
    val coreB = graft.CacheBin.persist(core)
    // ε-graph restricted to core endpoints (each undirected edge appears in
    // both orders in `pairs`; components only need one, ia < ib)
    val coreEdges = pairs
      .where(col("ia") < col("ib"))
      .join(coreB.withColumnRenamed("id", "ia"), Seq("ia"), "left_semi")
      .join(coreB.withColumnRenamed("id", "ib"), Seq("ib"), "left_semi")
      .select(col("ia").as("a"), col("ib").as("b"))
    val labels = graft.ops.Adjacency.connectedComponents(
      coreB.select(col("id").as("bid")), coreEdges)
    val coreOut = labels.select(col("bid").as("id"), lit("core").as("role"),
      col("comp").as("cluster"))
    // border: non-core with >= 1 core neighbor → min core-neighbor label
    val borderOut = pairs
      .join(coreB.withColumnRenamed("id", "ia"), Seq("ia"), "left_anti")
      .join(labels.select(col("bid").as("ib"), col("comp")), Seq("ib"))
      .groupBy(col("ia").as("id"))
      .agg(min(col("comp")).as("cluster"))
      .select(col("id"), lit("border").as("role"), col("cluster"))
    val assigned = coreOut.unionByName(borderOut)
    val noise = points.select(col("id"))
      .join(assigned.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit("noise").as("role"), lit(-1L).as("cluster"))
    assigned.unionByName(noise)
  }

  /** EXACT dense-cell contraction DBSCAN (the Gan–Tao grid observation,
    * PODS'15): on a grid of side s = ε/1.5, any two same-cell points are
    * within s·√2 ≈ 0.94ε < ε of each other (strict, so no fp-boundary
    * hazard), hence a cell holding ≥ minPts points is ALL CORE with no
    * intra-cell distance checks, and the whole cell contracts to ONE
    * supernode (id = min point id in the cell — which is the cell's min
    * core id, preserving [[dbscan]]'s min-core-id labels exactly).
    *
    * What that buys at city-hotspot skew (the regime geotagged pages live
    * in): the O(d²)-per-cell intra-cell pair volume — the dominant term
    * when most points sit in dense cells — is never materialized; the
    * degree aggregation runs over SPARSE-probe pairs only; and the
    * component graph has one vertex per dense cell instead of
    * one per point, collapsing both the per-round shuffle volume and
    * (via the contracted graph's smaller diameter) the round count.
    *
    * Exactness: the candidate window is Chebyshev ≤ 2 in the s-grid
    * (25 literal offsets; ε = 1.5s so an axis gap > 2 cells means
    * distance > 2s = 1.33ε) — every ε-pair appears exactly once per
    * direction (the home cell is unique). Output is row-identical to
    * [[dbscan]]: same roles, same min-core-id clusters, same min-label
    * border rule (q_dbscan_dense is gated on the SAME oracle replay).
    */
  def dbscanDense(points: DataFrame, eps: Double, minPts: Int): DataFrame = {
    val eps2 = eps * eps
    val s = eps / 1.5
    val cellStats0 = points
      .groupBy(floor(col("x") / lit(s)).cast("long").as("cx"),
        floor(col("y") / lit(s)).cast("long").as("cy"))
      .agg(count(lit(1)).as("m"), min(col("id")).as("snid"))
      .select(col("cx"), col("cy"),
        (col("m") >= lit(minPts.toLong)).as("dense"), col("snid"))
    // density dispatch (r06, the AQE principle applied to the grid
    // constant): when NO cell reaches minPts, the contraction machinery
    // has zero supernodes to contract and every point takes the sparse
    // path over the FINER s-grid's 25-cell window — strictly more probe
    // volume than [[dbscan]]'s ε-grid 3×3 for an identical (spec- and
    // oracle-pinned) result. One cheap aggregate decides; hotspot-skewed
    // inputs (the regime this operator exists for — see ScaleDbscan)
    // keep the contraction path.
    val nDense = cellStats0.filter(col("dense"))
      .agg(count(lit(1))).head().getLong(0)
    if (nDense == 0L) return dbscan(points, eps, minPts)
    val tagged = graft.CacheBin.persist(points
      .select(col("id"), col("x"), col("y"),
        floor(col("x") / lit(s)).cast("long").as("cx"),
        floor(col("y") / lit(s)).cast("long").as("cy"))
      .join(cellStats0, Seq("cx", "cy")))
    val offsets = array((for (dx <- -2 to 2; dy <- -2 to 2)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val dist2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    // window prune (r06, same proof as dbscan's): drop probe rows whose
    // point-to-cell-rectangle distance exceeds ε — on the Chebyshev-2
    // 25-cell window roughly half the ring cells are provably out of
    // reach for any given point position
    def cellPrune(ax: org.apache.spark.sql.Column, ay: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = {
      val dxm = greatest(lit(0.0), col("cx") * lit(s) - ax, ax - (col("cx") + 1) * lit(s))
      val dym = greatest(lit(0.0), col("cy") * lit(s) - ay, ay - (col("cy") + 1) * lit(s))
      dxm * dxm + dym * dym <= lit(eps2)
    }
    val build = tagged.select(col("id").as("ib"), col("x").as("bx"),
      col("y").as("by"), col("cx"), col("cy"), col("dense").as("bdense"),
      col("snid").as("bsnid"))
    // A) sparse-probe pairs: the ONLY per-point pair stream — probe side
    // holds sparse-cell points alone, so hotspot mass never fans out
    val spairs = graft.CacheBin.persist(tagged.where(!col("dense"))
      .select(col("id").as("ia"), col("x").as("ax"), col("y").as("ay"),
        col("cx").as("hx"), col("cy").as("hy"), explode(offsets).as("o"))
      .select(col("ia"), col("ax"), col("ay"),
        (col("hx") + col("o.dx")).as("cx"), (col("hy") + col("o.dy")).as("cy"))
      .where(cellPrune(col("ax"), col("ay")))
      .join(build, Seq("cx", "cy"))
      .where(col("ia") =!= col("ib") && dist2 <= lit(eps2))
      .select(col("ia"), col("ib"), col("bdense"), col("bsnid")))
    val sparseCore = graft.CacheBin.persist(spairs
      .groupBy(col("ia")).agg(count(lit(1)).as("nn"))
      .where(col("nn") + lit(1L) >= lit(minPts.toLong))
      .select(col("ia").as("id")))
    // B) dense↔dense supernode witness edges: dense probe into the window,
    // intra-cell pairs excluded BY CONSTRUCTION (home != build cell),
    // collapsed to one edge per supernode pair before anything shuffles on
    val dd = tagged.where(col("dense"))
      .select(col("x").as("ax"), col("y").as("ay"), col("snid").as("asnid"),
        col("cx").as("hx"), col("cy").as("hy"), explode(offsets).as("o"))
      .where(col("o.dx") =!= 0L || col("o.dy") =!= 0L)
      .select(col("ax"), col("ay"), col("asnid"),
        (col("hx") + col("o.dx")).as("cx"), (col("hy") + col("o.dy")).as("cy"))
      .where(cellPrune(col("ax"), col("ay")))
      .join(build.where(col("bdense")), Seq("cx", "cy"))
      .where(col("asnid") < col("bsnid") && dist2 <= lit(eps2))
      .groupBy(col("asnid").as("a"), col("bsnid").as("b")).agg(count(lit(1)))
      .select(col("a"), col("b"))
    // sparse-core ↔ sparse-core / ↔ dense-supernode edges from stream A
    val sFrom = spairs.join(sparseCore.withColumnRenamed("id", "ia"),
      Seq("ia"), "left_semi")
    val ss = sFrom.where(!col("bdense") && col("ia") < col("ib"))
      .join(sparseCore.withColumnRenamed("id", "ib"), Seq("ib"), "left_semi")
      .select(col("ia").as("a"), col("ib").as("b"))
    val sd = sFrom.where(col("bdense"))
      .groupBy(col("ia").as("a"), col("bsnid").as("b")).agg(count(lit(1)))
      .select(col("a"), col("b"))
    val verts = tagged.where(col("dense"))
      .select(col("snid").as("bid")).distinct()
      .unionByName(sparseCore.select(col("id").as("bid")))
    val labels = graft.CacheBin.persist(graft.ops.Adjacency.connectedComponents(
      verts, dd.unionByName(ss).unionByName(sd)))
    // expand supernode labels back onto dense-cell points; sparse cores
    // carry their own vertex label
    val coreOut = tagged.where(col("dense"))
      .join(labels.select(col("bid").as("snid"), col("comp")), Seq("snid"))
      .select(col("id"), lit("core").as("role"), col("comp").as("cluster"))
      .unionByName(labels.join(
          sparseCore.withColumnRenamed("id", "bid"), Seq("bid"), "left_semi")
        .select(col("bid").as("id"), lit("core").as("role"),
          col("comp").as("cluster")))
    // border: sparse non-core with >= 1 core neighbor -> min neighbor label
    val borderOut = spairs
      .join(sparseCore.withColumnRenamed("id", "ia"), Seq("ia"), "left_anti")
      .select(col("ia"),
        when(col("bdense"), col("bsnid")).otherwise(col("ib")).as("bid"),
        col("bdense"))
      .join(labels.select(col("bid"), col("comp")), Seq("bid"))
      .groupBy(col("ia").as("id")).agg(min(col("comp")).as("cluster"))
      .select(col("id"), lit("border").as("role"), col("cluster"))
    val assigned = coreOut.unionByName(borderOut)
    val noise = tagged.select(col("id"))
      .join(assigned.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), lit("noise").as("role"), lit(-1L).as("cluster"))
    assigned.unionByName(noise)
  }
}
