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
  *    points feeds the pointer-jumping min-label components
  *    ([[graft.ops.Adjacency.connectedComponentsWithRounds]], O(log d)
  *    rounds), so cluster ids are min-core-id — deterministic at any
  *    parallelism.
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
    val probe = points
      .select(col("id").as("ia"), col("x").as("ax"), col("y").as("ay"),
        cx.as("pcx"), cy.as("pcy"), explode(offsets).as("o"))
      .select(col("ia"), col("ax"), col("ay"),
        (col("pcx") + col("o.dx")).as("cx"), (col("pcy") + col("o.dy")).as("cy"))
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
}
