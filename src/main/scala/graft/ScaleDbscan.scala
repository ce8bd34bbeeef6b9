package graft

import org.apache.spark.sql.functions._

/** N→4N scaling evidence for grid-bucketed DBSCAN: the same multi-million
  * point cloud (xxhash64-uniform in [0,1000)², pure column math — identical
  * bits at any parallelism) clustered at two core counts (strong scaling,
  * the brief's two-cluster-size criterion). Cross-level correctness
  * invariants: role census (core/border/noise counts) and a cluster-label
  * checksum must be IDENTICAL at both levels — a clustering that changes
  * under parallelism is broken, not slow. Density is set supercritical
  * (E[ε-neighbors] ≈ 3) so a giant component exists and the
  * alternating-star rounds do real per-round volume — the giant
  * ε-percolation component is exactly the high-diameter regime the
  * diameter-independent contraction exists for.
  *
  * SPARK_GRAFT_DBSCAN_MODE=compare instead races the baseline against the
  * dense-cell contraction ([[graft.spatial.Dbscan.dbscanDense]]) on BOTH a
  * uniform cloud and a city-hotspot-skewed cloud (80% of points in ~2000
  * tight hotspots — the regime the contraction exists for), requiring the
  * two variants' invariants to be identical at full scale.
  */
object ScaleDbscan {

  def pointsDf(spark: org.apache.spark.sql.SparkSession, n: Long, parts: Int) =
    spark.range(0L, n, 1L, parts).select(
      col("id"),
      (pmod(xxhash64(col("id")), lit(1000000L)) / 1000.0).as("x"),
      (pmod(xxhash64(col("id"), lit(1L)), lit(1000000L)) / 1000.0).as("y"))

  /** 80% of points in nHot tight (0.4-unit) hotspots, 20% uniform noise —
    * pure column math, bit-identical at any parallelism. */
  def hotspotDf(spark: org.apache.spark.sql.SparkSession, n: Long, parts: Int,
      nHot: Long = 2000L) = {
    val cid = pmod(xxhash64(col("id"), lit(2L)), lit(nHot))
    val hx = pmod(xxhash64(cid), lit(999000L)) / 1000.0
    val hy = pmod(xxhash64(cid, lit(1L)), lit(999000L)) / 1000.0
    val inHot = pmod(xxhash64(col("id"), lit(9L)), lit(10L)) < 8L
    spark.range(0L, n, 1L, parts).select(
      col("id"),
      when(inHot, hx + pmod(xxhash64(col("id"), lit(3L)), lit(400L)) / 1000.0)
        .otherwise(pmod(xxhash64(col("id"), lit(5L)), lit(1000000L)) / 1000.0)
        .as("x"),
      when(inHot, hy + pmod(xxhash64(col("id"), lit(4L)), lit(400L)) / 1000.0)
        .otherwise(pmod(xxhash64(col("id"), lit(6L)), lit(1000000L)) / 1000.0)
        .as("y"))
  }

  final case class Run(sec: Double, nCore: Long, nBorder: Long, nNoise: Long,
      checksum: Long)

  def timed(cores: Int, n: Long, eps: Double, minPts: Int,
      dense: Boolean = false, hotspot: Boolean = false): Run = {
    val spark = Scale.makeSession(cores)
    val t0 = System.nanoTime()
    val pts = if (hotspot) hotspotDf(spark, n, cores * 2)
      else pointsDf(spark, n, cores * 2)
    // dense=true means "measure the CONTRACTION plan" — force it so the
    // cost-model dispatch cannot route the sweep to the plain plan
    val out = if (dense)
      graft.spatial.Dbscan.dbscanDense(pts, eps, minPts, forceContraction = true)
    else graft.spatial.Dbscan.dbscan(pts, eps, minPts)
    val row = out.agg(
      sum(when(col("role") === "core", 1L).otherwise(0L)),
      sum(when(col("role") === "border", 1L).otherwise(0L)),
      sum(when(col("role") === "noise", 1L).otherwise(0L)),
      sum(pmod(col("cluster") * col("id"), lit(1000003L)))).head()
    val sec = (System.nanoTime() - t0) / 1e9
    CacheBin.drain()
    spark.stop()
    Run(sec, row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_DBSCAN_N", "2000000").toLong
    // default eps keeps E[ε-neighbors] ≈ 3 at the default n; pass both to
    // scale n at CONSTANT per-point density (eps ∝ 1/√n), the regime where
    // per-round volume, not round latency, dominates
    val eps = sys.env.getOrElse("SPARK_GRAFT_DBSCAN_EPS", "0.7").toDouble
    val minPts = 4
    if (sys.env.get("SPARK_GRAFT_DBSCAN_MODE").contains("compare")) {
      val cores = sys.env.getOrElse("SPARK_GRAFT_DBSCAN_CORES", "32").toInt
      System.err.println(s"[scale-dbscan] warmup n=${n / 8}")
      timed(cores, n / 8, eps, minPts) // warmup
      val out = Seq(false, true).flatMap { hot =>
        val runs = Seq(false, true).map { dense =>
          val r = Seq.fill(2) {
            System.err.println(s"[scale-dbscan] run hotspot=$hot dense=$dense n=$n")
            timed(cores, n, eps, minPts, dense, hot)
          }.minBy(_.sec)
          System.err.println(s"[scale-dbscan] done hotspot=$hot dense=$dense " +
            f"sec=${r.sec}%.2f core=${r.nCore} border=${r.nBorder} noise=${r.nNoise}")
          (if (dense) "dense" else "baseline") -> r
        }
        val inv = runs.map(_._2)
          .map(r => (r.nCore, r.nBorder, r.nNoise, r.checksum)).distinct
        require(inv.size == 1,
          s"variant invariants diverged (hotspot=$hot): $inv")
        val cloud = if (hot) "hotspot" else "uniform"
        val i = runs.head._2
        runs.map { case (v, r) =>
          f""""${cloud}_$v":{"sec":${r.sec}%.2f,""" +
            s""""n_core":${i.nCore},"n_border":${i.nBorder},""" +
            s""""n_noise":${i.nNoise},"checksum":${i.checksum}}"""
        }
      }
      println(s"""{"job":"dbscan_variants","n":$n,"cores":$cores,""" +
        s""""eps":$eps,"min_pts":$minPts,${out.mkString(",")}}""")
      return
    }
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    // SPARK_GRAFT_DBSCAN_HOTSPOT=1 sweeps the CONTRACTION plan on the
    // hotspot-skewed cloud — the regime where the plain baseline's
    // all-pairs clump volume no longer fits this sandbox at full n (the
    // 250k compare battery covers both variants on both clouds)
    val hot = sys.env.contains("SPARK_GRAFT_DBSCAN_HOTSPOT")
    timed(pair.head, n / 8, eps, minPts, dense = hot, hotspot = hot) // warmup
    val runs = pair.map(c => c ->
      Seq.fill(2)(timed(c, n, eps, minPts, dense = hot, hotspot = hot)).minBy(_.sec))
    val checks = runs.map(_._2)
      .map(r => (r.nCore, r.nBorder, r.nNoise, r.checksum)).distinct
    require(checks.size == 1,
      s"DBSCAN invariants diverged across core counts: $checks")
    val thr = runs.map { case (c, r) => c -> n / r.sec }.toMap
    val eff = (thr(pair.last) / thr(pair.head)) / (pair.last.toDouble / pair.head)
    val pts = runs.map { case (c, r) =>
      f""""local$c":{"sec":${r.sec}%.2f,"points_per_sec":${(n / r.sec).round}}"""
    }.mkString("{", ",", "}")
    val inv = runs.head._2
    println(s"""{"job":"dbscan_scale","n":$n,"eps":$eps,"min_pts":$minPts,""" +
      s""""n_core":${inv.nCore},"n_border":${inv.nBorder},""" +
      s""""n_noise":${inv.nNoise},"label_checksum":${inv.checksum},""" +
      s""""points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
