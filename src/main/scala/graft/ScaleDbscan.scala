package graft

import org.apache.spark.sql.functions._

/** N→4N scaling evidence for grid-bucketed DBSCAN: the same multi-million
  * point cloud (xxhash64-uniform in [0,1000)², pure column math — identical
  * bits at any parallelism) clustered at two core counts (strong scaling,
  * the brief's two-cluster-size criterion). Cross-level correctness
  * invariants: role census (core/border/noise counts) and a cluster-label
  * checksum must be IDENTICAL at both levels — a clustering that changes
  * under parallelism is broken, not slow. Density is set supercritical
  * (E[ε-neighbors] ≈ 3) so a giant component exists and the pointer-jump
  * rounds do real per-round volume, the regime the O(log d) bound is for.
  */
object ScaleDbscan {

  def pointsDf(spark: org.apache.spark.sql.SparkSession, n: Long, parts: Int) =
    spark.range(0L, n, 1L, parts).select(
      col("id"),
      (pmod(xxhash64(col("id")), lit(1000000L)) / 1000.0).as("x"),
      (pmod(xxhash64(col("id"), lit(1L)), lit(1000000L)) / 1000.0).as("y"))

  final case class Run(sec: Double, nCore: Long, nBorder: Long, nNoise: Long,
      checksum: Long)

  def timed(cores: Int, n: Long, eps: Double, minPts: Int): Run = {
    val spark = Scale.makeSession(cores)
    val t0 = System.nanoTime()
    val out = graft.spatial.Dbscan.dbscan(pointsDf(spark, n, cores * 2), eps, minPts)
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
    val eps = 0.7
    val minPts = 4
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    timed(pair.head, n / 8, eps, minPts) // warmup
    val runs = pair.map(c => c -> Seq.fill(2)(timed(c, n, eps, minPts)).minBy(_.sec))
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
