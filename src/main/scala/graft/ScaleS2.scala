package graft

import org.apache.spark.sql.functions._
import graft.spatial.{S2Grid, SynthGeo}

/** N→4N scaling evidence for the spherical family — the BASELINE metric's
  * literal shape: "spatial-join + tile-assignment throughput (docs/sec)"
  * over geotagged pages. The fused pass runs (1) S2-level-13 encode +
  * level-6 parent tile rollup (one scan, one bounded partial-agg exchange
  * whose width is the number of OCCUPIED tiles, not the corpus) and
  * (2) the admin-boundary join (cell-6 broadcast probe + exact refinement
  * + per-region rollup — the page side never shuffles).
  *
  * Input: deterministic synthetic geotags from pure column math over
  * range() — the same 0.005-offset lattice as the oracle-gated queries
  * (S2GridSpec's margin guard covers the full formula range). The
  * cross-level invariant is an EXACT integer checksum (crc32 mod prime,
  * summed — reduction-order-free) over both ops' full outputs, so the two
  * core counts must agree bit-for-bit.
  */
object ScaleS2 {

  private def ck(df: org.apache.spark.sql.DataFrame, cols: String*): Long =
    df.agg(sum(crc32(concat_ws(":", cols.map(col): _*)) % 1000003L))
      .head().getLong(0)

  def timed(cores: Int, n: Long): (Double, Double, Long) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val docs = spark.range(0L, n, 1L, cores * 2)
      .select(col("id"),
        SynthGeo.latColOf(col("id")).as("lat"),
        SynthGeo.lonColOf(col("id")).as("lon"))
    val regionSide = spark.createDataFrame(
      SynthGeo.geoRegionParams.flatMap { case (k, clat, clon, r) =>
        S2Grid.coverDiamond(clat, clon, r, 6).map(c => (c, k, clat, clon, r))
      }).toDF("cell", "region_id", "clat", "clon", "rr")
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    // 1. encode + tile rollup (exchange width = occupied level-6 tiles)
    val tiles = docs
      .select(S2Grid.cellCol(col("lat"), col("lon"), 13).as("cell13"))
      .select(S2Grid.parentCol(col("cell13"), 13, 6).as("cell6"))
      .groupBy("cell6").agg(count(lit(1)).as("n"))
    val ckTiles = ck(tiles, "cell6", "n")
    // 2. admin-boundary join + per-region rollup (broadcast probe)
    val joined = docs
      .withColumn("cell", S2Grid.cellCol(col("lat"), col("lon"), 6))
      .join(broadcast(regionSide), "cell")
      .where(abs(col("lat") - col("clat")) + abs(col("lon") - col("clon")) < col("rr"))
      .groupBy("region_id").agg(count(lit(1)).as("n"))
    val ckJoin = ck(joined, "region_id", "n")
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100)
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, shufMb, ckTiles + ckJoin)
  }

  /** Strong mode (default): same N at both levels — the cross-level
    * checksum must match bit-for-bit (the parallelism-determinism
    * invariant). Weak mode (SPARK_GRAFT_S2_MODE=weak): N scales with
    * cores (SPARK_GRAFT_S2_N = rows PER CORE, the flagship-table
    * convention) so per-level fixed costs — AQE stage scheduling, task
    * launch — dilute identically; the checksum equality is then
    * level-local and not asserted across levels. */
  def main(args: Array[String]): Unit = {
    val weak = sys.env.get("SPARK_GRAFT_S2_MODE").contains("weak")
    val n = sys.env.getOrElse("SPARK_GRAFT_S2_N",
      if (weak) "20000000" else "160000000").toLong
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    def nOf(c: Int): Long = if (weak) n * c else n
    timed(pair.head, nOf(pair.head) / 8) // warmup
    val runs = pair.map { c =>
      val (sec, mb, ckSum) = Seq.fill(2)(timed(c, nOf(c))).minBy(_._1)
      (c, sec, mb, ckSum)
    }
    if (!weak) require(runs.map(_._4).distinct.size == 1,
      s"cross-level checksum drift: ${runs.map(r => r._1 -> r._4)}")
    val rates = runs.map { case (c, sec, _, _) => (c, nOf(c).toDouble / sec) }
    val eff = (rates.last._2 / rates.head._2) /
      (pair.last.toDouble / pair.head)
    val pts = runs.zip(rates).map { case ((c, sec, mb, _), (_, rate)) =>
      f""""local$c":{"sec":$sec%.2f,"docs":${nOf(c)},"docs_per_sec":${rate.round},"shuffle_mb":$mb%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"s2_scale","mode":"${if (weak) "weak" else "strong"}","checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
