package graft

import org.apache.spark.sql.functions._
import graft.spatial.{HexGrid, SynthGeo}

/** N→4N scaling evidence for the hexagonal family — the planar H3-res-9
  * analog of ScaleS2's sweep. One fused pass per level runs (1) hex encode
  * + occupancy rollup + the 6-neighbor ring smoothing (corpus pays one
  * partial-agg exchange; the ring expansion runs over per-cell COUNTS via
  * pure id arithmetic, so its exchange width is 7× the occupied-cell count,
  * never the corpus) and (2) the hex-keyed zone join (broadcast cover probe
  * + exact |dx|+|dy| refinement + per-zone rollup — the point side never
  * shuffles).
  *
  * Input: the deterministic planar point lattice from pure column math over
  * range() — the same formula as SynthGeo.points, so HexGridSpec's parity
  * contract covers the full formula range. Cross-level invariant: exact
  * integer checksum (crc32 mod prime, summed — reduction-order-free) over
  * both ops' full outputs.
  */
object ScaleHex {

  private def ck(df: org.apache.spark.sql.DataFrame, cols: String*): Long =
    df.agg(sum(crc32(concat_ws(":", cols.map(col): _*)) % 1000003L))
      .head().getLong(0)

  def timed(cores: Int, n: Long): (Double, Double, Long) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val pts = spark.range(0L, n, 1L, cores * 2)
      .select(col("id"),
        (col("id") * lit(7919L) % lit(10000L) / lit(100.0)).as("x"),
        (col("id") * lit(104729L) % lit(10000L) / lit(100.0)).as("y"))
    val zoneSide = spark.createDataFrame(
      SynthGeo.zoneParams.flatMap { case (k, cx, cy, r) =>
        HexGrid.coverDiamond(cx, cy, r, 7.5).map(c => (c, k, cx, cy, r))
      }).toDF("cell", "zone_id", "zcx", "zcy", "zr")
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    // 1. encode + occupancy + 6-neighbor ring (counts-sized second
    // exchange; the counts aggregate is persisted — it feeds both the
    // ring explode and the final join, one corpus scan not two)
    val cnts = CacheBin.persist(pts
      .select(HexGrid.cellCol(col("x"), col("y"), 2.5).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n")))
    val offs = typedLit(0L +: HexGrid.neighborOffsets)
    val ring = cnts
      .select(col("cell"), col("n"), explode(offs).as("off"))
      .select((col("cell") + col("off")).as("tgt"), col("n"))
      .groupBy("tgt").agg(sum("n").as("ring_n"))
    val smoothed = cnts.join(ring, cnts("cell") === ring("tgt"))
      .select(col("cell"), col("n"), col("ring_n"))
    val ckRing = ck(smoothed, "cell", "n", "ring_n")
    // 2. hex-keyed zone join + per-zone rollup (broadcast probe)
    val joined = pts
      .withColumn("cell", HexGrid.cellCol(col("x"), col("y"), 7.5))
      .join(broadcast(zoneSide), "cell")
      .where(abs(col("x") - col("zcx")) + abs(col("y") - col("zcy")) < col("zr"))
      .groupBy("zone_id").agg(count(lit(1)).as("n"))
    val ckJoin = ck(joined, "zone_id", "n")
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100)
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, shufMb, ckRing + ckJoin)
  }

  /** Strong mode (default): same N at both levels, cross-level checksum
    * asserted bit-for-bit. Weak mode (SPARK_GRAFT_HEX_MODE=weak):
    * SPARK_GRAFT_HEX_N = rows per core. */
  def main(args: Array[String]): Unit = {
    val weak = sys.env.get("SPARK_GRAFT_HEX_MODE").contains("weak")
    val n = sys.env.getOrElse("SPARK_GRAFT_HEX_N",
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
    println(s"""{"job":"hex_scale","mode":"${if (weak) "weak" else "strong"}","checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
