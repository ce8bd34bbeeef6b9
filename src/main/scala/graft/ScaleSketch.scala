package graft

import org.apache.spark.sql.functions._
import graft.text.CountMin
import graft.ops.Stats

/** N→4N scaling evidence for the sketch family: Count-Min build+probe
  * and HyperLogLog registers+estimate — the session-F approximate
  * operators whose whole point is that the wire carries sketch-sized
  * partials, never the corpus.
  *
  * Input is pure column math over range(): a zipf-ish token stream
  * (token rank = id % 4096 biased by a second mod so head tokens repeat
  * heavily) and per-group keys with ~n/16 true distincts. Per-core work
  * is constant in weak mode; strong mode (default) asserts the crc
  * checksum of the CM probe table and the exact HLL register table
  * bit-identical across core counts.
  */
object ScaleSketch {

  private def ck(df: org.apache.spark.sql.DataFrame, cols: String*): Long =
    df.agg(sum(crc32(concat_ws(":", cols.map(col): _*)) % 1000003L))
      .head().getLong(0)

  @volatile var lastSplits: Seq[Double] = Nil

  def timed(cores: Int, n: Long): (Double, Double, Long) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val base = spark.range(0L, n, 1L, cores * 2)
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()

    // 1. Count-Min: zipf-ish tokens (head token ~1/64 of the corpus),
    //    sketch 4x4096; probe the 4096-token vocabulary
    val tok = concat(lit("t"),
      when(col("id") % 64 < 32, col("id") % 8) // heavy head
        .otherwise(col("id") % 4096).cast("string"))
    val toks = base.select(tok.as("w"))
    val sk = CountMin.build(toks, "w", depth = 4, width = 4096L)
    val vocab = spark.range(0L, 4096L)
      .select(concat(lit("t"), col("id").cast("string")).as("w"))
    val est = CountMin.estimate(sk, vocab, "w", depth = 4, width = 4096L)
    val ckCm = ck(est, "w", "est")
    val t1 = System.nanoTime()

    // 2. HLL: 8 groups, ~n/16 true distincts per corpus, b=11 registers
    val keyed = base.select((col("id") % 8).cast("string").as("g"),
      concat(lit("k"), (col("id") % math.max(n / 16, 1L)).cast("string")).as("k"))
    val regs = Stats.hllRegisters(keyed, "g", "k", bucketBits = 11)
    // checksum covers the INTEGER-exact registers only: the estimator's
    // double summation order varies with partitioning, and a rounded est
    // sitting on a .5 boundary would be a false cross-level drift. The
    // estimate still runs (timed) via its row count.
    val ckHll = ck(regs, "g", "bucket", "r") +
      Stats.hllEstimate(regs, "g", 11).count()
    val tEnd = System.nanoTime()

    lastSplits = Seq((t1 - t0) / 1e9, (tEnd - t1) / 1e9)
    val sec = (tEnd - t0) / 1e9
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, shufMb, ckCm + ckHll)
  }

  def main(args: Array[String]): Unit = {
    val weak = sys.env.get("SPARK_GRAFT_SKETCH_MODE").contains("weak")
    val n = sys.env.getOrElse("SPARK_GRAFT_SKETCH_N",
      if (weak) "8000000" else "64000000").toLong
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    def nOf(c: Int): Long = if (weak) n * c else n
    timed(pair.head, nOf(pair.head) / 8) // warmup
    val runs = pair.map { c =>
      val attempts = Seq.fill(2) { val r = timed(c, nOf(c)); (r, lastSplits) }
      val ((sec, mb, ckSum), splits) = attempts.minBy(_._1._1)
      println(f"[sketch] local$c splits cm=${splits(0)}%.2f hll=${splits(1)}%.2f")
      (c, sec, mb, ckSum)
    }
    if (!weak) require(runs.map(_._4).distinct.size == 1,
      s"cross-level checksum drift: ${runs.map(r => r._1 -> r._4)}")
    val rates = runs.map { case (c, sec, _, _) => (c, nOf(c).toDouble / sec) }
    val eff = (rates.last._2 / rates.head._2) / (pair.last.toDouble / pair.head)
    val pts = runs.zip(rates).map { case ((c, sec, mb, _), (_, rate)) =>
      f""""local$c":{"sec":$sec%.2f,"rows":${nOf(c)},"rows_per_sec":${rate.round},"shuffle_mb":$mb%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"sketch_scale","mode":"${if (weak) "weak" else "strong"}","checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
