package graft

import org.apache.spark.sql.functions._
import graft.ops.Temporal

/** N→4N scaling evidence for the temporal join family (as-of join,
  * tiled range join, gap sessionization) — the time-axis twin of the
  * spatial sweeps (ScaleS2/ScaleHex).
  *
  * Input is pure column math over range(): every key gets a constant
  * 8-snapshot history probed by 8 as-of queries (per-key window cost
  * flat in corpus size), every user a constant 64-event stream, and the
  * interval set grows with the corpus while the time DOMAIN grows too,
  * holding pairs-per-point constant (~6) — so weak scaling is honest:
  * rows per core constant at every level, no quadratic hidden in the
  * range join. The cross-level invariant is an exact integer checksum
  * (crc32 mod prime, summed — reduction-order-free) over all three ops'
  * full outputs; strong mode asserts it bit-for-bit across core counts.
  */
object ScaleTemporal {

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

    // 1. as-of join: nKeys histories of 8 snapshots, probed 8× each;
    //    probe offsets include a before-first case (left-outer sentinel)
    val nKeys = math.max(n / 16, 1L)
    val key = col("id") % nKeys
    val seq = col("id") / nKeys // 0..15
    val snaps = base.filter(seq < 8)
      .select(key.as("k"), (seq * 1000L).as("ts"), seq.cast("string").as("rev"))
    val probes = base.filter(seq >= 8)
      .select(key.as("k"), ((seq - 8) * 1000L - 500L + key % 1500L).as("qts"))
    val asof = Temporal.asofJoin(probes, snaps, "k", "qts", "ts", Seq("rev"))
      .select(col("k"), col("qts"),
        coalesce(col("rev"), lit("none")).as("rev"),
        coalesce(col("asof_ts"), lit(-1L)).as("asof_ts"))
    val ckAsof = ck(asof, "k", "qts", "rev", "asof_ts")
    val t1 = System.nanoTime()

    // 2. range join: a CONSTANT interval catalog (the dimension side, like
    //    the zones table) probed by corpus-sized points — weak scaling
    //    holds the broadcast hash table constant per level so eff measures
    //    probe throughput, not build-table cache decay; domain 2^24,
    //    ~1.6 pairs/point, bucket 4096 ≥ max duration 2500
    val domain = 1L << 24
    val nIv = 16384L
    val iv = base.filter(col("id") < nIv).select(
      col("id").as("iid"),
      ((col("id") * 7919L) % domain).as("lo"))
      .withColumn("hi", col("lo") + 500L + (col("iid") % 11L) * 200L)
    val pts = base.select(col("id").as("pid"),
      ((col("id") * 104729L) % domain).as("pts_ts"))
    val rj = Temporal.rangeJoin(pts, "pts_ts", broadcast(iv), "lo", "hi", 4096L)
      .groupBy("iid").agg(count(lit(1)).as("np"),
        min("pts_ts").as("mn"), max("pts_ts").as("mx"))
    val ckRange = ck(rj, "iid", "np", "mn", "mx")
    val t2 = System.nanoTime()

    // 3. sessionization: nUsers streams of 64 events, jittered 700s-ish
    //    steps against a 1000s gap → deterministic multi-session splits
    val nUsers = math.max(n / 64, 1L)
    val ev = base.select((col("id") % nUsers).as("u"), col("id").as("eid"),
      ((col("id") / nUsers) * 700L + (col("id") % 13L) * 150L).as("ts"))
    val sess = Temporal.sessionize(ev, "u", "ts", "eid", 1000L)
      .groupBy("u").agg(max("session_no").as("ns"), count(lit(1)).as("ne"))
    val ckSess = ck(sess, "u", "ns", "ne")

    val sec = (System.nanoTime() - t0) / 1e9
    lastSplits = Seq((t1 - t0) / 1e9, (t2 - t1) / 1e9,
      (System.nanoTime() - t2) / 1e9)
    Thread.sleep(100)
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, shufMb, ckAsof + ckRange + ckSess)
  }

  /** The family's irreducible machine kernel: ONE hash exchange + ONE
    * per-key sort (a bare row_number window) over the same row count —
    * what every temporal op pays at minimum. Its own N→4N efficiency is
    * this host's exchange+sort ceiling; the battery is graded against
    * it, not against ideal (exchanges saturate a single box's memory
    * subsystem, which separate executors don't share). */
  def kernelTimed(cores: Int, n: Long): Double = {
    val spark = Scale.makeSession(cores)
    val nKeys = math.max(n / 16, 1L)
    val t0 = System.nanoTime()
    spark.range(0L, n, 1L, cores * 2)
      // width-matched to the battery's exchange rows (~40 B: key, two
      // longs, a short string) so the ceiling measures the same bytes/row
      .select((col("id") % nKeys).as("k"), col("id").as("v"),
        (col("id") * 31L).as("v2"), conv(col("id"), 10, 16).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")))
      .agg(sum(col("rn") % 1000003L), max(length(col("s"))), max("v2")).head()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    sec
  }

  /** Strong mode (default): same N at both levels, checksum must match
    * bit-for-bit. Weak mode (SPARK_GRAFT_TEMPORAL_MODE=weak):
    * SPARK_GRAFT_TEMPORAL_N = rows PER CORE. */
  def main(args: Array[String]): Unit = {
    val weak = sys.env.get("SPARK_GRAFT_TEMPORAL_MODE").contains("weak")
    val n = sys.env.getOrElse("SPARK_GRAFT_TEMPORAL_N",
      if (weak) "4000000" else "32000000").toLong
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    def nOf(c: Int): Long = if (weak) n * c else n
    timed(pair.head, nOf(pair.head) / 8) // warmup
    val runs = pair.map { c =>
      val attempts = Seq.fill(2) { val r = timed(c, nOf(c)); (r, lastSplits) }
      val ((sec, mb, ckSum), splits) = attempts.minBy(_._1._1)
      println(f"[temporal] local$c splits asof=${splits(0)}%.2f range=${splits(1)}%.2f sess=${splits(2)}%.2f")
      (c, sec, mb, ckSum)
    }
    if (!weak) require(runs.map(_._4).distinct.size == 1,
      s"cross-level checksum drift: ${runs.map(r => r._1 -> r._4)}")
    val rates = runs.map { case (c, sec, _, _) => (c, nOf(c).toDouble / sec) }
    val eff = (rates.last._2 / rates.head._2) /
      (pair.last.toDouble / pair.head)
    val pts = runs.zip(rates).map { case ((c, sec, mb, _), (_, rate)) =>
      f""""local$c":{"sec":$sec%.2f,"rows":${nOf(c)},"rows_per_sec":${rate.round},"shuffle_mb":$mb%.1f}"""
    }.mkString("{", ",", "}")
    val kSecs = pair.map(c => c -> Seq.fill(2)(kernelTimed(c, nOf(c))).min)
    val kEff = (nOf(pair.last) / kSecs.last._2) / (nOf(pair.head) / kSecs.head._2) /
      (pair.last.toDouble / pair.head)
    val kPts = kSecs.map { case (c, s) => f""""local$c":$s%.2f""" }.mkString("{", ",", "}")
    println(s"""{"job":"temporal_scale","mode":"${if (weak) "weak" else "strong"}","checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"},"kernel_sec":$kPts,"kernel_eff":${f"$kEff%.3f"}}""")
  }
}
