package graft

import org.apache.spark.sql.functions._
import graft.dedup.Bloom
import graft.ops.{UrlOps, WebGraph}

/** N→4N scaling evidence for the crawl-maintenance family: blocked Bloom
  * membership (build + probe), windowed crawl diff, and mirror-host
  * detection — the session-F ops.
  *
  * Input is pure column math over range(). Structure keeps per-core work
  * honest at every level:
  *  - bloom: nWords ∝ n (constant bits/key), probe n keys half-seen —
  *    build is one groupBy(w), probe one equi-join;
  *  - crawl diff: n/4 urls × 4 revisions split across two windows — one
  *    groupBy(url) with conditional struct-max partials;
  *  - mirror hosts: each content on exactly 2 of n/64 hosts ⇒ per-host
  *    doc count and per-pair shared count stay constant (~64) as n grows
  *    — the self-join output is ∝ n, never quadratic.
  * Cross-level invariant: crc32-mod-prime checksum over all three ops'
  * full outputs; strong mode asserts it bit-identical across core counts.
  */
object ScaleCrawl {

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

    // 1. bloom: corpus = even ids, probes = all; constant 8 keys/word
    val urls = base.select(col("id"),
      concat(lit("https://synth.example/doc/"), col("id")).as("url"))
    val nWords = math.max(n / 8, 1L)
    val filt = Bloom.build(urls.filter(col("id") % 2 === 0), "url", nWords)
    val probed = Bloom.probe(filt, urls, "url", nWords)
      .select(col("id"), col("maybe_seen").cast("string").as("seen"))
    val ckBloom = ck(probed, "id", "seen")
    val t1 = System.nanoTime()

    // 2. crawl diff: n/4 urls × 4 revisions, ts split across two windows,
    //    rev changes for half the urls
    val nUrls = math.max(n / 4, 1L)
    val snaps = base.select(
      concat(lit("u"), (col("id") % nUrls).cast("string")).as("url"),
      (lit(1000L) + expr(s"id div $nUrls") * 100L +
        (col("id") % nUrls % 2) * 250L).as("ts"),
      concat(lit("v"), expr(s"(id div $nUrls + id % $nUrls % 3) div 2")
        .cast("string")).as("rev"))
    val diff = UrlOps.crawlDiff(snaps, "url", "ts", "rev",
      t0 = 1000L, t1 = 1200L, t2 = 2000L)
      .select(col("url"), coalesce(col("rev1"), lit("-")).as("r1"),
        coalesce(col("rev2"), lit("-")).as("r2"), col("status"))
    val ckDiff = ck(diff, "url", "r1", "r2", "status")
    val t2 = System.nanoTime()

    // 3. mirror hosts: content c (= id div 2) on hosts c%nHosts and
    //    (c*31+7)%nHosts — per-host load and pair overlap stay constant
    val nHosts = math.max(n / 64, 2L)
    val cId = expr("id div 2")
    val host = when(col("id") % 2 === 0, pmod(cId, lit(nHosts)))
      .otherwise(pmod(cId * 31L + 7L, lit(nHosts)))
    val pages = base.select(
      concat(lit("h"), host.cast("string")).as("host"),
      concat(lit("c"), cId.cast("string")).as("ckey"))
    val mir = WebGraph.mirrorHosts(pages, "host", "ckey",
      minShared = 1L, maxHostsPerContent = 8L)
    val ckMir = ck(mir, "host_a", "host_b", "shared", "n_a", "n_b")
    val tEnd = System.nanoTime()

    lastSplits = Seq((t1 - t0) / 1e9, (t2 - t1) / 1e9, (tEnd - t2) / 1e9)
    val sec = (tEnd - t0) / 1e9
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, shufMb, ckBloom + ckDiff + ckMir)
  }

  /** Strong mode (default): same N at both levels, checksum bit-identical.
    * Weak mode (SPARK_GRAFT_CRAWL_MODE=weak): SPARK_GRAFT_CRAWL_N = rows
    * PER CORE. */
  def main(args: Array[String]): Unit = {
    val weak = sys.env.get("SPARK_GRAFT_CRAWL_MODE").contains("weak")
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N",
      if (weak) "4000000" else "32000000").toLong
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    def nOf(c: Int): Long = if (weak) n * c else n
    timed(pair.head, nOf(pair.head) / 8) // warmup
    val runs = pair.map { c =>
      val attempts = Seq.fill(2) { val r = timed(c, nOf(c)); (r, lastSplits) }
      val ((sec, mb, ckSum), splits) = attempts.minBy(_._1._1)
      println(f"[crawl] local$c splits bloom=${splits(0)}%.2f diff=${splits(1)}%.2f mirror=${splits(2)}%.2f")
      (c, sec, mb, ckSum)
    }
    if (!weak) require(runs.map(_._4).distinct.size == 1,
      s"cross-level checksum drift: ${runs.map(r => r._1 -> r._4)}")
    val rates = runs.map { case (c, sec, _, _) => (c, nOf(c).toDouble / sec) }
    val eff = (rates.last._2 / rates.head._2) / (pair.last.toDouble / pair.head)
    val pts = runs.zip(rates).map { case ((c, sec, mb, _), (_, rate)) =>
      f""""local$c":{"sec":$sec%.2f,"rows":${nOf(c)},"rows_per_sec":${rate.round},"shuffle_mb":$mb%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"crawl_scale","mode":"${if (weak) "weak" else "strong"}","checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
