package graft

/** Scaling evidence for the SimHash near-dup path after the round-4
  * combination-block rewrite: the replicated corpus (same deterministic
  * per-replica token suffixes as ScaleDedup, so signatures vary across
  * replicas) runs through simhashNearDups(maxDist=8) — b=12 blocks,
  * C(12,4)=495 combo keys of ~21 bits — at two parallelism levels with
  * constant per-core work. Output pair count is deterministic (the
  * generator is lossless for the radius; cross-replica chance pairs are
  * legitimate hamming-<=8 hits), so equal counts across core counts is the
  * correctness invariant and wall time is the scaling measure. */
object ScaleSimhash {

  def timed(cores: Int, sfDir: String, repl: Int): (Double, Long, Long, Double) = {
    val spark = Scale.makeSession(cores)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val shuffleBytes = Scale.shuffleCounter(spark)
    val d = ScaleDedup.docs(spark, sfDir, repl, cores)
    val nDocs = d.count()
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    val docsDs = d
      .select(col("doc_id"),
        filter(split(col("text"), " "), x => length(x) > lit(0)).as("toks"))
      .filter(size(col("toks")) > 0)
      .as[(Long, Seq[String])]
    // maxBucket = the production backstop: this synthetic corpus is DENSE
    // in hamming-<=8 clusters (near-identical template docs), so the
    // uncapped output grows quadratically with cluster size — real
    // boilerplate behavior; the cap is precisely the documented corpus-
    // scale answer, and the sweep measures the capped production path
    val pairs = graft.dedup.Dedup
      .simhashNearDups(docsDs, maxDist = 8, maxBucket = 64).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100) // listener bus drain
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, nDocs, pairs, shufMb)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val perCore = sys.env.getOrElse("SPARK_GRAFT_REPL_PER_CORE", "2").toInt
    timed(8, sfDir, 4) // warmup
    val runs = pair.map { c =>
      val repl = perCore * c
      val (sec, nDocs, pairs, shufMb) = Seq.fill(2)(timed(c, sfDir, repl)).minBy(_._1)
      (c, sec, nDocs, pairs, nDocs / sec, shufMb)
    }
    val thr = runs.map(r => r._1 -> r._5).toMap
    val eff = (thr(pair.last) / thr(pair.head)) / (pair.last.toDouble / pair.head)
    val pts = runs.map { case (c, sec, n, p, t, sm) =>
      f""""local$c":{"sec":$sec%.2f,"docs":$n,"pairs":$p,"docs_per_sec":${t.round},"shuffle_mb":$sm%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"simhash_dedup_scale","points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
