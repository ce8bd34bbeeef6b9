package graft

import org.apache.spark.sql.functions._

/** Incremental-ingest scaling evidence: index a corpus at several sizes,
  * then probe it with the SAME constant batch (minhash near-dup +
  * exact-key dedup), and measure what the bucketed index buys:
  *
  *  - probe SHUFFLE bytes must stay ~flat as the corpus grows (every
  *    exchange in the probe is batch-sized — the index never re-shuffles);
  *  - probe WALL TIME grows only with the index's sequential scan (the
  *    unavoidable floor of a join-based probe), NOT with a corpus-sized
  *    sort+exchange — contrast column: the one-shot minhashNearDups cost
  *    over the same corpus, which re-pays signatures + the full self-join
  *    every time;
  *  - matched-pair count stays constant (the batch's duplicates live in
  *    replica 0, present at every corpus size) — correctness under scale.
  *
  * Emits one JSON line like the other Scale mains.
  */
object ScaleIncremental {

  private def timed(cores: Int, sfDir: String, repl: Int)
      : (Double, Double, Double, Long, Long, Long, Double) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val corpus = ScaleDedup.docs(spark, sfDir, repl, cores)
    val nCorpus = corpus.count()
    val t0 = System.nanoTime()
    graft.dedup.Dedup.writeMinhashIndex(
      corpus, "doc_id", "text", "mh_scale_idx", cores * 2)
    graft.dedup.Dedup.writeDedupIndex(
      corpus, substring(col("text"), 1, 12), "ex_scale_idx", cores * 2)
    val buildSec = (System.nanoTime() - t0) / 1e9
    // constant probe batch: every 10th replica-0 doc, remapped ids — its
    // exact duplicates sit in replica 0 of the corpus at EVERY size
    val batch = ScaleDedup.docs(spark, sfDir, 1, cores)
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("text"))
    val nBatch = batch.count()
    graft.CacheBin.drain()
    val s0 = shuffleBytes.get()
    val t1 = System.nanoTime()
    val pairs = graft.dedup.Dedup
      .incrementalNearDups(batch, "doc_id", "text", "mh_scale_idx")
      .count()
    val newKeys = graft.dedup.Dedup
      .incrementalNew(batch, "doc_id", substring(col("text"), 1, 12), "ex_scale_idx")
      .count()
    val probeSec = (System.nanoTime() - t1) / 1e9
    Thread.sleep(100) // listener bus drain
    val probeShufMb = (shuffleBytes.get() - s0) / 1e6
    // contrast: the non-incremental alternative re-runs the full self-join
    val t2 = System.nanoTime()
    graft.dedup.Dedup
      .minhashNearDups(corpus.unionByName(batch), "doc_id", "text")
      .count()
    val oneShotSec = (System.nanoTime() - t2) / 1e9
    graft.CacheBin.drain()
    spark.stop()
    (buildSec, probeSec, oneShotSec, nCorpus, nBatch, pairs, probeShufMb)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repls = sys.env.getOrElse("SPARK_GRAFT_REPLS", "2,8,32")
      .split(",").map(_.trim.toInt).toSeq
    timed(cores, sfDir, repls.head) // warmup
    val runs = repls.map { r =>
      val (b, p, o, nc, nb, pairs, sm) = timed(cores, sfDir, r)
      (r, b, p, o, nc, nb, pairs, sm)
    }
    val first = runs.head; val last = runs.last
    val shufRatio = last._8 / math.max(first._8, 1e-9)
    val probeRatio = last._3 / first._3
    val corpusRatio = last._5.toDouble / first._5
    val pts = runs.map { case (r, b, p, o, nc, nb, pairs, sm) =>
      f""""repl$r":{"build_sec":$b%.2f,"probe_sec":$p%.2f,"oneshot_sec":$o%.2f,"corpus_docs":$nc,"batch_docs":$nb,"pairs":$pairs,"probe_shuffle_mb":$sm%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"incremental_ingest_scale","points":$pts,"corpus_ratio":${f"$corpusRatio%.1f"},"probe_sec_ratio":${f"$probeRatio%.2f"},"probe_shuffle_ratio":${f"$shufRatio%.2f"}}""")
  }
}
