package graft

import org.apache.spark.sql.functions._

/** N→4N scaling evidence for the round-5 web-clean family: URL
  * canonicalization + blocklist collapse, line-level cleanup,
  * deterministic shard shuffle, contiguous global indexing, and
  * stratified eval sampling — the scan-plus-bounded-exchange shapes the
  * playbook assigns them (the only corpus-sized exchanges are the
  * canonical-url groupBy and the 8-shard hash partition).
  *
  * Input is a deterministic synthetic corpus from pure column math over
  * range() (identical at any parallelism): each doc gets 40 Zipf-ish
  * words (the ScaleText rule) and a messy URL whose canonical identity is
  * id/4 — so the collapse does real 4:1 work. The cross-level invariant
  * is the EXACT integer checksum over every op's full output (crc32 mod a
  * prime, summed — reduction-order-free), so both core counts must agree
  * bit-for-bit, not approximately. Throughput is docs/sec over the fused
  * five-op pass.
  */
object ScaleWebClean {

  private def synthDocs(spark: org.apache.spark.sql.SparkSession,
      n: Long, parts: Int) =
    spark.range(0L, n, 1L, parts)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(1L), lit(40L)),
          j => concat(lit("w"), (j * (col("id") % 19L + j)) % 4096L)), " ")
          .as("text"),
        when(col("id") % 5L === 0L, "en").otherwise("xx").as("lang"))

  private def ck(df: org.apache.spark.sql.DataFrame, cols: String*): Long =
    df.agg(sum(crc32(concat_ws(":", cols.map(col): _*)) % 1000003L))
      .head().getLong(0)

  def timed(cores: Int, n: Long): (Double, Double, Long) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val docs = synthDocs(spark, n, cores * 2)
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    // 1. canonicalize + blocklist + 4:1 collapse (ONE corpus groupBy)
    val pages = docs.select(col("doc_id"),
      graft.ops.UrlOps.normalize(graft.ops.UrlOps.messyUrl(
        expr("doc_id div 4"), col("doc_id"))).as("url_norm"))
    val collapsed = graft.ops.UrlOps.filterAndCollapse(pages, "doc_id", "url_norm")
    val ckUrl = ck(collapsed, "url_norm", "canonical_id", "n_dups")
    // 2. line cleanup (pure scan)
    val ls = graft.text.TextFns.fixedLines(col("text"), 5)
    val kept = filter(ls, l => !concat(lit(" "), l, lit(" ")).contains(" w7 "))
    val ckLines = ck(docs.select(col("doc_id"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("text_clean")), "doc_id", "n_kept", "text_clean")
    // 3. deterministic shard shuffle (8-shard hash partition + local sorts)
    val ckShard = ck(graft.text.Sampling.shardShuffle(docs, "doc_id", 8),
      "doc_id", "shard", "pos")
    // 4. contiguous global index (bounded offsets + per-bucket windows)
    val ckIdx = ck(graft.text.Sampling.globalIndex(docs, "doc_id"),
      "doc_id", "idx")
    // 5. stratified eval sampling (threshold sliver + exact rank)
    val ckStrat = ck(graft.text.Sampling.stratifiedSample(
      docs, "doc_id", "lang", 20), "doc_id", "lang", "pos")
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100)
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    (sec, shufMb, ckUrl + ckLines + ckShard + ckIdx + ckStrat)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_WEB_N", "3000000").toLong
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    timed(pair.head, n / 8) // warmup
    val runs = pair.map { c =>
      val (sec, mb, ckSum) = Seq.fill(2)(timed(c, n)).minBy(_._1)
      (c, sec, mb, ckSum)
    }
    require(runs.map(_._4).distinct.size == 1,
      s"cross-level checksum drift: ${runs.map(r => r._1 -> r._4)}")
    val docsPerSec = runs.map(r => r._1 -> (n.toDouble / r._2)).toMap
    val eff = (docsPerSec(pair.last) / docsPerSec(pair.head)) /
      (pair.last.toDouble / pair.head)
    val pts = runs.map { case (c, sec, mb, _) =>
      f""""local$c":{"sec":$sec%.2f,"docs_per_sec":${docsPerSec(c).round},"shuffle_mb":$mb%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"web_clean_scale","docs":$n,"checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
