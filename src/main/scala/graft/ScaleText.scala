package graft

import org.apache.spark.sql.functions._

/** N→4N scaling evidence for the round-5 term-relevance family (TF-IDF,
  * DSIR importance, BPE pair stats) — the scan + word-keyed-aggregate
  * shape shared by all three.
  *
  * Input is a deterministic synthetic corpus built from pure column math
  * over range() (identical at any parallelism): each doc is 40 "words"
  * drawn from a Zipf-ish arithmetic rule, so the word-key space has the
  * hot-head skew real text has (stopword-heavy keys are the skew case the
  * playbook's AQE argument addresses). The cross-level invariant is the
  * EXACT result checksum: every op here is integer-or-rounded arithmetic,
  * so all core counts must produce identical aggregates, not just close
  * ones. Throughput is doc-tokens/sec over the fused three-op pass.
  */
object ScaleText {

  /** (doc_id, text, lang): Zipf-head vocabulary via j*(doc%19+j) % 4096,
    * all from range() — no files, no RNG state. */
  private def synthDocs(spark: org.apache.spark.sql.SparkSession,
      n: Long, parts: Int) =
    spark.range(0L, n, 1L, parts)
      .select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(1L), lit(40L)),
          j => concat(lit("w"), (j * (col("id") % 19L + j)) % 4096L)), " ")
          .as("text"),
        when(col("id") % 5L === 0L, "en").otherwise("xx").as("lang"))

  def timed(cores: Int, n: Long): (Double, Double, Long) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val docs = synthDocs(spark, n, cores * 2)
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    // integer checksums pin cross-level exactness: the (doc, rank, term)
    // assignment and the pair counts are integer-determined, so every
    // core count must produce the IDENTICAL value, not a close one
    val tfidf = graft.text.Relevance.tfIdfTopK(docs, "doc_id", col("text"), 3)
      .agg(sum(crc32(concat_ws(":", col("doc_id"), col("rank"), col("term")))
        % 1000003L)).head().getLong(0)
    // per-doc weights are 6-dp-rounded; fold them to integers BEFORE the
    // cross-doc sum so the checksum is reduction-order-free too
    val imp = graft.text.Relevance
      .importanceWeights(docs, "doc_id", col("text"), col("lang") === "en", 64)
      .agg(sum(round(col("weight") * 1000000).cast("long"))).head().getLong(0)
    val bpe = graft.text.BpeStats.topPairs(docs, col("text"), 20)
      .agg(sum("n")).head().getLong(0)
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100)
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    val checksum = tfidf + bpe + imp
    (sec, shufMb, checksum)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_TEXT_N", "3000000").toLong
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    timed(pair.head, n / 8) // warmup
    val runs = pair.map { c =>
      val (sec, mb, ck) = Seq.fill(2)(timed(c, n)).minBy(_._1)
      (c, sec, mb, ck)
    }
    require(runs.map(_._4).distinct.size == 1,
      s"cross-level checksum drift: ${runs.map(r => r._1 -> r._4)}")
    val tokPerSec = runs.map(r => r._1 -> (n * 40.0 / r._2)).toMap
    val eff = (tokPerSec(pair.last) / tokPerSec(pair.head)) /
      (pair.last.toDouble / pair.head)
    val pts = runs.map { case (c, sec, mb, _) =>
      f""""local$c":{"sec":$sec%.2f,"tokens_per_sec":${tokPerSec(c).round},"shuffle_mb":$mb%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"text_relevance_scale","docs":$n,"checksum":${runs.head._4},"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
