package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N→4N scaling evidence for the edit-distance near-dup family
  * (dedup/EditDedup.scala PassJoin): strong scaling over a synthetic
  * corpus with PLANTED twins whose pair count and distance are exact
  * closed forms — the run asserts them at every parallelism level, so the
  * sweep measures a provably-correct operator, not just wall time.
  *
  * Corpus: md5-chained hex text of length 32·(4 + id%4) (128–224 chars,
  * multiples of 32). Every 16th id gets a twin with exactly 3 character
  * substitutions ('Z'/'Q'/'X' — outside the hex alphabet, so no indel
  * alignment can do better and the distance is exactly 3). Unrelated docs
  * can only pair at EQUAL length (|Δlen| <= tau=3 < 32) and random hex of
  * equal length differs in ~94% of positions — zero accidental pairs.
  * Expected: n/16 pairs, every d == 3. */
object ScaleEdit {

  def corpus(spark: SparkSession, n: Long, cores: Int): DataFrame = {
    val base = spark.range(0L, n, 1L, cores * 2)
      .select(col("id").as("doc_id"),
        expr("substring(" + "concat(" +
          (0 until 7).map(j => s"md5(concat(cast(id as string), ':', '$j'))")
            .mkString(",") + "), 1, cast(32 * (4 + id % 4) as int))").as("text"))
    val twins = base.filter(col("doc_id") % 16 === 0)
      .select((col("doc_id") + n).as("doc_id"),
        expr("overlay(overlay(overlay(text placing 'Z' from 11) " +
          "placing 'Q' from cast(length(text)/2 as int)) " +
          "placing 'X' from length(text) - 4)").as("text"))
    base.unionByName(twins)
  }

  def timed(cores: Int, n: Long, tau: Int): (Double, Long, Long, Long, Double) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val d = corpus(spark, n, cores)
    val nDocs = d.count()
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    val out = graft.dedup.EditDedup.nearDups(d, "doc_id", "text", tau = tau)
      .agg(count(lit(1)), coalesce(min("d"), lit(-1L)),
        coalesce(max("d"), lit(-1L))).head()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100) // listener bus drain
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    graft.CacheBin.drain()
    spark.stop()
    (sec, nDocs, out.getLong(0), out.getLong(2), shufMb)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_EDIT_N", "1000000").toLong
    val tau = sys.env.getOrElse("SPARK_GRAFT_EDIT_TAU", "3").toInt
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val expected = (n + 15) / 16
    timed(pair.head, n / 8, tau) // warmup
    val runs = pair.map { c =>
      val (sec, nDocs, pairs, maxD, shufMb) =
        Seq.fill(2)(timed(c, n, tau)).minBy(_._1)
      require(pairs == expected && maxD == 3,
        s"planted-pair invariant broke at local[$c]: pairs=$pairs (expected $expected), maxD=$maxD")
      (c, sec, nDocs, pairs, nDocs / sec, shufMb)
    }
    val thr = runs.map(r => r._1 -> r._5).toMap
    val eff = (thr(pair.last) / thr(pair.head)) / (pair.last.toDouble / pair.head)
    val pts = runs.map { case (c, sec, nd, p, t, sm) =>
      f""""local$c":{"sec":$sec%.2f,"docs":$nd,"pairs":$p,"docs_per_sec":${t.round},"shuffle_mb":$sm%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"edit_dedup_scale","tau":$tau,"expected_pairs":$expected,"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
