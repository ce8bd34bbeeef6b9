package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.GeoPipeline

/** Incremental crawl-append scaling evidence for the web-geo pipeline:
  * build the canonical per-url state over a growing base corpus, then fold
  * the SAME constant batch in via GeoPipeline's mergeable-canonical +
  * ±1-retraction algebra, and measure what the algebra buys:
  *
  *  - fold SHUFFLE bytes must stay ~flat as the corpus grows — every
  *    exchange in the fold is batch- or counts-sized; the corpus pays one
  *    broadcast semi probe (scan, no exchange);
  *  - fold WALL TIME grows only with that unavoidable state scan, never
  *    with a corpus re-aggregation — contrast column: the full recompute
  *    of the report over base ∪ batch, which re-pays the url collapse
  *    and region join every time;
  *  - the folded report stays EQUAL to the full recompute (collected
  *    sorted compare — the report is counts-sized) — correctness under
  *    scale, not just speed. The batch is all-retraction (every batch doc
  *    is the min-doc_id revision of an EXISTING url, flipping its
  *    survivor), the worst case for the delta path.
  *
  * Emits one JSON line like the other Scale mains.
  */
object ScaleGeoIncr {

  private val Langs = Seq("en", "es", "de", "fr", "pt", "it")

  /** Synthetic page rows for url groups picked by `idExpr` over range(n):
    * url group = doc_id div 4; survivor attributes all derive from doc_id
    * so a flipped survivor changes lang, chars, and geotag at once. */
  private def pages(spark: SparkSession, n: Long, filterExpr: String,
      idOff: Long = 0L): DataFrame =
    spark.range(n).filter(expr(filterExpr))
      .select(
        (col("id") + lit(idOff)).as("doc_id"),
        element_at(typedLit(Langs), (col("id") % 6 + 1).cast("int")).as("lang"),
        (col("id") * 31 % 5000 + 50).as("n_chars"),
        concat(lit("https://h"), (col("id") / 4 % 1000).cast("long"),
          lit(".example/p/"), (col("id") / 4).cast("long")).as("url_norm"))

  private def collectReport(df: DataFrame): Seq[(Long, String, Long, Long)] = {
    df.select("region_id", "lang", "n_docs", "tot_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  /** One measurement: base = non-multiple-of-4 ids below 4*nGroups (so
    * every url's base survivor is 4g+1); batch = the 4g ids of the first
    * batchGroups urls (every one flips its survivor). */
  private def timed(cores: Int, nGroups: Long, batchGroups: Long)
      : (Double, Double, Double, Long, Long, Boolean, Double) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val base = pages(spark, 4L * nGroups, "id % 4 != 0")
    val batch = pages(spark, 4L * batchGroups, "id % 4 = 0")
    val t0 = System.nanoTime()
    val baseCanon = CacheBin.persist(GeoPipeline.canonPartial(base))
    val nState = baseCanon.count()
    val baseReport = CacheBin.persist(GeoPipeline.reportOf(baseCanon))
    baseReport.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    val nBatch = batch.count()
    val s0 = shuffleBytes.get()
    val t1 = System.nanoTime()
    val folded = collectReport(
      GeoPipeline.incrementalReport(baseCanon, baseReport, batch))
    val foldSec = (System.nanoTime() - t1) / 1e9
    Thread.sleep(100) // listener bus drain
    val foldShufMb = (shuffleBytes.get() - s0) / 1e6
    // contrast: full recompute over base ∪ batch
    val t2 = System.nanoTime()
    val full = collectReport(GeoPipeline.reportOf(
      GeoPipeline.canonPartial(base.unionByName(batch))))
    val fullSec = (System.nanoTime() - t2) / 1e9
    CacheBin.drain()
    spark.stop()
    (buildSec, foldSec, fullSec, nState, nBatch, folded == full, foldShufMb)
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val groups = sys.env.getOrElse("SPARK_GRAFT_GROUPS", "2000000,8000000,32000000")
      .split(",").map(_.trim.toLong).toSeq
    val batchGroups = sys.env.getOrElse("SPARK_GRAFT_BATCH_GROUPS", "500000").toLong
    timed(cores, groups.head, batchGroups) // warmup
    val runs = groups.map { g =>
      val (b, f, o, ns, nb, ok, sm) = timed(cores, g, batchGroups)
      (g, b, f, o, ns, nb, ok, sm)
    }
    // N -> 4N on the largest corpus: fold throughput at cores/4 vs cores
    val (_, foldN, _, _, _, okN, _) = timed(cores / 4, groups.last, batchGroups)
    val fold4N = runs.last._3
    val eff = (foldN / fold4N) / 4.0
    val first = runs.head; val last = runs.last
    val pts = runs.map { case (g, b, f, o, ns, nb, ok, sm) =>
      f""""g$g":{"build_sec":$b%.2f,"fold_sec":$f%.2f,"full_sec":$o%.2f,"state_urls":$ns,"batch_docs":$nb,"match":$ok,"fold_shuffle_mb":$sm%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"geo_incremental_scale","points":$pts,""" +
      s""""corpus_ratio":${f"${last._5.toDouble / first._5}%.1f"},""" +
      s""""fold_sec_ratio":${f"${last._3 / first._3}%.2f"},""" +
      s""""fold_shuffle_ratio":${f"${last._8 / math.max(first._8, 1e-9)}%.2f"},""" +
      s""""all_match":${runs.forall(_._7) && okN},""" +
      s""""fold_eff_n_to_4n":${f"$eff%.3f"},"cpus":$cores}""")
  }
}
