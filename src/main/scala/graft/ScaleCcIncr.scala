package graft

import org.apache.spark.sql.functions._

/** Scale evidence for incremental component maintenance
  * (Adjacency.incrementalComponents): on one multi-million-edge graph,
  * labeling the base ONCE and folding in a small edge delta must cost a
  * small fraction of re-solving the union from scratch — the property
  * that makes daily crawl-delta ingestion affordable at 10^12 edges.
  *
  * The base graph is BLOCK-LOCAL power edges (3 per node inside each
  * 64-node block → n/64 components), so the delta does real merge work:
  * cross-block edges from every `holdout`-th node of each EVEN block to
  * the next block collapse component PAIRS — the contracted graph the
  * incremental pass solves has n/64 supernodes, 64× smaller than the
  * corpus, while the full recompute re-walks all ~3n edges. (A ring
  * graph would be degenerate here: one giant component, every delta
  * edge intra-component, checksum identically 0.) Correctness gate: the
  * label checksum of the incremental result must EQUAL the from-scratch
  * labeling of the union — bit-identity, not wall-clock, is the first
  * claim.
  */
object ScaleCcIncr {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CCINCR_N", "4000000").toLong
    val holdout = sys.env.getOrElse("SPARK_GRAFT_CCINCR_HOLDOUT", "100").toInt
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Scale.makeSession(cores)
    spark.sparkContext.setLogLevel("WARN")
    def clock[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val blk = 64L
    val ids = spark.range(0L, n, 1L, cores * 2)
    // 3 power edges per node, confined to the node's 64-id block
    val base = ids
      .select(col("id").as("a"), explode(sequence(lit(0L), lit(2L))).as("j"))
      .select(col("a"),
        (col("a") - col("a") % blk +
          (col("a") * 131L + lit(7L) * col("j")) % blk).as("b"))
    // cross-block merges: every holdout-th node of each EVEN block links
    // one block ahead -> component pairs collapse, odd->even stay apart
    val delta = ids
      .where(col("id") % holdout === 0 &&
        col("id") % (2L * blk) < blk && col("id") + blk < n)
      .select(col("id").as("a"), (col("id") + blk).as("b"))
    val all = base.unionByName(delta)
    val verts = ids.select(col("id").as("bid"))
    def checksum(labels: org.apache.spark.sql.DataFrame): Long = labels
      .agg(sum(col("bid") * col("comp") % 1000003L)).head().getLong(0)

    // base labeling (the once-per-corpus cost)
    val (labels, baseSec) = clock {
      val l = graft.ops.Adjacency.connectedComponents(verts, base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      l.count(); l
    }
    // incremental fold of the delta
    val ((incChk, nDelta), incSec) = clock {
      val r = graft.ops.Adjacency.incrementalComponents(labels, delta)
      (checksum(r), delta.count())
    }
    CacheBin.drain()
    labels.unpersist()
    // from-scratch union recompute (what the incremental path avoids)
    val (fullChk, fullSec) = clock(
      checksum(graft.ops.Adjacency.connectedComponents(verts, all)))
    CacheBin.drain()
    require(incChk == fullChk,
      s"incremental checksum $incChk != full recompute $fullChk")
    println(s"""{"job":"cc_incremental_scale","nodes":$n,""" +
      s""""delta_edges":$nDelta,"holdout":$holdout,"cores":$cores,""" +
      s""""base_label_sec":${f"$baseSec%.2f"},"incr_sec":${f"$incSec%.2f"},""" +
      s""""full_recompute_sec":${f"$fullSec%.2f"},""" +
      s""""speedup_vs_full":${f"${fullSec / incSec}%.2f"},""" +
      s""""checksum":$incChk}""")
    spark.stop()
  }
}
