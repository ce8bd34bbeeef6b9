package graft

import org.apache.spark.sql.functions._

/** Scaling evidence for the iterative PageRank path (north-rule N→4N on
  * one input): a multi-million-node synthetic link graph — the same
  * arithmetic degree-1..4 rule the oracle-gated q_pagerank uses, generated
  * as pure column math from range() so the input is identical and
  * perfectly balanced at any parallelism — runs 5 rank iterations at two
  * core counts. Rank-mass conservation (Σrank = 1) is the cross-level
  * correctness invariant; edge-iterations/sec is the scaling measure, with
  * stage shuffle-write MB recorded as the contention-immune volume check
  * (it must be identical across core counts — same exchanges, same rows).
  */
object ScaleGraph {

  def timed(cores: Int, n: Long, iters: Int): (Double, Long, Double, Double) = {
    val spark = Scale.makeSession(cores)
    val shuffleBytes = Scale.shuffleCounter(spark)
    val edges = spark.range(0L, n, 1L, cores * 2)
      .select(col("id").as("src"),
        explode(sequence(lit(0L), col("id") % 4)).as("j"))
      .select(col("src"),
        ((col("src") * 131L + lit(7L) * col("j")) % n).as("dst"))
    val nEdges = n / 4 * 10 + (n % 4) * (n % 4 + 1) / 2 // Σ(id%4+1)
    val s0 = shuffleBytes.get()
    val t0 = System.nanoTime()
    val mass = graft.ops.WebGraph.pageRank(edges, n, iters)
      .agg(sum("rank")).head().getDouble(0)
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(100) // listener bus drain
    val shufMb = (shuffleBytes.get() - s0) / 1e6
    CacheBin.drain()
    spark.stop()
    require(math.abs(mass - 1.0) < 1e-6, s"rank mass drifted: $mass")
    (sec, nEdges, nEdges.toDouble * iters / sec, shufMb)
  }

  def main(args: Array[String]): Unit = {
    // default sits in the regime where per-stage work dominates the fixed
    // driver cost (below ~10M edges the job is latency-bound on this host
    // and N→4N reads as the scheduler's floor, not the engine's scaling)
    val n = sys.env.getOrElse("SPARK_GRAFT_GRAPH_N", "16000000").toLong
    val iters = sys.env.getOrElse("SPARK_GRAFT_GRAPH_ITERS", "5").toInt
    val pair = sys.env.getOrElse("SPARK_GRAFT_PAIR", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    timed(pair.head, n / 8, iters) // warmup
    val runs = pair.map { c =>
      val (sec, ne, thr, shufMb) = Seq.fill(2)(timed(c, n, iters)).minBy(_._1)
      (c, sec, ne, thr, shufMb)
    }
    val thr = runs.map(r => r._1 -> r._4).toMap
    val eff = (thr(pair.last) / thr(pair.head)) / (pair.last.toDouble / pair.head)
    val pts = runs.map { case (c, sec, ne, t, sm) =>
      f""""local$c":{"sec":$sec%.2f,"edges":$ne,"edge_iters_per_sec":${t.round},"shuffle_mb":$sm%.1f}"""
    }.mkString("{", ",", "}")
    println(s"""{"job":"pagerank_scale","nodes":$n,"iters":$iters,"points":$pts,"eff_${pair.head}_to_${pair.last}":${f"$eff%.3f"}}""")
  }
}
