package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** WebGraph.triangleCounts (degree-ordered orientation) and
  * Sampling.weightedSample (sequential Poisson priorities). */
class TriangleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val got = WebGraph.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    graft.CacheBin.drain()
    got
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tri = for {
      x <- vs; y <- vs if y > x && e((x, y))
      z <- vs if z > y && e((y, z)) && e((x, z))
    } yield (x, y, z)
    tri.flatMap(t => Seq(t._1, t._2, t._3)).groupBy(identity)
      .map { case (v, l) => v -> l.size.toLong }
  }

  test("K5: every vertex in C(4,2)=6 triangles; directed/multi/loop input normalized") {
    val k5 = for (a <- 0L until 5L; b <- 0L until 5L if a != b) yield (a, b)
    // full directed both ways + self loops + duplicates -> simple support is K5
    val noisy = k5 ++ Seq((0L, 0L), (3L, 3L)) ++ k5
    val got = counts(noisy)
    assert(got === (0L until 5L).map(_ -> 6L).toMap)
  }

  test("star has no triangles; wheel puts the hub in every one") {
    val star = (1L to 12L).map(i => (0L, i))
    assert(counts(star) === Map.empty)
    // wheel: hub 0 + cycle 1..12 — hub is in all 12 triangles, rim in 3? no:
    // rim vertex i is in triangles (0,i-1,i) and (0,i,i+1) = 2 each
    val rim = (1L to 12L).map(i => (i, if (i == 12L) 1L else i + 1))
    val got = counts(star ++ rim)
    assert(got(0L) === 12L)
    assert((1L to 12L).forall(got(_) === 2L))
  }

  test("triangleCounts == scala brute force on the mixed synthetic rule") {
    val n = 60L
    val pow = for (i <- 0L until n; j <- 0L to i % 4) yield (i, (i * 131 + 7 * j) % n)
    val ring = (0L until n).flatMap(i => Seq((i, (i + 1) % n), (i, (i + 2) % n)))
    val edges = pow ++ ring
    assert(counts(edges) === brute(edges))
  }
}

class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.text.{Sampling, TextFns}

  test("weightedSample == full-sort top-k by h/w priority, per stratum") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "stratum")
    val k = 10
    val got = Sampling.weightedSample(docs, "doc_id", "stratum",
        (col("doc_id") % 9 + 1).cast("double"), k)
      .select("doc_id", "stratum", "pos").as[(Long, String, Long)]
      .collect().toSet
    graft.CacheBin.drain()
    // brute: same md5-48 hash, same division, full sort
    val full = docs.select(col("doc_id"), col("stratum"),
        (TextFns.hash48(concat(col("doc_id").cast("string"), lit(":wsamp")))
          .cast("double") / (col("doc_id") % 9 + 1).cast("double")).as("prio"))
      .as[(Long, String, Double)].collect()
    val brute = full.groupBy(_._2).toSeq.flatMap { case (st, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(k).zipWithIndex
        .map { case (r, i) => (r._1, st, (i + 1).toLong) }.toSeq
    }.toSet
    assert(got === brute)
  }

  test("weight dominance: an overwhelming weight always ranks first") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, "all")).toDF("doc_id", "stratum")
    val got = Sampling.weightedSample(docs, "doc_id", "stratum",
        when(col("doc_id") === 42L, lit(1e12)).otherwise(lit(1.0)), 5)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    graft.CacheBin.drain()
    assert(got(42L) === 1L, s"the 1e12-weight doc must rank first: $got")
  }

  test("sampled mass skews toward weight (inclusion ∝ w sanity)") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, "x")).toDF("doc_id", "stratum")
    val got = Sampling.weightedSample(docs, "doc_id", "stratum",
        (col("doc_id") % 9 + 1).cast("double"), 50)
      .select("w").as[Double].collect()
    graft.CacheBin.drain()
    val corpusAvg = (0L until 500L).map(_ % 9 + 1).sum.toDouble / 500
    val sampleAvg = got.sum / got.length
    assert(sampleAvg > corpusAvg,
      f"weighted sample must over-represent heavy docs: $sampleAvg%.2f vs $corpusAvg%.2f")
  }
}

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    WebGraph.kCore(edges.toDF("src", "dst"), k)
      .as[(Long, Long)].collect().toMap
  }

  test("pendant chain peels CASCADING, clique survives (k=2)") {
    // triangle 0-1-2 plus a chain 2-10-11-12: at k=2 the chain melts one
    // vertex per round (12 first, then 11, then 10) — 3 peel rounds —
    // while the triangle is the stable 2-core
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 10L), (10L, 11L), (11L, 12L))
    assert(core(edges, 2) === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("k above the max degree empties the core") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    assert(core(edges, 3) === Map.empty)
  }

  test("kCore == scala brute peel on the mixed synthetic rule (k=6 and the empty k=7)") {
    val n = 120L
    val pow = for (i <- 0L until n; j <- 0L to i % 4) yield (i, (i * 131 + 7 * j) % n)
    val ring = (0L until n).flatMap(i => Seq((i, (i + 1) % n), (i, (i + 2) % n)))
    val edges = pow ++ ring
    def brutePeel(k: Int): Map[Long, Long] = {
      var es = edges.filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      var stable = false
      while (!stable) {
        val deg = es.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
          .map { case (v, l) => v -> l.size }
        val keep = deg.filter(_._2 >= k).keySet
        val nxt = es.filter(p => keep(p._1) && keep(p._2))
        stable = nxt == es
        es = nxt
      }
      es.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (v, l) => v -> l.size.toLong }
    }
    val expect6 = brutePeel(6)
    assert(expect6.nonEmpty)
    assert(core(edges, 6) === expect6)
    // at this size the 7-core melts COMPLETELY through the cascade — both
    // engines must agree on empty, not just on happy cores
    assert(brutePeel(7) === Map.empty)
    assert(core(edges, 7) === Map.empty)
  }
}

class BfsDepthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("multi-source BFS: min depth wins, direction respected, unreachable absent") {
    // 0 -> 1 -> 2 -> 3 ; seed {0, 3}; 4 -> 0 (upstream of seed: unreachable);
    // 5 isolated; 3 -> 1 shortcut does not shorten 1 (already depth 1 from 0)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 0L), (3L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(0L, 3L).toDF("v")
    val got = WebGraph.bfsDepth(edges, seeds)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 3L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("cycles terminate; maxRounds == true eccentricity is ENOUGH (no off-by-one)") {
    // directed 6-cycle from one seed: depths 0..5. maxRounds = 5 is the
    // exact eccentricity — the final empty-frontier confirm must not
    // demand a 6th round (the mercy probe settles it)
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val got = WebGraph.bfsDepth(edges, Seq(0L).toDF("v"), maxRounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(got === (0L until 6L).map(i => i -> i).toMap)
  }

  test("maxRounds guard fails loudly on a frontier that cannot settle in time") {
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      WebGraph.bfsDepth(edges, Seq(0L).toDF("v"), maxRounds = 3).count()
    }
    assert(ex.getMessage.contains("frontier still live"))
  }
}

class TrustRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trust flows FROM seeds and decays; spam linking TO a seed gets none") {
    // cycle 0->1->2->0 with seed {0}; node 3 links INTO the seed cluster
    // but nothing links to it — classic spam shape: it must score 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val got = graft.ops.WebGraph.trustRank(edges, 4L, Seq(0L).toDF("v"), iters = 2)
      .as[(Long, Double)].collect().toMap
    graft.CacheBin.drain()
    assert(got(3L) === 0.0)
    assert(math.abs(got(0L) - 0.15) < 1e-12)           // tele only (2 hops short)
    assert(math.abs(got(1L) - 0.85 * 0.15) < 1e-12)    // seed's iter-1 tele forwarded
    assert(math.abs(got(2L) - 0.85 * 0.85) < 1e-12)    // the initial unit, twice damped
    // mass conservation: no dangling nodes, so sum(rank) stays 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("empty seed set fails loudly") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.WebGraph.trustRank(edges, 2L, Seq.empty[Long].toDF("v"), 1)
    }
    assert(ex.getMessage.contains("seed"))
  }
}
