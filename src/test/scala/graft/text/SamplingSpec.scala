package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // independent JVM bucket computation (same as the splitBucket parity test)
  private def bucketOf(id: Long): Long = TestSpark.md5Bucket(id)

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, 5L + i % 13)).toDF("doc_id", "n_tokens")
  }

  private def bruteKeep(n: Int, budget: Long): Set[Long] = {
    val ordered = (0 until n).map(i => (i.toLong, 5L + i % 13))
      .sortBy { case (id, _) => (bucketOf(id), id) }
    var cum = 0L
    ordered.flatMap { case (id, t) =>
      val keep = cum < budget; cum += t; if (keep) Some(id) else None
    }.toSet
  }

  test("tokenBudgetSample equals the global-window brute force") {
    import spark.implicits._
    val n = 500
    val total = (0 until n).map(i => 5L + i % 13).sum
    for (budget <- Seq(0L, 1L, total / 3, total / 2, total - 1, total, total + 100)) {
      val got = Sampling.tokenBudgetSample(corpus(n), "doc_id", col("n_tokens"), budget)
        .select("doc_id").as[Long].collect().toSet
      assert(got === bruteKeep(n, budget), s"budget=$budget")
    }
  }

  test("kept set is a prefix of the (bucket, id) order and respects the budget") {
    import spark.implicits._
    val n = 500
    val total = (0 until n).map(i => 5L + i % 13).sum
    val budget = total / 3
    val kept = Sampling.tokenBudgetSample(corpus(n), "doc_id", col("n_tokens"), budget)
      .as[(Long, Long)].collect().toMap
    val ordered = (0 until n).map(_.toLong).sortBy(id => (bucketOf(id), id))
    // contiguity: once a doc is dropped, everything after it is dropped
    val flags = ordered.map(kept.contains)
    assert(flags.indexOf(false) === flags.lastIndexOf(true) + 1)
    // budget law: total kept < budget + max doc size; prior of last kept < budget
    val keptTokens = kept.values.sum
    assert(keptTokens - kept(ordered(flags.lastIndexOf(true))) < budget)
    assert(keptTokens >= budget || kept.size === n)
  }

  test("tokenBudgetFraction(1,3) equals the fixed-budget form at total/3") {
    import spark.implicits._
    val n = 500
    val total = (0 until n).map(i => 5L + i % 13).sum
    val viaFraction = Sampling.tokenBudgetFraction(corpus(n), "doc_id",
      col("n_tokens"), 1, 3).select("doc_id").as[Long].collect().toSet
    assert(viaFraction === bruteKeep(n, total / 3))
    // guards: fractions above 1 and non-positive denominators are refused
    for ((num, den) <- Seq((4L, 3L), (1L, 0L), (-1L, 3L)))
      intercept[IllegalArgumentException] {
        Sampling.tokenBudgetFraction(corpus(5), "doc_id", col("n_tokens"), num, den)
      }
  }

  test("a NULL document id fails loudly in phase 1, not as an NPE") {
    import spark.implicits._
    val docs = Seq((Some(1L), 5L), (None, 7L), (Some(3L), 2L))
      .toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(docs, "doc_id", col("n_tokens"), 10L)
    }
    assert(e.getMessage.contains("non-null"))
  }

  test("zero-token docs at an exact bucket-edge budget match the global rule") {
    import spark.implicits._
    // doc tokens: 0 for even ids, 3 for odd — zero-token docs can land
    // exactly AT the budget, where the <= full-bucket shortcut would
    // wrongly keep them; the min-token guard must route that bucket
    // through the window instead
    val n = 200
    val docs = (0 until n).map(i => (i.toLong, if (i % 2 == 0) 0L else 3L))
      .toDF("doc_id", "n_tokens")
    val ordered = (0 until n).map(i => (i.toLong, if (i % 2 == 0) 0L else 3L))
      .sortBy { case (id, _) => (bucketOf(id), id) }
    def brute(budget: Long): Set[Long] = {
      var cum = 0L
      ordered.flatMap { case (id, t) =>
        val keep = cum < budget; cum += t; if (keep) Some(id) else None
      }.toSet
    }
    // budgets landing exactly on each bucket's cumulative edge, plus odd cuts
    val byBucket = ordered.groupBy { case (id, _) => bucketOf(id) }
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val edges = byBucket.scanLeft(0L)(_ + _._2).drop(1)
    for (budget <- edges.take(5) ++ Seq(1L, 4L, 7L)) {
      val got = Sampling.tokenBudgetSample(docs, "doc_id", col("n_tokens"), budget)
        .select("doc_id").as[Long].collect().toSet
      assert(got === brute(budget), s"budget=$budget")
    }
  }

  test("domainMix equals the integer-arithmetic brute force, binding domain kept whole") {
    import spark.implicits._
    def bpOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest((id.toString + "mix").getBytes("UTF-8"))
      h.take(6).foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL)) % 10000
    }
    val domains = Seq("en", "de", "zh")
    val rows = (0 until 300).map(i => (i.toLong, domains(i % 3), 5L + i % 13))
    val docs = rows.toDF("doc_id", "lang", "n_tokens")
    val targets = Map("en" -> 6000L, "de" -> 3000L, "zh" -> 1000L)

    val dt = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val stot = domains.map(d => dt(d) * 10000L / targets(d)).min
    val thr = domains.map(d =>
      d -> (targets(d) * stot / 10000L) * 10000L / dt(d)).toMap
    val expect = rows.filter { case (id, d, _) => bpOf(id) < thr(d) }
      .map { case (id, d, t) => (id, d, t) }.toSet

    val got = Sampling.domainMix(docs, "doc_id", "lang", col("n_tokens"), targets)
      .as[(Long, String, Long)].collect().toSet
    assert(got === expect)
    // natural shares are ~equal, so the domain scarcest RELATIVE to its
    // target is en (60% target vs ~33% natural) -> binding: kept ~whole
    // (threshold within floor-rounding of 10000)
    val binding = domains.minBy(d => dt(d) * 10000L / targets(d))
    assert(binding === "en" && thr(binding) >= 9900)
    val keptTok = got.toSeq.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(keptTok(binding) >= dt(binding) * 99 / 100)
    // non-binding domains are genuinely downsampled
    assert(domains.filterNot(_ == binding)
      .forall(d => keptTok.getOrElse(d, 0L) < dt(d)))

    val bad = intercept[IllegalArgumentException] {
      Sampling.domainMix(docs, "doc_id", "lang", col("n_tokens"),
        Map("en" -> 5000L, "de" -> 3000L))
    }
    assert(bad.getMessage.contains("10000"))
  }

  test("a bucket-aligned budget skips the window phase entirely") {
    import spark.implicits._
    val n = 500
    // cumulative totals in bucket order; pick the boundary after ~1/3
    val byBucket = (0 until n).map(i => (bucketOf(i.toLong), 5L + i % 13))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val total = byBucket.map(_._2).sum
    val budget = byBucket.scanLeft(0L)(_ + _._2).drop(1).find(_ >= total / 3).get
    val df = Sampling.tokenBudgetSample(corpus(n), "doc_id", col("n_tokens"), budget)
    // phase structure: no boundary bucket -> the plan contains NO window sort
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    assert(df.select("doc_id").as[Long].collect().toSet === bruteKeep(n, budget))
  }

  test("globalIndex is the contiguous (bucket, id) rank; corpus window is bucket-partitioned") {
    import spark.implicits._
    val n = 700
    val docs = (0 until n).map(_.toLong).toDF("doc_id")
    val df = Sampling.globalIndex(docs, "doc_id")
    val got = df.as[(Long, Long)].collect().toMap
    val expected = (0 until n).map(_.toLong).sortBy(id => (bucketOf(id), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(got === expected)
    // plan shape: the ranking window over the corpus is PARTITIONED by
    // bucket (windowspecdefinition(bucket, doc_id ASC ...)); no window
    // orders the raw corpus globally (windowspecdefinition(doc_id ASC ...)
    // must not appear — that's the single-partition anti-pattern this op
    // exists to avoid; the one unpartitioned window runs over the bounded
    // 100-row bucket-count aggregate only)
    val plan = df.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(bucket#\\d+L?, doc_id#\\d+L? ASC".r
      .findFirstIn(plan).isDefined, plan.take(2000))
    assert("windowspecdefinition\\(doc_id#\\d+L? ASC".r
      .findFirstIn(plan).isEmpty, plan.take(2000))
  }

  test("stratifiedSample = k smallest salted hashes per stratum; small strata kept whole") {
    import spark.implicits._
    def saltedH(id: Long): Long =
      java.lang.Long.parseLong(graft.TestSpark.md5Hex(s"$id:strat").take(12), 16)
    // 3 strata: two big (300/195 docs), one SMALLER than k (5 docs)
    val docs = (0L until 500L).map { i =>
      val s = if (i < 300) "en" else if (i < 495) "de" else "tiny"
      (i, s)
    }.toDF("doc_id", "lang")
    val k = 20
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang", k)
      .as[(Long, String, Long)].collect()
    val byStratum = (0L until 500L).groupBy(i =>
      if (i < 300) "en" else if (i < 495) "de" else "tiny")
    byStratum.foreach { case (s, ids) =>
      val exp = ids.sortBy(id => (saltedH(id), id)).take(k)
        .zipWithIndex.map { case (id, i) => (id, s, i + 1L) }
      assert(got.filter(_._2 == s).sortBy(_._3).toSeq === exp, s"stratum=$s")
    }
    assert(got.count(_._2 == "tiny") === 5)
  }
}
