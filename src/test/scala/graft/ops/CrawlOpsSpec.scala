package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.dedup.Bloom

/** Blocked Bloom filter, mirror-host detection, and windowed crawl diff
  * vs independent plain-Scala replicas.
  */
class CrawlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // plain-JVM replica of the engine-wide md5-48 idiom (TextFns.hash48)
  private def h48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }
  private def bruteWord(k: String, nWords: Long): Long = h48(k + "|w") % nWords
  private def bruteMask(k: String): Long =
    (1L << (h48(k + "|b1") % Bloom.WordBits)) | (1L << (h48(k + "|b2") % Bloom.WordBits))

  private val corpusKeys = (0 until 200).map(i => s"key-$i")
  private val probeKeys = (0 until 400).map(i => s"key-$i") // half seen

  test("Bloom: zero false negatives, false positives bit-identical to replica") {
    val nWords = 8L
    val f = Bloom.build(corpusKeys.toDF("k"), "k", nWords)
    val got = Bloom.probe(f, probeKeys.toDF("k"), "k", nWords)
      .as[(String, Boolean)].collect().toMap

    val words = corpusKeys.groupBy(k => bruteWord(k, nWords))
      .map { case (w, ks) => w -> ks.map(bruteMask).reduce(_ | _) }
    probeKeys.foreach { k =>
      val m = bruteMask(k)
      val want = (words.getOrElse(bruteWord(k, nWords), 0L) & m) == m
      assert(got(k) === want, s"probe $k")
      if (k.drop(4).toInt < 200) assert(got(k), s"false negative on corpus key $k")
    }
    // the undersized filter must actually exercise the fp path
    val fps = probeKeys.count(k => got(k) && k.drop(4).toInt >= 200)
    assert(fps > 0, "test filter too large to exercise false positives")
  }

  test("Bloom: bit 62 and the sign bit never set (DuckDB shift safety)") {
    val bits = Bloom.build(corpusKeys.toDF("k"), "k", 2L)
      .select("bits").as[Long].collect()
    bits.foreach(b => assert((b & (3L << 62)) === 0L, s"high bits set in $b"))
  }

  test("mirrorHosts equals the brute-force pair count with the hot-content cap") {
    // 6 hosts; content c lives on hosts c%6 and (c+1)%6; content 99 is
    // boilerplate on ALL hosts and must fall to the cap
    val pages = ((0 until 60).flatMap { c =>
      Seq((s"h${c % 6}", s"c$c"), (s"h${(c + 1) % 6}", s"c$c"))
    } ++ (0 until 6).map(h => (s"h$h", "c99"))).toDF("host", "ck")

    val got = WebGraph.mirrorHosts(pages, "host", "ck",
        minShared = 1L, maxHostsPerContent = 5L)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap

    val hc = ((0 until 60).flatMap { c =>
      Seq((s"h${c % 6}", s"c$c"), (s"h${(c + 1) % 6}", s"c$c"))
    } ++ (0 until 6).map(h => (s"h$h", "c99"))).distinct
    val perHost = hc.groupBy(_._1).map { case (h, xs) => h -> xs.size.toLong }
    val okCk = hc.groupBy(_._2).filter(_._2.size <= 5).keySet
    val want = hc.filter(p => okCk(p._2)).groupBy(_._2).values
      .flatMap(xs => for (a <- xs; b <- xs if a._1 < b._1) yield (a._1, b._1))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    assert(got.keySet === want.keySet)
    want.foreach { case (p, shared) =>
      assert(got(p) === ((shared, perHost(p._1), perHost(p._2))), s"pair $p")
    }
    // the capped boilerplate content contributed to NO pair beyond `want`
    assert(!got.contains(("h0", "h3")) || want.contains(("h0", "h3")))
  }

  test("politenessSchedule: per-host spacing law and priority order") {
    val frontier = (0 until 60).map { i =>
      (s"u-${i % 7}-$i", s"host${i % 7}", (i * 13) % 20)
    }.toDF("url", "host", "prio")
    val got = UrlOps.politenessSchedule(frontier, "host", "url", "prio",
        startTs = 5000L, delaySec = 3L)
      .as[(String, String, Int, Long, Long)].collect()
    got.groupBy(_._2).foreach { case (host, rows) =>
      val byslot = rows.sortBy(_._4)
      // slots are 0..n-1 dense and fetch times delaySec apart
      assert(byslot.map(_._4).toSeq === byslot.indices.map(_.toLong))
      assert(byslot.map(_._5).toSeq === byslot.indices.map(i => 5000L + i * 3L))
      // priority order: descending prio, ties by url ascending
      val want = rows.sortBy(r => (-r._3, r._1)).map(_._1).toSeq
      assert(byslot.map(_._1).toSeq === want, s"host $host order")
    }
    // determinism at different parallelism
    val again = UrlOps.politenessSchedule(frontier.repartition(7), "host",
        "url", "prio", 5000L, 3L)
      .as[(String, String, Int, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === got.sortBy(_._1).toSeq)
  }

  test("crawlDiff: every status reachable and equal to the two-snapshot join") {
    val snaps = (0 until 40).flatMap { id =>
      (0L to id % 4).map { k =>
        (s"u$id", 1000L + (k + (id % 2) * 2) * 100L, s"v${(id % 3 + k) / 4}")
      }
    }
    val (t0, t1, t2) = (1000L, 1100L, 1300L)
    val got = UrlOps.crawlDiff(snaps.toDF("url", "ts", "rev"),
        "url", "ts", "rev", t0, t1, t2)
      .as[(String, Option[String], Option[String], String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    def latest(id: Int, lo: Long, hi: Long): Option[String] =
      snaps.filter(s => s._1 == s"u$id" && s._2 > lo && s._2 <= hi)
        .sortBy(_._2).lastOption.map(_._3)
    (0 until 40).foreach { id =>
      val r1 = latest(id, t0 - 1, t1) // [t0, t1]
      val r2 = latest(id, t1, t2) // (t1, t2]
      val want = (r1, r2) match {
        case (None, None) => None
        case (None, _) => Some("new")
        case (_, None) => Some("removed")
        case (a, b) if a == b => Some("unchanged")
        case _ => Some("changed")
      }
      want match {
        case None => assert(!got.contains(s"u$id"), s"u$id should be absent")
        case Some(st) => assert(got(s"u$id") === ((r1, r2, st)), s"u$id")
      }
    }
    val statuses = got.values.map(_._3).toSet
    assert(statuses === Set("new", "removed", "changed", "unchanged"),
      s"synthesis must exercise all four statuses, got $statuses")
  }
}
