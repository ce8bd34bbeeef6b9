package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Temporal family vs independent JVM brute force: the as-of window
  * carry-forward must equal a per-probe linear scan of the history, the
  * tiled range join must equal the bare inequality join (exactly once per
  * pair), and sessionization must equal a sequential gap walk.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- as-of -------------------------------------------------------------
  private val snaps = Seq( // (key, ts, rev)
    ("a", 100L, "a0"), ("a", 200L, "a1"), ("a", 300L, "a2"),
    ("b", 150L, "b0"),
    ("c", 999L, "c0"))
  private val probes = Seq( // (key, qts) — before-first, exact-hit, between, after-last
    ("a", 99L), ("a", 100L), ("a", 250L), ("a", 301L),
    ("b", 150L), ("b", 149L),
    ("c", 5L),
    ("d", 500L)) // key with no history at all

  private def bruteAsof(key: String, qts: Long): Option[(Long, String)] =
    snaps.filter(s => s._1 == key && s._2 <= qts)
      .sortBy(_._2).lastOption.map(s => (s._2, s._3))

  test("asofJoin equals the per-probe linear scan on every boundary shape") {
    val got = Temporal.asofJoin(
        probes.toDF("key", "qts"), snaps.toDF("key", "ts", "rev"),
        "key", "qts", "ts", Seq("rev"))
      .select("key", "qts", "asof_ts", "rev")
      .as[(String, Long, Option[Long], Option[String])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size === probes.size) // every probe survives, matched or not
    probes.foreach { case (k, q) =>
      val want = bruteAsof(k, q)
      assert(got((k, q)) === (want.map(_._1), want.map(_._2)), s"probe ($k,$q)")
    }
  }

  test("asofJoin keeps extra probe columns and multiple payload columns") {
    val p = Seq(("a", 250L, 7)).toDF("key", "qts", "tag")
    val s2 = Seq(("a", 200L, "a1", 41), ("a", 300L, "a2", 42))
      .toDF("key", "ts", "rev", "size")
    val row = Temporal.asofJoin(p, s2, "key", "qts", "ts", Seq("rev", "size"))
      .select("key", "qts", "tag", "rev", "size", "asof_ts")
      .as[(String, Long, Int, String, Int, Long)].collect().toSeq
    assert(row === Seq(("a", 250L, 7, "a1", 41, 200L)))
  }

  // ---- range join ---------------------------------------------------------
  test("rangeJoin equals the inequality join, each pair exactly once") {
    // intervals straddling bucket boundaries (bucket=100), nested, and
    // degenerate (end <= start)
    val ivs = Seq((1L, 50L, 250L), (2L, 90L, 110L), (3L, 100L, 101L),
      (4L, 300L, 300L), (5L, 400L, 350L), (6L, 120L, 180L))
    val pts = (0L until 50L).map(i => (i, i * 9L)) // ts 0..441
    val got = Temporal.rangeJoin(
        pts.toDF("pid", "ts"), "ts", ivs.toDF("iid", "lo", "hi"), "lo", "hi", 100L)
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
    val want = (for {
      (iid, lo, hi) <- ivs; (pid, ts) <- pts
      if ts >= lo && ts < hi
    } yield (iid, pid)).sorted
    assert(got === want)               // no pair missed, none duplicated
    assert(!got.exists(p => p._1 == 4L || p._1 == 5L)) // degenerate → nothing
  }

  // ---- sessionize ----------------------------------------------------------
  test("sessionize equals the sequential gap walk; gap == threshold stays in-session") {
    val ev = Seq( // (user, eid, ts)
      (1L, 1L, 0L), (1L, 2L, 30L), (1L, 3L, 31L), // gap 30 == thr → same session
      (1L, 4L, 62L),                              // gap 31 > thr → new session
      (1L, 5L, 62L),                              // tie ts, eid orders it
      (2L, 6L, 1000L))
    val got = Temporal.sessionize(ev.toDF("user", "eid", "ts"), "user", "ts", "eid", 30L)
      .select("user", "eid", "session_no")
      .as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    // brute: per-user walk in (ts, eid) order
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var sess = 0L; var prev = Long.MinValue
      ordered.map { case (_, eid, ts) =>
        if (prev == Long.MinValue || ts - prev > 30L) sess += 1
        prev = ts; (u, eid, sess)
      }
    }.sortBy(_._2)
    assert(got === want)
  }
}
