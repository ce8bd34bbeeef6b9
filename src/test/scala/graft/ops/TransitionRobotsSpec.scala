package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Temporal.transitionMatrix + UrlOps.robotsFilter. */
class TransitionMatrixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("transition counts and probabilities match a hand-walked stream") {
    import spark.implicits._
    // user 1: a b a b  -> (a,b)x2 (b,a)x1 ; user 2: a a c -> (a,a) (a,c)
    val e = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"), (1L, 40L, 4L, "b"),
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "a"), (2L, 30L, 7L, "c"))
      .toDF("user_id", "ts_s", "event_id", "event_type")
    val got = Temporal.transitionMatrix(e, "user_id", "ts_s", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got === Map(
      ("a", "b") -> (2L, 0.5), ("a", "a") -> (1L, 0.25), ("a", "c") -> (1L, 0.25),
      ("b", "a") -> (1L, 1.0)))
  }

  test("ties on ts order by the tiebreak column; streams never cross users") {
    import spark.implicits._
    // same ts: event_id orders c before d; user boundary yields no (d, x)
    val e = Seq(
      (1L, 10L, 1L, "c"), (1L, 10L, 2L, "d"),
      (2L, 10L, 3L, "x"))
      .toDF("user_id", "ts_s", "event_id", "event_type")
    val got = Temporal.transitionMatrix(e, "user_id", "ts_s", "event_id", "event_type")
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === Set(("c", "d", 1L, 1.0)))
  }
}

class RobotsFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("longest prefix wins; no match defaults to allowed (RFC 9309 order)") {
    import spark.implicits._
    val rules = Seq(
      ("h1", "/a", false), ("h1", "/a/b", true), ("h1", "/c", false),
      ("h2", "/a", true))
      .toDF("host", "prefix", "allow")
    val urls = Seq(
      (1L, "h1", "/a/b/c"),   // /a disallows, /a/b overrides -> allowed
      (2L, "h1", "/a/x"),     // only /a matches -> disallowed
      (3L, "h1", "/c"),       // exact match -> disallowed
      (4L, "h1", "/z/q"),     // no rule -> allowed, null prefix
      (5L, "h2", "/a/b/c"),   // other host's rules must not leak
      (6L, "h3", "/a"))       // host with no rules at all -> allowed
      .toDF("id", "host", "path")
    val got = UrlOps.robotsFilter(urls, rules)
      .select("id", "matched_prefix", "allowed")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getBoolean(2))).toMap
    assert(got === Map(
      1L -> (Some("/a/b"), true),
      2L -> (Some("/a"), false),
      3L -> (Some("/c"), false),
      4L -> (None, true),
      5L -> (Some("/a"), true),
      6L -> (None, true)))
  }

  test("RFC 9309 byte-prefix semantics: /a matches /ab, /admin/ matches inside") {
    import spark.implicits._
    val rules = Seq(("h", "/a", false), ("h", "/admin/", false),
      ("h", "/priv", false)).toDF("host", "prefix", "allow")
    val urls = Seq(
      (1L, "h", "/ab/c"),          // byte prefix: /a matches /ab
      (2L, "h", "/a/c"),           // and the segment-aligned case
      (3L, "h", "/admin/secret"),  // trailing-slash rule matches inside
      (4L, "h", "/private/x"),     // mid-segment rule matches
      (5L, "h", "/b"))             // nothing matches
      .toDF("id", "host", "path")
    val got = UrlOps.robotsFilter(urls, rules)
      .select("id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> false,
      4L -> false, 5L -> true))
  }
}
