package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** URL canonicalization / blocklist collapse / line cleanup / shard
  * shuffle, checked against independent JVM brute-force reimplementations
  * (no Spark expressions on the expected side). */
class WebCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- independent url synthesis + normalization ----------------------
  private def messy(page: Long, noise: Long): String = {
    val scheme = if (noise % 2 == 0) "https" else "HTTPS"
    val host = (if (noise % 3 == 0) "H" else "h") + (page % 16) + ".Example"
    val port = if (noise % 4 == 0) ":443" else ""
    val query = s"?utm_source=s${noise % 3}&id=${page % 7}&ref=r${noise % 2}"
    val frag = if (noise % 5 != 0) s"#sec${noise % 5}" else ""
    s"$scheme://$host$port/Doc/$page$query$frag"
  }

  private def normalize(u: String): String = {
    val noFrag = u.takeWhile(_ != '#')
    val m = "^[A-Za-z]+://[^/?#]*".r.findFirstIn(noFrag).getOrElse("")
    val rest = noFrag.drop(m.length)
    val pre = m.toLowerCase.replaceAll(":443$", "")
    val path = rest.takeWhile(_ != '?')
    val q = rest.drop(path.length).stripPrefix("?")
    val kept = q.split("&", -1).filterNot(_.matches("^(utm_[^=]*|ref)=.*"))
      .filter(_ => q.nonEmpty)
    pre + path + (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  test("normalize matches the independent implementation on every noise shape") {
    import spark.implicits._
    val ids = (0L until 240L)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), UrlOps.normalize(
        UrlOps.messyUrl(col("doc_id"), col("doc_id"))).as("n"))
      .as[(Long, String)].collect().toMap
    ids.foreach { i =>
      assert(got(i) === normalize(messy(i, i)), s"id=$i raw=${messy(i, i)}")
    }
  }

  test("normalization canonical laws: lowercase authority, no frag/port/tracking, path case kept") {
    (0L until 240L).foreach { i =>
      val n = normalize(messy(i, i))
      assert(!n.contains("#") && !n.contains(":443") && !n.contains("utm_") && !n.contains("ref="))
      assert(n.startsWith("https://h"))
      assert(n.contains("/Doc/"), "path case must be preserved")
      assert(n.contains(s"?id=${i % 7}"), "non-tracking param survives")
    }
  }

  test("filterAndCollapse: 4 spellings collapse to 1, blocked hosts dropped, counts conserved") {
    import spark.implicits._
    val n = 480L
    val pages = (0L until n).toDF("doc_id")
      .select(col("doc_id"), UrlOps.normalize(UrlOps.messyUrl(
        expr("doc_id div 4"), col("doc_id"))).as("url_norm"))
    val out = UrlOps.filterAndCollapse(pages, "doc_id", "url_norm")
      .as[(String, Long, Long)].collect()
    // expected: page identities 0..119, host = page%16, blocked 3/7/11
    val expected = (0L until n / 4).filterNot(p => Seq(3L, 7L, 11L).contains(p % 16))
    assert(out.length === expected.size)
    out.foreach { case (url, canon, dups) =>
      assert(dups === 4L, url)              // every canonical page had 4 spellings
      assert(canon % 4 === 0L, url)         // survivor = min doc_id of the group
    }
    // exact canonical forms: canonicalization is noise-invariant, so
    // normalize() of ANY spelling in the group is the canonical url
    val gotUrls = out.map(_._1).toSet
    val expUrls = expected.map(p => normalize(messy(p, 4 * p))).toSet
    assert(gotUrls === expUrls)
  }

  // ---- line cleanup ----------------------------------------------------
  private def cleanLines(text: String, w: Int): (Long, Long, String) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val lines = toks.grouped(w).filter(_.length == w).map(_.mkString(" ")).toSeq
    val kept = lines.filterNot(l => s" $l ".contains(" dup "))
    (lines.size.toLong, kept.size.toLong, kept.mkString("\n"))
  }

  test("line cleanup matches brute force incl. short docs and all-dropped docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),             // 2 full lines
      (2L, "a b c d e f g h i"),               // ragged tail dropped
      (3L, "x dup c d e f g h i j"),           // first line dropped
      (4L, "dup a b c dup"),                   // single line dropped -> empty
      (5L, "a b c"),                           // no full line at all
      (6L, "duplicate b c d e"),               // 'dup' as substring only: kept
      (7L, "")
    ).toDF("doc_id", "text")
    val ls = graft.text.TextFns.fixedLines(col("text"), 5)
    val kept = filter(ls, l => !concat(lit(" "), l, lit(" ")).contains(" dup "))
    val got = docs.select(col("doc_id"), size(ls).cast("long"),
        size(kept).cast("long"), array_join(kept, "\n"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    Seq(1L -> "a b c d e f g h i j", 2L -> "a b c d e f g h i",
      3L -> "x dup c d e f g h i j", 4L -> "dup a b c dup", 5L -> "a b c",
      6L -> "duplicate b c d e", 7L -> "").foreach { case (id, txt) =>
      assert(got(id) === cleanLines(txt, 5), s"doc=$id")
    }
    assert(got(4L)._3 === "")
    assert(got(6L)._2 === 1L)
  }

  // ---- shard shuffle ---------------------------------------------------
  test("shardShuffle: positions are 1..|shard| in salted-hash order; permutation is total") {
    import spark.implicits._
    val n = 500
    val docs = (0 until n).map(_.toLong).toDF("doc_id")
    val got = graft.text.Sampling.shardShuffle(docs, "doc_id", 8)
      .as[(Long, Long, Long)].collect()
    assert(got.length === n)
    def h48(id: Long): Long =
      java.lang.Long.parseLong(TestSpark.md5Hex(s"$id:shard").take(12), 16)
    val expected = (0 until n).map(_.toLong).groupBy(id => h48(id) % 8)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val exp = expected(shard).sortBy(id => (h48(id), id))
      assert(rows.sortBy(_._3).map(_._1).toSeq === exp, s"shard=$shard")
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length.toLong), s"shard=$shard")
    }
    // independence from the split bucket: the shard hash is salted, so it
    // must NOT equal the unsalted split coordinate's mod-8
    val unsalted = (0 until n).count(i => TestSpark.md5Bucket(i.toLong) % 8 ==
      got.find(_._1 == i.toLong).get._2)
    assert(unsalted < n / 4, "salted shard must decorrelate from splitBucket")
  }
}
