package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(pages: Seq[(Long, String, Seq[String])],
      minFrac: Double = 0.5, minPages: Int = 2): Map[Long, (Seq[String], Long)] =
    Boilerplate.stripHostBoilerplate(
        pages.toDF("doc_id", "host", "paras"), "doc_id", "host", "paras",
        minFrac, minPages)
      .as[(Long, String, Seq[String], Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap

  test("host furniture strips, sub-threshold and cross-host repeats survive") {
    val pages = Seq(
      (1L, "a", Seq("nav", "body one", "footer")),
      (2L, "a", Seq("nav", "body two", "footer")),
      (3L, "a", Seq("nav", "body three")),
      (4L, "a", Seq("nav", "promo", "body four")),   // promo: 1/4 < 0.5
      (5L, "b", Seq("nav", "other body")))           // host b: nav on 1 page only
    val got = run(pages)
    // host a: nav on 4/4, footer on 2/4 -> both >= 0.5 and >= 2 pages
    assert(got(1L) === (Seq("body one"), 2L))
    assert(got(2L) === (Seq("body two"), 2L))
    assert(got(3L) === (Seq("body three"), 1L))
    assert(got(4L) === (Seq("promo", "body four"), 1L))
    // host b: nothing reaches minPages=2 — 'nav' survives THERE
    assert(got(5L) === (Seq("nav", "other body"), 0L))
  }

  test("paragraph order is preserved and an all-furniture page empties cleanly") {
    val pages = Seq(
      (1L, "a", Seq("x", "mid", "y", "tail")),
      (2L, "a", Seq("x", "y")),
      (3L, "a", Seq("y", "x")))
    val got = run(pages)
    assert(got(1L) === (Seq("mid", "tail"), 2L))
    assert(got(2L) === (Seq.empty[String], 2L))
    assert(got(3L) === (Seq.empty[String], 2L))
  }

  test("within-page repeats count the page once toward the fraction") {
    // 'r' appears twice on page 1 but only on 1 of 3 pages -> not furniture
    val pages = Seq(
      (1L, "a", Seq("r", "r", "b1")),
      (2L, "a", Seq("b2")),
      (3L, "a", Seq("b3")))
    val got = run(pages)
    assert(got(1L) === (Seq("r", "r", "b1"), 0L))
  }
}
