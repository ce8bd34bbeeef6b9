package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Perceptual dHash near-dup: hash correctness on hand grids, the
  * <= 2-bit single-pixel perturbation bound, and LSH == brute-force
  * parity over the planted synthetic table. */
class MediaPhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dHash64 encodes horizontal gradients, bit r*8+c") {
    // strictly increasing rows -> every comparison true -> all 64 bits set
    val inc = Array.tabulate(72)(i => i % 9)
    assert(Media.dHash64(inc) == -1L)
    // strictly decreasing rows -> no bit set
    val dec = Array.tabulate(72)(i => 9 - i % 9)
    assert(Media.dHash64(dec) == 0L)
    // flat grid with pix(1) bumped: only comparisons (0,1) and (1,2)
    // change -> bits 0 (set: 5<9) and 1 (cleared side: 9>5 stays 0)
    val flat = Array.fill(72)(5)
    val one = flat.clone(); one(1) = 9
    val x = Media.dHash64(flat) ^ Media.dHash64(one)
    assert(java.lang.Long.bitCount(x) <= 2 && (x & 1L) == 1L)
  }

  test("one pixel mutation moves at most 2 bits") {
    val base = Array.tabulate(72)(i => (i * 37 + 11) % 256)
    for (p <- Seq(0, 1, 8, 9, 35, 70, 71)) {
      val m = base.clone(); m(p) = (m(p) + 128) % 256
      val d = java.lang.Long.bitCount(Media.dHash64(base) ^ Media.dHash64(m))
      assert(d <= 2, s"pixel $p moved $d bits")
    }
  }

  test("phashNearDups == brute force on the planted table") {
    val pixels = Media.synthPixels(spark, "/root/testdata/sf0.001")
    val rows = pixels.as[(Long, Array[Int])].collect()
    val sigs = rows.map { case (id, pix) => id -> Media.dHash64(pix) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 4
    } yield (ia, ib, d)).toSet
    assert(brute.nonEmpty, "planted groups must yield near-dup pairs")
    val got = Media.phashNearDups(pixels, maxDist = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute)
    graft.CacheBin.drain()
  }

  test("same-group pairs stay within Hamming 4; planted mutations move bits") {
    val rows = Media.synthPixels(spark, "/root/testdata/sf0.001")
      .as[(Long, Array[Int])].collect()
    val byGroup = rows.groupBy(_._1 % 25)
    var nonZero = 0
    for ((_, g) <- byGroup; Array(a, b) <- g.combinations(2)) {
      val d = java.lang.Long.bitCount(
        Media.dHash64(a._2) ^ Media.dHash64(b._2))
      assert(d <= 4, s"pair ${a._1},${b._1} at distance $d")
      if (d > 0) nonZero += 1
    }
    assert(nonZero > 0, "mutations must perturb some within-group hashes")
  }
}
