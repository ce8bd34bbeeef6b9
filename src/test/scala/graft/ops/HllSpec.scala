package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** HyperLogLog registers + estimate vs a plain-Scala replica: exact
  * register parity, the merge law (union = element-wise max), and
  * estimation accuracy within the 1.04/√m error band.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16)
  }
  private def replica(keys: Seq[String], b: Int): Map[Long, Long] = {
    val m = 1L << b
    keys.map { k =>
      val h = h48(k)
      val v = h >> b
      val rho = if (v == 0L) 48 - b + 1 else 48 - b + 1 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      (h % m, rho.toLong)
    }.groupBy(_._1).map { case (bk, xs) => bk -> xs.map(_._2).max }
  }
  private def estimate(regs: Map[Long, Long], b: Int): Double = {
    val m = (1L << b).toDouble
    val alpha = 0.7213 / (1 + 1.079 / m)
    val z = regs.values.map(r => math.pow(2.0, -r.toDouble)).sum + (m - regs.size)
    val raw = alpha * m * m / z
    val zeros = m - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  test("registers equal the replica exactly (one group)") {
    val keys = (0 until 5000).map(i => s"key-${i % 1300}")
    val got = Stats.hllRegisters(keys.map(("g", _)).toDF("g", "k"), "g", "k", 11)
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    assert(got === replica(keys.distinct, 11))
  }

  test("estimate within the 1.04/sqrt(m) band at b=11 (~2.3% stderr)") {
    val truth = 1300
    val keys = (0 until 5000).map(i => s"key-${i % truth}")
    val regs = replica(keys.distinct, 11)
    val est = Stats.hllEstimate(
        Stats.hllRegisters(keys.map(("g", _)).toDF("g", "k"), "g", "k", 11),
        "g", 11)
      .select("est").as[Long].head()
    assert(est === math.round(estimate(regs, 11)), "engine == replica estimator")
    assert(math.abs(est - truth).toDouble / truth < 0.08,
      s"estimate $est vs truth $truth outside 3.5 sigma")
  }

  test("merge law: registers of a union = element-wise max of the parts") {
    val a = (0 until 800).map(i => s"a-$i")
    val b = (0 until 800).map(i => if (i % 2 == 0) s"a-$i" else s"b-$i")
    def regsOf(ks: Seq[String]) =
      Stats.hllRegisters(ks.map(("g", _)).toDF("g", "k"), "g", "k", 8)
        .select("bucket", "r").as[(Long, Long)].collect().toMap
    val (ra, rb, ru) = (regsOf(a), regsOf(b), regsOf((a ++ b).distinct))
    val merged = (ra.keySet ++ rb.keySet).map { k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))
    }.toMap
    assert(ru === merged)
  }

  test("hllMerge operator == sketch of the union; intersection by " +
      "inclusion-exclusion lands within the error band") {
    val b = 11
    val a = (0 until 2000).map(i => s"x-$i")
    val bb = (1200 until 3200).map(i => s"x-$i") // |A|=|B|=2000, |A∩B|=800
    def regs(ks: Seq[(String, String)]) =
      Stats.hllRegisters(ks.toDF("g", "k"), "g", "k", b)
    val parts = regs(a.map(("A", _)) ++ bb.map(("B", _)))
    val mergedOp = Stats.hllMerge(parts)
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    val unionSketch = regs((a ++ bb).distinct.map(("U", _)))
      .select("bucket", "r").as[(Long, Long)].collect().toMap
    assert(mergedOp === unionSketch, "merge operator must equal a rescan")
    def est(ks: Seq[String]) =
      Stats.hllEstimate(regs(ks.map(("g", _))), "g", b)
        .select("est").as[Long].head()
    val inter = est(a) + est(bb) - est((a ++ bb).distinct)
    // inclusion-exclusion compounds three ~2.3% estimates over a set
    // 4x smaller than the union — allow a generous 4-sigma-ish band
    assert(math.abs(inter - 800L) < 800 * 0.35,
      s"intersection estimate $inter vs truth 800")
  }

  test("small-range linear counting kicks in and stays sane") {
    val keys = (0 until 30).map(i => s"only-$i")
    val est = Stats.hllEstimate(
        Stats.hllRegisters(keys.map(("g", _)).toDF("g", "k"), "g", "k", 11),
        "g", 11)
      .select("est").as[Long].head()
    assert(math.abs(est - 30L) <= 2, s"linear-counting estimate $est for 30 keys")
  }
}
