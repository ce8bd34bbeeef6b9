package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide, lazy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf001 = "/root/testdata/sf0.001"

  /** Independent JVM replica of TextFns.splitBucket (first 48 md5 bits of
    * the decimal id, as unsigned, mod 100) — one shared copy so the
    * parity/sampling/packing specs can't drift apart. */
  def md5Bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(id.toString.getBytes("UTF-8"))
    h.take(6).foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL)) % 100
  }

  /** Hex md5 of an arbitrary string (independent replica of the salted
    * hash48 idiom for specs that need the full 48-bit value). */
  def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }
}
