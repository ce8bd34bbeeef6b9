package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.geom.Pt

/** WKB (Well-Known Binary) geometry parser — Polygon (3) and MultiPolygon
  * (6), both byte orders, 2D (Z/M flags ignored where possible). Public
  * OGC format. Rings are re-opened (closing vertex dropped) for the
  * engine's open-ring model.
  */
object Wkb {

  def parseMultiPolygon(bytes: Array[Byte]): Array[Array[Array[Pt]]] = {
    val buf = ByteBuffer.wrap(bytes)
    readGeometry(buf)
  }

  def parseHex(hex: String): Array[Array[Array[Pt]]] =
    parseMultiPolygon(hex.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray)

  private def readGeometry(buf: ByteBuffer): Array[Array[Array[Pt]]] = {
    val order = if (buf.get() == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    buf.order(order)
    val typ = buf.getInt() & 0xFF // mask off Z/M/SRID high bits (2.5D variants)
    typ match {
      case 3 => Array(readPolygon(buf))
      case 6 =>
        val n = buf.getInt()
        (0 until n).flatMap(_ => readGeometry(buf)).toArray
      case other =>
        throw new IllegalArgumentException(s"unsupported WKB type $other")
    }
  }

  private def readPolygon(buf: ByteBuffer): Array[Array[Pt]] = {
    val nRings = buf.getInt()
    Array.tabulate(nRings) { _ =>
      val nPts = buf.getInt()
      val ring = Array.tabulate(nPts)(_ => Pt(buf.getDouble(), buf.getDouble()))
      if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
    }
  }

  /** Load a TSV fixture with a trailing hex-WKB column (header row). */
  def readTsv(path: String): Seq[(Map[String, String], Array[Array[Array[Pt]]])] = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    val header = lines.get(0).split("\t")
    (1 until lines.size()).map { i =>
      val parts = lines.get(i).split("\t", -1)
      val attrs = header.dropRight(1).zip(parts.dropRight(1)).toMap
      (attrs, parseHex(parts.last))
    }
  }
}
