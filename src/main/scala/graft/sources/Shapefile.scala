package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer
import graft.geom.{Geom, Pt}

/** Minimal ESRI Shapefile (+dBase III) reader — just enough to load the
  * reference's own test fixtures (cons.shp: Polygon type 5 + localId dbf
  * column) so the engine can replay the reference test suite's golden
  * values on the reference's own data. Public format, implemented from the
  * ESRI Shapefile Technical Description (July 1998).
  *
  * Ring orientation: shapefiles store outer rings clockwise and holes
  * counter-clockwise; rings are closed (first == last vertex). The loader
  * groups holes with the outer ring containing them and re-opens rings
  * (drops the closing vertex) to match the engine's open-ring model.
  */
object Shapefile {

  final case class ShpFeature(fid: Int, attrs: Map[String, String],
      geometry: Array[Array[Array[Pt]]])

  def read(shpPath: String): Seq[ShpFeature] = {
    val geoms = readShp(shpPath)
    val attrs = readDbf(shpPath.stripSuffix(".shp") + ".dbf")
    geoms.zipWithIndex.map { case (g, i) =>
      ShpFeature(i, if (i < attrs.length) attrs(i) else Map.empty, g)
    }
  }

  /** Parse .shp: sequence of multipolygons (empty for null shapes). */
  def readShp(path: String): Seq[Array[Array[Array[Pt]]]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes)
    val out = ArrayBuffer[Array[Array[Array[Pt]]]]()
    var pos = 100 // header
    while (pos + 8 <= bytes.length) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val contentWords = buf.getInt(pos + 4)
      val contentStart = pos + 8
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = buf.getInt(contentStart)
      if (shapeType == 5 || shapeType == 15 || shapeType == 25) { // Polygon/Z/M
        val numParts = buf.getInt(contentStart + 36)
        val numPoints = buf.getInt(contentStart + 40)
        val partsOff = contentStart + 44
        val pointsOff = partsOff + 4 * numParts
        val partIdx = (0 until numParts).map(i => buf.getInt(partsOff + 4 * i))
        val pts = (0 until numPoints).map { i =>
          Pt(buf.getDouble(pointsOff + 16 * i), buf.getDouble(pointsOff + 16 * i + 8))
        }
        val rings = partIdx.zipWithIndex.map { case (start, i) =>
          val end = if (i + 1 < numParts) partIdx(i + 1) else numPoints
          val ring = pts.slice(start, end).toArray
          // drop closing vertex (shapefile rings are closed)
          if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring
        }
        out += groupRings(rings)
      } else out += Array.empty
      pos = contentStart + contentWords * 2
    }
    out.toSeq
  }

  /** Group rings into polygons: shapefile outers are CW (negative shoelace
    * in our convention), holes CCW; assign each hole to the outer whose
    * ring contains its first vertex. */
  def groupRings(rings: Seq[Array[Pt]]): Array[Array[Array[Pt]]] = {
    val (outers, holes) = rings.partition(r => Geom.signedArea(r) <= 0)
    val base = if (outers.nonEmpty) outers else rings // degenerate fallback
    base.map { o =>
      val myHoles = holes.filter(h => h.nonEmpty && Geom.pointInRing(h.head, o))
      (o +: myHoles).toArray
    }.toArray
  }

  /** Parse .dbf (dBase III): per-record string map (trimmed). */
  def readDbf(path: String): Seq[Map[String, String]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xFFFF
    val recordSize = buf.getShort(10) & 0xFFFF
    // field descriptors: 32 bytes each from offset 32 until 0x0D
    val fields = ArrayBuffer[(String, Int)]()
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0D) {
      val name = new String(bytes, off, 11, "ASCII").takeWhile(_ != 0)
      val len = bytes(off + 16) & 0xFF
      fields += ((name, len))
      off += 32
    }
    (0 until numRecords).map { r =>
      var p = headerSize + r * recordSize + 1 // skip deletion flag
      fields.map { case (name, len) =>
        val v = new String(bytes, p, len, "UTF-8").trim
        p += len
        (name, v)
      }.toMap
    }
  }
}
