package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spatial.Zone

/** Tab-delimited K/V persistence + GeoJSON export — the reference's
  * csvtools (highway_names.csv / tasks.csv, csvtools.py:10-91) and
  * BaseLayer.export GeoJSON path (base.py:372-400).
  */
object CsvGeoJson {

  /** Write a key→value dict as tab-separated csv (csvtools.dict2csv). */
  def writeDict(spark: SparkSession, dict: Map[String, String], path: String): Unit = {
    import spark.implicits._
    dict.toSeq.sortBy(_._1).toDF("k", "v")
      .coalesce(1)
      .write.mode("overwrite").option("sep", "\t").csv(path)
  }

  /** csvtools.filter (csvtools.py:43-61): rows of a tab-delimited CSV
    * passing `query`; `stop` returns at the first match. */
  def filterRows(path: String, stop: Boolean = false)(
      query: Array[String] => Boolean): Seq[Array[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[String]]()
    val stream = java.nio.file.Files.lines(java.nio.file.Paths.get(path))
    try {
      val it = stream.iterator()
      while (it.hasNext && !(stop && out.nonEmpty)) {
        // limit -1 keeps trailing empty fields, like the reference's
        // csv.reader (split's default drops them -> index crashes)
        val row = it.next().split("\t", -1)
        if (query(row)) out += row
      }
    } finally stream.close()
    out.toSeq
  }

  /** csvtools.search (csvtools.py:64-73): first matching row. */
  def searchRow(path: String)(query: Array[String] => Boolean): Option[Array[String]] =
    filterRows(path, stop = true)(query).headOption

  /** Reader.is_empty (catatom.py:136-153): sniff the first 2000 bytes —
    * fewer than 3 COMPLETED element start tags means the Cadastre served a
    * null layer (the usual otherconstruction case). '.gz' and '.zip'
    * containers are opened like get_file_object does. */
  def isEmptyGml(path: String): Boolean = {
    // read UP TO 2000 bytes, looping: a single read() may return fewer
    // bytes than available (gzip inflate chunks), which would misclassify
    // a real layer as empty; the reference's Python read(2000) also loops
    def readHead(in: java.io.InputStream): String = try {
      val buf = new Array[Byte](2000)
      var off = 0
      var n = 0
      while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
        off += n
      new String(buf, 0, off, java.nio.charset.StandardCharsets.ISO_8859_1)
    } finally in.close()
    val head =
      if (path.contains(".zip!"))
        // container member (archive.zip!member.gml): bounded head sniff —
        // never inflates the whole member
        readHead(GmlText.open(path))
      else if (path.endsWith(".gz"))
        readHead(new java.util.zip.GZIPInputStream(
          java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))))
      else if (path.endsWith(".zip")) {
        val zf = new java.util.zip.ZipFile(path)
        try {
          val entries = zf.entries.asScala.toSeq
          if (entries.isEmpty) return true // no payload at all
          val entry = entries.find(_.getName.endsWith(".gml")).getOrElse(entries.head)
          readHead(zf.getInputStream(entry))
        } finally zf.close()
      } else readHead(
        java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)))
    // completed start tags only — a tag truncated by the 2000-byte window
    // never fires a start event in the reference's pull parser either
    "<[A-Za-z][^>]*>".r.findAllIn(head).size < 3
  }

  /** Read it back (csvtools.csv2dict). */
  def readDict(spark: SparkSession, path: String): Map[String, String] = {
    import spark.implicits._
    spark.read.option("sep", "\t").csv(path)
      .select(col("_c0"), col("_c1"))
      .as[(String, String)].collect().toMap
  }

  /** app.get_translations (app.py:690-728): first run computes the street
    * translation table (get_names) and persists it; later runs read the
    * file back — either way the returned values are stripped (the file
    * keeps the raw values, the caller sees clean ones). */
  def getTranslations(
      spark: SparkSession, namesPath: String, isNew: Boolean)(
      computeNames: => Map[String, String]): Map[String, String] = {
    val names =
      if (isNew) { val n = computeNames; writeDict(spark, n, namesPath); n }
      else readDict(spark, namesPath)
    names.view.mapValues(_.trim).toMap
  }

  /** ZoningLayer.export_poly (zoning.py:80-93): the Osmosis boundary-polygon
    * text format — header line, one numbered section per ring ('!' prefix
    * marks holes), '%f %f' coordinate lines, END terminators. The input is
    * the merged municipality multipolygon (Adjacency.unionByComponent's
    * ring output). */
  def exportPoly(mun: Array[Array[Array[graft.geom.Pt]]], name: String = "admin_boundary"): String = {
    val sb = new StringBuilder
    sb ++= s"$name\n"
    var i = 0
    for (part <- mun; (ring, j) <- part.zipWithIndex) {
      i += 1
      val prefix = if (j > 0) "!" else ""
      sb ++= s"$prefix$i\n"
      // '%f %f' lines exactly like the reference (it writes no END
      // terminators — observable behavior replicated, zoning.py:84-93)
      for (p <- ring) sb ++= f"${p.x}%f ${p.y}%f\n"
    }
    sb.toString
  }

  /** export_fixmes (cons.py:580-587 + fixme.py:15-21): features with a
    * nonempty fixme become Point features at their geometry CENTROID with
    * the fixme text as the only property — as GeoJSON Feature lines. Layout
    * matches the reference's <task>.fixmes.geojson payload; an empty input
    * yields an empty frame (the reference writes no file then). */
  def fixmesToGeoJson(
      features: org.apache.spark.sql.Dataset[(String, Array[Array[Array[graft.geom.Pt]]])])
      : DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features
      .filter(f => f._1 != null && f._1.nonEmpty)
      .map { case (fixme, geom) =>
        val c = graft.geom.Geom.centroid(geom)
        (fixme, Array(c.x, c.y))
      }
      .toDF("fixme", "coordinates")
      .select(to_json(struct(
        lit("Feature").as("type"),
        struct(col("fixme")).as("properties"),
        struct(lit("Point").as("type"), col("coordinates")).as("geometry")))
        .as("feature"))
  }

  /** Zones -> GeoJSON FeatureCollection lines (one Feature per row), via
    * to_json over nested structs — no hand-built strings. */
  def zonesToGeoJson(spark: SparkSession, zones: Seq[Zone]): DataFrame = {
    import spark.implicits._
    spark.createDataset(zones)
      .map { z =>
        val coords = z.geometry.map(poly => poly.map(ring =>
          (ring :+ ring.head).map(p => Array(p.x, p.y)))) // closed rings
        (z.zone_id, z.label, z.level, coords)
      }
      .toDF("zone_id", "label", "level", "coordinates")
      .select(to_json(struct(
        lit("Feature").as("type"),
        struct(col("zone_id"), col("label"), col("level")).as("properties"),
        struct(lit("MultiPolygon").as("type"), col("coordinates")).as("geometry")))
        .as("feature"))
  }
}
