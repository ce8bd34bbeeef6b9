package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.geom.{Geom, Pt}
import graft.spatial.CellGrid

/** Auxiliary Carto-BCN address source adapter (reference catatom2osm/
  * cbcn.py): the Catalan street-type expansion table, the CBCN-row →
  * Cadastre-attribute mapping, and get_address's parcel assignment —
  * point-in-parcel with a 1 m bbox probe, falling back to the nearest
  * parcel boundary strictly under 1 m (cbcn.py:16-97).
  *
  * The reference walks a QgsSpatialIndex per address; here the candidate
  * stage is the engine's cell equi-join (parcel bboxes expanded by the
  * threshold, covering cells exploded on the parcel side; the address side
  * keys by its single cell), and the refinement runs in a per-address
  * cogroup — the same broadcast-free shape as pipJoinPartitioned.
  */
object Cbcn {
  /** Threshold in meters to search for the Cadastre parcel (cbcn.py:16). */
  val cbcnThr = 1.0

  /** highway_types_equiv (cbcn.py:18-46) — verbatim public data table. */
  val highwayTypesEquiv: Map[String, String] = Map(
    "Av" -> "Avinguda", "Bda" -> "Baixada", "C" -> "Carrer", "Cro" -> "Carreró",
    "Csta" -> "Costa", "Ctra" -> "Carretera", "Dav" -> "Davallada",
    "Drec" -> "Drecera", "Esc" -> "Escales", "Escu" -> "Escullera",
    "Esp" -> "Espigó", "G.V." -> "Gran Via", "Jard" -> "Jardins",
    "Pdis" -> "Passadís", "Pg" -> "Passeig", "Pl" -> "Plaça",
    "Plta" -> "Placeta", "Ptge" -> "Passatge", "Ptja" -> "Platja",
    "Rbla" -> "Rambla", "Rda" -> "Ronda", "Rier" -> "Riera", "T" -> "Torrent",
    "Trav" -> "Travessera", "Trvs" -> "Travessia", "Viad" -> "Viaducte")

  /** get_cat_address (cbcn.py:49-58): CBCN row -> Cadastre attrs. The street
    * type is the FIRST word of NOM_VIA, expanded via the table; the rest of
    * the string (leading space included) is appended verbatim. */
  def getCatAddress(ad: Map[String, String]): Map[String, String] = {
    val nomVia = ad("NOM_VIA")
    val tipVia = nomVia.split(" ")(0)
    val nomTipVia = highwayTypesEquiv.getOrElse(tipVia, tipVia)
    Map(
      "TN_text" -> (nomTipVia + nomVia.substring(tipVia.length)),
      "spec" -> "Entrance",
      "designator" -> ad("LITERAL").replace(".", ""))
  }

  final case class CbcnAddr(fid: Long, nomVia: String, literal: String,
      codiCarrer: String, x: Double, y: Double)
  final case class ParcelGeom(localId: String, geometry: Array[Array[Array[Pt]]])

  /** get_address (cbcn.py:60-97): assign each CBCN address to its parcel —
    * the containing parcel if any (deterministically: min localId, where the
    * reference takes spatial-index order), else the nearest parcel whose
    * boundary is STRICTLY closer than cbcnThr; addresses with null NOM_VIA
    * or no qualifying parcel are dropped. localId becomes
    * CODICARRER.designator.parcelLocalId. */
  def getAddress(
      addrs: Dataset[CbcnAddr], parcels: Dataset[ParcelGeom],
      grid: CellGrid): DataFrame = {
    require(grid.cellSize >= cbcnThr,
      "cellSize must be >= cbcnThr so the expanded-bbox cover is complete")
    val spark = addrs.sparkSession
    import spark.implicits._
    val parcelCells = parcels.flatMap { pc =>
      val b = Geom.bbox(pc.geometry)
      val expanded = Geom.BBox(
        b.xmin - cbcnThr, b.ymin - cbcnThr, b.xmax + cbcnThr, b.ymax + cbcnThr)
      grid.cover(expanded).map(c => (c, pc))
    }.toDF("cell", "parcel")
    addrs
      .filter(a => a.nomVia != null)
      .map(a => (grid.cellOf(a.x, a.y), a))
      .toDF("cell", "ad")
      .join(parcelCells, "cell")
      .select(org.apache.spark.sql.functions.col("ad").as[CbcnAddr],
        org.apache.spark.sql.functions.col("parcel").as[ParcelGeom])
      .groupByKey(_._1.fid)
      .flatMapGroups { (_, it) =>
        val rows = it.toSeq
        val ad = rows.head._1
        val p = Pt(ad.x, ad.y)
        val cands = rows.map(_._2)
        val inside = cands.filter(pc => Geom.pointInMultiPolygon(p, pc.geometry))
        val chosen =
          if (inside.nonEmpty) Some(inside.minBy(_.localId))
          else cands
            .map(pc => (Geom.closestSegment(p, pc.geometry)._1, pc))
            .filter(t => math.sqrt(t._1) < cbcnThr)
            .sortBy(t => (t._1, t._2.localId))
            .headOption.map(_._2)
        chosen.iterator.map { pc =>
          val attr = getCatAddress(Map("NOM_VIA" -> ad.nomVia, "LITERAL" -> ad.literal))
          (ad.fid, s"${ad.codiCarrer}.${attr("designator")}.${pc.localId}",
            attr("TN_text"), attr("spec"), attr("designator"), ad.x, ad.y)
        }
      }
      .toDF("fid", "localId", "TN_text", "spec", "designator", "x", "y")
  }
}
