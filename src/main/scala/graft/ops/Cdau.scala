package graft.ops

/** Auxiliary CDAU address source adapter (reference catatom2osm/cdau.py):
  * the Cadastre↔INE municipality-code translation (its province-specific
  * offset rules) and the CSV-row → Cadastre-attribute mapping used before
  * conflation. Pure functions — the conflation join itself is the
  * argmin/radius machinery already in SpatialJoin/Conjoin.
  */
object Cdau {
  val codMunTrans: Map[String, Map[Int, Int]] = Map(
    "04" -> Map(40 -> 901, 104 -> 902, 105 -> 903, 900 -> 13),
    "11" -> Map(43 -> 901, 44 -> 902, 45 -> 903, 900 -> 12),
    "14" -> Map(900 -> 21),
    "18" -> Map(20 -> 911, 53 -> 908, 59 -> 907, 63 -> 119, 83 -> 905, 92 -> 906,
      105 -> 910, 106 -> 103, 120 -> 903, 130 -> 904, 132 -> 902, 141 -> 909,
      163 -> 901, 199 -> 912, 200 -> 913, 900 -> 87),
    "21" -> Map(79 -> 60, 900 -> 41),
    "23" -> Map(13 -> 902, 23 -> 901, 78 -> 904, 100 -> 903, 102 -> 905, 900 -> 50),
    "29" -> Map(102 -> 902, 103 -> 901, 900 -> 67),
    "41" -> Map(103 -> 901, 104 -> 902, 105 -> 903, 900 -> 91))

  /** cod_mun_cat2ine (cdau.py:109-135). */
  def codMunCat2Ine(codMunCat: String): String = {
    var codProv = codMunCat.substring(0, 2)
    var codMun = codMunCat.substring(2).toInt
    codProv match {
      case "18" =>
        codMunTrans("18").get(codMun) match {
          case Some(v) => codMun = v
          case None =>
            if ((codMun >= 64 && codMun < 120) || (codMun >= 137 && codMun < 143)) codMun -= 2
            else if (codMun >= 144 && codMun < 184) codMun -= 3
            else if (codMun >= 185 && codMun < 199) codMun -= 4
            else codMun -= 1
        }
      case "21" =>
        codMun = codMunTrans("21").getOrElse(codMun, if (codMun > 59) codMun + 1 else codMun)
      case "53" =>
        codProv = "11"
        codMun = codMunTrans("11").getOrElse(codMun, codMun)
      case p =>
        codMun = codMunTrans.get(p).flatMap(_.get(codMun)).getOrElse(codMun)
    }
    f"$codProv${codMun}%03d"
  }

  /** highway_types_equiv (cdau.py:66-106) — the FULL table. */
  val highwayTypesEquiv: Map[String, String] = Map(
    "ACCESO" -> "AC", "ALAMEDA" -> "AL", "ARROYO" -> "AY", "AUTOPISTA" -> "AU",
    "AUTOVIA" -> "AU", "AVENIDA" -> "AV", "BARRIO" -> "BO", "BAJADA" -> "BJ",
    "BARRANCO" -> "BR", "BULEVAR" -> "BV", "CALLE" -> "CL", "CAÑADA" -> "CA",
    "CASERIO" -> "CS", "CALZADA" -> "CZ", "CINTURON" -> "CI",
    "CONCEJO, COLEGIO" -> "CO", "DISEMINADO" -> "DS",
    "EXPLANADA" -> "EX", "EXTRAMUROS" -> "EM", "EXTRARRADIO" -> "ER",
    "GRAN VIA" -> "GV", "GRUPO" -> "GR", "GLORIETA" -> "GL",
    "HUERTA, HUERTO" -> "HT", "JARDINES" -> "JR", "LUGAR" -> "LG",
    "MONTE" -> "MT", "MUELLE" -> "ML", "PASEO" -> "PS", "POBLADO" -> "PB",
    "PLAZA" -> "PZ", "PUENTE" -> "PT", "POLIGONO" -> "PL", "RAMAL" -> "RM",
    "RAMBLA" -> "RB", "RONDA" -> "RD", "SUBIDA" -> "SU", "SECTOR" -> "SC",
    "URBANIZACION" -> "UR")

  /** get_cat_address (cdau.py:138-152): CDAU CSV row -> Cadastre attrs. */
  def getCatAddress(ad: Map[String, String], codMunCat: String): Map[String, String] = {
    val tip = highwayTypesEquiv.getOrElse(ad("nom_tip_via"), ad("nom_tip_via"))
    val to = Option(ad.getOrElse("num_por_hasta", "")).getOrElse("") +
      Option(ad.getOrElse("ext_hasta", "")).getOrElse("")
    val from = Option(ad.getOrElse("num_por_desde", "")).getOrElse("") +
      Option(ad.getOrElse("ext_desde", "")).getOrElse("")
    Map(
      "localId" -> s"${codMunCat.substring(0, 2)}.${codMunCat.substring(2)}.${ad("dgc_via")}.${ad("refcatparc")}",
      "TN_text" -> s"$tip ${ad("nom_via")}",
      "postCode" -> ad("cod_postal"),
      "spec" -> "Entrance",
      "designator" -> (if (to.nonEmpty) s"$from-$to" else from))
  }
}
