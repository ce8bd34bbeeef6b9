package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Replays the reference's cdau goldens (test/test_cdau.py:23-49, 124-143):
  * the full municipality-code translation table and the CSV->attribute map. */
class CdauGoldenSpec extends AnyFunSuite {
  import Cdau._

  test("reference golden: cod_mun_cat2ine translation table") {
    val golden = Seq(
      "04030" -> "04030", "04040" -> "04901", "04103" -> "04103",
      "04104" -> "04902", "14900" -> "14021", "18059" -> "18907",
      "18002" -> "18001", "18062" -> "18061", "18063" -> "18119",
      "18064" -> "18062", "18119" -> "18117", "18120" -> "18903",
      "18121" -> "18120", "18135" -> "18134", "18137" -> "18135",
      "18142" -> "18140", "18144" -> "18141", "18183" -> "18180",
      "18185" -> "18181", "18198" -> "18194", "18199" -> "18912",
      "21001" -> "21001", "21059" -> "21059", "21060" -> "21061",
      "21079" -> "21060", "21900" -> "21041", "29900" -> "29067")
    for ((in, out) <- golden)
      assert(codMunCat2Ine(in) === out, s"cat $in")
  }

  test("reference golden: get_cat_address mapping") {
    val ad = Map(
      "dgc_via" -> "123", "refcatparc" -> "foobar", "nom_tip_via" -> "CALLE",
      "nom_via" -> "Alegría", "cod_postal" -> "12345",
      "num_por_desde" -> "10", "ext_desde" -> "A",
      "num_por_hasta" -> "", "ext_hasta" -> "")
    val attr = getCatAddress(ad, "29900")
    assert(attr("localId") === "29.900.123.foobar")
    assert(attr("TN_text") === "CL Alegría")
    assert(attr("postCode") === "12345")
    assert(attr("spec") === "Entrance")
    assert(attr("designator") === "10A")
    val attr2 = getCatAddress(ad ++ Map("num_por_hasta" -> "14", "ext_hasta" -> "D"), "29900")
    assert(attr2("designator") === "10A-14D")
  }

  test("highway_types_equiv covers the full cdau.py table (PLAZA, PASEO, ...)") {
    // the tail of cdau.py:66-106 that a truncated table would miss
    val golden = Seq(
      "PLAZA" -> "PZ", "PASEO" -> "PS", "RONDA" -> "RD", "URBANIZACION" -> "UR",
      "LUGAR" -> "LG", "MONTE" -> "MT", "MUELLE" -> "ML", "POBLADO" -> "PB",
      "PUENTE" -> "PT", "POLIGONO" -> "PL", "RAMAL" -> "RM", "RAMBLA" -> "RB",
      "SUBIDA" -> "SU", "SECTOR" -> "SC", "CONCEJO, COLEGIO" -> "CO",
      "HUERTA, HUERTO" -> "HT")
    for ((in, out) <- golden)
      assert(highwayTypesEquiv(in) === out, in)
    assert(highwayTypesEquiv.size === 39)
    val adPz = Map(
      "dgc_via" -> "1", "refcatparc" -> "p", "nom_tip_via" -> "PLAZA",
      "nom_via" -> "Mayor", "cod_postal" -> "1", "num_por_desde" -> "1",
      "ext_desde" -> "", "num_por_hasta" -> "", "ext_hasta" -> "")
    assert(getCatAddress(adPz, "29900")("TN_text") === "PZ Mayor")
    assert(getCatAddress(adPz ++ Map("nom_tip_via" -> "PASEO"), "29900")("TN_text")
      === "PS Mayor")
  }
}
