package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Translate

/** Replays the reference's report-validation goldens
  * (test/test_report.py:43-111) and translate goldens
  * (test/test_translate.py:24-68) with the same values verbatim. */
class ReportGoldenSpec extends AnyFunSuite {

  test("reference golden: consistent run values validate clean (test_validate1)") {
    val r = new Report
    Seq(
      "inp_address_entrance" -> 7L, "inp_address_parcel" -> 5L, "inp_address" -> 12L,
      "addresses_without_number" -> 1L, "orphaned_addresses" -> 2L,
      "multiple_addresses" -> 1L, "refused_addresses" -> 2L,
      "out_address_entrance" -> 5L, "out_address_parcel" -> 1L,
      "out_addr_str" -> 4L, "out_addr_plc" -> 2L, "out_address" -> 6L,
      "inp_features" -> 6L, "inp_buildings" -> 2L, "inp_parts" -> 3L,
      "inp_pools" -> 1L, "out_buildings" -> 3L, "out_features" -> 6L,
      "outside_parts" -> 1L, "underground_parts" -> 1L,
      "multipart_geoms_building" -> 2L, "exploded_parts_building" -> 4L)
      .foreach { case (k, v) => r.set(k, v) }
    r.buildingCounter = Map("a" -> 1L, "b" -> 2L)
    assert(r.validate() === Seq.empty)
  }

  test("reference golden: broken run reports the documented 7 errors (test_validate2)") {
    val r = new Report
    Seq(
      "inp_address_entrance" -> 1L, "inp_address_parcel" -> 2L, "inp_address" -> 4L,
      "addresses_without_number" -> 1L, "orphaned_addresses" -> 1L,
      "multiple_addresses" -> 1L, "refused_addresses" -> 1L,
      "out_address_entrance" -> 1L, "out_address_parcel" -> 2L,
      "out_addr_str" -> 1L, "out_addr_plc" -> 2L, "out_address" -> 4L,
      "inp_features" -> 7L, "inp_buildings" -> 2L, "inp_parts" -> 3L,
      "inp_pools" -> 1L, "out_buildings" -> 4L, "out_features" -> 8L)
      .foreach { case (k, v) => r.set(k, v) }
    r.buildingCounter = Map("a" -> 1L, "b" -> 2L)
    val errs = r.validate()
    val expected = Seq(
      "Sum of address types should be equal to the input addresses",
      "Sum of output and deleted addresses should be equal to the input addresses",
      "Sum of entrance and parcel addresses should be equal to output addresses",
      "Sum of street and place addresses should be equal to output addresses",
      "Sum of buildings, parts and pools should be equal to the feature count",
      "Sum of building types should be equal to the number of buildings",
      "Sum of output and deleted minus created building features should be equal to input features")
    expected.foreach(m => assert(errs.contains(m), m))
  }
}

class TranslateGoldenSpec extends AnyFunSuite {

  test("reference golden: address_tags decision rules (test_translate.py:24-68)") {
    assert(Translate.addressTagsRow("0", "  ", "", "9", "", "") === Map.empty)
    val t1 = Translate.addressTagsRow("000", "111", "222", "", "Parcel", "foobar")
    assert(t1("ref") === "000")
    assert(t1("addr:street") === "111")
    assert(t1("addr:housenumber") === "222")
    assert(t1("image") === "foobar")
    assert(!t1.contains("addr:postcode") && !t1.contains("entrance"))
    val t2 = Translate.addressTagsRow("000", "111", "222", "333", "Entrance", "foobar")
    assert(t2("entrance") === "yes")
    assert(t2("addr:postcode") === "00333")
    val t3 = Translate.addressTagsRow("000", "Lugar foo", "", "", "", "foobar")
    assert(t3("addr:place") === "foo")
    assert(!t3.contains("addr:street"))
    val t4 = Translate.addressTagsRow("000", "Plaza foo", "", "", "", "foobar")
    assert(t4("addr:street") === "Plaza foo")
    val t5 = Translate.addressTagsRow("000", "squarePlaza foo", "", "", "", "foobar")
    assert(t5("addr:place") === "Plaza foo")
    assert(!t5.contains("addr:street"))
  }

  test("reference golden: building_tags rules (translate.py:46-90 semantics)") {
    val b = Translate.buildingTagsRow("X", "functional", "1_residential", "", 3, 1, 0, "")
    assert(b("building") === "residential")
    assert(b("ref") === "X")
    assert(b("building:levels") === "3")
    assert(b("building:levels:underground") === "1")
    val ruin = Translate.buildingTagsRow("X", "ruin", null, "", 0, 0, 0, "")
    assert(ruin("building") === "ruins")
    assert(ruin("abandoned:building") === "yes")
    val part = Translate.buildingTagsRow("X_part1", "functional", null, "", 0, 1, 0, "")
    assert(part("building:part") === "roof")
    assert(!part.contains("building"))
    val pool = Translate.buildingTagsRow("X_PI.1", "functional", null, "openAirPool", 0, 0, 1, "")
    assert(pool("leisure") === "swimming_pool")
    assert(pool("layer") === "1" && pool("location") === "roof")
    val ruinUse = Translate.buildingTagsRow("X", "ruin", "1_residential", "", 0, 0, 0, "")
    assert(ruinUse("abandoned:building") === "residential") // condition-keyed use
  }
}
