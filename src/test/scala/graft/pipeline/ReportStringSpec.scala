package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Replays report.to_string's documented layout (test_report.py
  * test_to_string0/1/2): header lines, conditional group/subgroup headers,
  * tab-indented sub-rows, grouped integers, and the fixme doc link. */
class ReportStringSpec extends AnyFunSuite {
  import Report.{Eol, FixmeDocUrl, Tab}

  test("to_string0: bare report is just date + language") {
    val r = new Report
    r.strings("date") = "08/17/26"
    r.strings("language") = "es_ES"
    assert(r.toDisplayString() ===
      s"Date: 08/17/26${Eol}Language: es_ES$Eol")
  }

  test("to_string1: one address metric pulls in its group+subgroup headers") {
    val r = new Report
    r.strings("mun_name") = "Foobar"
    r.strings("date") = "08/17/26"
    r.strings("language") = "es_ES"
    r.set("inp_zip_codes", 1000)
    r.fixmesTracked = true
    val expected =
      s"Municipality: Foobar$Eol" +
        s"Date: 08/17/26$Eol" +
        s"Language: es_ES$Eol" +
        s"$Eol=Addresses=$Eol" +
        s"$Eol==Input data==$Eol" +
        s"Postal codes: 1,000$Eol" +
        Eol + FixmeDocUrl
    assert(r.toDisplayString() === expected)
  }

  test("to_string2: sub-rows are tab-indented, errors list with count") {
    val r = new Report
    r.set("inp_features", 12345)
    r.set("inp_buildings", 12000)
    r.errors += "Test error"
    val out = r.toDisplayString()
    assert(out.contains(s"$Eol=Buildings=$Eol"))
    assert(out.contains(s"$Eol==Input data==$Eol"))
    assert(out.contains(s"Feature count: 12,345$Eol"))
    assert(out.contains(s"${Tab}Buildings: 12,000$Eol"))
    assert(out.contains(s"$Eol=Problems=$Eol"))
    assert(out.contains(s"Report validation: 1$Eol${Tab}Test error$Eol"))
    assert(!out.contains("=Addresses="), "absent group emits no header")
  }
}
