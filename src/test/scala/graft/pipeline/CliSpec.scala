package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Replay of the reference's test_main.py over [[Cli]]/[[Main]]: the
  * default Namespace, the -b/-d normalization, download routing order,
  * split-with-multiple-paths error, no-args usage, and -l validation. */
class CliSpec extends AnyFunSuite {

  /** test_main.py:27-40 setUp Namespace — the expected defaults. */
  private val defaults = Cli.Options(
    parcel = Nil, zoning = false, building = true, address = true,
    comment = false, download = false, info = false, list = "",
    logLevel = "INFO", manual = false, path = Seq("33333"),
    split = None, args = "33333")

  test("test_default: bare municipality code yields the reference Namespace") {
    assert(Cli.parse(Seq("33333")) === Right(defaults))
  }

  test("test_building: -b disables addresses") {
    assert(Cli.parse(Seq("33333", "-b")) ===
      Right(defaults.copy(building = true, address = false, args = "33333 -b")))
  }

  test("-d disables buildings (address-only run)") {
    assert(Cli.parse(Seq("33333", "-d")) ===
      Right(defaults.copy(building = false, address = true, args = "33333 -d")))
  }

  test("test_no_args: empty argv routes to usage") {
    val o = Cli.parse(Seq.empty).toOption.get
    assert(Cli.route(o) === Cli.Usage)
    assert(Cli.usage.contains("usage: catatom2osm"))
  }

  test("test_too_many_args: split + several paths is an error") {
    val o = Cli.parse(Seq("foo", "bar", "-s", "taz")).toOption.get
    Cli.route(o) match {
      case Cli.Fail(msg) => assert(msg.contains("Can't use split file"))
      case other => fail(s"expected Fail, got $other")
    }
  }

  test("test_download: -w routes to Download; unconfigured base is a clear error") {
    val o = Cli.parse(Seq("-w", "33333")).toOption.get
    assert(o.download && o.args === "-w 33333")
    assert(Cli.route(o) === Cli.Download(Seq("33333")))
    val errs = scala.collection.mutable.ArrayBuffer[String]()
    val io = Main.Io(out = _ => (), err = errs += _)
    assert(Main.run(Seq("-w", "33333"), io,
      () => fail("download must not build a session")) === 1)
    assert(errs.exists(_.contains("download_base not configured")),
      errs.mkString("; "))
  }

  test("-l with no value lists provincial offices ('99' const)") {
    val o = Cli.parse(Seq("-l")).toOption.get
    assert(o.list === "99")
    val listing = Cli.listCode("99", _ => Seq.empty).toOption.get
    assert(listing.startsWith("Territorial office"))
    assert(listing.contains("38 Santa Cruz de Tenerife"))
    assert(listing.linesIterator.size === 2 + Cli.provCodes.size)
  }

  test("test_list_error: -l 01 is not a valid province code") {
    assert(Cli.listCode("01", _ => Seq.empty) ===
      Left("Province code '01' is not valid"))
    // 1-char codes are zero-padded first (boundary.py:18)
    assert(Cli.listCode("1", _ => Seq.empty) ===
      Left("Province code '01' is not valid"))
  }

  test("-l PROV lists municipalities from the injected source") {
    val got = Cli.listCode("05",
      p => Seq((s"${p}001", "Adanero"), (s"${p}015", "Ávila"))).toOption.get
    val title = "Territorial office 05 - Ávila"
    assert(got.linesIterator.toSeq ===
      Seq(title, "=" * title.length, "05001 Adanero", "05015 Ávila"))
  }

  test("--log validates its choice set") {
    assert(Cli.parse(Seq("33333", "--log", "DEBUG")).toOption.get.logLevel === "DEBUG")
    assert(Cli.parse(Seq("33333", "--log", "bogus")).isLeft)
  }

  test("unknown options are rejected like argparse") {
    assert(Cli.parse(Seq("33333", "--frobnicate")).isLeft)
  }

  test("-x routes to generate_municipalities with the paths") {
    val o = Cli.parse(Seq("-x", "new.csv")).toOption.get
    assert(Cli.route(o) === Cli.GenerateMunicipalities(Seq("new.csv")))
  }

  test("-g routes to generate_config before everything else") {
    val o = Cli.parse(Seq("-g", "-s", "x", "a", "b")).toOption.get
    assert(Cli.route(o) === Cli.GenerateConfig)
  }

  test("-o stores a single parcel refcat, --municipality flips the flag") {
    val o = Cli.parse(Seq("33333", "-o", "9872023VH5797S", "--municipality"))
      .toOption.get
    assert(o.parcel === Seq("9872023VH5797S") && o.municipality)
  }

  test("--municipality disables any split boundary (app.py:87-88)") {
    val o = Cli.parse(Seq("33333", "-s", "x.geojson", "--municipality")).toOption.get
    assert(o.municipality && o.split === None)
  }

  test("argparse attached short-option values: -sX, -oX, -fX, -lX") {
    val s = Cli.parse(Seq("33333", "-sAtocha.geojson")).toOption.get
    assert(s.split === Some("Atocha.geojson"))
    val o = Cli.parse(Seq("33333", "-oREFCAT")).toOption.get
    assert(o.parcel === Seq("REFCAT"))
    val f = Cli.parse(Seq("33333", "-fconf.yaml")).toOption.get
    assert(f.configFile === Some("conf.yaml"))
    val l = Cli.parse(Seq("-l28")).toOption.get
    assert(l.list === "28")
  }

  test("argparse token forms: --opt=value, bundled shorts, -v") {
    val eq = Cli.parse(Seq("33333", "--log=debug")).toOption.get
    assert(eq.logLevel === "DEBUG")
    val bundle = Cli.parse(Seq("33333", "-bz")).toOption.get
    assert(bundle.building && bundle.zoning && !bundle.address)
    assert(Cli.route(Cli.parse(Seq("-v")).toOption.get) === Cli.ShowVersion)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    assert(Main.run(Seq("-v"), Main.Io(out = out += _, err = out += _),
      () => fail("version needs no session")) === 0)
    assert(out.exists(_.contains("graft")))
  }
}
