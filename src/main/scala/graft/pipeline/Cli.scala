package graft.pipeline

import scala.collection.immutable.ListMap

/** The reference's command-line surface (catatom2osm/__main__.py:76-234):
  * option grammar, default Namespace, the building/address normalization
  * rule, and the process() routing order — reproduced so a reference user
  * can drive this engine with the same invocations test_main.py exercises.
  *
  * Parsing is pure (argv in, Options/Action out); execution lives in
  * [[Main]] so every routing branch is unit-testable without Spark.
  */
object Cli {

  /** argparse Namespace equivalent (__main__.py:78-213 dest defaults). */
  final case class Options(
      path: Seq[String] = Nil,
      list: String = "",
      building: Boolean = false,
      address: Boolean = false,
      zoning: Boolean = false,
      parcel: Seq[String] = Nil,
      municipality: Boolean = false,
      split: Option[String] = None,
      manual: Boolean = false,
      comment: Boolean = false,
      download: Boolean = false,
      info: Boolean = false,
      logLevel: String = "INFO",
      configFile: Option[String] = None,
      generateConfig: Boolean = false,
      generateMunicipalities: Boolean = false,
      version: Boolean = false,
      args: String = "")

  val Version = "catatom2osm-spark (graft) 1.0"

  sealed trait Action
  /** No paths, no list → print help + examples (__main__.py:225-228). */
  case object Usage extends Action
  /** -v → print version and exit (argparse action='version'). */
  case object ShowVersion extends Action
  /** argparse/validation error surfaced via log.error. */
  final case class Fail(msg: String) extends Action
  /** -l routing → boundary.list_code (__main__.py:54-55). */
  final case class ListCodes(code: String) extends Action
  /** -w → Reader(path).download of the three INSPIRE layers in the
    * reference's order (__main__.py:56-61). */
  final case class Download(paths: Seq[String]) extends Action
  /** -g → config.generate_default_user_config (__main__.py:219-220). */
  case object GenerateConfig extends Action
  /** -x → municipalities.generate_municipalities (__main__.py:221-222). */
  final case class GenerateMunicipalities(paths: Seq[String]) extends Action
  /** The main path: CatAtom2Osm.create_and_run per path (__main__.py:63-73). */
  final case class Process(options: Options) extends Action

  val logLevels = Set("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")

  /** usage= string passed to ArgumentParser (__main__.py:18-25); argparse
    * prefixes it with 'usage: '. */
  val usage: String =
    """usage: catatom2osm [OPTION]... [PATHS]
      |  The argument PATHS states for directories to process municipalities. The last
      |  directory in each path shall be 5 digits (GGMMM) matching the Cadastral codes
      |  for Provincial Office (GG) and Municipality (MMM).""".stripMargin

  /** Parse argv exactly as the reference's ArgumentParser: flags may appear
    * anywhere, positionals accumulate into `path`, unknown options and bad
    * --log choices are errors. Returns the post-processed Options
    * (args string joined, building/address default rule applied —
    * __main__.py:214-218). */
  /** Single-char flags that may be bundled like argparse ('-bd'). */
  private val BundleFlags = Set('b', 'd', 'z', 'm', 'c', 'w', 'i', 'g', 'x')
  private val ValueShorts = Set('s', 'o', 'f', 'l')

  def parse(rawArgv: Seq[String]): Either[String, Options] = {
    // argparse-compatible token forms: '--opt=value' splits, and bundled
    // short flags ('-bd') expand when every char is a known flag
    val argv = rawArgv.flatMap {
      case a if a.startsWith("--") && a.contains("=") =>
        val i = a.indexOf('='); Seq(a.take(i), a.drop(i + 1))
      case a if a.length > 2 && a.startsWith("-") && !a.startsWith("--") &&
          a.drop(1).forall(BundleFlags) =>
        a.drop(1).map(c => s"-$c")
      // argparse's attached short-option value form: -sAtocha.geojson,
      // -oREFCAT, -fconf.yaml, -l28 split into flag + value
      case a if a.length > 2 && a.startsWith("-") && !a.startsWith("--") &&
          ValueShorts(a.charAt(1)) =>
        Seq(a.take(2), a.drop(2))
      case a => Seq(a)
    }
    var o = Options(args = rawArgv.mkString(" "))
    val paths = Seq.newBuilder[String]
    var i = 0
    def value(flag: String): Either[String, String] =
      if (i + 1 >= argv.length) Left(s"argument $flag: expected one argument")
      else { i += 1; Right(argv(i)) }
    while (i < argv.length) {
      argv(i) match {
        case "-v" | "--version" => o = o.copy(version = true)
        case "-b" | "--building" => o = o.copy(building = true)
        case "-d" | "--address" => o = o.copy(address = true)
        case "-z" | "--zoning" => o = o.copy(zoning = true)
        case "-m" | "--manual" => o = o.copy(manual = true)
        case "-c" | "--comment" => o = o.copy(comment = true)
        case "-w" | "--download" => o = o.copy(download = true)
        case "-i" | "--info" => o = o.copy(info = true)
        case "-g" | "--generate-config" => o = o.copy(generateConfig = true)
        case "-x" | "--gen-munis" => o = o.copy(generateMunicipalities = true)
        case "--municipality" => o = o.copy(municipality = true)
        case "-o" | "--parcel" =>
          value("-o/--parcel") match {
            case Left(e) => return Left(e)
            case Right(v) => o = o.copy(parcel = Seq(v))
          }
        case "-s" | "--split" =>
          value("-s/--split") match {
            case Left(e) => return Left(e)
            case Right(v) => o = o.copy(split = Some(v))
          }
        case "-f" | "--config-file" =>
          value("-f/--config-file") match {
            case Left(e) => return Left(e)
            case Right(v) => o = o.copy(configFile = Some(v))
          }
        case "--log" =>
          value("--log") match {
            case Left(e) => return Left(e)
            case Right(v) if logLevels(v.toUpperCase) =>
              o = o.copy(logLevel = v.toUpperCase)
            case Right(v) =>
              return Left(s"argument --log: invalid choice: '$v'")
          }
        case "-l" | "--list" =>
          // nargs='?' const='99': consume a value only if the next token
          // is not an option (__main__.py:91-104).
          if (i + 1 < argv.length && !argv(i + 1).startsWith("-")) {
            i += 1; o = o.copy(list = argv(i))
          } else o = o.copy(list = "99")
        case flag if flag.startsWith("-") && flag != "-" =>
          return Left(s"unrecognized arguments: $flag")
        case p => paths += p
      }
      i += 1
    }
    o = o.copy(path = paths.result())
    // if not options.building and not options.address: both (py:215-217)
    if (!o.building && !o.address) o = o.copy(building = true, address = true)
    // --municipality disables any split boundary (app.py:87-88)
    if (o.municipality) o = o.copy(split = None)
    Right(o)
  }

  /** The exact branch order of __main__.run (py:219-234). */
  def route(o: Options): Action =
    if (o.version) ShowVersion
    else if (o.generateConfig) GenerateConfig
    else if (o.generateMunicipalities) GenerateMunicipalities(o.path)
    else if (o.split.isDefined && o.path.length > 1)
      Fail("Can't use split file with multiple municipalities")
    else if (o.path.isEmpty && o.list.isEmpty) Usage
    else if (o.list.nonEmpty) ListCodes(o.list)
    else if (o.download) Download(o.path)
    else Process(o)

  /** config.prov_codes (config.py:559-612) — the static territorial-office
    * table behind `-l`. */
  val provCodes: ListMap[String, String] = ListMap(
    "02" -> "Albacete", "03" -> "Alicante", "04" -> "Almería",
    "05" -> "Ávila", "06" -> "Badajoz", "07" -> "Baleares",
    "08" -> "Barcelona", "09" -> "Burgos", "10" -> "Cáceres",
    "11" -> "Cádiz", "12" -> "Castellón", "13" -> "Ciudad Real",
    "14" -> "Córdoba", "15" -> "Coruña", "16" -> "Cuenca",
    "17" -> "Girona", "18" -> "Granada", "19" -> "Guadalajara",
    "21" -> "Huelva", "22" -> "Huesca", "23" -> "Jaén",
    "24" -> "León", "25" -> "Lleida", "26" -> "La Rioja",
    "27" -> "Lugo", "28" -> "Madrid", "29" -> "Málaga",
    "30" -> "Murcia", "32" -> "Ourense", "33" -> "Oviedo",
    "34" -> "Palencia", "35" -> "Las Palmas", "36" -> "Pontevedra",
    "37" -> "Salamanca", "38" -> "Santa Cruz de Tenerife",
    "39" -> "Cantabria", "40" -> "Segovia", "41" -> "Sevilla",
    "42" -> "Soria", "43" -> "Tarragona", "44" -> "Teruel",
    "45" -> "Toledo", "46" -> "Valencia", "47" -> "Valladolid",
    "49" -> "Zamora", "50" -> "Zaragoza", "51" -> "Cartagena",
    "52" -> "Gijón", "53" -> "Jerez de la Frontera", "54" -> "Vigo",
    "55" -> "Ceuta", "56" -> "Melilla")

  /** boundary.list_code (boundary.py:14-30,162-172). '99' lists the static
    * office table; a 2-digit code lists that province's municipalities via
    * the injected fetcher (the reference fetches the INSPIRE ATOM feed —
    * network, so callers supply the source); >2 digits needs Overpass
    * boundaries (out of scope here, same injection point). Invalid
    * province codes raise the reference's CatValueError message. */
  def listCode(
      code: String,
      municipalities: String => Seq[(String, String)]): Either[String, String] = {
    if (code == "99") {
      val title = "Territorial office"
      Right((Seq(title, "=" * title.length) ++
        provCodes.map { case (c, p) => s"$c $p" }).mkString("\n"))
    } else {
      val padded = if (code.length < 2) "0" * (2 - code.length) + code else code
      if (!provCodes.contains(padded) && padded.length <= 2)
        Left(s"Province code '$padded' is not valid")
      else {
        val title = s"Territorial office $padded - ${provCodes.getOrElse(padded, "")}"
        Right((Seq(title, "=" * title.length) ++
          municipalities(padded).map { case (c, n) => s"$c $n" }).mkString("\n"))
      }
    }
  }
}
