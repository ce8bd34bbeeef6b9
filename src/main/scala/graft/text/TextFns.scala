package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the web-pages/documents table.
  * All are pure Catalyst expressions (whole-stage-codegen friendly, no UDF),
  * mirroring the reference's string-normalization discipline
  * (catatom2osm/hgwnames.py:11-46) generalized to corpus analytics.
  */
object TextFns {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count via length arithmetic (identical to the oracle SQL form). */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + lit(1)).cast("long")

  /** BPE-ish subword count: split on word boundaries + digits, drop empties. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), t => length(t) > lit(0))).cast("long")

  /** Occurrences of `word` as a standalone token, via length arithmetic so
    * the DuckDB oracle can reproduce it exactly: in ' '||text||' ' replace
    * ' word ' by ' ' and divide the length delta by len(word)+1. */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val target = s" $word "
    ((length(padded) - length(replaceLit(padded, target, " "))) / lit(target.length - 1))
      .cast("long")
  }

  /** Quality-score components (length / stopword ratios; reference-style
    * deterministic scoring). Returns struct columns for select(). */
  def charLen(text: Column): Column = length(text).cast("long")

  def stopwordCount(text: Column, stops: Seq[String]): Column =
    stops.map { w =>
      val t = s" $w "
      val padded = concat(lit(" "), text, lit(" "))
      ((length(padded) - length(replaceAll(padded, t, " "))) / lit(t.length - 1)).cast("long")
    }.reduce(_ + _)

  /** Non-regex replace (maps to DuckDB replace()). Spark's `replace` SQL
    * function is string translate; use regexp_replace with quoted pattern. */
  private def replaceAll(c: Column, find: String, repl: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(find), repl)

  def replaceLit(c: Column, find: String, repl: String): Column = replaceAll(c, find, repl)

  /** Stopword-based language id: argmax of per-language stopword hit counts.
    * n-gram-heuristic class of classifier (deterministic, data-independent). */
  val langLexicon: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "es"),
    "fr" -> Seq("le", "la", "et", "de", "un", "en", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  def langId(text: Column): Column = {
    val toks = array_distinct(split(lower(text), "[^\\p{L}]+"))
    val scored = langLexicon.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang desc) -> deterministic
    val best = scored.reduce { (a, b) =>
      when(b("score") > a("score"), b).otherwise(a)
    }
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  /** Punctuation ratio, rounded for fp-stable comparison. */
  def punctRatio(text: Column): Column =
    round(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        length(text),
      4)

  /** 64-bit FNV-1a rolling document fingerprint — pure Scala scalar, used
    * inside typed map for fingerprint dedup. Deterministic across JVMs. */
  def fingerprint64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Token-sort-ratio fuzzy match (reference hgwnames.match,
    * catatom2osm/hgwnames.py:49-70): Levenshtein ratio over token-sorted
    * strings, in [0, 100]. */
  def tokenSortRatio(a: String, b: String): Int = {
    def norm(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).sorted.mkString(" ")
    val x = norm(a); val y = norm(b)
    val tot = x.length + y.length
    if (tot == 0) 100
    else {
      val d = levenshteinDist(x, y)
      // SequenceMatcher-style ratio: 2*M/T with M = matched chars ≈ T - d
      math.round(100.0 * (tot - 2.0 * d) / tot).toInt.max(0)
    }
  }

  /** Street-name normalization (reference hgwnames.parse,
    * catatom2osm/hgwnames.py:15-46): expand the leading way-type
    * abbreviation via the dictionary, drop excluded types entirely,
    * Title-Case the rest with articles lowercased (except when first),
    * preserving apostrophe prefixes (l'Eixample) per the reference's rules. */
  def parseStreetName(
      name: String,
      abbrevs: Map[String, String] = StreetAbbrevs,
      articles: Set[String] = Articles,
      excluded: Set[String] = ExcludedTypes): String = {
    val words = name.trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return ""
    val typ = words.head.toUpperCase.stripSuffix(".")
    if (excluded.contains(typ)) return ""
    val expanded = abbrevs.getOrElse(typ, words.head)
    val rest = words.tail.map(_.toLowerCase)
    def caseWord(w: String, first: Boolean): String =
      if (!first && articles.contains(w)) w
      else if (w.contains("'") && w.indexOf('\'') <= 2) {
        // apostrophe prefix: l'eixample -> l'Eixample
        val i = w.indexOf('\'') + 1
        w.substring(0, i) + w.substring(i).capitalize
      } else w.capitalize
    (titleCase(expanded) +: rest.zipWithIndex.map { case (w, i) => caseWord(w, first = false) })
      .mkString(" ")
  }

  private def titleCase(s: String): String =
    s.toLowerCase.split(" ").map(_.capitalize).mkString(" ")

  /** A representative slice of the reference's dictionaries
    * (config.py:94-416 has the full Spanish set). */
  val StreetAbbrevs: Map[String, String] = Map(
    "CL" -> "Calle", "AV" -> "Avenida", "PZ" -> "Plaza", "CR" -> "Carretera",
    "CM" -> "Camino", "PS" -> "Paseo", "TR" -> "Travesía", "RD" -> "Ronda")
  val Articles: Set[String] = Set("de", "del", "la", "las", "el", "los", "y", "al", "en")
  val ExcludedTypes: Set[String] = Set("DS", "ER", "EX") // diseminados etc.

  def levenshteinDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0)
      dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(
          math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }
}
