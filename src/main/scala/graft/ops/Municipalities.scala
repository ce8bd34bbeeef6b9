package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.text.TextFns

/** The municipalities.csv builder (reference catatom2osm/municipalities.py:
  * 38-156, the computable core — the atom/zip downloads are zero-egress
  * n/a): Cadastre AD municipality names fuzzy-join against the IGN
  * Administrative Units names WITHIN their province, token-sort-ratio > 60,
  * falling back to the original name. Expressed as a per-province cogroup:
  * provinces parallelize, each group's pool is the province's IGN list in
  * municipality-code order (the reference dict's file order).
  */
object Municipalities {
  val MatchThr = 60

  /** municipalities.normalize (municipalities.py:38-39): lower+strip first,
    * then drop any parenthesized tail. */
  def normalize(text: String): String =
    (if (text == null) "" else text).toLowerCase.trim.replaceAll(" *\\(.*\\)", "")

  /** municipalities.clean (municipalities.py:42-48). */
  def clean(text: String): String = text.replaceAll(" +", " ").trim

  /** municipalities.match (municipalities.py:51-72): extractOne with
    * token_sort_ratio over the normalized pool; the winner maps back to the
    * FIRST choice with that normalized form (list.index), > 60 required. */
  def matchMun(name: String, choices: Seq[String]): String = {
    if (name == null || name.isEmpty || choices.isEmpty) return name
    val normalized = choices.map(normalize)
    val q = normalize(name)
    val scores = normalized.map(c => TextFns.tokenSortRatio(q, c))
    val bestIdx = scores.indices.maxBy(scores)
    if (scores(bestIdx) > MatchThr)
      choices(normalized.indexOf(normalized(bestIdx)))
    else name
  }

  /** generate_mun_csv (municipalities.py:96-156) as a Dataset cogroup:
    * input rows are (prov, code, catName) / (prov, munCode, ignName) /
    * (code, oldCol2); output (code, col2, name) — one row per Cadastre
    * municipality, col2 preserved from the old table ('123456' default). */
  def generateMunD(
      catAd: Dataset[(String, String, String)],
      ignAu: Dataset[(String, String, String)],
      old: Dataset[(String, String)]): DataFrame = {
    val spark = catAd.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val matched = catAd.groupByKey(_._1)
      .cogroup(ignAu.groupByKey(_._1)) { (_, cIt, iIt) =>
        val pool = iIt.toSeq.sortBy(_._2).map(_._3)
        cIt.map { case (_, code, name) =>
          (clean(code), clean(matchMun(clean(name), pool)))
        }
      }
      .toDF("code", "name")
    matched
      .join(old.toDF("code", "col2"), Seq("code"), "left")
      .select(col("code"), coalesce(col("col2"), lit("123456")).as("col2"), col("name"))
  }
}
