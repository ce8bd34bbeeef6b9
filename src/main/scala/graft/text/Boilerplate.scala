package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level template (boilerplate) removal: a paragraph that appears on
  * at least `minFrac` of a host's pages is site furniture — navigation,
  * footer, cookie banner — and is stripped from EVERY page of that host.
  * This is the template-removal discipline of CCNet/boilerplate cleanup,
  * and the complement of corpus-wide first-occurrence paragraph dedup
  * (which keeps one copy; furniture must keep zero). Reference analog:
  * the reference drops repeated fixed attributes at copy_feature time
  * (base.py:88-155 rename/drop discipline) — here the "attribute" is a
  * repeated text block discovered from the data itself.
  *
  * Scale shape: paragraphs explode once with their position; the
  * (host, para-hash) page-frequency aggregate is map-side combinable on
  * constant-width keys (8-byte hash + host); the boilerplate table holds
  * only paragraphs above the threshold (furniture is rare per host,
  * never corpus-sized) and removal is one anti join on the SAME
  * (host, hash) key the aggregate shuffled on; reassembly sorts each
  * document's own paragraphs only (array_sort over a collected
  * (pos, para) struct list — per-doc cost, no global sort). Paragraph
  * membership per page is DISTINCT (a paragraph repeated twice on one
  * page counts that page once), matching the "fraction of pages" rule.
  *
  * Input: (idCol, hostCol, parasCol: array<string>).
  * Output: (idCol, hostCol, paras_clean: array<string>, n_stripped). */
object Boilerplate {

  def stripHostBoilerplate(pages: DataFrame, idCol: String, hostCol: String,
      parasCol: String, minFrac: Double = 0.5, minPages: Int = 2): DataFrame = {
    val p = pages.select(col(idCol).as("id"), col(hostCol).as("host"),
      posexplode(col(parasCol)).as(Seq("pos", "para")))
      .withColumn("ph", xxhash64(col("para")))
    val hostPages = pages.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n_pages"))
    // page frequency per (host, paragraph): DISTINCT pages containing it
    val freq = p.select("host", "ph", "id").distinct()
      .groupBy("host", "ph").agg(count(lit(1)).as("n_with"))
    val boiler = freq.join(hostPages, "host")
      .filter(col("n_with") >= minPages &&
        col("n_with") >= lit(minFrac) * col("n_pages"))
      .select("host", "ph")
    val kept = p.join(boiler, Seq("host", "ph"), "left_anti")
    pages.select(col(idCol).as("id"), col(hostCol).as("host"),
        size(col(parasCol)).as("n_paras"))
      .join(
        kept.groupBy("id")
          .agg(array_sort(collect_list(struct(col("pos"), col("para"))))
            .as("sorted")),
        Seq("id"), "left")
      .select(col("id").as(idCol), col("host").as(hostCol),
        coalesce(transform(col("sorted"), s => s.getField("para")),
          array().cast("array<string>")).as("paras_clean"),
        // size() on the coalesced array, not on `sorted`: size(NULL) is -1
        // in non-ANSI mode, which would over-count all-furniture pages
        (col("n_paras") - size(coalesce(transform(col("sorted"),
          s => s.getField("para")), array().cast("array<string>"))))
          .cast("long").as("n_stripped"))
  }
}
