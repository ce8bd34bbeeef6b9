package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graft input table shape (BASELINE.json input_hint): web pages with
  * (url, warc_ts, html:binary, text, lang) and the per-row invariant that
  * `text` is byte-identical to the deterministic extraction of `html` —
  * the discipline of the reference's fix_encoding/fix_amp ingest
  * (catatom2osm/catatom.py:178-202): text is a pure function of the bytes,
  * never regenerated lossily.
  *
  * The sandbox has no Common-Crawl data, so pages are synthesized from the
  * documents table: html wraps text in deterministic markup (utf-8 binary);
  * extraction decodes and strips the markup. Both directions are Catalyst
  * expressions — the invariant check is a full-scan codegen filter.
  */
object Pages {

  /** documents -> pages(url, warc_ts, html, text, lang). */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("https://synth.example/doc/"), col("doc_id")).as("url"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("warc_ts"),
        encode(concat(
          lit("<html><head><title>"), col("lang"),
          lit("</title></head><body><p>"), col("text"),
          lit("</p></body></html>")), "utf-8").as("html"),
        col("text"), col("lang"))

  /** Deterministic pure extraction: bytes -> text (the invariant function). */
  def extractText(html: Column): Column =
    regexp_extract(decode(html, "utf-8"), "(?s)<body><p>(.*)</p></body>", 1)

  /** Invariant scan: rows where extract(html) == text, as one summary row. */
  def invariantCheck(pages: DataFrame): DataFrame =
    pages.agg(
      count(lit(1)).as("n_total"),
      sum(when(extractText(col("html")) === col("text"), 1L).otherwise(0L)).as("n_match"))
}
