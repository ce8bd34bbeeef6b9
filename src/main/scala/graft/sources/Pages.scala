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
    regexp_extract(decode(html, "utf-8"), "(?s)<body><p>(.*?)</p>", 1)

  /** documents -> pages whose html additionally carries a deterministic
    * anchor footer, giving the corpus a real hyperlink structure to mine:
    * page `doc_id` links to targets `(doc_id*131 + 7*j) % n` for
    * `j = 0 .. doc_id%4` (so out-degree 1..4, never dangling), and every
    * page lives on host `h{id%16}.example`. `n` is the table's row count,
    * passed in so the synthesis stays a pure column map (one scan, no
    * inner count job). The link targets are arithmetic in doc_id, which is
    * what lets DuckDB regenerate the exact edge set without parsing HTML —
    * the Spark side must recover it from the bytes with real regex
    * extraction (WebGraph.hostEdges). */
  def fromDocumentsLinked(spark: SparkSession, sfDir: String, n: Long): DataFrame =
    linkedPagesFrom(spark.read.parquet(s"$sfDir/documents.parquet"), n)

  /** The same linked-page synthesis as a pure column map over any
    * documents-shaped frame — batch OR streaming (the streaming link
    * windows reuse it over a readStream of the same parquet). */
  def linkedPagesFrom(docs: DataFrame, n: Long): DataFrame = {
    def pageUrl(id: Column): Column =
      concat(lit("https://h"), id % 16, lit(".example/doc/"), id)
    val anchors = array_join(
      transform(sequence(lit(0L), col("doc_id") % 4), j => {
        val tgt = (col("doc_id") * 131L + lit(7L) * j) % lit(n)
        concat(lit("<a href=\""), pageUrl(tgt), lit("\">a"),
          col("doc_id"), lit("x"), j, lit("</a>"))
      }), "")
    docs.select(
      pageUrl(col("doc_id")).as("url"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("warc_ts"),
      encode(concat(
        lit("<html><head><title>"), col("lang"),
        lit("</title></head><body><p>"), col("text"),
        lit("</p>"), anchors, lit("</body></html>")), "utf-8").as("html"),
      col("text"), col("lang"))
  }

  /** Invariant scan: rows where extract(html) == text, as one summary row. */
  def invariantCheck(pages: DataFrame): DataFrame =
    pages.agg(
      count(lit(1)).as("n_total"),
      sum(when(extractText(col("html")) === col("text"), 1L).otherwise(0L)).as("n_match"))
}
