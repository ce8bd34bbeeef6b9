package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style paragraph-level deduplication: every paragraph that appears
  * more than once in the corpus is kept only at its FIRST occurrence
  * (lowest (doc_id, position)); documents are reassembled from their
  * surviving paragraphs in order.
  *
  * This is the corpus-wide sibling of the reference's duplicate-geometry
  * collapse (Osm.merge_duplicated, catatom2osm/osm.py:360: identical
  * elements keep one canonical copy, references rewired) applied at
  * sub-document granularity, and the standard web-corpus cleaning step
  * between exact-document dedup and near-dup (CCNet splits on '\n' and
  * drops repeated paragraph hashes; the synthetic corpus has no newlines,
  * so the paragraph unit here is a deterministic non-overlapping
  * `wordsPerPara`-word chunk).
  *
  * 100 TB shape: paragraphs are shuffled ONCE, keyed by their 128-bit md5
  * (constant-width key, no paragraph text on the wire for the aggregate
  * side); the min-occurrence winner comes from a map-side-partial `min` on
  * an 8-byte encoded (doc, pos) key. The rejoin that flags survivors is a
  * second shuffle on the same hash key (AQE co-locates it with the first),
  * and reassembly is one aggregate on doc_id. Nothing global, no windows,
  * no sorts — three hash exchanges total, all on fixed-width keys.
  */
object ParaDedup {

  /** docs(doc_id, text) -> (doc_id, chunk_i, para): non-overlapping
    * wordsPerPara-word chunks, scan-shaped (split + sequence + transform +
    * posexplode, all codegen). */
  def paragraphs(docs: DataFrame, wordsPerPara: Int = 10): DataFrame = {
    val w = wordsPerPara
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(ws) / $w.0) as int) - 1," +
          s" 1), i -> array_join(slice(ws, i * $w + 1, $w), ' '))")))
      .toDF("doc_id", "chunk_i", "para")
  }

  /** Corpus-wide first-occurrence-wins paragraph dedup. Returns one row
    * per document: (doc_id, n_paras, n_kept, text_kept) where text_kept is
    * the space-joined surviving chunks in original order. `posWidth` must
    * exceed the maximum chunks per document (it encodes (doc_id, chunk_i)
    * into one comparable long). */
  def dedupParagraphs(docs: DataFrame, wordsPerPara: Int = 10,
      posWidth: Long = 1000000L): DataFrame = {
    val keyed = paragraphs(docs, wordsPerPara)
      // md5 = 128-bit content key: collision-free in practice at any
      // corpus size (CCNet uses sha1 the same way); fixed 32-byte shuffle
      // width regardless of paragraph length
      .withColumn("h", md5(col("para")))
      .withColumn("k", col("doc_id") * posWidth + col("chunk_i"))
    val persisted = graft.CacheBin.persist(keyed)
    val firsts = persisted.groupBy("h").agg(min("k").as("keep"))
    persisted
      .join(firsts, "h")
      .withColumn("kept", col("k") === col("keep"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("chunk_i"), col("para"))))),
          s => s.getField("para")), " ").as("text_kept"))
  }
}
