package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextFns

/** Distributed blocked Bloom filter over canonical keys — the
  * approximate-membership twin of the exact seen-set index
  * ([[Dedup.writeDedupIndex]]): where the exact index anti-joins a batch
  * against the full corpus KEY SET, the Bloom table answers the same
  * question from a bit table ~100× smaller, at a documented
  * false-positive rate and with ZERO false negatives.
  *
  * Reference analog: the seen-ID guard the reference keeps while merging
  * layers (`geo/osm.py` merge_duplicated's index dict) — generalized to
  * the crawl-frontier "have we seen this url" membership test that a
  * 10^12-page pipeline cannot answer with a driver-side set.
  *
  * Layout: one row per 62-bit word — `(w: long, bits: long)`. A key sets
  * TWO bits (k=2), both inside the single word `hash48(key||"|w") %
  * nWords`: the blocked-Bloom discipline (Putze/Sanders/Singler 2007,
  * "Cache-, Hash- and Space-Efficient Bloom Filters") — one probe touches
  * one word, so a membership test is ONE equi-join row lookup, never k
  * scattered reads. All hash math is the engine-wide md5-48-bit idiom
  * ([[TextFns.hash48]]), so DuckDB replays the filter BIT-IDENTICALLY —
  * false positives included — and the oracle gate is exact.
  *
  * 100 TB shape: build = one scan + one groupBy(w) with map-side BIT_OR
  * partials (the filter never exists on the driver; it IS a DataFrame,
  * writable bucketed-by-w like the exact index). Probe = equi-join on w —
  * broadcast when nWords is small, shuffle-on-long otherwise. Sizing:
  * nWords ≈ n_keys/4 gives ~8 bits/key ⇒ fp ≈ (1-e^(-8/62·2))²… in
  * practice ~2-4% at k=2; callers trade nWords for fp rate.
  *
  * ONLY bits 0..61 are used: DuckDB's `<<` on BIGINT is overflow-checked
  * (the engine-wide <=30-bit Morton-axis rule, CellGrid.scala), so bit 62
  * and the sign bit stay clear and `1::BIGINT << p` is wrap-free in both
  * engines.
  */
object Bloom {

  /** Bits usable per word (see overflow note above). */
  val WordBits = 62

  /** Word index of `key` (a string column) in a `nWords`-word filter. */
  def word(key: Column, nWords: Long): Column =
    TextFns.hash48(concat(key, lit("|w"))) % nWords

  private def bitPos(key: Column, salt: String): Column =
    TextFns.hash48(concat(key, lit(salt))) % WordBits

  /** The two-bit mask `key` sets inside its word. */
  def maskOf(key: Column): Column = {
    def bit(salt: String): Column = shiftleft(lit(1L), bitPos(key, salt))
    bit("|b1").bitwiseOR(bit("|b2"))
  }

  /** Column-valued shiftleft: `functions.shiftleft` only takes a literal
    * Int shift, so route through the SQL function. */
  private def shiftleft(one: Column, pos: Column): Column =
    call_function("shiftleft", one, pos.cast("int"))

  /** Build the filter table `(w, bits)` from a key column: one scan, one
    * groupBy(w) with map-side bit_or partials. Empty words are absent
    * (the probe left-join reads absence as all-zero). */
  def build(keys: DataFrame, keyCol: String, nWords: Long): DataFrame =
    keys.select(word(col(keyCol), nWords).as("w"), maskOf(col(keyCol)).as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))

  /** Probe: adds `maybe_seen` to `probes` — true iff BOTH of the key's
    * bits are set in its word. No false negatives by construction; false
    * positives at the documented rate, bit-identical in any engine that
    * replays the md5 math. */
  def probe(filter: DataFrame, probes: DataFrame, keyCol: String,
      nWords: Long): DataFrame = {
    val p = probes
      .withColumn("__w", word(col(keyCol), nWords))
      .withColumn("__m", maskOf(col(keyCol)))
    p.join(filter.withColumnRenamed("w", "__w"), Seq("__w"), "left")
      .withColumn("maybe_seen",
        coalesce(col("bits").bitwiseAND(col("__m")) === col("__m"), lit(false)))
      .drop("__w", "__m", "bits")
  }

  // ---- persisted index (the incremental-ingest shape) -----------------

  /** Persist the filter BUCKETED AND SORTED by word — the Bloom twin of
    * [[Dedup.writeDedupIndex]]: the filter's shuffle is paid once at
    * write time, every later probe joins it exchange-free on the index
    * side. At 10^12 keys the filter is nWords rows (∝ corpus), so never
    * re-shuffling it per probe batch is the same game as the exact
    * index — at ~1/100 the bytes. */
  def writeIndex(keys: DataFrame, keyCol: String, nWords: Long,
      table: String, buckets: Int): Unit =
    graft.sources.Bucketed.writeBucketed(
      build(keys, keyCol, nWords), table, "w", buckets)

  /** Append new keys' words to an existing index. Appended rows are NOT
    * merged with the stored ones (parquet is immutable); [[probeIndex]]
    * bit_or-merges all rows of a word at probe time, so membership stays
    * exact-Bloom after any number of appends. Rebuild via [[writeIndex]]
    * occasionally to compact. */
  def appendIndex(newKeys: DataFrame, keyCol: String, nWords: Long,
      table: String): Unit =
    graft.sources.Bucketed.appendBucketed(
      build(newKeys, keyCol, nWords), table)

  /** Probe against a persisted index table: same contract as [[probe]],
    * but the filter side is the bucketed table (zero exchange, zero sort
    * on the index side — asserted in the spec) and per-word rows from
    * appends are bit_or-merged per probe. Only the probe batch shuffles.
    * Contract: probe ROWS must be distinct (carry an id) — the merge
    * groups by the probe's columns. */
  def probeIndex(probes: DataFrame, keyCol: String, nWords: Long,
      table: String): DataFrame = {
    val spark = probes.sparkSession
    val p = probes
      .withColumn("__w", word(col(keyCol), nWords))
      .withColumn("__m", maskOf(col(keyCol)))
    val probeCols = probes.columns.map(col).toSeq
    p.join(spark.table(table).withColumnRenamed("w", "__w"), Seq("__w"), "left")
      .groupBy((probeCols :+ col("__m")): _*)
      .agg(expr("bit_or(bits)").as("__bits"))
      .withColumn("maybe_seen",
        coalesce(col("__bits").bitwiseAND(col("__m")) === col("__m"), lit(false)))
      .drop("__m", "__bits")
  }

  // ---- DuckDB parity fragments (the oracle replays the exact bits) ----

  /** SQL for [[word]] over key expression `k` (VARCHAR). */
  def wordSql(k: String, nWords: Long): String =
    s"(('0x' || substr(md5($k || '|w'), 1, 12))::BIGINT % $nWords)"

  private def bitPosSql(k: String, salt: String): String =
    s"(('0x' || substr(md5($k || '$salt'), 1, 12))::BIGINT % $WordBits)"

  /** SQL for [[maskOf]] over key expression `k`. */
  def maskSql(k: String): String =
    s"((1::BIGINT << ${bitPosSql(k, "|b1")}::INT) | (1::BIGINT << ${bitPosSql(k, "|b2")}::INT))"
}
