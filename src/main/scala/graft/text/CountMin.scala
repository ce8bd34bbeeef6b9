package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Count-Min sketch (Cormode & Muthukrishnan 2005): frequency
  * estimation over an unbounded key domain in `depth × width` counters —
  * the heavy-hitter primitive a 100 TB token pipeline uses where an exact
  * `groupBy(token)` would materialize billions of distinct keys it never
  * reads again. Estimates are upper bounds: `est ≥ truth` always, and
  * `est ≤ truth + εN` with probability 1−δ for width = ⌈e/ε⌉,
  * depth = ⌈ln 1/δ⌉.
  *
  * Reference analog: the reference's report histograms
  * (report.py *_stats counters) — generalized to the sub-linear-memory
  * sketch the same counts need at corpus scale.
  *
  * The sketch IS a DataFrame `(r, c, cnt)` — build is one scan that
  * explodes each item onto its `depth` (row, column) cells and ONE
  * groupBy(r, c) whose map-side combine collapses every partition to at
  * most depth×width partial rows: the wire cost is bounded by the SKETCH
  * size, not the corpus (the whole point). Probe is a depth-row equi-join
  * + min. All cell addressing is the engine-wide md5-48 idiom
  * ([[TextFns.hash48]]), so DuckDB rebuilds the BIT-IDENTICAL sketch and
  * the oracle gate is exact — collision overestimates included.
  */
object CountMin {

  /** Cell column of `key` for sketch row `r`. */
  def cellCol(key: Column, r: Int, width: Long): Column =
    TextFns.hash48(concat(key, lit(s"|cm$r"))) % width

  /** The depth cells of `key` as an array of (r, c) structs. */
  private def cells(key: Column, depth: Int, width: Long): Column =
    array((0 until depth).map(r =>
      struct(lit(r).as("r"), cellCol(key, r, width).as("c"))): _*)

  /** Build the sketch from a weighted key stream: `(r, c, cnt)` rows,
    * absent cells are zero. `weight` defaults to 1 per row. */
  def build(items: DataFrame, keyCol: String, depth: Int, width: Long,
      weight: Column = lit(1L)): DataFrame =
    items
      .select(explode(cells(col(keyCol), depth, width)).as("rc"),
        weight.as("wt"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(sum("wt").as("cnt"))

  /** Point-estimate each probe key against the sketch: min over the
    * depth cells (missing cell = 0). Returns probes + `est`. Probe rows
    * must be distinct (the merge groups by the probe's columns). */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Long): DataFrame = {
    val probeCols = probes.columns.map(col).toSeq
    probes
      .select(probeCols :+ explode(cells(col(keyCol), depth, width)).as("rc"): _*)
      .join(sketch, col("rc.r") === sketch("r") && col("rc.c") === sketch("c"),
        "left")
      .groupBy(probeCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge two sketches built with the SAME (depth, width): cell-wise
    * sum — the linearity that makes CM the incremental/streaming
    * frequency state (fold per-batch sketches with merge; estimates over
    * the merged sketch equal estimates over the concatenated stream,
    * exactly). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "c").agg(sum("cnt").as("cnt"))

  // ---- DuckDB parity fragments ----------------------------------------

  /** SQL for [[cellCol]] over key expression `k` (VARCHAR) and literal
    * row `r`. */
  def cellSql(k: String, r: Int, width: Long): String =
    s"(('0x' || substr(md5($k || '|cm$r'), 1, 12))::BIGINT % $width)"
}
