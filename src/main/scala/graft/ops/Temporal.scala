package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/grouping operators over the crawl timeline — the time
  * axis twin of the covering-cell spatial family in
  * [[graft.spatial.SpatialJoin]].
  *
  * The input_hint's pages table carries `warc_ts`: every question the
  * reference answers spatially ("which zone contains this point" —
  * `layer.py` set_zones; "which building is nearest this address" —
  * `cbcn.py` get_address) has a temporal twin over crawl history:
  * "which revision was live at time t" (as-of), "which events fall in
  * this interval" (range join), "split this url's fetch history into
  * visits" (sessionize). All three are expressed as single-exchange
  * Catalyst plans — no inequality-only joins, no driver state.
  */
object Temporal {

  /** As-of join: for every probe row, the latest snapshot of the same
    * `key` with `snapTs <= probeTs` (inclusive), or NULLs when the probe
    * predates all snapshots (left-outer semantics).
    *
    * Plan: tag + union both sides, ONE exchange on `key`, and a
    * per-key time-ordered window where `last(payload, ignoreNulls)`
    * carries the most recent snapshot forward into each probe row.
    * Snapshots sort BEFORE a probe at the same timestamp, giving the
    * inclusive bound. This is the scale-safe as-of shape: cost is one
    * shuffle of |probes|+|snaps| rows and a per-key sort bounded by that
    * key's history — never a cross-key sort, never an O(|P|·|S|)
    * inequality join. At 10^12 pages a hot url only pays for its own
    * revision count; skew lands on AQE like any groupBy key.
    *
    * Contract: `probes` carries (`key`, `probeTs`, extra probe columns);
    * `snaps` carries (`key`, `snapTs`, `payload` columns, all named
    * distinctly from probe columns). Output = probe columns + `payload`
    * (as-of values) + `asof_ts` (matched snapshot time, long).
    */
  def asofJoin(probes: DataFrame, snaps: DataFrame, key: String,
      probeTs: String, snapTs: String, payload: Seq[String]): DataFrame = {
    val probeCols = probes.columns.toSeq
    val snapTyped = payload.map(c => c -> snaps.schema(c).dataType)

    val pSide = snapTyped.foldLeft(
      probes.withColumn("__ts", col(probeTs).cast("long"))
        .withColumn("__probe", lit(1))
    ) { case (df, (c, dt)) => df.withColumn(c, lit(null).cast(dt)) }

    val sSide = probeCols.filterNot(_ == key).foldLeft(
      snaps.withColumn("__ts", col(snapTs).cast("long"))
        .withColumn("__probe", lit(0))
        .drop(snapTs)
    ) { (df, c) => df.withColumn(c, lit(null).cast(probes.schema(c).dataType)) }

    // snapshots (__probe=0) sort before probes at equal __ts → inclusive
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val snapOnly = (c: Column) => when(col("__probe") === 0, c)

    val carried = payload.foldLeft(
      pSide.unionByName(sSide.select(pSide.columns.map(col).toIndexedSeq: _*))
        .withColumn("asof_ts", last(snapOnly(col("__ts")), ignoreNulls = true).over(w))
    ) { (df, c) =>
      df.withColumn(c, last(snapOnly(col(c)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__probe") === 1).drop("__ts", "__probe")
  }

  /** Range (interval) join: inner-join `points` rows whose `tsCol` falls
    * in `[startCol, endCol)` of an `intervals` row, via temporal tiling —
    * the 1-D twin of the covering-cell PIP join
    * ([[graft.spatial.SpatialJoin]], reference R-tree candidate step
    * `base.py:331-336`).
    *
    * Each interval explodes onto the coarse time buckets it covers
    * (bounded replication: ≤ ceil(maxDuration/bucketSec)+1 copies); each
    * point maps to exactly ONE bucket, so every qualifying pair meets in
    * exactly one bucket and needs NO distinct. The join is a plain
    * equi-join on bucket with the range predicate refined inside the
    * same join condition — shuffles both sides once (or broadcasts the
    * interval side when small), versus the cartesian fallback Spark
    * plans for a bare inequality join. Degenerate intervals
    * (`end <= start`) match nothing and are dropped up front (also keeps
    * `sequence()` from running backwards).
    *
    * Pick `bucketSec` ≥ the typical interval duration: hot buckets (time
    * skew) then behave like any skewed join key — AQE skew-split or salt.
    */
  def rangeJoin(points: DataFrame, tsCol: String, intervals: DataFrame,
      startCol: String, endCol: String, bucketSec: Long): DataFrame = {
    val ivb = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__ib", explode(sequence(
        floor(col(startCol) / bucketSec).cast("long"),
        floor((col(endCol) - 1) / bucketSec).cast("long"))))
    val ptb = points.withColumn("__pb", floor(col(tsCol) / bucketSec).cast("long"))
    ptb.join(ivb,
        ptb("__pb") === ivb("__ib") &&
          col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__pb", "__ib")
  }

  /** Gap-based sessionization: split each key's event stream into
    * sessions wherever consecutive events are more than `gapSec` apart
    * (a gap of exactly `gapSec` stays in-session). Appends `session_no`
    * (long, 1-based per key). The temporal twin of the reference's
    * adjacency grouping (`layer.py` get_adjacents merges features that
    * touch; this merges events that touch in time).
    *
    * Plan: ONE exchange on `key` + one per-key sort shared by both
    * window frames (lag to flag session breaks, running sum to number
    * them) — Catalyst plans a single Exchange/Sort pair for both. Per-key
    * cost is that key's own event count; `tieBreak` makes the order (and
    * therefore session numbering) deterministic under equal timestamps.
    */
  def sessionize(events: DataFrame, key: String, ts: String,
      tieBreak: String, gapSec: Long): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val prev = lag(col(ts), 1).over(order)
    val brk = when(prev.isNull || col(ts) - prev > gapSec, 1L).otherwise(0L)
    events
      .withColumn("__brk", brk)
      .withColumn("session_no", sum("__brk").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** First-order Markov transition matrix over each key's event stream:
    * counts and probabilities of consecutive (state → next state) steps,
    * ordered by (ts, tieBreak) per key — the navigation-flow / funnel
    * profile a web-analytics pipeline derives from session logs.
    *
    * Plan: the SAME one-exchange-one-sort shape as [[sessionize]] (lead
    * over the per-key order; per-key cost = that key's own event count),
    * then a transition rollup whose map-side combine collapses every
    * partition to ≤ |states|² partial rows — the output (and the second
    * exchange) is state-vocabulary-sized, never corpus-sized, the same
    * wire bound as the Count-Min / HLL sketch family. Probability is
    * count/total_from rounded to 6dp so cross-engine division grids agree.
    */
  def transitionMatrix(events: DataFrame, key: String, ts: String,
      tieBreak: String, state: String): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val steps = events
      .withColumn("__next", lead(col(state), 1).over(order))
      .filter(col("__next").isNotNull)
      .select(col(state).as("from_state"), col("__next").as("to_state"))
    val counts = steps.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy("from_state")
    counts
      .withColumn("p", round(col("n").cast("double") /
        sum("n").over(totals), 6))
  }

  /** Retention cohorts: users grouped by first-activity bucket (their
    * cohort), counted per (cohort, age) where age = activity bucket −
    * cohort bucket — the day-N retention table every activity log feeds.
    * `bucket` is the time bucket column expression (e.g. epoch-day).
    *
    * Shape: first-seen per user is ONE map-side-combining min aggregate on
    * the user key; the join back onto the user's own activity is
    * user-keyed (co-partitioned with the aggregate output — AQE plans it
    * without a second exchange of the big side when bucketing matches);
    * the final rollup first collapses to DISTINCT (user, cohort, age) —
    * map-side — so the count-distinct never ships raw events. Output is
    * bounded by cohorts × max-age, never corpus-sized. */
  def retentionCohorts(events: DataFrame, key: String,
      bucket: org.apache.spark.sql.Column): DataFrame = {
    val acts = events.select(col(key).as("u"), bucket.as("b"))
    val first = acts.groupBy("u").agg(min("b").as("cohort"))
    acts.join(first, "u")
      .select(col("u"), col("cohort"), (col("b") - col("cohort")).as("age"))
      .distinct()
      .groupBy("cohort", "age")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Burst detection over keyed event-count windows (the integer-exact
    * core of Kleinberg 2002's bursty-stream model, as a threshold rule):
    * window w of key k bursts when its count exceeds num/den × the mean
    * of the key's `baseline` previous NON-EMPTY windows — the
    * trending-topic / crawl-anomaly signal. The comparison is the integer
    * cross-multiplication n·baseline·den > trail·num, so engines cannot
    * disagree on a division grid; windows without a full trailing history
    * never burst (warm-up is explicit, not NULL-dependent).
    *
    * Shape: one map-side-combined count exchange to (key, window) rows —
    * the value DOMAIN, not the corpus — then lag-frame sums over the
    * per-key window order ([[sessionize]]'s one-exchange-one-sort
    * discipline; per-key cost = that key's own window count, and a hot
    * key's windows are bounded by the time range, not the event volume).
    *
    * Returns (key, win, n, trail, trail_w, burst). */
  def bursts(events: DataFrame, key: String, win: Column,
      baseline: Int, num: Long, den: Long): DataFrame = {
    val counts = events.groupBy(col(key), win.as("win"))
      .agg(count(lit(1)).as("n"))
    val frame = Window.partitionBy(key).orderBy("win")
      .rowsBetween(-baseline, -1)
    counts
      .withColumn("trail", coalesce(sum("n").over(frame), lit(0L)))
      .withColumn("trail_w", count(lit(1)).over(frame))
      .withColumn("burst",
        col("trail_w") === baseline &&
          col("n") * baseline * den > col("trail") * num)
  }

  /** Ordered k-step funnel: how many users reach each stage of
    * `steps` IN ORDER (stage i's earliest event must be strictly after
    * the user's stage-(i−1) entry time). Returns (stage, step, n_users)
    * with stage 1-based.
    *
    * Shape: one user-keyed min aggregate per step, each joined back onto
    * the (already user-partitioned) event stream — k small co-partitioned
    * joins of user-sized tables, NO per-user sort and no event
    * materialization beyond the scan. k is the funnel length (constant);
    * the user tables are corpus-user-sized, each carrying one timestamp. */
  def funnel(events: DataFrame, key: String, ts: String, state: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(key).as("u"), col(ts).as("t"), col(state).as("s"))
    // reached(i): (u, t_prev) = the user's earliest qualifying entry time
    // of step i. Each stage is persisted (CacheBin — caller drains): stage
    // i+1 and stage i's count both read it, and the tables are user-sized
    // with one timestamp, the cheapest thing in the job to cache.
    var reached = graft.CacheBin.persist(
      e.filter(col("s") === steps.head).groupBy("u").agg(min("t").as("t_prev")))
    def stageCount(i: Int, st: String, r: DataFrame): DataFrame =
      r.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step"), lit(st).as("state"), col("n_users"))
    var out = stageCount(1, steps.head, reached)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = graft.CacheBin.persist(
        e.filter(col("s") === st)
          .join(reached, "u")
          .filter(col("t") > col("t_prev"))
          .groupBy("u").agg(min("t").as("t_prev")))
      out = out.unionByName(stageCount(i + 1, st, reached))
    }
    out
  }
}
