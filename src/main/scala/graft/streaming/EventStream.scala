package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming face of the engine. The reference is batch-only
  * (SURVEY §2.8), so streaming here covers the graft's ingest shape: a
  * watermarked tumbling-window aggregation over the events table that is
  * provably equivalent to the batch q_event_windows query — the streaming
  * and batch plans share the same grouping semantics, so a pipeline can
  * switch between backfill (batch) and live (stream) with identical results.
  */
object EventStream {

  /** Tumbling 5-minute windowed counts/sums, streaming flavor. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        (unix_micros(col("window.start")) / lit(300000000L)).cast("long").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup — the live flavor of Osm.merge_duplicated /
    * Dedup.exactDedup: custom state via flatMapGroupsWithState keyed by the
    * canonical key; a key emits exactly once (its first-seen batch's min
    * id), every later occurrence is swallowed by the per-key state. The
    * state is one boolean+long per distinct key, partitioned by key — the
    * 10^12-row shape (state ∝ distinct keys per executor, not rows). */
  def streamingDedup(keyed: org.apache.spark.sql.Dataset[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val keepId = it.map(_._2).min
            state.update(keepId)
            Iterator((k, keepId))
          }
      }
      .toDF("k", "keep_id")
  }

  /** streamingDedup with BOUNDED state (VERDICT r2 item 6): event-time
    * watermark + per-key timeout eviction. Semantics change vs the
    * unbounded flavor, documented: a key emits once per TTL window — after
    * its state is evicted (no occurrence for `ttl` past the watermark), a
    * reappearance emits again. State is therefore ∝ keys ACTIVE within the
    * watermark horizon, not all keys ever seen — the 10^12-distinct-key
    * shape a 100 TB stream needs. */
  def streamingDedupTtl(
      keyed: org.apache.spark.sql.Dataset[(String, Long, java.sql.Timestamp)],
      ttlMs: Long = 10 * 60 * 1000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.toDF("k", "id", "ets")
      .withWatermark("ets", watermarkDelay)
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[(String, Long, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // evicted: the key may emit again later
            Iterator.empty
          } else if (state.exists) {
            // key still hot: push the eviction horizon out, swallow rows
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs + ttlMs)
            Iterator.empty
          } else {
            val keepId = it.map(_._2).min
            state.update(keepId)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs + ttlMs)
            Iterator((k, keepId))
          }
      }
      .toDF("k", "keep_id")
  }

  /** STREAMING face of the flagship spatial join: the same UDF-free cell
    * derivation + broadcast zone-cell join + native point_in_polygon
    * refinement as pipJoinCodegen, applied to a stream, then a tumbling
    * window count per zone — stream-static join and windowed agg, so a
    * live geo-tagged page feed gets the identical tile assignment the
    * batch backfill computes. */
  def zoneWindowCounts(
      events: DataFrame,
      zones: Seq[graft.spatial.Zone],
      grid: graft.spatial.CellGrid): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val zoneSide = spark.createDataset(
      zones.flatMap(z => grid.coverPolygon(z.geometry)
        .map(c => graft.spatial.SpatialJoin.ZoneCellEdges(
          c, z.zone_id, graft.spatial.SpatialJoin.zoneEdges(z)))))
      .toDF("cell", "zone_id", "edges")
    events
      .select(
        col("event_id").as("id"),
        (col("event_id") * lit(7919L) % lit(10000L) / lit(100.0)).as("x"),
        (col("event_id") * lit(104729L) % lit(10000L) / lit(100.0)).as("y"),
        col("ts").cast("timestamp").as("ets"))
      .withColumn("cell", grid.cellCol(col("x"), col("y")))
      .join(broadcast(zoneSide), "cell")
      .where(graft.functions.PointInPolygonExpr.pointInPolygon(
        col("x"), col("y"), col("edges")))
      .groupBy(window(col("ets"), "5 minutes"), col("zone_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        (unix_micros(col("window.start")) / lit(300000000L)).cast("long").as("bucket"),
        col("zone_id"), col("n"))
  }

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run zoneWindowCounts over the parquet events of `sfDir` synchronously
    * (memory sink, complete mode) and return the result. */
  def runZoneWindowsOnce(spark: SparkSession, sfDir: String,
      zones: Seq[graft.spatial.Zone], grid: graft.spatial.CellGrid): DataFrame = {
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val name = s"zone_windows_${runSeq.incrementAndGet()}"
    val q = zoneWindowCounts(stream, zones, grid).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Run streamingDedup over the documents table synchronously. */
  def runDedupOnce(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    import spark.implicits._
    val schema: StructType = spark.read
      .parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    val keyed = stream
      .select(substring(col("text"), 1, 30).as("k"), col("doc_id"))
      .as[(String, Long)]
    val q = streamingDedup(keyed).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Run the streaming agg over the parquet events of `sfDir` synchronously
    * (memory sink, complete mode) and return the result as a DataFrame. */
  def runOnce(spark: SparkSession, sfDir: String, queryName: String): DataFrame = {
    val schema: StructType = spark.read
      .parquet(s"$sfDir/events.parquet").schema
    // FileStreamSource needs a directory; the testdata table is a single
    // file, so scope the directory scan with a glob filter
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    val q = windowedAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
