package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque binary + typed metadata.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batched
  * mapPartitions (the Scala analog of mapInPandas batch shape), feature
  * vector output — while the codec itself is a clearly-marked STUB: this
  * container has no image/audio libraries, so `decodeStub` produces a
  * deterministic fake decode (byte-histogram moments) with the exact
  * signature a real codec plug-in would have. Swapping in a real decoder
  * changes one function, not the pipeline.
  */
object Media {
  /** Batch size for the per-partition decode loop — the "batch shape" a
    * vectorized codec (or Arrow-based UDF) would consume. */
  val DecodeBatch = 64

  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, kind: String,
      n_bytes: Long, features: Array[Float])

  /** Deterministic synthetic media table: payload bytes derive from doc_id
    * (seeded splitmix over byte index) — binary column + typed metadata. */
  def synth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val len = 128 + (n % 256).toInt
        val bytes = Array.tabulate(len) { i =>
          var z = id * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
          z ^= z >>> 30; z *= 0x94D049BB133111EBL; z ^= z >>> 27
          (z & 0xFF).toByte
        }
        MediaRow(id, if (id % 3 == 0) "image" else "audio", bytes,
          width = (id % 64).toInt + 1, height = (id % 48).toInt + 1)
      }
      .toDF()
  }

  /** STUB decode: where a real image/audio codec would run. Deterministic
    * fake: 8 byte-histogram moments as the "decoded features". The
    * surrounding plumbing (batched per-partition loop, schema, metadata
    * pass-through) is the real engineering surface. */
  private def decodeOneBatchSTUB(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      // >>> STUB: replace with actual codec (e.g. decode + resize + embed)
      val hist = new Array[Long](8)
      m.payload.foreach(b => hist((b & 0xFF) >> 5) += 1)
      val tot = math.max(m.payload.length, 1).toFloat
      MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong,
        hist.map(_ / tot))
      // <<< STUB
    }

  /** The synth table with an md5-CHAINED payload (block j = md5(id ++ ":"
    * ++ j), truncated to the row's length): byte-identical to what an
    * external SQL engine derives from its own md5, so the feature-extract
    * stub's byte histogram is oracle-checkable end-to-end. Same schema and
    * lengths as [[synth]]. */
  def synthMd5(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val len = 128 + (n % 256).toInt
        val md = java.security.MessageDigest.getInstance("MD5")
        val bytes = Array.ofDim[Byte](len)
        var pos = 0
        var j = 0
        while (pos < len) {
          val block = md.digest(
            s"$id:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val take = math.min(16, len - pos)
          System.arraycopy(block, 0, bytes, pos, take)
          pos += take; j += 1
        }
        MediaRow(id, if (id % 3 == 0) "image" else "audio", bytes,
          width = (id % 64).toInt + 1, height = (id % 48).toInt + 1)
      }
      .toDF()
  }

  final case class MediaHistogram(doc_id: Long, kind: String,
      n_bytes: Long, hist: Array[Long])

  /** The feature-extract stub's RAW byte histogram (exact integer counts,
    * 8 bins of the top-3 bits) through the same batched partition loop —
    * the oracle-facing flavor of decodeFeatures. */
  def decodeHistogram(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap(_.map { m =>
          val hist = new Array[Long](8)
          m.payload.foreach(b => hist((b & 0xFF) >> 5) += 1)
          MediaHistogram(m.doc_id, m.kind, m.payload.length.toLong, hist)
        })
      }
      .toDF()
  }

  /** Batched per-partition decode: partition-preserving (no shuffle), rows
    * processed in DecodeBatch groups exactly like an Arrow/mapInPandas
    * vectorized UDF would receive them. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap(b => decodeOneBatchSTUB(b.toSeq))
      }
      .toDF()
  }

  /** Resize: the metadata side is EXACT pure-column integer math
    * (aspect-preserving fit into maxSide, floor with a 1-pixel floor); the
    * pixel transform itself is the stubbed codec step. Partition-preserving,
    * whole-stage codegen (no UDF). */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    def fit(side: org.apache.spark.sql.Column) =
      when(longest <= maxSide, side)
        .otherwise(greatest(lit(1), floor(side * maxSide / longest).cast("int")))
    media.select(
      col("doc_id"), col("kind"), col("width"), col("height"),
      fit(col("width")).cast("int").as("out_w"),
      fit(col("height")).cast("int").as("out_h"))
    // >>> STUB: a real resize would transform `payload` here per (out_w, out_h)
  }

  /** Deterministic synthetic video table (duration derives from n_chars). */
  def synthVideo(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        (lit(1000L) + col("n_chars") % 60 * 1000L).as("duration_ms"),
        lit(30).as("fps"))

  /** Frame sampling: one output row per sampled timestamp (t = 0, every,
    * 2·every … < duration) — the row-explosion plumbing a video pipeline
    * needs, as pure Catalyst sequence/explode; the frame decode itself is
    * the stubbed codec step. */
  def sampleFrames(video: DataFrame, everyMs: Long): DataFrame =
    video.select(
      col("doc_id"),
      explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("t_ms"))
      .select(col("doc_id"), (col("t_ms") / everyMs).cast("long").as("frame_idx"),
        col("t_ms"))
    // >>> STUB: a real sampler would seek+decode the frame at t_ms here

  // ---- perceptual-hash near-duplicate images ---------------------------

  /** dHash grid shape: PhRows × PhCols luminance samples; the hash compares
    * horizontally adjacent samples → PhRows × (PhCols−1) = 64 bits. */
  val PhRows = 8
  val PhCols = 9

  /** Deterministic synthetic "decoded image" table with PLANTED
    * near-duplicates: each doc's 8×9 luminance grid is its GROUP's base
    * image (md5-chained from `doc_id % 25`, so ~25 re-hosted copies of the
    * same image exist per group — the thumbnail/mirror situation image
    * dedup exists for) with at most one per-doc pixel mutation (re-encode
    * noise). A mutation moves ≤ 2 dHash bits, so same-group pairs sit
    * within Hamming 4 of each other while cross-group hashes are ~32 bits
    * apart (binomial, 5σ+ away). The md5 chain is the same oracle-
    * replayable byte source as [[synthMd5]]. */
  def synthPixels(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = PhRows * PhCols
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long]
      .map { id =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val grp = id % 25
        val pix = new Array[Int](n)
        var j = 0
        while (j * 16 < n) {
          val block = md.digest(
            s"g$grp:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var k = 0
          while (k < 16 && j * 16 + k < n) {
            pix(j * 16 + k) = block(k) & 0xFF; k += 1
          }
          j += 1
        }
        if (id % 2 == 1) {
          val p = ((id * 31) % n).toInt
          pix(p) = md.digest(
            s"m$id:0".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xFF
        }
        (id, pix)
      }
      .toDF("doc_id", "pix")
  }

  /** 64-bit difference hash (dHash) of one decoded luminance grid: bit
    * r·8+c set iff pixel (r,c) < pixel (r,c+1) — the classic
    * gradient-direction perceptual hash, invariant to brightness/contrast
    * shifts and robust to small pixel noise. The grid is what a real
    * pipeline's resize-to-9×8-grayscale step produces; here it arrives
    * from the deterministic stub. */
  def dHash64(pix: Array[Int]): Long = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      val r = b / (PhCols - 1); val c = b % (PhCols - 1)
      if (pix(r * PhCols + c) < pix(r * PhCols + c + 1)) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Near-duplicate image pairs: dHash each decoded grid, then reuse the
    * generic combination-block Hamming machinery
    * ([[graft.dedup.Dedup.hammingNearDups]] — lossless candidate keys,
    * sort-merge join, bit_count verify). Scale shape is the audited
    * SimHash one: candidate width constant per doc, never an all-pairs
    * or broadcast-that-grows-with-n step. */
  def phashNearDups(pixels: DataFrame, maxDist: Int): DataFrame = {
    val spark = pixels.sparkSession
    import spark.implicits._
    val sigs = pixels.select(col("doc_id"), col("pix"))
      .as[(Long, Array[Int])]
      .map { case (id, pix) => (id, dHash64(pix)) }
      .toDF("id", "sig")
    graft.dedup.Dedup.hammingNearDups(sigs, maxDist, withDist = true)
  }
}
