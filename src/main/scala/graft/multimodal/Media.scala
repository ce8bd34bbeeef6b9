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
}
