package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque BINARY columns with
  * a typed metadata struct riding next to them. The Spark-side contract —
  * schema, partition behavior, batch shape — is real and tested; the actual
  * media decode is STUBBED (no image/audio codecs in this environment) with
  * a deterministic byte-level fake, clearly marked below.
  *
  * Scale notes: payloads stay in executors end-to-end (no collect); feature
  * extraction is a typed mapPartitions, so one task processes one file split
  * and the decode stub is amortized per-partition; metadata-only queries
  * prune the payload column at the parquet scan.
  */
object Multimodal {

  case class MediaMeta(kind: String, sizeBytes: Long, width: Int, height: Int)
  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  /** Manufacture a media corpus from the documents table: payload = UTF-8
    * bytes of the text (standing in for encoded image/audio bytes), with
    * deterministic fake dimensions derived from the payload length.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes("UTF-8")
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRecord(id, bytes, MediaMeta(kind, bytes.length.toLong,
          (nChars % 640).toInt + 1, (nChars % 480).toInt + 1))
      }
  }

  /** ========== STUB ==========
    * Real implementation would decode the payload with an image/audio codec
    * (not available in this container) and pool pixel/sample values. The
    * deterministic fake below extracts an 8-bin byte-value histogram,
    * normalized by payload length — a real computation with the same shape
    * (fixed-dim float vector per record), so downstream operators (ANN over
    * features, filtering on feature norms) exercise genuine plumbing.
    */
  def decodeToFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val hist = new Array[Float](8)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xFF) >> 5) += 1f
          i += 1
        }
        val n = math.max(r.payload.length, 1).toFloat
        MediaFeatures(r.media_id, r.meta.kind, hist.map(_ / n))
      }
    }
  }

  /** Frame sampling: split the payload into `frames` equal byte-range
    * chunks (a video decoder would seek to key frames; the byte-range split
    * is the deterministic stand-in) and explode one row per sampled frame.
    */
  def sampleFrames(records: Dataset[MediaRecord], frames: Int = 4): DataFrame =
    records.toDF()
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_idx * (meta.sizeBytes div $frames) + 1," +
          s" greatest(meta.sizeBytes div $frames, 1))"))
      .select(col("media_id"), col("meta.kind").as("kind"), col("frame_idx"),
        length(col("frame_bytes")).cast("long").as("frame_len"))

  /** Metadata-only scan — the payload column must be pruned at the source.
    * Oracle-able: byte length of the UTF-8 payload.
    */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        substring(col("text"), 1, 16).as("head16"))
      .orderBy("doc_id")

  /** Feature-extraction end-to-end as a registered query: manufacture →
    * decode(stub) → fixed-dim features, one row per record.
    */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame =
    decodeToFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .orderBy("media_id")

  /** Frame-sampling end-to-end as a registered query. */
  def frameQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, sfDir))
      .orderBy("media_id", "frame_idx")
}
