package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata structs, plus a partition-batched decode/feature-extract
  * operator.
  *
  * The decode step is a clearly-marked STUB (this container has no codec
  * libraries): it produces deterministic fake features from the bytes. The
  * Spark-side plumbing is real and what actually matters at scale —
  * declared schema, binary column handling, partition-batched iteration
  * (the Scala shape of a batched pandas-UDF: amortize per-batch setup such
  * as a codec context across `batchSize` records), and no driver-side
  * collection anywhere.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, duration_ms: Long, codec: String)
  case class MediaRecord(doc_id: Long, media_type: String,
      payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Int,
      checksum: Long, n_frames: Int, feature: Array[Float])

  /** Derive a media table from `documents`: payload = UTF-8 bytes of the
    * text (stands in for encoded media), media_type cycles deterministically,
    * metadata derived from n_chars. */
  def toMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 40).cast("long").as("duration_ms"),
        lit("stub-v0").as("codec")).as("meta"))

  /** Batch size for the partition-batched decode — the knob that a real
    * decoder would use to amortize codec-context setup. */
  val decodeBatchSize = 64

  /** Partition-batched decode / feature extraction. Runs fully distributed;
    * each partition iterates in `decodeBatchSize` groups. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // A real implementation would open one codec context per batch
        // here and decode `batch` through it.
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** STUB decoder — deterministic fake in place of a real codec call.
    * Real version: image decode → (w, h, pixel stats); audio → PCM frame
    * stats; video → sampled frames. */
  private def decodeOne(m: MediaRecord): MediaFeatures = {
    val checksum = m.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) & 0xFFFFFFFFL)
    val nFrames = m.media_type match {
      case "video" => (m.meta.duration_ms / 40).toInt // 25 fps stub
      case "audio" => (m.meta.duration_ms / 20).toInt
      case _       => 1
    }
    // "Feature vector": first 8 payload bytes, scaled — a stand-in for an
    // embedding a real extractor would emit.
    val feature = m.payload.take(8).map(b => (b & 0xff) / 255.0f)
    MediaFeatures(m.doc_id, m.media_type, m.payload.length, checksum, nFrames, feature)
  }

  /** Frame sampling over binary payloads: split each payload into
    * fixed-size byte frames (posexplode of computed offsets + binary
    * substring — all relational, no decode), yielding one row per frame
    * with its length and content hash. The real-codec version would
    * replace the byte slice with an I-frame extraction at the same
    * operator shape. */
  def sampleFrames(media: DataFrame, frameBytes: Int): DataFrame =
    media
      // empty payloads yield no frames (unguarded, floor((0-1)/n) = -1 and
      // sequence(0,-1) emits [0,-1] — two spurious rows)
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("media_type"), col("payload"),
        explode(sequence(lit(0),
          floor((octet_length(col("payload")) - 1) / frameBytes).cast("int")))
          .as("frame_idx"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        octet_length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))

  /** End-to-end media pipeline as a DataFrame op (for the query layer). */
  def mediaFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    decodeFeatures(toMedia(documents).as[MediaRecord]).toDF()
  }
}
