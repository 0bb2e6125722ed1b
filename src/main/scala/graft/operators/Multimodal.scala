package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column processing scaffold.
  *
  * Media ride through the engine as opaque `binary` payload columns
  * with a typed metadata struct — decode and feature extraction
  * happen executor-side in batched `mapPartitions` passes, so a
  * 100 TB media table streams partition-by-partition through the
  * codec without ever materializing decoded frames in the plan.
  *
  * The actual codecs (JPEG/PNG/PCM decoders) are NOT available in
  * this environment, so `decodeFeatures` is a clearly-marked
  * deterministic STUB: it derives a fixed-length feature vector from
  * the payload bytes. Everything around it — the schema contract,
  * the partition-streaming execution shape, the frame-sampling
  * stride, the typed Dataset surface — is the real plumbing a codec
  * drop-in would use, and is exercised by MultimodalSpec.
  */
object Multimodal {

  /** Typed row contract for a media table. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String)

  /** Extracted features: fixed-width vector + basic decode metadata. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           n_frames: Int, features: Array[Float])

  val FeatureDim = 16

  /** STUB decoder: stands in for "decode media, extract an embedding".
    * Deterministic pure function of the bytes so tests are stable: a
    * rolling byte histogram folded into `FeatureDim` buckets,
    * normalized by payload length. A real implementation would
    * replace ONLY this function body with a codec call. */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < FeatureDim) { acc(j) /= payload.length; j += 1 }
    }
    acc
  }

  /** Frame sampling: every `stride`-th byte stands in for "every
    * N-th video frame". Real decoders substitute frame boundaries
    * for byte offsets; the streaming shape is identical. */
  def sampleFrames(payload: Array[Byte], stride: Int): Array[Byte] = {
    require(stride > 0, "stride must be positive")
    val out = new Array[Byte]((payload.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = payload(i * stride); i += 1 }
    out
  }

  /** Resize: nearest-neighbor downsample of a (w × h) single-channel
    * byte raster to (outW × outH) — the codec-free stand-in for image
    * resize (a real implementation swaps the per-pixel lookup for a
    * codec/SIMD call; the executor-side batched shape is identical).
    * Pure and allocation-bounded: output is exactly outW×outH bytes
    * regardless of input size, which is what keeps a 100 TB image
    * table's resize pass memory-constant per row. */
  def resizeRaster(pixels: Array[Byte], w: Int, h: Int,
                   outW: Int, outH: Int): Array[Byte] = {
    require(w > 0 && h > 0 && outW > 0 && outH > 0, "dimensions must be positive")
    require(pixels.length >= w * h, s"raster smaller than $w x $h")
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = pixels(sy * w + (x * w / outW))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Batched executor-side decode: one pass per partition, constant
    * memory per row, no decoded state in the shuffle. This is the
    * `mapPartitions` shape (SURVEY §2 "[C] last resort" is justified
    * here: codecs are imperative per-payload work no Catalyst
    * expression expresses). */
  def decodeFeatures(media: Dataset[MediaRow], frameStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = sampleFrames(r.payload, frameStride)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong,
          frames.length, stubDecode(frames))
      }
    }
  }

  /** Build a typed media table from `documents` (text bytes standing
    * in for media payloads — the container has no binary media
    * testdata; schema and lineage are what matter). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("kind"))
      .as[MediaRow]
  }
}
