package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched partition passes.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked deterministic STUB (`stubDecode`): it derives pixel
  * dimensions and a "pixel buffer" from the bytes themselves, making the
  * Spark-side contract — schema, partition batching, UDF signature,
  * output shape — real and testable. Swap `stubDecode` for a JNI/ffmpeg
  * call in production; nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, n_frames: Int)

  /** Deterministic synthetic media table derived from any table with a
    * (doc_id, text) shape: binary payload = UTF-8 bytes (stand-in for an
    * encoded image), metadata from byte statistics.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (length(col("text")) % 64 + 8).cast("int").as("width"),
        (length(col("text")) % 48 + 8).cast("int").as("height"),
        (length(col("text")) % 7 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: bytes -> deterministic fake pixel values. In production
    * this is the image codec; the contract (binary in, float features
    * out, batched per partition) is identical.
    */
  private[spark] def stubDecode(media: Array[Byte], width: Int, height: Int): Array[Float] = {
    val n = math.max(1, math.min(width * height, 256))
    val out = new Array[Float](n)
    if (media.isEmpty) return out // all-zero buffer for empty payloads
    var i = 0
    while (i < n) {
      out(i) = ((media(i % media.length) & 0xFF) / 255.0f)
      i += 1
    }
    out
  }

  /** Feature extraction over the decoded buffer: 16-bin histogram +
    * mean/variance — a 18-dim feature vector per media row. Runs as one
    * batched partition pass (reusable buffers), shuffle-free.
    */
  def extractFeatures(mediaDf: DataFrame): DataFrame = {
    val spark = mediaDf.sparkSession
    import spark.implicits._
    mediaDf
      .select(col("doc_id"), col("media"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        val hist = new Array[Float](16)
        it.map { case (id, media, w, h) =>
          java.util.Arrays.fill(hist, 0.0f)
          val px = stubDecode(if (media == null) Array.emptyByteArray else media, w, h)
          var mean = 0.0; var m2 = 0.0
          var i = 0
          while (i < px.length) {
            hist((px(i) * 15.999f).toInt) += 1.0f
            val d = px(i) - mean
            mean += d / (i + 1)
            m2 += d * (px(i) - mean)
            i += 1
          }
          val variance = if (px.length > 1) m2 / px.length else 0.0
          (id, (hist.map(_ / px.length) :+ mean.toFloat :+ variance.toFloat).toSeq)
        }
      }
      .toDF("doc_id", "features")
  }

  /** Nearest-neighbor resize to (outW, outH): stub-decode the payload,
    * sample the source grid, re-quantize to one byte per output pixel.
    * Batched partition pass, shuffle-free; output metadata carries the
    * new dimensions and the payload is exactly outW*outH bytes (the
    * SQL-checkable part of the contract — the pixel mapping itself is
    * pinned by MultimodalSpec). Swap stubDecode for the real codec in
    * production; the batching/signature/shape stay identical.
    */
  def resize(mediaDf: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame = {
    val spark = mediaDf.sparkSession
    import spark.implicits._
    mediaDf
      .select(col("doc_id"), col("media"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        val out = new Array[Byte](outW * outH) // reused per row, copied on emit
        it.map { case (id, media, w, h) =>
          val px = stubDecode(if (media == null) Array.emptyByteArray else media, w, h)
          val n = px.length
          var yo = 0
          while (yo < outH) {
            val sy = yo * h / outH
            var xo = 0
            while (xo < outW) {
              val sx = xo * w / outW
              out(yo * outW + xo) = ((px((sy * w + sx) % n) * 255.0f).toInt & 0xFF).toByte
              xo += 1
            }
            yo += 1
          }
          (id, out.clone(),
            MediaMeta("fake/raw", outW, outH, 1))
        }
      }
      .toDF("doc_id", "media", "meta")
  }

  /** Frame sampling for "video" payloads: split the binary into n_frames
    * equal chunks, emit every `stride`-th as (doc_id, frame_idx, frame).
    * Generator-shaped: one input row -> 0..n output rows via flatMap.
    */
  def sampleFrames(mediaDf: DataFrame, stride: Int = 2): DataFrame = {
    val spark = mediaDf.sparkSession
    import spark.implicits._
    mediaDf
      .select(col("doc_id"), col("media"), col("meta.n_frames").as("n_frames"))
      .as[(Long, Array[Byte], Int)]
      .flatMap { case (id, media, nFrames) =>
        val m = if (media == null) Array.emptyByteArray else media
        val frames = math.max(1, nFrames)
        val size = math.max(1, m.length / frames)
        (0 until frames by stride).map { f =>
          val from = f * size
          val until = math.min(m.length, from + size)
          (id, f, java.util.Arrays.copyOfRange(m, math.min(from, m.length), until))
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }
}
