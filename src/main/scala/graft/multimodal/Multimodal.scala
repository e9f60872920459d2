package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines (north-star extension; the reference is tabular-only).
  *
  * Model: media is an opaque `binary` column plus a typed metadata
  * struct — Spark never interprets the bytes until an explicit decode
  * stage. Decode/feature/resize run partition-wise over `mapPartitions`
  * (the Scala analog of PySpark's `mapInPandas`: one iterator per
  * partition, constant memory, codec state initialized once per
  * partition, not per row — exactly how a JNI codec or an ONNX session
  * would be held).
  *
  * STUB NOTE: this container ships no image/audio codecs, so
  * `decodeFake` is a clearly-marked deterministic stand-in (pixel bytes
  * derived from the content hash). Every schema, partitioning and
  * batching decision around it is real; swapping `decodeFake` for a
  * libjpeg/ffmpeg call changes no plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque bytes. */
  final case class MediaMeta(media_type: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int)

  final case class MediaRow(media_id: Long, meta: MediaMeta, content: Array[Byte])

  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      mean_intensity: Double, histogram: Array[Long])

  final case class Frame(media_id: Long, frame_idx: Int, content: Array[Byte])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))), nullable = false),
    StructField("content", BinaryType, nullable = false)))

  // ---------------------------------------------------------------- decode

  /** STUB (`???`-equivalent): deterministic fake decoder — produces a
    * width×height single-channel image whose pixel (x, y) is a hash mix
    * of the content bytes and the coordinate. Replace with an actual
    * codec (libjpeg via JNI, javax.imageio, …) for real media; the
    * signature — bytes in, row-major pixel array out — is the contract
    * the rest of the pipeline compiles against. */
  def decodeFake(content: Array[Byte], width: Int, height: Int): Array[Byte] = {
    var seed = 1125899906842597L // FNV-ish fold of the content
    var i = 0
    while (i < content.length) { seed = seed * 31 + content(i); i += 1 }
    val px = new Array[Byte](width * height)
    var p = 0
    while (p < px.length) {
      val h = (seed ^ (p * 0x9E3779B97F4A7C15L)) * 0xBF58476D1CE4E5B9L
      px(p) = ((h >>> 56) & 0xFF).toByte
      p += 1
    }
    px
  }

  // ------------------------------------------------------------- pipelines

  /** Partition-wise image feature extraction: decode → mean intensity +
    * 16-bin histogram. One decoder instantiation per PARTITION (the
    * `val codecState` line) — the mapInPandas-batch pattern. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (real codecs/ONNX sessions are expensive):
      val histogramBins = 16
      rows.map { m =>
        val px = decodeFake(m.content, m.meta.width, m.meta.height)
        val hist = new Array[Long](histogramBins)
        var sum = 0L
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xFF
          hist(v * histogramBins / 256) += 1
          sum += v
          i += 1
        }
        ImageFeatures(m.media_id, m.meta.width, m.meta.height,
          if (px.length == 0) 0.0 else sum.toDouble / px.length, hist)
      }
    }
  }

  /** Resize by integer-factor average pooling on the decoded pixels —
    * the distributed plumbing for a thumbnail stage. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (w, h) = (m.meta.width, m.meta.height)
        val (nw, nh) = (math.max(1, w / factor), math.max(1, h / factor))
        val px = decodeFake(m.content, w, h)
        val out = new Array[Byte](nw * nh)
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) {
            var acc = 0; var n = 0
            var dy = 0
            while (dy < factor && y * factor + dy < h) {
              var dx = 0
              while (dx < factor && x * factor + dx < w) {
                acc += px((y * factor + dy) * w + (x * factor + dx)) & 0xFF
                n += 1; dx += 1
              }
              dy += 1
            }
            out(y * nw + x) = (acc / math.max(1, n)).toByte
            x += 1
          }
          y += 1
        }
        MediaRow(m.media_id, m.meta.copy(width = nw, height = nh), out)
      }
    }
  }

  /** Frame sampling for video rows: emit every `everyN`-th frame as its
    * own row (flatMap — the fan-out shape; a real implementation seeks
    * the container stream instead of slicing the fake buffer). */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val frameLen = math.max(1, m.meta.width * m.meta.height)
      (0 until m.meta.n_frames by everyN).map { f =>
        // STUB slice: a real decoder extracts frame f from the container
        val bytes = decodeFake(m.content ++ BigInt(f).toByteArray,
          m.meta.width, m.meta.height)
        Frame(m.media_id, f, bytes.take(frameLen))
      }
    }
  }

  // ------------------------------------------- metadata-only (no decode)

  /** Byte-level metadata needs no decode and stays whole-stage-codegen:
    * size, content fingerprint, and a deterministic pseudo-dimension
    * derived from the hash (stands in for header sniffing). */
  def binaryMeta(df: DataFrame, contentCol: String): DataFrame = {
    val c = col(contentCol)
    val h = md5(c)
    df.select(
      col("*"),
      length(c).cast(LongType).as("n_bytes"),
      h.as("fingerprint"),
      (ascii(substring(h, 1, 1)) % 64 + 1).as("pseudo_width"),
      (ascii(substring(h, 2, 1)) % 64 + 1).as("pseudo_height"))
  }
}
