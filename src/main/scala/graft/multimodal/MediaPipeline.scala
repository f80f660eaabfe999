package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads plus typed
  * metadata, processed partition-locally in batches.
  *
  * The Spark-side plumbing is real and scale-shaped: binary columns
  * travel through parquet/shuffle untouched; decode/feature-extract
  * runs via `mapPartitions` so any native decoder is initialized once
  * per partition (the Scala analog of `mapInPandas` batch shape), and
  * the work parallelizes per partition with no driver involvement.
  *
  * The decode itself is a clearly-marked STUB — image/audio codecs
  * are not available in this environment — producing deterministic
  * pseudo-features derived from the bytes, so tests can pin exact
  * values while the real decoder slots in behind the same signature.
  */
object MediaPipeline {

  case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      brightness: Double, histogram: Array[Double])

  /** Wrap documents as media rows (payload = utf-8 bytes stand-in). */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("content"))

  /** STUB decoder — stands in for e.g. an image codec. Deterministic:
    * derives dimensions from payload length and a 4-bin byte
    * histogram. A real build replaces ONLY this function. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double, Array[Double]) = {
    val n = bytes.length
    val width = n % 640 + 1
    val height = n % 480 + 1
    val hist = new Array[Double](4)
    var sum = 0L
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      hist(b >> 6) += 1
      sum += b
      i += 1
    }
    if (n > 0) { var j = 0; while (j < 4) { hist(j) /= n; j += 1 } }
    val brightness = if (n == 0) 0.0 else sum.toDouble / n / 255.0
    (width, height, brightness, hist)
  }

  /** Partition-local batch decode: one decoder context per partition,
    * rows streamed through it. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // (real decoders would be initialized here, once per partition)
      rows.map { r =>
        val (w, h, br, hist) = decodeStub(r.content)
        MediaFeatures(r.doc_id, r.content.length, w, h, br, hist)
      }
    }
  }

  /** Deterministic frame-sample analog: pick every k-th byte-block
    * offset — the plumbing shape of video frame sampling. */
  def frameOffsets(nBytes: Int, frameSize: Int, everyK: Int): Seq[Int] = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    require(everyK > 0, s"everyK must be positive, got $everyK")
    (0 until nBytes / frameSize by everyK).map(_ * frameSize)
  }

  /** Deterministic nearest-neighbor resize over the stub-decoded byte
    * grid — the resize stage of an image pipeline with the codec
    * stubbed: source pixel (sx, sy) of the fake (srcW × srcH) frame
    * maps from the byte array, normalized to [0, 1]. The index
    * arithmetic (integer `x·srcW/dstW`) is the real nearest-neighbor
    * kernel; only the pixel fetch is fake. */
  def resizeStub(bytes: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Double] = {
    require(dstW > 0 && dstH > 0, s"target dims must be positive: $dstW x $dstH")
    val out = new Array[Double](dstW * dstH)
    if (srcW <= 0 || srcH <= 0 || bytes.isEmpty) return out
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        out(y * dstW + x) = (bytes((sy * srcW + sx) % bytes.length) & 0xff) / 255.0
        x += 1
      }
      y += 1
    }
    out
  }

  case class MediaThumb(doc_id: Long, w: Int, h: Int, thumb: Array[Double])

  /** Thumbnail stage: decode (stub) → resize to a fixed dstW × dstH
    * grid, one decoder/resizer context per partition — the same
    * partition-local batching shape as [[extractFeatures]]; binary
    * payloads never shuffle (the stage runs where the scan put them). */
  def thumbnails(spark: SparkSession, media: DataFrame,
      dstW: Int = 4, dstH: Int = 4): Dataset[MediaThumb] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _, _) = decodeStub(r.content)
        MediaThumb(r.doc_id, dstW, dstH, resizeStub(r.content, w, h, dstW, dstH))
      }
    }
  }
}
