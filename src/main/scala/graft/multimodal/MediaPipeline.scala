package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` payloads plus typed
  * metadata, processed partition-locally in batches.
  *
  * The Spark-side plumbing is scale-shaped: binary columns travel
  * through parquet/shuffle untouched; decode/feature-extract runs via
  * `mapPartitions` so the decoder is initialized once per partition
  * (the Scala analog of `mapInPandas` batch shape), and the work
  * parallelizes per partition with no driver involvement.
  *
  * The decode is REAL: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF —
  * ships in every JDK) round-trips actual pixels. Test media are
  * deterministic synthetic grayscale PNGs derived from `doc_id`
  * ([[synthPng]]), so every decoded statistic (dimensions, mean
  * brightness, min/max pixel, histogram) is exactly computable in
  * closed form — the DuckDB oracle for `q_multimodal_features`
  * recomputes them from the generating formula without ever seeing a
  * PNG, which certifies the whole encode→shuffle→decode path.
  */
object MediaPipeline {

  case class MediaRow(doc_id: Long, mime: String, content: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      brightness: Double, px_min: Int, px_max: Int, histogram: Array[Double])

  /** Wrap documents as generic media rows (payload = utf-8 bytes) —
    * the schema/plumbing shape for media whose codec is external. */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("content"))

  /** Deterministic synthetic grayscale image: w = id%13+4,
    * h = id%7+3, pixel (x, y) = (id·31 + y·w + x) mod 256. Small by
    * construction (≤ 16×9) so a 100 TB corpus of them is still
    * dominated by the fact rows, and every statistic has a closed
    * form the SQL oracle can recompute. */
  def synthDims(docId: Long): (Int, Int) =
    ((docId % 13 + 4).toInt, (docId % 7 + 3).toInt)

  def synthPixel(docId: Long, i: Int): Int = ((docId * 31 + i) % 256).toInt

  /** Encode the synthetic image as a real PNG via ImageIO (lossless
    * for TYPE_BYTE_GRAY, so decode returns the exact pixels). */
  def synthPng(docId: Long): Array[Byte] = {
    val (w, h) = synthDims(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, synthPixel(docId, y * w + x))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of synthetic PNGs, one per document id — built
    * partition-locally (no driver loop, no shuffle: the encode runs
    * where the scan put the ids). */
  def toMediaPng(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "image/png", synthPng(id)))
    }.toDF()
  }

  /** Real image decode: bytes → (width, height, gray pixels in
    * row-major order). Throws on undecodable payloads — a corrupt
    * image in a pipeline should fail loudly, not yield zeros. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = raster.getSample(x, y, 0)
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Partition-local batch decode: ImageIO's disk cache is disabled
    * once per partition (decoder init), then rows stream through.
    * Feature math is integer-exact until the single final division,
    * so the oracle's identical arithmetic bit-matches. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false) // decoder init: once per partition
      rows.map { r =>
        val (w, h, px) = decodeImage(r.content)
        val hist = new Array[Double](4)
        var sum = 0L
        var mn = 255
        var mx = 0
        var i = 0
        while (i < px.length) {
          val v = px(i)
          hist(v >> 6) += 1
          sum += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        val n = px.length
        if (n > 0) { var j = 0; while (j < 4) { hist(j) /= n; j += 1 } }
        val brightness = if (n == 0) 0.0 else sum.toDouble / (n * 255.0)
        MediaFeatures(r.doc_id, r.content.length, w, h, brightness,
          if (n == 0) 0 else mn, mx, hist)
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

  /** Nearest-neighbor resize over a decoded gray pixel grid,
    * normalized to [0, 1]: target pixel (x, y) samples source
    * (x·srcW/dstW, y·srcH/dstH) — integer index arithmetic, the
    * standard NN kernel. */
  def resizeGray(px: Array[Int], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Double] = {
    require(dstW > 0 && dstH > 0, s"target dims must be positive: $dstW x $dstH")
    val out = new Array[Double](dstW * dstH)
    if (srcW <= 0 || srcH <= 0 || px.isEmpty) return out
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        out(y * dstW + x) = px(sy * srcW + sx) / 255.0
        x += 1
      }
      y += 1
    }
    out
  }

  case class MediaThumb(doc_id: Long, w: Int, h: Int, thumb: Array[Double])

  /** Thumbnail stage: real decode → nearest-neighbor resize to a
    * fixed dstW × dstH grid, one decoder context per partition — the
    * same partition-local batching shape as [[extractFeatures]];
    * binary payloads never shuffle (the stage runs where the scan put
    * them). */
  def thumbnails(spark: SparkSession, media: DataFrame,
      dstW: Int = 4, dstH: Int = 4): Dataset[MediaThumb] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, px) = decodeImage(r.content)
        MediaThumb(r.doc_id, dstW, dstH, resizeGray(px, w, h, dstW, dstH))
      }
    }
  }
}
