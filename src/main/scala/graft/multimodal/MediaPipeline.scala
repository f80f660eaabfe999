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
}
