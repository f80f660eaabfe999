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

  // ----- perceptual-hash dedup fixtures (q_dedup_phash) ---------------

  /** Grid cell (X ∈ 0..8, Y ∈ 0..7) of the synthetic TEXTURED image
    * family used by `q_dedup_phash`. Content is keyed on a base
    * pattern id `doc_id / 4` (groups of 4 consecutive documents share
    * a base image → planted near-duplicates), de-periodized with an
    * independent `base / 256` coefficient set (any polynomial in the
    * base alone repeats mod 256 — measured: 559 cross-group
    * hash-collision pairs at 5 000 docs without the second term, 6
    * with), plus a per-document perturbation: +128 on one grid cell
    * (`doc_id % 72`), or on that cell's whole row for "heavy"
    * variants (`doc_id % 7 == 0`). Light variants of a base land at
    * Hamming ≤ 4 of each other; heavy variants fall outside the
    * threshold — so the query's Hamming cut provably keeps AND drops.
    * Everything is integer arithmetic, so the DuckDB oracle recomputes
    * the exact dHash without decoding a PNG. */
  def phashGridVal(docId: Long, x: Int, y: Int): Int = {
    val b = docId / 4
    val v = (docId % 72).toInt
    val heavy = docId % 7 == 0
    val base = (b * (x * 7 + y * 11 + 13) + (b / 256) * (x * 17 + y * 23 + 29)
      + x * x * 5 + y * y * 3) % 256
    val pert =
      if ((heavy && y == v / 9) || (!heavy && x == v % 9 && y == v / 9)) 128 else 0
    ((base + pert) % 256).toInt
  }

  /** Scale of the textured image: the 9×8 grid block-upscaled by
    * s ∈ {1, 2, 3} (`doc_id % 3 + 1`), so the SAME base pattern ships
    * at three resolutions — and nearest-neighbor downsampling back to
    * 9×8 recovers the identical grid. Same-base documents therefore
    * dedup together ACROSS resolutions, the defining property of a
    * perceptual hash (vs byte-level dedup, which sees three distinct
    * files). */
  def phashScale(docId: Long): Int = (docId % 3 + 1).toInt

  /** Real PNG of the textured image: (9·s) × (8·s), pixel (x, y) =
    * grid cell (x/s, y/s). Lossless TYPE_BYTE_GRAY round trip, same
    * as [[synthPng]]. */
  def synthTexturedPng(docId: Long): Array[Byte] = {
    val s = phashScale(docId)
    val w = 9 * s
    val h = 8 * s
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, phashGridVal(docId, x / s, y / s))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Textured media table, one PNG per document id — partition-local
    * encode, same shape as [[toMediaPng]]. */
  def toTexturedMediaPng(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "image/png", synthTexturedPng(id)))
    }.toDF()
  }

  /** dHash (difference hash), the standard 64-bit perceptual image
    * hash (public technique: Krawetz, "Kind of Like That",
    * hackerfactor 2013): nearest-neighbor resample the luma plane to
    * a 9×8 grid, then bit (y·8 + x) = 1 iff grid(x, y) < grid(x+1, y)
    * — 64 horizontal gradient signs. Gradient signs survive global
    * brightness/contrast shifts and resizing, so near-identical
    * images land within a few bits of Hamming distance. Resampling
    * uses the same integer NN kernel as [[resizeGray]]
    * (sx = x·w/9, sy = y·h/8) on raw ints — no double division, so
    * the SQL oracle's identical integer arithmetic bit-matches. */
  def dHash64(px: Array[Int], w: Int, h: Int): Long = {
    require(w > 0 && h > 0, s"dHash64 needs a non-empty image, got $w x $h")
    var sig = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val l = px(sy * w + x * w / 9)
        val r = px(sy * w + (x + 1) * w / 9)
        if (l < r) sig |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sig
  }

  case class MediaHash(doc_id: Long, phash: Long)

  /** Per-image dHash over REAL decoded bytes: one decoder context per
    * partition, binary payloads never shuffle (the hash — 8 bytes —
    * is all that leaves the scan stage; at 100 TB of media the
    * downstream dedup join moves only (doc_id, phash)). */
  def phashOf(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val (w, h, px) = decodeImage(r.content)
        MediaHash(r.doc_id, dHash64(px, w, h))
      }
    }
  }

  // ----- audio modality (q_multimodal_audio) --------------------------

  /** Deterministic synthetic PCM signal: n = id%500+100 samples,
    * sample i = (id·37 + i·251) mod 65536 − 32768 — 16-bit signed
    * range by construction, linear in i so the SQL oracle recomputes
    * every decoded statistic without parsing a WAV. */
  def synthSampleCount(docId: Long): Int = (docId % 500 + 100).toInt

  def synthSample(docId: Long, i: Int): Int =
    ((docId * 37 + i.toLong * 251) % 65536).toInt - 32768

  /** The clip format, for the SPEC-side JDK-codec interop pins only
    * (never on the data path — see [[pcmToWav]]). */
  private[graft] val WavFormat = new javax.sound.sampled.AudioFormat(
    8000f, 16, 1, true, false) // 8 kHz, 16-bit, mono, signed, little-endian

  /** Canonical RIFF/WAVE container around 16-bit mono 8 kHz PCM
    * (RIFF header + `fmt ` + `data`, the layout of the public
    * WAVE spec). Hand-rolled ON PURPOSE: `AudioSystem.write`'s
    * provider lookup SERIALIZES under thread contention — measured
    * 7.3 s on 32 threads vs 3.9 s single-threaded for 50k clips, an
    * anti-scaling decode stage that showed up as a 1.26 wall
    * exponent in HeavyScaleProbe. Byte-for-byte interop with the
    * JDK codec is pinned both directions in AudioDedupSpec. */
  private[multimodal] def pcmToWav(pcm: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
    tag(0, "RIFF"); le32(4, 36 + pcm.length); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1) // PCM
    le16(22, 1) // mono
    le32(24, 8000) // sample rate
    le32(28, 16000) // byte rate
    le16(32, 2) // block align
    le16(34, 16) // bits per sample
    tag(36, "data"); le32(40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** Encode the synthetic signal as a REAL RIFF/WAVE file (lossless,
    * so decode returns the exact samples — the audio analog of
    * [[synthPng]]). */
  def synthWav(docId: Long): Array[Byte] = {
    val n = synthSampleCount(docId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = synthSample(docId, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    pcmToWav(pcm)
  }

  /** Audio media table, one WAV per document id — partition-local
    * encode, same shape as [[toMediaPng]]. */
  def toAudioWav(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "audio/wav", synthWav(id)))
    }.toDF()
  }

  /** Real audio decode: WAV bytes → signed 16-bit samples, via a
    * RIFF chunk walk (find `fmt `, require 16-bit mono PCM, read
    * `data`; unknown chunks skipped with the spec's even-byte
    * padding). Throws on undecodable payloads or unexpected
    * formats — corrupt audio in a pipeline should fail loudly, same
    * contract as [[decodeImage]]. Hand-rolled for the same
    * contention reason as [[pcmToWav]]: `AudioSystem
    * .getAudioInputStream`'s per-call SPI provider lookup serializes
    * executor threads; interop with the JDK reader/writer is
    * spec-pinned instead of paid per row. */
  def decodeWav(bytes: Array[Byte]): Array[Int] = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var fmtOk = false
    var data: (Int, Int) = null // (offset, length)
    while (off + 8 <= bytes.length && (data == null || !fmtOk)) {
      val id = tag(off)
      val len = le32(off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length,
        s"chunk $id overruns the payload")
      if (id == "fmt ") {
        require(len >= 16, "fmt chunk too short")
        val codec = le16(off + 8)
        val channels = le16(off + 10)
        val bps = le16(off + 22)
        require(codec == 1 && channels == 1 && bps == 16,
          s"expected 16-bit mono PCM, got codec=$codec ch=$channels bits=$bps")
        fmtOk = true
      } else if (id == "data") {
        data = (off + 8, len)
      }
      off += 8 + len + (len & 1) // chunks are even-padded per the spec
    }
    require(fmtOk, "no fmt chunk")
    require(data != null, "no data chunk")
    val (d0, dlen) = data
    val out = new Array[Int](dlen / 2)
    var i = 0
    while (i < out.length) {
      out(i) = (bytes(d0 + 2 * i + 1).toInt << 8) | (bytes(d0 + 2 * i) & 0xff)
      i += 1
    }
    out
  }

  case class AudioFeatures(
      doc_id: Long, n_bytes: Int, n_samples: Int, peak: Int,
      zero_cross: Long, rms: Double)

  /** Partition-local batch audio decode → per-clip signal statistics
    * (peak |amplitude|, strict-sign zero crossings, normalized RMS).
    * Integer sums throughout; ONE sqrt+division at the end, so the
    * oracle's identical arithmetic bit-matches. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val s = decodeWav(r.content)
        var peak = 0
        var zc = 0L
        var ss = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i)
          val a = math.abs(v)
          if (a > peak) peak = a
          if (i > 0 && v.toLong * s(i - 1) < 0L) zc += 1
          ss += v.toLong * v
          i += 1
        }
        val rms =
          if (s.length == 0) 0.0
          else math.sqrt(ss.toDouble / s.length) / 32768.0
        AudioFeatures(r.doc_id, r.content.length, s.length, peak, zc, rms)
      }
    }
  }

  // ----- audio near-dup family (q_dedup_audio) ------------------------

  /** Frames per fingerprinted clip (→ 64 energy-delta bits) and
    * samples per frame. */
  val AfpFrames = 65
  val AfpFrameLen = 8

  private val MixM = 2147483647L

  /** Scrambled per-(group, frame) base value: alternating
    * multiply-mod-M and xor-shift rounds. The xor-shifts are the
    * load-bearing part — multiply-mod alone is affine in `f`, which
    * makes frame-to-frame deltas CONSTANT across all groups and the
    * energy-comparison bits collide corpus-wide (measured: 325
    * identical cross-group fingerprints at 5k docs without them, 0
    * with; full-pairs cross-group min Hamming 11 vs within-group max
    * 4). Every intermediate stays below 2^63 for any docId (g is
    * reduced mod M before the 2^31.3 multiplier), so the DuckDB
    * BIGINT oracle — which errors on overflow rather than wrapping —
    * evaluates the identical arithmetic. */
  private def afpMix(g: Long, f: Long): Long = {
    var h = ((g % MixM) * 2654435761L + f * 40503L + 99991L) % MixM
    h = (h * 48271L) % MixM
    h = h ^ (h >> 13)
    h = (h * 16807L) % MixM
    h = h ^ (h >> 11)
    (h * 69621L) % MixM
  }

  /** Frame-`f` amplitude of clip `docId`. Groups of 4 consecutive ids
    * share a base amplitude sequence (range [1000, 21000)); variant
    * v = id mod 4 is the same recording at volume ×(8+v)/8 (order-
    * preserving: amplitudes differing pre-scale differ post-scale,
    * since the integer-scaled gap ≥ (8+v) > 8), plus — for v ≥ 1 —
    * ONE spliced loud frame (range [22000, 23000), above the whole
    * base band) at a variant-specific position, so within-group
    * fingerprints differ by ≤ 4 bits while volume alone changes
    * none. Max value 22999·11/8 = 31623 < 2^15: always 16-bit safe. */
  def groupWavAmp(docId: Long, f: Int): Int = {
    val g = docId / 4
    val v = docId % 4
    val h = afpMix(g, f.toLong)
    val base =
      if (v >= 1 && f == v * 16 + (g % 13)) 22000L + h % 1000L
      else 1000L + h % 20000L
    ((base * (8 + v)) / 8).toInt
  }

  /** Near-dup audio clip: [[AfpFrames]]×[[AfpFrameLen]] samples,
    * sample i = ±groupWavAmp(id, i/8) with alternating sign (a
    * square wave at Nyquist), encoded as a REAL RIFF/WAVE file via
    * the same contention-free writer as [[synthWav]]. */
  def synthGroupWav(docId: Long): Array[Byte] = {
    val n = AfpFrames * AfpFrameLen
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = groupWavAmp(docId, i / AfpFrameLen)
      val s = if (i % 2 == 0) a else -a
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    pcmToWav(pcm)
  }

  /** Audio media table over the near-dup family — same
    * (doc_id, mime, content) shape as [[toAudioWav]]. */
  def toGroupAudioWav(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "audio/wav", synthGroupWav(id)))
    }.toDF()
  }

  case class AudioFp(doc_id: Long, afp: Long)

  /** 64-bit acoustic fingerprint from DECODED samples: bit f = 1 iff
    * frame f+1 carries more energy (sum of squared samples) than
    * frame f — the sign-of-energy-delta bit derivation of Haitsma &
    * Kalker, "A Highly Robust Audio Fingerprinting System" (ISMIR
    * 2002) §3.1, collapsed to one band. Energy ratios are invariant
    * to uniform gain, so the same recording at a different volume
    * fingerprints identically — the perceptual property byte dedup
    * cannot see (every variant's WAV bytes differ). */
  def audioFingerprint(samples: Array[Int]): Long = {
    require(samples.length == AfpFrames * AfpFrameLen,
      s"expected ${AfpFrames * AfpFrameLen} samples, got ${samples.length}")
    val e = new Array[Long](AfpFrames)
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toLong
      e(i / AfpFrameLen) += v * v
      i += 1
    }
    var bits = 0L
    var f = 0
    while (f < AfpFrames - 1) {
      if (e(f + 1) > e(f)) bits |= 1L << f
      f += 1
    }
    bits
  }

  /** Partition-local decode → fingerprint: only (doc_id, 8-byte afp)
    * leaves the stage, never the waveform — same scale shape as
    * [[phashOf]]. */
  def afpOf(spark: SparkSession, media: DataFrame): Dataset[AudioFp] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => AudioFp(r.doc_id, audioFingerprint(decodeWav(r.content))))
    }
  }

  // ----- video modality (q_dedup_video) -------------------------------

  /** Frames per synthetic video. */
  val VideoFrames = 4

  /** The unique-variant pattern offset: far above any reachable
    * group-shared id ((docId/4)·8 + f < 2·docId + 8), so the two
    * ranges cannot collide for any docId < 2^38 — guarded, because a
    * collision would silently plant cross-group frame matches and
    * invalidate the keep/drop structure. */
  val VideoVariantBase: Long = 1L << 40

  /** Pattern id of frame `f` of video `docId`: group-shared
    * ((docId/4)·8 + f — all 4 group members render the IDENTICAL
    * frame) except each video's OWN variant position (f = docId mod 4
    * gets a globally unique pattern), so two same-group videos share
    * exactly 2 of 4 frames bit-identically and cross-group videos
    * share none — the planted structure `q_dedup_video`'s ≥-half
    * frame-match rule provably keeps AND drops. */
  def videoPatternId(docId: Long, f: Int): Long = {
    require(docId >= 0 && docId < (1L << 38),
      s"doc_id $docId would collide the shared/variant pattern ranges")
    if (f == (docId % VideoFrames).toInt) VideoVariantBase + docId
    else (docId / 4) * 8 + f
  }

  /** Deterministic video CONTAINER: `[n:int][len:int][png bytes]…` —
    * the container parse is the stubbed codec (a real demuxer is not
    * in the JDK), but every frame inside is a REAL PNG and the
    * per-frame decode is the REAL ImageIO path, so the Spark-side
    * plumbing (binary column → partition-local demux → frame decode →
    * 8-byte hash) is exactly a production video-dedup pipeline's. */
  def synthVideo(docId: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(VideoFrames)
    var f = 0
    while (f < VideoFrames) {
      val png = synthTexturedPng(videoPatternId(docId, f))
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    bos.toByteArray
  }

  def decodeVideoFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    require(n >= 0 && n < (1 << 20), s"implausible frame count $n")
    (0 until n).map { _ =>
      val len = in.readInt()
      val frame = new Array[Byte](len)
      in.readFully(frame)
      frame
    }
  }

  case class VideoFrameHash(doc_id: Long, f: Int, fhash: Long)

  /** Video media table, one frame container per document id —
    * partition-local encode, same (doc_id, mime, content) shape as
    * [[toMediaPng]]/[[toWavMedia]], so downstream stages see a real
    * binary column they must demux, not a synthesizer they can reach
    * around. */
  def toVideoMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map(id => MediaRow(id, "video/x-graft-frames", synthVideo(id)))
    }.toDF()
  }

  /** Per-frame dHash extraction over a (doc_id, mime, content) video
    * media table: demux of the binary column and frame decode run
    * partition-locally; only (doc_id, frame index, 8-byte hash) rows
    * leave the stage — at 100 TB of video the downstream dedup join
    * moves sampled hashes, never frames. */
  def videoFrameHashes(spark: SparkSession, media: DataFrame): Dataset[VideoFrameHash] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { r =>
        decodeVideoFrames(r.content).zipWithIndex.map { case (png, f) =>
          val (w, h, px) = decodeImage(png)
          VideoFrameHash(r.doc_id, f, dHash64(px, w, h))
        }
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
