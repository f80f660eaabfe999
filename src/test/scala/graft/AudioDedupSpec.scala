package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline
import graft.operators.Pigeonhole

/** q_dedup_audio: the acoustic-fingerprint near-dup family.
  *
  * Pins (1) the WAV round trip is sample-exact against the
  * generating formula, (2) the fingerprint's planted separation —
  * within-group Hamming ≤ 4, cross-group well above the cut — that
  * makes Hamming ≤ 4 recover exactly the planted groups, (3) gain
  * invariance: volume-only variants fingerprint IDENTICALLY, and
  * (4) banded candidate generation loses no qualifying pair vs the
  * brute-force cut (pigeonhole exact recall on real fingerprints).
  */
class AudioDedupSpec extends AnyFunSuite {

  private val N = 200
  private def fp(doc: Long): Long =
    MediaPipeline.audioFingerprint(
      MediaPipeline.decodeWav(MediaPipeline.synthGroupWav(doc)))

  test("WAV round trip is sample-exact against the generating formula") {
    val doc = 13L
    val wav = MediaPipeline.synthGroupWav(doc)
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte &&
      wav(2) == 'F'.toByte && wav(3) == 'F'.toByte)
    val s = MediaPipeline.decodeWav(wav)
    assert(s.length == MediaPipeline.AfpFrames * MediaPipeline.AfpFrameLen)
    s.indices.foreach { i =>
      val a = MediaPipeline.groupWavAmp(doc, i / MediaPipeline.AfpFrameLen)
      val want = if (i % 2 == 0) a else -a
      assert(s(i) == want, s"sample $i: decoded ${s(i)} != formula $want")
    }
  }

  test("JDK-codec interop: our writer's bytes decode via AudioSystem, and back") {
    // the hot path is the hand-rolled RIFF writer/chunk-walker (the
    // JDK provider lookup serializes executor threads); this pin is
    // where the "real codec" claim lives — both directions, sample-
    // exact, once, instead of per row
    import javax.sound.sampled.{AudioFileFormat, AudioInputStream, AudioSystem}
    val doc = 21L
    val ours = MediaPipeline.synthGroupWav(doc)
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(ours))
    val f = ais.getFormat
    assert(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian)
    val jdkPcm = ais.readAllBytes()
    val jdkSamples = jdkPcm.grouped(2)
      .map(p => (p(1).toInt << 8) | (p(0) & 0xff)).toArray
    assert(jdkSamples.sameElements(MediaPipeline.decodeWav(ours)))
    // reverse: a JDK-written WAV of the same PCM decodes via our walker
    val jdkAis = new AudioInputStream(
      new java.io.ByteArrayInputStream(jdkPcm), MediaPipeline.WavFormat,
      jdkSamples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(jdkAis, AudioFileFormat.Type.WAVE, bos): Unit
    assert(MediaPipeline.decodeWav(bos.toByteArray).sameElements(jdkSamples))
  }

  test("decode rejects junk and wrong formats loudly") {
    intercept[IllegalArgumentException] {
      MediaPipeline.decodeWav("RIFFxxxxJUNK".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      MediaPipeline.decodeWav(Array.fill[Byte](100)(0))
    }
  }

  test("amplitudes stay 16-bit safe at the loud-splice + max-volume corner") {
    // loud splice in [22000, 23000) scaled by 11/8 must not clip
    (0L until 400L).foreach { doc =>
      (0 until MediaPipeline.AfpFrames).foreach { f =>
        val a = MediaPipeline.groupWavAmp(doc, f)
        assert(a > 0 && a < 32768, s"doc $doc frame $f amp $a clips")
      }
    }
  }

  test("gain invariance: a volume-only variant fingerprints identically") {
    // strip the loud splice by comparing v=0 against a manual rescale:
    // scaling every amplitude by (8+v)/8 preserves every energy
    // comparison, so the base fingerprint equals the fingerprint of
    // the scaled amplitude sequence
    val doc = 40L // v = 0
    val base = fp(doc)
    (1 to 3).foreach { v =>
      val scaled = (0 until MediaPipeline.AfpFrames * MediaPipeline.AfpFrameLen)
        .map { i =>
          val a = (MediaPipeline.groupWavAmp(doc, i / MediaPipeline.AfpFrameLen)
            .toLong * (8 + v) / 8).toInt
          if (i % 2 == 0) a else -a
        }.toArray
      assert(MediaPipeline.audioFingerprint(scaled) == base,
        s"volume x${8 + v}/8 changed the fingerprint")
    }
  }

  test("planted separation: within-group <= 4, cross-group above the cut") {
    val fps = (0L until N.toLong).map(fp)
    var withinMax = 0
    var crossMin = 64
    for (a <- 0 until N; b <- a + 1 until N) {
      val ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if (a / 4 == b / 4) withinMax = math.max(withinMax, ham)
      else crossMin = math.min(crossMin, ham)
    }
    assert(withinMax <= 4, s"within-group Hamming $withinMax > 4")
    assert(crossMin > 4, s"cross-group Hamming $crossMin inside the cut")
  }

  test("banded pairs == brute-force pairs at the Hamming cut") {
    val spark = TestSpark.spark
    val ph = Pigeonhole(64, 4)
    val fps = (0L until N.toLong).map(fp)
    val brute = (for {
      a <- 0 until N; b <- a + 1 until N
      ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if ham <= 4
    } yield (a.toLong, b.toLong, ham)).toSet
    // every qualifying pair shares >= 1 bit-identical segment
    brute.foreach { case (a, b, _) =>
      assert((0 until ph.segments).exists(j =>
        ph.segmentValueLong(fps(a.toInt), j) == ph.segmentValueLong(fps(b.toInt), j)))
    }
    val rows = SparkEntry.queries("q_dedup_audio")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => a < N && b < N }
      .toSet
    assert(rows == brute,
      s"banded=${rows.size} brute=${brute.size}; diff=${(rows diff brute) ++ (brute diff rows)}")
  }

  test("group structure survives the full query: every within-group pair reported") {
    val spark = TestSpark.spark
    val out = SparkEntry.queries("q_dedup_audio")(spark, TestSpark.Sf).collect()
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables(spark, TestSpark.Sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val byGroup = docs.groupBy(_ / 4).values.filter(_.length > 1)
    byGroup.foreach { g =>
      for (a <- g; b <- g if a < b)
        assert(pairs.contains((a, b)), s"missing within-group pair ($a, $b)")
    }
  }
}
