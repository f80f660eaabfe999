package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("binary plumbing: features computed partition-locally, one row per doc") {
    val docs = Tables(spark, Sf, "documents")
    val feats = MediaPipeline.extractFeatures(spark, MediaPipeline.toMediaPng(spark, docs))
    assert(feats.count() == docs.count())
    val f = feats.filter(_.doc_id == 0L).head()
    assert(f.n_bytes > 0)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    assert(f.brightness > 0 && f.brightness < 1)
  }

  test("ImageIO round trip is pixel-exact against the generating formula") {
    val docId = 7L
    val (w, h) = MediaPipeline.synthDims(docId)
    val png = MediaPipeline.synthPng(docId)
    // real PNG magic bytes — this is an actual encoded image
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    val (dw, dh, px) = MediaPipeline.decodeImage(png)
    assert(dw == w && dh == h)
    (0 until w * h).foreach { i =>
      assert(px(i) == MediaPipeline.synthPixel(docId, i),
        s"pixel $i: decoded ${px(i)} != formula ${MediaPipeline.synthPixel(docId, i)}")
    }
  }

  test("known pixel values: doc 8 is 12x4 starting at (8*31) mod 256 = 248") {
    val (_, _, px) = MediaPipeline.decodeImage(MediaPipeline.synthPng(8L))
    assert(px.length == 48)
    assert(px(0) == 248 && px(1) == 249)
    assert(px(7) == 255 && px(8) == 0) // wraps through 255 -> 0
    assert(px(47) == 39)
  }

  test("undecodable payload fails loudly") {
    intercept[IllegalArgumentException] {
      MediaPipeline.decodeImage("not an image".getBytes("UTF-8"))
    }
  }

  test("frame sampling offsets are stride-aligned") {
    assert(MediaPipeline.frameOffsets(100, 10, 3) == Seq(0, 30, 60, 90))
  }

  test("WAV round trip is sample-exact against the generating formula") {
    val docId = 11L
    val wav = MediaPipeline.synthWav(docId)
    // real RIFF/WAVE container — an actual encoded audio file
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val s = MediaPipeline.decodeWav(wav)
    assert(s.length == MediaPipeline.synthSampleCount(docId))
    s.indices.foreach { i =>
      assert(s(i) == MediaPipeline.synthSample(docId, i),
        s"sample $i: decoded ${s(i)} != formula ${MediaPipeline.synthSample(docId, i)}")
    }
  }

  test("undecodable audio payload fails loudly") {
    intercept[Exception] {
      MediaPipeline.decodeWav("not audio".getBytes("UTF-8"))
    }
  }

  test("q_multimodal_frames samples exactly the frameOffsets kernel per document") {
    import TestSpark.spark.implicits._
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    // local 60-bit digest reference (md5Long WITHOUT the mod-P family
    // reduction digestOf applies)
    def ref60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    // CODEPOINT semantics, like Spark's char_length/substr and
    // DuckDB's length/substr — String.length/substring would count
    // UTF-16 units and diverge on astral-plane characters
    val expect = (for {
      (id, text) <- docs
      cps = text.codePoints().toArray
      off <- MediaPipeline.frameOffsets(cps.length, 64, 3)
    } yield (id, off.toLong / 64, ref60(new String(cps, off, 64))))
      .toVector.sorted
    val got = SparkEntry.queries("q_multimodal_frames")(spark, Sf)
      .as[(Long, Long, Long)].collect().toVector.sorted
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
