package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  test("binary plumbing: features computed partition-locally, one row per doc") {
    val docs = Tables(spark, Sf, "documents")
    val feats = MediaPipeline.extractFeatures(spark, MediaPipeline.toMedia(docs))
    assert(feats.count() == docs.count())
    val f = feats.filter(_.doc_id == 0L).head()
    assert(f.n_bytes > 0)
    assert(math.abs(f.histogram.sum - 1.0) < 1e-9)
    assert(f.brightness > 0 && f.brightness < 1)
  }

  test("decode stub is deterministic") {
    val bytes = "hello world".getBytes("UTF-8")
    val (w1, h1, b1, hist1) = MediaPipeline.decodeStub(bytes)
    val (w2, h2, b2, hist2) = MediaPipeline.decodeStub(bytes)
    assert(w1 == w2 && h1 == h2 && b1 == b2 && hist1.sameElements(hist2))
  }

  test("frame sampling offsets are stride-aligned") {
    assert(MediaPipeline.frameOffsets(100, 10, 3) == Seq(0, 30, 60, 90))
  }
}
