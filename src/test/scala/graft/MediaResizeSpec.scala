package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline

class MediaResizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("nearest-neighbor kernel picks the exact source pixels") {
    // 4×2 frame: pixels 0..7; resize to 2×1 → samples (0,0) and (2,0)
    val px = Array.tabulate(8)(identity)
    val out = MediaPipeline.resizeGray(px, srcW = 4, srcH = 2, dstW = 2, dstH = 1)
    assert(out.toSeq == Seq(0 / 255.0, 2 / 255.0))
  }

  test("upscale repeats source pixels; empty input yields zeros") {
    val out = MediaPipeline.resizeGray(Array(10, 20), 2, 1, 4, 1)
    assert(out.toSeq == Seq(10 / 255.0, 10 / 255.0, 20 / 255.0, 20 / 255.0))
    assert(MediaPipeline.resizeGray(Array.emptyIntArray, 0, 0, 3, 3).toSeq ==
      Seq.fill(9)(0.0))
  }

  test("resize of a decoded synthetic PNG samples the formula pixels") {
    // doc 8: 12×4 image, pixel i = (248 + i) mod 256. Resize to 3×2:
    // samples (x·12/3, y·4/2) = x∈{0,4,8}, y∈{0,2} → i ∈ {0,4,8,24,28,32}.
    val (w, h, px) = MediaPipeline.decodeImage(MediaPipeline.synthPng(8L))
    val out = MediaPipeline.resizeGray(px, w, h, 3, 2)
    val want = Seq(0, 4, 8, 24, 28, 32)
      .map(i => MediaPipeline.synthPixel(8L, i) / 255.0)
    assert(out.toSeq == want)
  }

  test("thumbnail stage preserves rows and emits bounded pixel values") {
    val media = MediaPipeline.toMediaPng(spark,
      graft.Tables(spark, TestSpark.Sf, "documents").limit(50))
    val thumbs = MediaPipeline.thumbnails(spark, media, 4, 4).collect()
    assert(thumbs.length == 50)
    assert(thumbs.forall(_.thumb.length == 16))
    assert(thumbs.forall(_.thumb.forall(v => v >= 0.0 && v <= 1.0)))
    // determinism: same doc ⇒ same thumbnail across runs
    val again = MediaPipeline.thumbnails(spark, media, 4, 4).collect()
    assert(thumbs.sortBy(_.doc_id).map(_.thumb.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.thumb.toSeq).toSeq)
  }
}
