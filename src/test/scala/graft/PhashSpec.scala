package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaPipeline

/** Pins the perceptual-hash dedup path (`q_dedup_phash`):
  * real-PNG-decode dHash == the integer closed form the SQL oracle
  * recomputes, and the pigeonhole-banded pair query == brute-force
  * all-pairs at the Hamming cut. */
class PhashSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  /** The grid-formula dHash — the reference the DuckDB oracle encodes
    * in SQL, computed here straight from [[MediaPipeline.phashGridVal]]
    * without any image in between. */
  private def refHash(id: Long): Long = {
    var sig = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (MediaPipeline.phashGridVal(id, x, y) <
          MediaPipeline.phashGridVal(id, x + 1, y))
        sig |= 1L << (y * 8 + x)
    sig
  }

  test("dHash64 over the decoded PNG equals the grid closed form at every scale") {
    (0L until 60L).foreach { id =>
      val png = MediaPipeline.synthTexturedPng(id)
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte) // real PNG
      val (w, h, px) = MediaPipeline.decodeImage(png)
      val s = MediaPipeline.phashScale(id)
      assert(w == 9 * s && h == 8 * s)
      assert(MediaPipeline.dHash64(px, w, h) == refHash(id),
        s"doc $id (scale $s): decoded dHash != closed form")
    }
  }

  test("banded pair query equals brute-force all-pairs at hamming <= 4") {
    val docs = Tables(spark, Sf, "documents")
    import spark.implicits._
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val hashes = ids.map(id => id -> refHash(id)).toMap
    val brute = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j)))
      if h <= 4
    } yield (ids(i), ids(j), h)).toVector.sorted
    val got = SparkEntry.queries("q_dedup_phash")(spark, Sf)
      .as[(Long, Long, Int)].collect().toVector.sorted
    assert(got == brute,
      s"banded pairs (${got.size}) != brute force (${brute.size})")
    assert(got.nonEmpty) // planted near-dup groups must surface
    // the perceptual property: at least one surfaced pair spans two
    // RESOLUTIONS of the same base image — invisible to byte dedup
    assert(got.exists { case (a, b, _) =>
      MediaPipeline.phashScale(a) != MediaPipeline.phashScale(b) })
  }

  test("property: dHash is invariant under integer block-upscale of ANY image") {
    // the defining perceptual property, on random grids rather than
    // the planted family: nearest-neighbor resampling in dHash64
    // recovers the base grid from any s-fold block upscale, so the
    // hash of the upscaled image equals the hash of the base
    val genCase = for {
      px <- Gen.containerOfN[Array, Int](72, Gen.choose(0, 255))
      s <- Gen.choose(1, 4)
    } yield (px, s)
    val prop = Prop.forAll(genCase) { case (base, s) =>
      val w = 9 * s
      val h = 8 * s
      val up = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w)
        up(y * w + x) = base((y / s) * 9 + (x / s))
      MediaPipeline.dHash64(up, w, h) == MediaPipeline.dHash64(base, 9, 8)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("media decontamination equals brute-force train-vs-bench matching") {
    val docs = Tables(spark, Sf, "documents")
    import spark.implicits._
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val hashes = ids.map(id => id -> refHash(id)).toMap
    val bench = ids.filter(_ % 97 == 0)
    val expect = ids.filter(_ % 97 != 0).flatMap { id =>
      val hits = bench
        .map(b => (b, java.lang.Long.bitCount(hashes(id) ^ hashes(b))))
        .filter(_._2 <= 4)
      if (hits.isEmpty) None
      else Some((id, hits.size.toLong, hits.map(_._1).min, hits.map(_._2).min))
    }.toVector
    val got = SparkEntry.queries("q_decontaminate_media")(spark, Sf)
      .as[(Long, Long, Long, Int)].collect().toVector.sortBy(_._1)
    assert(got == expect)
    assert(got.nonEmpty) // bench images must contaminate their group-mates
  }

  test("video frame hashes and temporal dedup equal the closed-form reference") {
    val docs = Tables(spark, Sf, "documents")
    import spark.implicits._
    val ids = docs.select("doc_id").as[Long].collect().sorted
    // container demux + REAL per-frame decode == closed form
    ids.take(12).foreach { v =>
      val frames = MediaPipeline.decodeVideoFrames(MediaPipeline.synthVideo(v))
      assert(frames.length == MediaPipeline.VideoFrames)
      frames.zipWithIndex.foreach { case (png, f) =>
        val (w, h, px) = MediaPipeline.decodeImage(png)
        assert(MediaPipeline.dHash64(px, w, h) ==
          refHash(MediaPipeline.videoPatternId(v, f)))
      }
    }
    // query == brute-force >= half frame-position matches
    val fh = ids.map(v => v -> (0 until MediaPipeline.VideoFrames)
      .map(f => refHash(MediaPipeline.videoPatternId(v, f)))).toMap
    val expect = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      n = fh(ids(i)).zip(fh(ids(j))).count { case (a, b) => a == b }
      if n >= 2
    } yield (ids(i), ids(j), n.toLong)).toVector
    val got = SparkEntry.queries("q_dedup_video")(spark, Sf)
      .as[(Long, Long, Long)].collect().toVector.sortBy(p => (p._1, p._2))
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("cluster manifest equals brute-force union-find over the pair graph") {
    val docs = Tables(spark, Sf, "documents")
    import spark.implicits._
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val hashes = ids.map(id => id -> refHash(id)).toMap
    // reference: union-find over the same brute-force pair set
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(i: Long): Long =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j))) <= 4
    } {
      val (ra, rb) = (find(ids(i)), find(ids(j)))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = ids.map(i => (i, find(i), find(i) == i)).toVector
    val got = SparkEntry.queries("q_dedup_phash_cc")(spark, Sf)
      .as[(Long, Long, Boolean)].collect().toVector.sortBy(_._1)
    assert(got == expect)
    assert(got.exists(!_._3)) // the manifest must actually DROP something
  }
}
