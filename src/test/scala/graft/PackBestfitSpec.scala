package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash

/** The no-split best-fit-decreasing packer behind q_pack_bestfit:
  * pinned against an independent sequential reference (different data
  * structures — a sorted-map of bins — over the same shard split),
  * plus mass conservation and the packing-quality floor. */
class PackBestfitSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val B = 512

  private lazy val rows =
    SparkEntry.queries("q_pack_bestfit")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq

  /** Independent reference: per-shard BFD with a List[(fill, nd)]
    * accumulator scanned functionally — not the operator's ArrayBuffer
    * walk. */
  private lazy val reference: Map[(Long, Long), (Long, Long)] = {
    val docs = Tables(spark, TestSpark.Sf, "documents")
    val n = docs.count()
    val shards = math.max(4L, (n + 255) / 256)
    val toks = docs.select(
        (PortableHash.md5Long(col("doc_id").cast("string")) % shards)
          .as("shard"),
        col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"))
      .as[(Long, Long, Long)].collect()
    toks.groupBy(_._1).flatMap { case (shard, ds) =>
      var bins = Vector.empty[(Long, Long)] // (fill, nDocs)
      ds.sortBy { case (_, id, l) => (-l, id) }.foreach { case (_, _, l) =>
        val eligible = bins.zipWithIndex.filter(_._1._1 + l <= B)
        if (eligible.isEmpty) bins = bins :+ ((l, 1L))
        else {
          // best fit = max fill; ties to lowest index
          val (_, i) = eligible.maxBy { case ((f, _), ix) => (f, -ix) }
          bins = bins.updated(i, (bins(i)._1 + l, bins(i)._2 + 1))
        }
      }
      bins.zipWithIndex.map { case ((f, nd), b) =>
        (shard, b.toLong) -> (nd, f)
      }
    }
  }

  test("per-bin occupancy equals the independent sequential BFD " +
      "reference, bin for bin") {
    assert(rows.nonEmpty)
    val got = rows.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == reference,
      "packer diverged from the reference BFD")
  }

  test("mass conservation: every document lands in exactly one bin " +
      "(doc and token totals match the corpus)") {
    val docs = Tables(spark, TestSpark.Sf, "documents")
    val exp = docs.select(count(lit(1)),
        sum(size(split(col("text"), "\\s+")).cast("long")))
      .as[(Long, Long)].head()
    assert((rows.map(_._3).sum, rows.map(_._4).sum) == exp,
      "packing lost or duplicated documents/tokens")
  }

  test("packing quality: no bin exceeds the budget unless it holds a " +
      "single oversized document; every shard's efficiency is >= 0.5 " +
      "(the BFD guarantee band) and beats trivial one-doc-per-bin") {
    rows.foreach { case (sh, b, nd, nt, fill, _) =>
      assert(nt <= B || nd == 1,
        s"shard $sh bin $b overfull ($nt tokens, $nd docs)")
      assert(math.abs(fill - math.rint(nt.toDouble / B * 10000) / 10000)
        < 1e-9, "fill_pct is not n_tokens/budget")
    }
    val perShard = rows.groupBy(_._1)
    perShard.foreach { case (sh, bs) =>
      val eff = bs.map(_._4).sum.toDouble / (bs.map(_._2).distinct.size * B)
      assert(eff >= 0.5, s"shard $sh efficiency $eff below the BFD band")
      assert(bs.exists(_._3 > 1),
        s"shard $sh degenerated to one doc per bin")
    }
  }

  test("deterministic: a second run reproduces the report bit-for-bit " +
      "(hash-shard + in-group sort make partitioning irrelevant)") {
    val again = SparkEntry.queries("q_pack_bestfit")(spark, TestSpark.Sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(again == rows)
  }
}
