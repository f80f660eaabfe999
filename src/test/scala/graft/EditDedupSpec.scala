package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins `q_dedup_edit`'s two stages independently:
  *
  *  - the VERIFY arithmetic: Spark's thresholded `levenshtein`
  *    builtin against a reference DP over every exhaustive pair of
  *    document prefixes (threshold semantics included — −1 past k);
  *  - the CANDIDATE stage's empirical recall: on the fixture corpus,
  *    MinHash banding loses NO pair the exhaustive prefix-edit filter
  *    admits (the planted near-dups are full-document near-dups, so
  *    band recall holds; this is the AnnRecallSpec stance — an
  *    empirical pin on real data, not a probabilistic theorem).
  */
class EditDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val Prefix = 512
  private val MaxLev = 103

  /** Reference Levenshtein with threshold: full O(n·m) DP, −1 if the
    * distance exceeds k — the semantics Spark's 3-arg builtin
    * documents, implemented independently. */
  private def levRef(a: String, b: String, k: Int): Int = {
    val n = a.length; val m = b.length
    var prev = Array.tabulate(m + 1)(identity)
    for (i <- 1 to n) {
      val cur = new Array[Int](m + 1)
      cur(0) = i
      for (j <- 1 to m)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    if (prev(m) > k) -1 else prev(m)
  }

  private def prefixes: Seq[(Long, String)] =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), substring(col("text"), 1, Prefix).as("p"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

  test("Spark thresholded levenshtein equals the reference DP on exhaustive pairs") {
    val p = prefixes
    val pairs = for (i <- p.indices; j <- i + 1 until p.length)
      yield (p(i)._2, p(j)._2)
    val got = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"), MaxLev)).as[Int].collect()
    pairs.zip(got).foreach { case ((a, b), v) =>
      assert(v == levRef(a, b, MaxLev), s"lev mismatch on ${a.take(20)}…")
    }
  }

  test("banding loses no pair the exhaustive prefix-edit filter admits") {
    val p = prefixes
    val want = (for {
      i <- p.indices; j <- i + 1 until p.length
      lev = levRef(p(i)._2, p(j)._2, MaxLev) if lev >= 0
      ln = math.max(p(i)._2.length, p(j)._2.length)
      if 1.0 - lev.toDouble / ln >= 0.8
    } yield (p(i)._1, p(j)._1)).toSet
    assert(want.nonEmpty) // the fixture plants prefix-edit near-dups
    val out = SparkEntry.queries("q_dedup_edit")(spark, "/root/testdata/sf0.001")
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(out == want, s"banded output ${out.size} vs exhaustive ${want.size}")
    // and the output is a subset of the candidate stage by construction
    val cand = queries.DedupQueries
      .editCandidates(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toSet
    assert(out.subsetOf(cand))
  }
}
