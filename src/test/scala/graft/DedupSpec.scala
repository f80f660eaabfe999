package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

class DedupSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("exact dedup partitions the corpus: group counts sum to row count") {
    import spark.implicits._
    val groups = run("q_dedup_exact").select("n").as[Long].collect()
    assert(groups.sum == Tables(spark, Sf, "documents").count())
  }

  test("minhash LSH candidates cover all high-jaccard pairs (recall=1 on planted dups)") {
    import spark.implicits._
    val exact = run("q_dedup_ngram")
      .where($"jac" >= 0.7).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val cand = run("q_dedup_minhash")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
    assert(exact.subsetOf(cand),
      s"LSH missed ${(exact -- cand).size} of ${exact.size} true pairs")
  }

  test("dedup pipeline verdicts: keep < drop, verified similarity, keepers never dropped") {
    import spark.implicits._
    val verdicts = run("q_dedup_pipeline")
      .as[(Long, Long, Double)].collect()
    assert(verdicts.nonEmpty)
    val dropped = verdicts.map(_._1).toSet
    verdicts.foreach { case (drop, keep, jac) =>
      assert(keep < drop)
      assert(jac >= 0.5)
    }
    // a keeper may not itself be dropped unless it was dropped in favor
    // of an even smaller id — the chain must terminate at an undropped id
    val keepOf = verdicts.map(v => v._1 -> v._2).toMap
    verdicts.foreach { case (_, keep, _) =>
      var k = keep
      var hops = 0
      while (dropped.contains(k) && hops < 100) { k = keepOf(k); hops += 1 }
      assert(hops < 100, "keep chain did not terminate")
    }
  }

  test("simhash: planted near-duplicates sit within small Hamming distance") {
    import spark.implicits._
    val exact = run("q_dedup_ngram")
      .where($"jac" >= 0.7).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val close = run("q_dedup_simhash_pairs")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(close),
      s"simhash separated ${(exact -- close).size} true near-dup pairs")
  }
}
