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
