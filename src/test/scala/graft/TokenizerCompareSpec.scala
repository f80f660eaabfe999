package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** The five-family tokenizer report behind `q_tokenizer_compare` —
  * the ○ query projects only the DuckDB-recomputable columns, so the
  * model-dependent numbers (vocab sizes, piece counts, compression)
  * are pinned HERE over the same shared frame. */
class TokenizerCompareSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("all five families conserve character mass, respect the " +
      "[words, chars] piece bound, and genuinely differ in segmentation") {
    val rows = TextQueries.tokenizerReport(spark, TestSpark.Sf)
      .as[(String, Long, Long, Long, Double, Boolean, Boolean)]
      .collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) ==
      Seq("bpe", "bpe_byte", "unigram", "unigram_soft", "wordpiece"))
    // the shared contract — what the ○ query hashes
    assert(rows.forall(_._6), s"a family is lossy: $rows")
    assert(rows.forall(_._7), s"a family broke the piece bound: $rows")
    // character mass is a property of the CORPUS, not the tokenizer
    // (bpe_byte counts BYTES of the raw text while the char families
    // count chars of the lowercased text — on the pure-ASCII fixture
    // the two masses coincide, which is itself worth pinning)
    assert(rows.map(_._4).distinct.size == 1,
      "the families disagree on total character mass")
    // model-dependent numbers are sane: real vocabularies, real
    // compression (every piece carries more than one char on average)
    assert(rows.forall(_._2 > 0))
    assert(rows.forall(r => r._5 > 1.0),
      s"a family degenerated to character-level segmentation: $rows")
    // and the families are not secretly one tokenizer: at least two
    // distinct corpus piece counts across the four
    assert(rows.map(_._3).distinct.size >= 2,
      s"all families produced identical piece counts: $rows")
  }
}
