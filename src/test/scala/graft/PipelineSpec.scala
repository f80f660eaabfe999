package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Corpus-pipeline invariants that the hash oracle alone can't state:
  * plan-equivalence between the scale-shaped engine form and the
  * declarative form, and budget arithmetic. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("bloom-pruned incremental dedup equals the broadcast anti-join plan") {
    import spark.implicits._
    val bloom = run("q_dedup_bloom")
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val plain = run("q_dedup_incremental")
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(bloom == plain,
      s"bloom path diverged: only-bloom=${(bloom -- plain).size} " +
        s"only-plain=${(plain -- bloom).size}")
    assert(bloom.nonEmpty)
  }

  test("token budget: histogram-threshold plan equals the declarative window form") {
    import spark.implicits._
    val engine = run("q_token_budget")
      .select("doc_id", "source", "toks").as[(Long, String, Long)].collect().toSet
    // the oracle's shape, evaluated by Spark itself: corpus-wide
    // running sum per source (fine at test scale; the engine form
    // exists to avoid exactly this window at 100 TB)
    import org.apache.spark.sql.expressions.Window
    val tok = Tables(spark, Sf, "documents").select(col("doc_id"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("toks").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = tok.withColumn("cum", sum(col("toks")).over(w))
      .where(col("cum") <= graft.queries.PipelineQueries.TokenBudget)
      .select("doc_id", "source", "toks").as[(Long, String, Long)].collect().toSet
    assert(engine == naive)
  }

  test("weighted sampling: token-proportional draw overweights heavy docs") {
    import spark.implicits._
    val sample = run("q_sample_weighted")
      .select("lang", "toks", "rn").as[(String, Long, Int)].collect()
    assert(sample.nonEmpty)
    // per-lang ranks are exactly 1..k
    sample.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length))
    }
    // inclusion probability ∝ toks must pull the sample's mean token
    // mass above the population's (deterministic draw, so this is a
    // fixed property of the testdata, not a flaky statistical test)
    val popMean = Tables(spark, Sf, "documents")
      .select(size(split(col("text"), "\\s+")).cast("double").as("t"))
      .agg(avg(col("t"))).head().getDouble(0)
    val sampleMean = sample.map(_._2.toDouble).sum / sample.length
    assert(sampleMean > popMean,
      s"weighted sample mean $sampleMean not above population mean $popMean")
  }

  test("token budget: every source's admitted token mass respects the budget") {
    import spark.implicits._
    val bySource = run("q_token_budget")
      .groupBy("source").agg(sum("toks").as("mass"))
      .select("source", "mass").as[(String, Long)].collect()
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, mass) =>
      assert(mass <= graft.queries.PipelineQueries.TokenBudget,
        s"source $src over budget: $mass")
    }
  }

  test("importance resampling pulls the selection toward the target domain") {
    import spark.implicits._
    val selected = run("q_sample_importance")
      .select("doc_id", "source", "score").as[(Long, String, Double)].collect()
    assert(selected.length == 500)
    // ranked output: scores non-increasing with doc_id tiebreak
    selected.sliding(2).foreach { case Array((i1, _, s1), (i2, _, s2)) =>
      assert(s1 > s2 || (s1 == s2 && i1 < i2))
    }
    // DSIR selects for target-likeness: the src0 share of the TOP of
    // the ranking must exceed its corpus share (deterministic property
    // of the fixed testdata, not a statistical test). At test scale
    // the corpus may be smaller than the 500-doc selection, so the
    // discriminating prefix is the top fifth of what was returned.
    val corpus = Tables(spark, Sf, "documents")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val corpusShare = corpus("src0").toDouble / corpus.values.sum
    val top = selected.take(math.max(20, selected.length / 5))
    val topShare = top.count(_._2 == "src0").toDouble / top.length
    assert(topShare > corpusShare,
      s"top-ranked src0 share $topShare not above corpus share $corpusShare")
  }

  test("KS drift statistic equals a local two-sample recompute") {
    import spark.implicits._
    val row = run("q_quality_ks")
      .select("n_a", "n_b", "d_num", "ks_d")
      .as[(Long, Long, Long, Double)].collect().head
    val (na, nb, dnum, ksd) = row
    val docs = Tables(spark, Sf, "documents")
      .select(col("source"), col("n_chars").cast("long"))
      .as[(String, Long)].collect()
    val a = docs.collect { case ("src0", x) => x }.sorted
    val b = docs.collect { case (s0, x) if s0 != "src0" => x }.sorted
    assert(na == a.length && nb == b.length)
    val expected = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x).toLong * nb - b.count(_ <= x).toLong * na)
    }.max
    assert(dnum == expected)
    assert(ksd == BigDecimal(expected.toDouble / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("RAG chunks are exact substrings at their stride offsets and cover every document") {
    import spark.implicits._
    val chunks = run("q_chunk_docs")
      .select("doc_id", "chunk_ix", "chunk").as[(Long, Int, String)].collect()
      .groupBy(_._1)
    val texts = Tables(spark, Sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == texts.keySet)
    chunks.foreach { case (id, rows) =>
      val text = texts(id)
      // chunk count is the pinned formula, indices dense from 0
      val expected = math.max((text.length - 1) / 192 + 1, 1)
      assert(rows.map(_._2).sorted.toSeq == (0 until expected))
      rows.foreach { case (_, ix, chunk) =>
        val from = ix * 192
        assert(chunk == text.substring(from, math.min(from + 256, text.length)))
      }
    }
  }

  test("passage dedup: untouched documents reconstruct exactly; chunk accounting is total") {
    import spark.implicits._
    val out = run("q_chunk_dedup")
      .select("doc_id", "n_kept", "n_dropped", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    val texts = Tables(spark, Sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.length == texts.size)
    assert(out.exists(_._3 > 0), "testdata should contain duplicated passages")
    out.foreach { case (id, kept, dropped, clean) =>
      val text = texts(id)
      assert(kept + dropped == math.max((text.length - 1) / 128 + 1, 1))
      // a document that lost nothing must reassemble bit-for-bit
      if (dropped == 0) assert(clean == text, s"doc $id reconstruction diverged")
      // surviving text is a concatenation of original 128-char-aligned
      // passages, so it can never exceed the original
      else assert(clean.length < text.length)
    }
  }

  test("temperature mixture: rates are n^alpha-monotone and the hash thin tracks them") {
    import spark.implicits._
    val rows = run("q_mixture_temperature")
      .select("source", "n_orig", "n_kept", "rate")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // the largest source keeps everything (rate 1.0 by construction)
    val largest = rows.maxBy(_._2)
    assert(largest._4 == 1.0 && largest._3 == largest._2)
    // rate must be monotone in source size, in (0, 1]
    rows.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4, s"rate not monotone: $a vs $b")
    }
    rows.foreach { case (src, n, k, r) =>
      assert(r > 0 && r <= 1.0)
      assert(k <= n)
      // md5-uniform thinning: kept/n within 5 sigma of the rate
      val sigma = math.sqrt(r * (1 - r) / n)
      assert(math.abs(k.toDouble / n - r) <= 5 * sigma + 1e-9,
        s"$src kept ${k.toDouble / n} vs rate $r (sigma $sigma)")
    }
  }
}
