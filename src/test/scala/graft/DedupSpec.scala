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

  test("connected components: labels are fixpoint minima of the verified pair graph") {
    import spark.implicits._
    val labels = run("q_dedup_cc").as[(Long, Long)].collect().toMap
    // rebuild the edge set independently from the pipeline verdicts
    val edges = run("q_dedup_pipeline")
      .select("drop_id", "keep_id").as[(Long, Long)].collect()
    assert(labels.nonEmpty)
    // every labelled node's cluster id is itself a node with that label
    labels.values.foreach(c => assert(labels.get(c).contains(c),
      s"cluster root $c must be labelled with itself"))
    // labels are consistent across every verified edge (drop/keep are
    // endpoints of verified pairs, so they must share a component)
    edges.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) crosses clusters")
    }
    // the label is never larger than the node id (min-of-component)
    labels.foreach { case (n, c) => assert(c <= n) }
  }

  test("KMV sketch estimates distinct counts within coarse relative error") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_sketch_kmv")(spark, Sf)
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, est, exact) =>
      assert(exact > 32, s"group $flag must exceed k for the estimator")
      val rel = math.abs(est - exact) / exact
      // k=32 gives ~1/sqrt(k-1) ≈ 18% std error; 3σ bound
      assert(rel < 0.55, s"group $flag: est=$est exact=$exact rel=$rel")
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

  test("all-pairs TF cosine equals a from-scratch local recompute") {
    import spark.implicits._
    val engine = run("q_sim_allpairs")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(engine.nonEmpty)
    // local reference: trigram TF vectors over the query's own
    // DfCap/CosMin/NGram constants
    import graft.queries.DedupQueries.{CosMin, DfCap, NGram}
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val tf: Map[Long, (String, Map[String, Long])] = docs.map { case (id, lang, text) =>
      val w = text.toLowerCase.split(" ", -1)
      val grams = if (w.length >= NGram) w.sliding(NGram).map(_.mkString(" ")).toSeq
        else Seq.empty
      id -> (lang, grams.groupBy(identity).map { case (g, o) => g -> o.length.toLong })
    }.toMap
    val df = tf.values.flatMap(_._2.keys).groupBy(identity).map { case (g, o) => g -> o.size }
    val keptTf = tf.map { case (id, (lang, v)) =>
      id -> (lang, v.filter { case (g, _) => df(g) <= DfCap })
    }
    val expected = (for {
      Seq((ai, (la, va)), (bi, (lb, vb))) <-
        keptTf.toSeq.sortBy(_._1).combinations(2)
      if la == lb
      dot = va.keySet.intersect(vb.keySet).toSeq.map(g => va(g) * vb(g)).sum
      if dot > 0
      cos = dot / math.sqrt(
        (va.values.map(x => x * x).sum * vb.values.map(x => x * x).sum).toDouble)
      if cos >= CosMin
    } yield (ai, bi) -> BigDecimal(cos)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(engine.keySet == expected.keySet,
      s"pair sets diverge: only-engine=${engine.keySet -- expected.keySet} " +
        s"only-local=${expected.keySet -- engine.keySet}")
    expected.foreach { case (k, c) =>
      assert(math.abs(engine(k) - c) <= 1e-4, s"pair $k: ${engine(k)} vs $c")
    }
  }
}
