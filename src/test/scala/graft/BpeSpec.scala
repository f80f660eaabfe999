package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Bpe.fit/encode vs an independent sequential reference, plus the
  * cross-pin to the oracle-checked `q_bpe_merge` pair statistic. */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val Merges = 30

  private lazy val docs = Tables(spark, TestSpark.Sf, "documents")

  private lazy val model = Bpe.fit(docs, "text", Merges)

  /** Independent reference: string-join representation (symbols
    * space-separated), merge applied via split/scan — different data
    * structures from the operator's Vector walk. */
  private def referenceMerges(n: Int): Seq[(String, String)] = {
    val wf = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var table: Seq[(List[String], Long)] =
      wf.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = Seq.newBuilder[(String, String)]
    (1 to n).foreach { _ =>
      val counts = table.flatMap { case (syms, f) =>
        syms.zip(syms.drop(1)).map(p => (p, f))
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (counts.nonEmpty) {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a + " " + b) }._1
        out += best
        def mergeList(s: List[String]): List[String] = s match {
          case a :: b :: rest if (a, b) == best =>
            (a + b) :: mergeList(rest)
          case a :: rest => a :: mergeList(rest)
          case Nil => Nil
        }
        table = table.map { case (syms, f) => (mergeList(syms), f) }
      }
    }
    out.result()
  }

  test("merge list matches the independent sequential reference") {
    assert(model.merges === referenceMerges(Merges))
    assert(model.merges.length === Merges)
  }

  test("incremental pair-delta trainer is bit-identical to the full recount") {
    val wf = Bpe.wordFreq(docs, "text", 100000)
    // deep into merge territory — past where early pair collisions
    // or a stale-index slip would diverge the two loops
    val n = 200
    assert(Bpe.trainMerges(wf, n) === Bpe.trainMergesRecount(wf, n))
    // and through exhaustion: more merges than pairs exist on a tiny
    // shortlist, so both loops must stop at the identical point
    val tiny = wf.take(30)
    val all = Bpe.trainMergesRecount(tiny, 10000)
    assert(Bpe.trainMerges(tiny, 10000) === all)
  }

  test("first merge equals q_bpe_merge's oracle-checked top pair") {
    val top = SparkEntry.queries("q_bpe_merge")(spark, TestSpark.Sf)
      .limit(1).collect()(0).getString(0)
    val (a, b) = model.merges.head
    assert(a + b === top)
  }

  test("encode round-trips and never expands") {
    val sample = docs.select(lower(col("text"))).limit(50)
      .collect().map(_.getString(0))
    sample.flatMap(_.split(' ')).foreach { w =>
      val toks = model.encodeWord(w)
      assert(toks.mkString === w, s"round-trip failed for '$w'")
      assert(toks.length <= w.length)
    }
    // more merges never increases the corpus token count
    val smaller = Bpe.Model(model.merges.take(10))
    val words = sample.flatMap(_.split(' ')).toSeq
    val nFull = words.map(model.encodeWord(_).length.toLong).sum
    val nSmall = words.map(smaller.encodeWord(_).length.toLong).sum
    assert(nFull <= nSmall)
  }

  test("q_bpe_encode's hidden quantity: the corpus actually compresses") {
    // the oracle checks losslessness/vocab-closure verdicts; the raw
    // token counts aren't SQL-recomputable, so pin the compression here
    val r = SparkEntry.queries("q_bpe_encode")(spark, TestSpark.Sf)
      .agg(sum(col("n_chars")).as("chars")).head()
    val enc = Bpe.encode(docs, "text",
      Bpe.fit(docs, "text", numMerges = 200, topV = 4096))
      .agg(sum(col("n_tokens")).as("toks")).head()
    val (chars, toks) = (r.getLong(0), enc.getLong(0))
    assert(toks < chars, s"200 merges should compress: $toks tokens vs $chars chars")
    assert(toks.toDouble / chars < 0.7, s"compression too weak: $toks/$chars")
  }

  test("distributed encode matches the driver-side apply") {
    val enc = Bpe.encode(docs, "text", model)
      .select(col("doc_id"), col("tokens"), col("n_tokens"))
      .orderBy(col("doc_id")).limit(20).collect()
    val local = docs.select(col("doc_id"), lower(col("text")))
      .orderBy(col("doc_id")).limit(20).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(' ').toSeq.flatMap(model.encodeWord)))
      .toMap
    enc.foreach { r =>
      val exp = local(r.getLong(0))
      assert(r.getSeq[String](1) === exp)
      assert(r.getInt(2) === exp.length)
    }
  }
}
