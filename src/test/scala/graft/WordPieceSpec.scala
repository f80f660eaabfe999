package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordPiece
import graft.queries.TextQueries

/** The distributed WordPiece trainer pinned EXACTLY against a
  * sequential in-memory reference (same likelihood score, same
  * tie-break, same symbol marking), the first merge pinned to
  * `q_wordpiece_merge`'s distributed top row, BERT's MaxMatch apply
  * pinned against an independent recursive matcher, plus the
  * whole-word [UNK] rule and the corpus closure/lossless
  * properties. */
class WordPieceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.Sf, "documents")

  /** Sequential reference trainer: plain collections, the same
    * score = cnt(ab)/(cnt(a)·cnt(b)) double compare and "left right"
    * tie-break — independent of the operator's loop structure. */
  private def refTrain(wf: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    var words = wf.filter(_._1.nonEmpty).map { case (w, f) =>
      (w.substring(0, 1) +:
        (1 until w.length).map(i => "##" + w.charAt(i)).toVector, f)
    }
    val out = Seq.newBuilder[(String, String)]
    var made = 0
    var done = false
    while (made < numMerges && !done) {
      val sym = scala.collection.mutable.Map.empty[String, Long]
      val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words) {
        syms.foreach(s => sym(s) = sym.getOrElse(s, 0L) + f)
        syms.zip(syms.tail).foreach(k => pair(k) = pair.getOrElse(k, 0L) + f)
      }
      if (pair.isEmpty) done = true
      else {
        val best = pair.toSeq.sortBy { case ((a, b), c) =>
          (-(c.toDouble / (sym(a).toDouble * sym(b).toDouble)), a + " " + b)
        }.head._1
        out += best
        val (a, b) = best
        val m = a + b.stripPrefix("##")
        words = words.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              nb += m; j += 2
            } else { nb += syms(j); j += 1 }
          }
          (nb.result(), f)
        }
        made += 1
      }
    }
    out.result()
  }

  /** Independent MaxMatch: recursive longest-prefix against the same
    * vocabulary (no arrays, no while loops shared with the
    * operator). */
  private def refEncode(w: String, vocab: Set[String]): Seq[String] = {
    def go(start: Int): Option[List[String]] =
      if (start == w.length) Some(Nil)
      else {
        val pre = if (start > 0) "##" else ""
        // longest match FIRST — MaxMatch is greedy, not backtracking:
        // the first (longest) piece that exists is taken, and if the
        // remainder then fails the whole word is [UNK] (BERT rule)
        (w.length to (start + 1) by -1).iterator
          .map(end => pre + w.substring(start, end))
          .find(vocab.contains) match {
          case None => None
          case Some(p) => go(start + p.stripPrefix("##").length)
            .map(p :: _)
        }
      }
    if (w.isEmpty) Seq.empty
    else go(0).getOrElse(List(WordPiece.Unk))
  }

  test("distributed fit equals the sequential reference EXACTLY at the " +
      "shipped operating point, and the first merge is q_wordpiece_merge's " +
      "distributed top row") {
    val wf = graft.operators.Bpe.wordFreq(docs, "text", TextQueries.WpTopV)
    val gotMerges = {
      val m = WordPiece.fit(docs, "text", numMerges = TextQueries.WpMerges,
        topV = TextQueries.WpTopV)
      // fit returns the vocab; re-derive the merge list for the pin
      graft.operators.WordPiece.trainMerges(wf, TextQueries.WpMerges)
    }
    val refMerges = refTrain(wf, TextQueries.WpMerges)
    assert(gotMerges == refMerges,
      "distributed trainer's merge list diverged from the sequential reference")
    // sf0.001's 31-word vocabulary exhausts the pair space before the
    // 200-merge operating point (every word becomes one symbol —
    // exhaustion is the CORRECT terminal state); the full operating
    // point runs un-exhausted at the Verify SFs. Require enough
    // merges that the likelihood ranking was exercised deeply.
    assert(gotMerges.size >= 50,
      s"only ${gotMerges.size} merges — too few to exercise the ranking")
    val topRow = SparkEntry.queries("q_wordpiece_merge")(spark, TestSpark.Sf)
      .select(col("pair")).as[String].head()
    assert(gotMerges.head._1 + " " + gotMerges.head._2 == topRow,
      "first merge != the oracle-checked distributed statistic's top row")
  }

  test("MaxMatch apply: operator encode equals the independent recursive " +
      "matcher on every corpus word, and an off-vocabulary word is " +
      "whole-word [UNK]") {
    val model = WordPiece.fit(docs, "text", numMerges = TextQueries.WpMerges,
      topV = TextQueries.WpTopV)
    val words = docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 1).distinct().as[String].collect()
    assert(words.length >= 30, "corpus too small to exercise the matcher")
    words.foreach { w =>
      assert(model.encodeWord(w) == refEncode(w, model.vocab),
        s"MaxMatch diverged on '$w'")
    }
    // losslessness on every corpus word (the alphabet floor at work)
    words.foreach { w =>
      assert(model.encodeWord(w).map(_.stripPrefix("##")).mkString == w,
        s"lossy encoding of corpus word '$w'")
    }
    // a character the corpus never saw → the whole word goes [UNK],
    // even when other characters of the word are known
    val unseen = "中"
    assert(!model.vocab.contains(unseen))
    assert(model.encodeWord(s"a${unseen}b") == Seq(WordPiece.Unk))
    assert(refEncode(s"a${unseen}b", model.vocab) == Seq(WordPiece.Unk))
  }

  test("likelihood score separates WordPiece from BPE: the two trainers " +
      "pick different first merges on a fixture built for it") {
    // 'ab' is the most FREQUENT pair (BPE's pick) but a and b are
    // both very common, so its likelihood ratio is low; 'qz' is rarer
    // but q and z occur ONLY together → likelihood 1/cnt — WordPiece
    // must prefer it
    val wf = Seq("ab" -> 100L, "ax" -> 80L, "bx" -> 80L, "qz" -> 30L)
    val wp = WordPiece.trainMerges(wf, 1).head
    assert(wp == ("q", "##z"), s"WordPiece picked $wp")
    val bpe = graft.operators.Bpe.fit(
      spark.createDataset(wf.flatMap { case (w, f) =>
        Seq.fill(f.toInt)(w) }).toDF("text")
        .withColumn("doc_id", monotonically_increasing_id()),
      "text", numMerges = 1).merges.head
    assert(bpe == ("a", "b"), s"BPE picked $bpe — fixture drifted")
  }

  test("STREAMED apply equals the batch encode across micro-batch splits " +
      "— a fixed model makes tokenization a stateless mark") {
    implicit val sqlCtx = spark.sqlContext
    val model = WordPiece.fit(docs, "text", numMerges = TextQueries.WpMerges,
      topV = TextQueries.WpTopV)
    val d = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    val q = WordPiece.encode(mem.toDF.toDF("doc_id", "text"), "text", model)
      .writeStream.format("memory").queryName("swp")
      .outputMode("append").start()
    try {
      val groups = d.grouped(d.length / 3 + 1).toSeq
      assert(groups.size >= 3, "need several splits or the test is vacuous")
      groups.foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      val streamed = spark.table("swp")
        .as[(Long, Seq[String], Long)].collect().toSeq.sortBy(_._1)
      val batch = WordPiece.encode(docs, "text", model)
        .as[(Long, Seq[String], Long)].collect().toSeq.sortBy(_._1)
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }
}
