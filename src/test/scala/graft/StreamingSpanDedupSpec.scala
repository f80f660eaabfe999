package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSpanDedup

/** The streamed at-arrival span marking vs a sequential reference,
  * per prefix and across different batch splits (the covered set
  * must be batch-split invariant), plus the batch finisher against
  * an independent cleaning reference. */
class StreamingSpanDedupSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private val SpanMin = 8

  private def docs: Seq[(Long, String)] = {
    import spark.implicits._
    Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1).take(200).toSeq
  }

  /** Reference covered set: per gram, occurrences ordered by
    * (doc_id, pos); covered from the second onward. */
  private def refCovered(ds: Seq[(Long, String)]): Set[(Long, Int)] = {
    val occ = scala.collection.mutable.Map.empty[String, Int]
    val out = scala.collection.mutable.Set.empty[(Long, Int)]
    for ((id, text) <- ds.sortBy(_._1)) {
      val ws = text.toLowerCase.split(" ", -1)
      for (i <- 0 to ws.length - StreamingSpanDedup.Gram) {
        val g = ws.slice(i, i + StreamingSpanDedup.Gram).mkString(" ")
        val k = occ.getOrElse(g, 0)
        if (k >= 1) out += ((id, i + 1))
        occ(g) = k + 1
      }
    }
    out.toSet
  }

  private def runStream(splits: Seq[Seq[(Long, String)]]): Set[(Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = StreamingSpanDedup
      .coveredStarts(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("span_cov")
      .outputMode("append").start()
    try {
      val out = scala.collection.mutable.Set.empty[(Long, Int)]
      for (batch <- splits) {
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      spark.table("span_cov").as[(Long, Int)].collect().foreach(out += _)
      out.toSet
    } finally q.stop()
  }

  test("covered set equals the reference and is batch-split invariant") {
    val d = docs
    val want = refCovered(d)
    assert(want.nonEmpty, "testdata should contain duplicated grams")
    // split A: one batch; split B: three uneven batches (doc order)
    val a = runStream(Seq(d))
    val b = runStream(Seq(d.take(30), d.slice(30, 31), d.drop(31)))
    assert(a == want, "single-batch covered set diverged from reference")
    assert(b == want, "covered set is not batch-split invariant")
  }

  test("out-of-order arrival: the first-ARRIVED copy survives") {
    // two docs sharing one long passage, delivered in reverse id
    // order across batches: the higher-id doc arrives first and must
    // be the survivor; the per-gram mark count is unchanged
    val passage = (1 to 12).map(i => s"tok$i").mkString(" ")
    val d9 = (9L, s"$passage unique nine tail")
    val d3 = (3L, s"head three unique2 $passage")
    val got = runStream(Seq(Seq(d9), Seq(d3)))
    // every shared-gram start of doc 3 is covered; none of doc 9's
    assert(got.nonEmpty)
    assert(got.forall(_._1 == 3L),
      s"arrival-order survivor violated: marks on ${got.map(_._1).toSet}")
    // same stream id-ordered: doc 3 (lower id, now first) survives
    val ordered = runStream(Seq(Seq(d3), Seq(d9)))
    assert(ordered.nonEmpty && ordered.forall(_._1 == 9L))
    // mark counts agree: all-but-one per gram either way
    assert(got.size == ordered.size)
  }

  test("prefix semantics: first copy survives, later copies are marked") {
    val d = docs
    val half = d.take(d.length / 2)
    val wantHalf = refCovered(half)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = StreamingSpanDedup
      .coveredStarts(spark, mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("span_cov_pfx")
      .outputMode("append").start()
    try {
      mem.addData(half: _*)
      q.processAllAvailable()
      val got = spark.table("span_cov_pfx").as[(Long, Int)].collect().toSet
      assert(got == wantHalf, "prefix covered set diverged")
      // feed the rest: previously-emitted marks never change, new
      // marks are exactly the reference delta
      mem.addData(d.drop(d.length / 2): _*)
      q.processAllAvailable()
      val all = spark.table("span_cov_pfx").as[(Long, Int)].collect().toSet
      assert(all == refCovered(d))
      assert(wantHalf.subsetOf(all))
    } finally q.stop()
  }

  test("batch finisher cleans marked spans like the sequential reference") {
    import spark.implicits._
    val d = docs
    val covered = refCovered(d)
    // independent sequential cleaner with the same run/cut semantics
    val want = d.map { case (id, text) =>
      val ws = text.toLowerCase.split(" ", -1)
      val pos = covered.collect { case (i, p) if i == id =>
        (p until p + StreamingSpanDedup.Gram) }.flatten.toSet
      val removed = pos.toSeq.sorted
        .foldLeft(List.empty[List[Int]]) {
          case (run :: rest, p) if run.head == p - 1 => (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }.filter(_.length >= SpanMin).flatten.toSet
      val clean = ws.zipWithIndex
        .collect { case (w, i) if !removed(i + 1) => w }.mkString(" ")
      id -> (ws.length.toLong, removed.size.toLong, clean)
    }.toMap
    val covDf = covered.toSeq.toDF("doc_id", "pos")
    val docsDf = d.toDF("doc_id", "text")
    val got = StreamingSpanDedup.clean(docsDf, covDf, SpanMin)
      .select("doc_id", "n_before", "n_removed", "n_after", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length == d.length)
    var touched = 0
    got.foreach { case (id, before, removed, after, clean) =>
      val (wb, wr, wc) = want(id)
      assert(before == wb, s"doc $id n_before")
      assert(removed == wr, s"doc $id n_removed")
      assert(before == removed + after, s"doc $id accounting")
      assert(clean == wc, s"doc $id cleaned text")
      if (removed > 0) touched += 1
    }
    // at-arrival semantics keep the FIRST copy: fewer docs touched
    // than the batch query's global view, but still some
    assert(touched > 0, "testdata should contain spans >= SpanMin")
  }
}
