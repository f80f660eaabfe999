package graft

import org.apache.spark.sql.functions.{col, lower}
import org.scalatest.funsuite.AnyFunSuite

/** q_dedup_span vs an independent in-memory implementation of the
  * same semantics (gram≥2 coverage → maximal runs → cut ≥ SpanMin →
  * reassemble) — the union-find-style twin discipline of the dedup
  * family. */
class DedupSpanSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}

  private val SpanMin = 8

  /** Sequential reference: (n_before, removed position set) per doc. */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Int, Set[Int])] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }.toMap
    val gramCount = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ws) <- toks; i <- 0 to ws.length - 5)
      gramCount.updateWith(ws.slice(i, i + 5).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    docs.map { case (id, _) =>
      val ws = toks(id)
      val covered = (for {
        i <- 0 to ws.length - 5
        if gramCount(ws.slice(i, i + 5).mkString(" ")) >= 2
        j <- i to i + 4
      } yield j + 1).toSet // 1-based, as the query
      // maximal runs of covered positions; cut those >= SpanMin
      val removed = covered.toSeq.sorted
        .foldLeft(List.empty[List[Int]]) {
          case (run :: rest, p) if run.head == p - 1 => (p :: run) :: rest
          case (acc, p) => List(p) :: acc
        }
        .filter(_.length >= SpanMin).flatten.toSet
      id -> (ws.length, removed)
    }.toMap
  }

  test("distributed span removal equals the sequential reference") {
    import spark.implicits._
    val docs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val want = reference(docs)
    val got = SparkEntry.queries("q_dedup_span")(spark, Sf)
      .select("doc_id", "n_before", "n_removed", "n_after", "clean_md5")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.length == docs.length, "every document must appear")
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split(" ", -1).toSeq }.toMap
    var touched = 0
    got.foreach { case (id, before, removed, after, cleanMd5) =>
      val (refBefore, refRemoved) = want(id)
      assert(before == refBefore, s"doc $id n_before")
      assert(removed == refRemoved.size, s"doc $id n_removed")
      assert(before == removed + after, s"doc $id accounting")
      if (removed > 0) touched += 1
      // cleaned text digest: surviving tokens in order
      val clean = toks(id).zipWithIndex
        .collect { case (w, p) if !refRemoved(p + 1) => w }
        .mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(clean.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(cleanMd5 == md, s"doc $id cleaned digest")
    }
    // the corpus genuinely contains long duplicated spans
    assert(touched > 0, "testdata should contain spans >= SpanMin")
  }
}
