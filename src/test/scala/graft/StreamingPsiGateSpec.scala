package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPsiGate

/** Streaming PSI gate ≡ the shared formula over every stream prefix,
  * and the shared formula's per-bin terms ≡ `q_quality_psi`'s emitted
  * rows on the real corpus split. */
class StreamingPsiGateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val Bin = 64L

  /** (bin, isPrior) rows of the real documents table — the same
    * split and binning as q_quality_psi. */
  private lazy val binned: Seq[(Long, Boolean)] =
    Tables(spark, TestSpark.Sf, "documents")
      .select((col("n_chars").cast("long") / Bin).cast("long"),
        col("source").rlike("^src[0-9]$"))
      .as[(Long, Boolean)].collect().toSeq

  private def histOf(rows: Seq[Long]): Map[Long, Long] =
    rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("per-bin terms of the shared formula equal q_quality_psi's rows, " +
      "and BOTH surfaces expose the identical alert scalar") {
    val ref = histOf(binned.filter(_._2).map(_._1))
    val cur = histOf(binned.filterNot(_._2).map(_._1))
    val (verdict, terms) = StreamingPsiGate.psi(ref, cur)
    val batch = SparkEntry.queries("q_quality_psi")(spark, TestSpark.Sf)
      .select($"bin", $"psi_term", $"psi_total")
      .as[(Long, Double, Double)].collect().toSeq
    assert(terms.sorted == batch.map(r => (r._1, r._2)).sorted)
    // r13 stretch: the batch psi_total column and the streaming
    // verdict are the SAME decimal fold of the same grid terms
    val totals = batch.map(_._3).distinct
    assert(totals == Seq(verdict.psi),
      s"batch psi_total $totals != gate verdict ${verdict.psi}")
  }

  test("gate re-issues the exact verdict over every stream prefix") {
    implicit val sqlCtx = spark.sqlContext
    val ref = histOf(binned.filter(_._2).map(_._1))
    val curRows = binned.filterNot(_._2).map(_._1)
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingPsiGate.gate(spark, ref, mem.toDS())
      .writeStream.format("memory").queryName("psigate")
      .outputMode("update").start()
    try {
      var fed = Seq.empty[Long]
      for (batch <- curRows.grouped(curRows.size / 4 + 1)) {
        // upstream partial counts, possibly split across rows for the
        // same bin — the gate must fold deltas, not overwrite
        val partials = batch.groupBy(identity).toSeq.flatMap { case (b, xs) =>
          if (xs.size > 1) Seq((b, 1L), (b, (xs.size - 1).toLong))
          else Seq((b, xs.size.toLong))
        }
        mem.addData(partials: _*)
        q.processAllAvailable()
        fed = fed ++ batch
        val got = spark.table("psigate")
          .select($"nRef", $"nCur", $"psi", $"worstBin")
          .as[(Long, Long, Double, Long)].collect().maxBy(_._2) // latest = largest nCur
        val (want, _) = StreamingPsiGate.psi(ref, histOf(fed))
        assert(got == ((want.nRef, want.nCur, want.psi, want.worstBin)),
          s"prefix of ${fed.size} rows: gate verdict != shared formula")
      }
      // drifted stream: feeding a mass spike into one bin must move
      // the verdict (guards against a vacuously constant gate)
      def latestPsi() = spark.table("psigate")
        .select($"nCur", $"psi").as[(Long, Double)].collect().maxBy(_._1)._2
      val before = latestPsi()
      mem.addData((99L, 500L))
      q.processAllAvailable()
      val after = latestPsi()
      assert(after > before + 0.1, s"mass spike moved PSI only $before -> $after")
    } finally q.stop()
  }
}
