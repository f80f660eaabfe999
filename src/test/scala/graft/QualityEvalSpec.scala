package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The classifier-evaluation family's math, pinned against first
  * principles: the rank-based Mann-Whitney AUC the query computes
  * (mid-rank tie handling, all-integer until the final division)
  * must equal the DEFINITIONAL pairwise AUC — over every
  * (positive, negative) pair, full credit when the positive scores
  * higher, half credit on a tie. The DuckDB oracle cannot prove this
  * (both engines run the same rank formula); only the O(n²)
  * reference can. */
class QualityEvalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("rank-based AUC equals the definitional pairwise AUC, ties at " +
      "half credit, for every language") {
    // per-doc (lang, margin, label) — the same signals the query scans
    val margins = SparkEntry.queries("q_quality_logreg")(spark, TestSpark.Sf)
      .select(col("doc_id"), col("lang"), col("margin_num"))
    val labels = SparkEntry.queries("q_text_quality")(spark, TestSpark.Sf)
      .select(col("doc_id"), (col("quality") === "good").as("pos"))
    val docs = margins.join(labels, "doc_id")
      .select(col("lang"), col("margin_num"), col("pos"))
      .as[(String, Long, Boolean)].collect().toSeq
    val want = docs.groupBy(_._1).flatMap { case (lang, ds) =>
      val posS = ds.filter(_._3).map(_._2)
      val negS = ds.filterNot(_._3).map(_._2)
      if (posS.isEmpty || negS.isEmpty) None
      else {
        val credit = (for (p <- posS; n <- negS) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        Some(lang -> BigDecimal(credit / (posS.size.toLong * negS.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = SparkEntry.queries("q_quality_auc")(spark, TestSpark.Sf)
      .select(col("lang"), col("auc"))
      .as[(String, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    for ((lang, w) <- want)
      assert(math.abs(got(lang) - w) < 2e-6,
        s"$lang: rank AUC ${got(lang)} != pairwise AUC $w")
  }

  test("mid-rank tie handling: a synthetic frame with cross-class score " +
      "ties scores exactly the half-credit pairwise AUC") {
    import graft.queries.TextQueries
    // xx: pos {10, 20, 20, 30}, neg {20, 20, 5} — 12 pairs:
    //   10 vs (20,20,5):          0 + 0 + 1        = 1
    //   20 vs (20,20,5)  (twice): (.5+.5+1)*2      = 4
    //   30 vs (20,20,5):          1 + 1 + 1        = 3
    // AUC = 8/12 = 0.666667 — impossible without the 0.5 tie credit
    // (all-or-nothing would give 6/12 or 10/12)
    // yy: every score tied across classes → AUC exactly 0.5
    val rows = Seq(
      ("xx", 10L, 1L), ("xx", 20L, 1L), ("xx", 20L, 1L), ("xx", 30L, 1L),
      ("xx", 20L, 0L), ("xx", 20L, 0L), ("xx", 5L, 0L),
      ("yy", 7L, 1L), ("yy", 7L, 0L), ("yy", 7L, 1L), ("yy", 7L, 0L))
    val got = TextQueries.aucByLang(spark,
        rows.toDF("lang", "margin_num", "p"))
      .select(col("lang"), col("n_pos"), col("n_neg"), col("auc"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (l, a, b, c) => l -> ((a, b, c)) }.toMap
    assert(got("xx") == ((4L, 3L, 0.666667)), s"xx: ${got("xx")}")
    assert(got("yy") == ((2L, 2L, 0.5)), s"yy: ${got("yy")}")
  }

  test("evaluation over STREAMED marks: sweeping the streamed logreg " +
      "scores against the rule labels equals batch q_quality_auc — the " +
      "mark-then-sweep shape extends to classifier evaluation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.queries.TextQueries
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String, String)]
    // the MARK stage is the existing streamed scoring path (the
    // q_quality_logreg projection under readStream — the
    // StreamingLogregSpec contract); evaluation adds NO new stream op
    val q = TextQueries.logregScore(mem.toDF.toDF("doc_id", "lang", "text"))
      .select(col("doc_id"), col("lang"), col("margin_num"))
      .writeStream.format("memory").queryName("sauc_marks")
      .outputMode("append").start()
    try {
      docs.grouped(docs.length / 3 + 1).foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      val labels = SparkEntry.queries("q_text_quality")(spark, TestSpark.Sf)
        .select(col("doc_id"), (col("quality") === "good").cast("long").as("p"))
      val swept = TextQueries.aucByLang(spark,
          spark.table("sauc_marks").join(labels, "doc_id")
            .select(col("lang"), col("margin_num"), col("p")))
        .as[(String, Long, Long, Double)].collect().toSeq
      val batch = SparkEntry.queries("q_quality_auc")(spark, TestSpark.Sf)
        .as[(String, Long, Long, Double)].collect().toSeq
      assert(batch.nonEmpty)
      assert(swept == batch)
    } finally q.stop()
  }

  test("calibration deciles: equal-count bins covering the corpus, " +
      "rates consistent with their counts") {
    val rows = SparkEntry.queries("q_quality_calibration")(spark, TestSpark.Sf)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) == (0 until 10), s"decile ids: ${rows.map(_._1)}")
    val n = rows.map(_._2).sum
    val docs = SparkEntry.queries("q_quality_logreg")(spark, TestSpark.Sf).count()
    assert(n == docs, s"bins cover $n of $docs docs")
    // equal-count terciles: sizes differ by at most 1 (integer split)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    for ((_, nd, np, rate) <- rows)
      assert(math.abs(rate - np.toDouble / nd) < 1e-6)
  }
}
