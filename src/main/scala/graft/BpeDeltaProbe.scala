package graft

import graft.operators.Bpe

/** Measures the per-iteration cost of the incremental (pair-delta)
  * BPE merge loop vs the full-recount reference on the real word-
  * frequency shortlist — the number PLANS.md records for the round-10
  * trainer change. Both loops are driver-side over the same top-V
  * table, so the comparison isolates exactly the statistic-
  * maintenance strategy. */
object BpeDeltaProbe {

  /** Deterministic Zipf-ish synthetic shortlist (the testdata corpus
    * has a ~31-word vocabulary — far below the top-V scale the trainer
    * is built for): `n` distinct words of 6–14 lowercase letters from
    * a seeded multiplicative hash, frequency ∝ 1/rank. */
  private def synthShortlist(n: Int): Seq[(String, Long)] =
    (0 until n).map { r =>
      var h = r * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
      val len = 6 + (math.abs(h) % 9).toInt
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        sb += ('a' + math.floorMod(h >>> 33, 26)).toChar
      }
      (sb.result(), math.max(1L, 1000000L / (r + 1)))
    }.distinct

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val merges = if (args.length > 1) args(1).toInt else 500
    val vocabN = if (args.length > 2) args(2).toInt else 50000
    val spark = Sessions.local()
    val corpusWf = Bpe.wordFreq(Tables(spark, sfDir, "documents"), "text", 100000)
    spark.stop()
    val wf =
      if (corpusWf.size >= 1000) corpusWf
      else {
        println(s"corpus vocab ${corpusWf.size} too small; synthesizing $vocabN words")
        synthShortlist(vocabN)
      }
    println(s"shortlist: ${wf.size} words, ${wf.map(_._1.length).sum} chars")
    def time(label: String, f: => Seq[(String, String)]): Seq[(String, String)] = {
      val t0 = System.nanoTime() // warm
      val r = f
      val t1 = System.nanoTime()
      val r2 = f
      val t2 = System.nanoTime()
      require(r == r2, "nondeterministic trainer")
      val best = math.min(t1 - t0, t2 - t1) / 1e9
      println(f"$label: $best%.3f s total, ${best * 1000 / merges}%.3f ms/merge")
      r
    }
    val inc = time("incremental", Bpe.trainMerges(wf, merges))
    val rec = time("recount    ", Bpe.trainMergesRecount(wf, merges))
    require(inc == rec, "trainers diverge")
    println(s"identical merge lists: ${inc.length} merges")
  }
}
