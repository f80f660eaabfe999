package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al. ACL'16) with the
  * industry-standard distributed split (what HF `tokenizers` does
  * behind a corpus iterator): the CORPUS-scale work is exactly one
  * map-side-combined word-frequency collapse + a TakeOrdered top-V
  * shortlist ([[wordFreq]]); the merge-selection loop then runs over
  * that VOCABULARY-scale table (top-V rows, not trillions of tokens)
  * on the driver, the same place KMeans holds its k×d centroids. The
  * per-iteration pair-count statistic is the one `q_bpe_merge`
  * oracle-checks distributively — BpeSpec pins `fit`'s first merge to
  * that query's top row, and the whole merge list against an
  * independent sequential reference.
  *
  * Scale honesty: at 100 TB the distinct-word table can be huge
  * (noise tokens), which is why training CAPS it at top-V by
  * frequency — the real-world recipe (GPT-2 trained on a ~50k-word
  * shortlist per merge step is the same construction). V ~ 1M rows ×
  * avg word length is driver-safe by orders of magnitude.
  *
  * [[encode]] applies the learned ranks corpus-wide as a per-row
  * `mapPartitions` (model serialized once per task — the
  * decoder-per-partition pattern of the media pipeline): greedy
  * lowest-rank merging, the exact HF/GPT-2 apply rule.
  */
object Bpe {

  case class Model(merges: Seq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy BPE apply: repeatedly merge the present pair with the
      * LOWEST rank until none applies. */
    def encodeWord(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      var syms = w.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) done = true
        else {
          // merge ALL occurrences of the best pair, left to right
          val (a, b) = (syms(bestAt), syms(bestAt + 1))
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += a + b; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
  }

  /** The ONLY corpus-scale stage: word-frequency collapse (map-side
    * combined groupBy) + deterministic top-V TakeOrdered shortlist
    * (frequency desc, word asc — never a full-vocabulary sort). */
  def wordFreq(docs: DataFrame, textCol: String, topV: Int)
      : Seq[(String, Long)] =
    docs.select(explode(split(lower(col(textCol)), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc).limit(topV)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Merge every left-to-right occurrence of (a, b) in `syms` — the
    * one merge-application rule, shared by training (both trainer
    * variants) and [[Model.encodeWord]]'s greedy apply. */
  private def mergeOnce(syms: Vector[String], a: String, b: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Train `numMerges` merges over the top-V word shortlist. Pair
    * selection per iteration: max count, ties to the lexicographically
    * smallest (left, right) — the same (cnt DESC, pair ASC) rule
    * `q_bpe_merge` ranks by.
    *
    * The pair-count statistic is maintained INCREMENTALLY (the
    * Sennrich `learn_bpe` recipe): one full pass seeds the counts and
    * a pair → word-occurrence index, then each merge updates counts
    * only for the words that actually contain the selected pair —
    * per-iteration cost O(Σ|affected words|), not O(Σ|all words|).
    * [[fitRecount]] keeps the naive full-recount loop as the
    * measured/spec-pinned reference (BpeSpec asserts bit-identical
    * merge lists; PLANS.md records the measured per-iteration drop). */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      topV: Int = 100000): Model = {
    require(numMerges >= 1 && topV >= 1, s"numMerges=$numMerges topV=$topV")
    Model(trainMerges(wordFreq(docs, textCol, topV), numMerges))
  }

  /** The vocabulary-scale (driver-side, like KMeans' centroids)
    * incremental merge loop over a (word, freq) shortlist. */
  private[graft] def trainMerges(wf: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    val words = mutable.ArrayBuffer.from(
      wf.map { case (w, f) => (w.map(_.toString).toVector, f) })
    val counts = mutable.Map.empty[(String, String), Long]
    // pair → indices of words that contained it when last touched;
    // entries may go STALE after later merges rewrite a word — the
    // apply step re-checks adjacency in the current symbols, so stale
    // indices cost a scan, never correctness (counts stays exact).
    val where = mutable.Map.empty[(String, String), mutable.Set[Int]]
    def bump(k: (String, String), d: Long): Unit = {
      val c = counts.getOrElse(k, 0L) + d
      if (c == 0L) counts.remove(k) else counts(k) = c
    }
    def pairsOf(syms: Vector[String])(f: ((String, String)) => Unit): Unit = {
      var i = 0
      while (i < syms.length - 1) { f((syms(i), syms(i + 1))); i += 1 }
    }
    words.zipWithIndex.foreach { case ((syms, f), ix) =>
      pairsOf(syms) { k =>
        bump(k, f)
        where.getOrElseUpdate(k, mutable.Set.empty) += ix
      }
    }
    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }._1
        merges += best
        val (a, b) = best
        where.remove(best).getOrElse(mutable.Set.empty).toSeq.sorted
          .foreach { ix =>
            val (syms, f) = words(ix)
            var contains = false
            var i = 0
            while (!contains && i < syms.length - 1) {
              contains = syms(i) == a && syms(i + 1) == b; i += 1
            }
            if (contains) { // stale index entries re-checked, skipped
              val next = mergeOnce(syms, a, b)
              pairsOf(syms)(bump(_, -f))
              pairsOf(next) { k =>
                bump(k, f)
                where.getOrElseUpdate(k, mutable.Set.empty) += ix
              }
              words(ix) = (next, f)
            }
          }
        made += 1
      }
    }
    merges.result()
  }

  /** The round-6..9 full-recount loop, kept as the reference the
    * incremental trainer is pinned against (BpeSpec) and measured
    * against (PLANS.md). Semantics identical by construction: a full
    * recount equals the seeded counts plus the exact per-word deltas
    * the incremental loop applies. */
  private[graft] def trainMergesRecount(wf: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      wf.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }._1
        merges += best
        val (a, b) = best
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f) else (mergeOnce(syms, a, b), f)
        }
        made += 1
      }
    }
    merges.result()
  }

  /** Corpus-wide apply: (doc_id, tokens array<string>, n_tokens) —
    * embarrassingly parallel, zero shuffle; the model rides to each
    * partition once via task-closure serialization. */
  def encode(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(' ').toSeq.flatMap(model.encodeWord)
          (id, toks, toks.length)
        }
      }
      .toDF("doc_id", "tokens", "n_tokens")
  }
}
