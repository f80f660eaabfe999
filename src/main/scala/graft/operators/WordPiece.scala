package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WORDPIECE tokenizer training (Schuster & Nakajima, ICASSP 2012 —
  * the BERT tokenizer; the HF `WordPieceTrainer` recipe) — the third
  * production tokenizer family beside [[Bpe]] (count-greedy merges)
  * and [[UnigramLm]] (EM): BPE-style greedy merges, but the merge
  * choice maximizes the LIKELIHOOD ratio
  *
  *   score(a, b) = count(ab) / (count(a) · count(b))
  *
  * — merge the pair whose joint occurrence is most surprising under
  * symbol independence, not the most frequent pair. Symbols carry
  * BERT's continuation marking from the start: word "abc" splits to
  * ["a", "##b", "##c"], merging `a + ##b → "ab"`, `##b + ##c →
  * "##bc"`, so a trained piece knows whether it may start a word.
  *
  * Distribution split — [[Bpe]]'s exactly: the corpus-scale work is
  * ONE map-side-combined word-frequency collapse + top-V TakeOrdered
  * shortlist (reused verbatim: [[Bpe.wordFreq]]) plus one
  * char-cardinality alphabet aggregation; the merge loop runs over
  * the V-bounded shortlist on the driver (the KMeans-centroid
  * pattern). The per-iteration pair-score statistic is what
  * `q_wordpiece_merge` oracle-checks distributively; WordPieceSpec
  * pins `fit`'s first merge to that query's top row and the whole
  * merge list against an independent sequential reference.
  *
  * Determinism: scores are IEEE doubles built from EXACT integer
  * counts through one fixed expression — `cnt / (cl · cr)` — so both
  * engines and every partitioning produce bit-identical values (no
  * accumulation-order freedom exists); ties break by the
  * lexicographically smallest "left right" pair string, a total
  * order. The driver trainer uses the IDENTICAL double compare as
  * the ranking query, so the spec pin can never flake on a
  * double-rounding near-tie between exact-fraction and double
  * orderings.
  *
  * [[Model.encodeWord]] is BERT's own runtime algorithm — greedy
  * longest-match-first (MaxMatch) against the closed vocabulary,
  * whole-word `[UNK]` when no prefix matches. [[fit]] seeds the
  * vocabulary with BOTH forms (initial and `##`) of every character
  * in the FULL corpus (not just the top-V shortlist), so encoding
  * the training corpus can never hit `[UNK]` — the closure property
  * the oracle's lossless verdict rides on. */
object WordPiece {

  /** BERT's unknown-word token. */
  val Unk = "[UNK]"

  /** Trained model: the closed piece vocabulary (`##`-prefixed for
    * continuation pieces). */
  case class Model(vocab: Set[String]) {
    @transient lazy val maxLen: Int =
      if (vocab.isEmpty) 1
      else vocab.iterator.map(_.stripPrefix("##").length).max

    /** Greedy longest-match-first (BERT's WordpieceTokenizer): take
      * the longest vocabulary piece matching the remainder's prefix
      * (`##` form past position 0); a position with NO match makes
      * the WHOLE word `[UNK]` — the BERT rule, not a partial emit. */
    def encodeWord(w: String): Seq[String] = {
      if (w.isEmpty) return Seq.empty
      val out = Seq.newBuilder[String]
      var start = 0
      val n = w.length
      while (start < n) {
        var end = math.min(n, start + maxLen)
        var found: String = null
        while (found == null && end > start) {
          val cand = (if (start > 0) "##" else "") + w.substring(start, end)
          if (vocab.contains(cand)) found = cand else end -= 1
        }
        if (found == null) return Seq(Unk)
        out += found
        start = end
      }
      out.result()
    }
  }

  /** BERT symbol split: first char bare, continuations `##`-marked. */
  private def symbolsOf(w: String): Vector[String] =
    w.substring(0, 1) +: (1 until w.length).map(i => "##" + w.charAt(i)).toVector

  /** Merge product: the right side sheds its continuation mark. */
  private[graft] def product(a: String, b: String): String =
    a + b.stripPrefix("##")

  /** Full-corpus character inventory (ONE tiny aggregation,
    * char-cardinality result) — the vocabulary floor that makes
    * training-corpus encoding `[UNK]`-free regardless of how hard
    * the top-V word shortlist truncates. */
  def alphabet(docs: DataFrame, textCol: String): Seq[String] =
    docs.select(explode(split(lower(col(textCol)), "")).as("c"))
      .where(col("c") =!= " " && length(col("c")) === 1)
      .distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** Train `numMerges` merges over the top-V word shortlist
    * ([[Bpe.wordFreq]] — shared with the BPE trainer so the two
    * families cannot diverge on the corpus statistic), then close
    * the vocabulary over the full-corpus [[alphabet]] in both
    * symbol forms plus every merge product. */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
      topV: Int = 100000): Model = {
    require(numMerges >= 1 && topV >= 1, s"numMerges=$numMerges topV=$topV")
    fitWf(Bpe.wordFreq(docs, textCol, topV), alphabet(docs, textCol),
      numMerges)
  }

  /** [[fit]] body over a pre-collected word-frequency shortlist and
    * character inventory — identical semantics; lets a caller that
    * trains BPE and WordPiece at the SAME (textCol, topV) operating
    * point (q_tokenizer_compare) run the corpus collapse once (r19
    * optimization round). */
  private[graft] def fitWf(wf: Seq[(String, Long)], chars: Seq[String],
      numMerges: Int): Model = {
    val merges = trainMerges(wf, numMerges)
    Model(chars.toSet ++ chars.map("##" + _) ++
      merges.map { case (a, b) => product(a, b) })
  }

  /** The vocabulary-scale (driver-side) merge loop: full pair/symbol
    * recount per iteration (numMerges × V × avg-len — driver-trivial
    * at any real operating point; the corpus never re-enters), best
    * pair by (score DESC, "left right" ASC). */
  private[graft] def trainMerges(wf: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] =
      wf.filter(_._1.nonEmpty).map { case (w, f) => (symbolsOf(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val pair = mutable.Map.empty[(String, String), Long]
      val sym = mutable.Map.empty[String, Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length) {
          sym(syms(i)) = sym.getOrElse(syms(i), 0L) + f
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pair(k) = pair.getOrElse(k, 0L) + f
          }
          i += 1
        }
      }
      if (pair.isEmpty) exhausted = true
      else {
        // the EXACT ranking expression of q_wordpiece_merge: integer
        // counts through one double divide — bit-identical everywhere
        val best = pair.toSeq.minBy { case ((a, b), c) =>
          (-(c.toDouble / (sym(a).toDouble * sym(b).toDouble)), a + " " + b)
        }._1
        merges += best
        val (a, b) = best
        val merged = product(a, b)
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += merged; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), f)
          }
        }
        made += 1
      }
    }
    merges.result()
  }

  /** Corpus-wide apply: (doc_id, pieces array<string>, n_pieces) —
    * embarrassingly parallel, zero shuffle; model once per task via
    * closure (the [[Bpe.encode]] / [[UnigramLm.encode]] shape), with
    * the same per-partition word memo as the unigram apply (Zipf
    * makes the hit rate enormous). */
  def encode(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Seq[String]]()
        it.map { case (id, text) =>
          val ps = text.split(' ').toSeq.filter(_.nonEmpty).flatMap { w =>
            var r = memo.get(w)
            if (r == null) {
              r = model.encodeWord(w)
              if (memo.size < (1 << 16)) memo.put(w, r)
            }
            r
          }
          (id, ps, ps.length)
        }
      }
      .toDF("doc_id", "pieces", "n_pieces")
  }
}
