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

  /** BYTE-LEVEL alphabet (round 19 — the GPT-2/Llama-lineage remap,
    * Radford et al. 2019 `bytes_to_unicode`): every possible byte maps
    * to one printable BMP codepoint — the 188 "nice" printable bytes
    * (0x21–0x7E, 0xA1–0xAC, 0xAE–0xFF) to themselves, the remaining
    * 68 (controls, space, 0x7F, 0xAD) to 0x100+n in scan order. The
    * map is a BIJECTION byte↔char, so BPE over remapped symbols is
    * BPE over raw bytes: no OOV exists by construction (every input
    * decomposes to single-byte symbols), and equality in remapped
    * space IS byte equality — the property that makes losslessness
    * provable for ARBITRARY input, mojibake included. */
  private[graft] val ByteToChar: Array[Char] = {
    val nice = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++
      (0xAE to 0xFF)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (nice(b)) arr(b) = b.toChar
      else { arr(b) = (0x100 + n).toChar; n += 1 }
    }
    arr
  }

  /** Inverse of [[ByteToChar]] (total on its range — remap output
    * only ever contains mapped chars). */
  private[graft] lazy val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** UTF-8 bytes of `s`, remapped char-per-byte. */
  private[graft] def remapBytes(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(ByteToChar(b & 0xFF)))
    sb.toString
  }

  /** Inverse of [[remapBytes]]: symbols back to raw bytes. */
  private[graft] def unmapBytes(s: String): Array[Byte] =
    s.toCharArray.map(c => CharToByte(c).toByte)

  /** The byte-level corpus collapse: word frequency over RAW
    * (case-preserving — losslessness over arbitrary input forbids
    * the char-family's lowercasing) space-split words, each remapped
    * to its byte symbols BEFORE the group-by, so the deterministic
    * top-V cut (f DESC, w ASC) orders on the symbol strings the
    * trainer actually consumes. Same scale shape as [[wordFreq]]:
    * one map-side-combined collapse + a TakeOrdered shortlist. */
  def wordFreqBytes(docs: DataFrame, textCol: String, topV: Int)
      : Seq[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol)).as[String]
      .flatMap(t => t.split(' ').iterator.filter(_.nonEmpty).map(remapBytes))
      .toDF("w")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc).limit(topV)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Byte-level BPE training: [[wordFreqBytes]] collapse, then the
    * IDENTICAL vocabulary-scale incremental merge loop — merges are
    * pairs of byte-symbol strings. */
  def fitBytes(docs: DataFrame, textCol: String, numMerges: Int,
      topV: Int = 100000): Model = {
    require(numMerges >= 1 && topV >= 1, s"numMerges=$numMerges topV=$topV")
    Model(trainMerges(wordFreqBytes(docs, textCol, topV), numMerges))
  }

  /** Byte-level corpus apply: (doc_id, tokens, n_tokens, flat) —
    * tokens are remapped byte-symbol strings (greedy lowest-rank
    * merging, the same apply rule), `flat` is the remap of the
    * space-stripped raw text so the caller can assert losslessness
    * with a plain column equality (concat(tokens) === flat ⇔ the
    * token stream carries exactly the input's non-space bytes —
    * bijection, so remapped equality is byte equality). Zero-shuffle
    * per-row pass, the [[encode]] shape. */
  def encodeBytes(docs: DataFrame, textCol: String, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = text.split(' ').toSeq.filter(_.nonEmpty)
            .flatMap(w => model.encodeWord(remapBytes(w)))
          (id, toks, toks.length, remapBytes(text.replace(" ", "")))
        }
      }
      .toDF("doc_id", "tokens", "n_tokens", "flat")
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
