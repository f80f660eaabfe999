package graft.operators

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Fence.FenceOps

/** UNIGRAM-LM tokenizer training (the SentencePiece unigram model,
  * Kudo ACL'18, hard-EM variant) as a distributed operator — the
  * second tokenizer family beside [[Bpe]], trained by EM instead of
  * greedy merges: a vocabulary of candidate pieces carries a unigram
  * log-probability table; the E-step segments every word by Viterbi
  * under the current table; the M-step re-estimates piece
  * probabilities from the segmentation counts; pruning decays the
  * candidate set toward the target vocabulary by LIKELIHOOD LOSS
  * (Kudo §3.2's exact rule, [[pruneByLoss]] — round 17, replacing
  * the count-based proxy; 3/4 per round with the target as floor;
  * single characters never prune, so every word stays encodable —
  * the closure property).
  *
  * Distribution split — STRONGER than [[Bpe]]'s: BPE collapses the
  * corpus to a TOP-V driver shortlist and loops there (the HF
  * recipe), so its training statistic is truncated at V words. Here
  * the distinct-word table NEVER leaves the cluster:
  *
  *  - the corpus-scale work per E-step is one `mapPartitions` Viterbi
  *    pass over the distributed (word, freq) table (model broadcast
  *    to tasks through a re-pointed [[graft.BcSlot]], so ONE planned
  *    RDD serves every round) folding per-partition piece counts —
  *    the map-side combine — merged exactly on the driver;
  *  - the driver holds ONLY the piece table (seed-size-bounded, the
  *    KMeans-centroid / Sgns-vocab pattern, loud [[MaxPieces]] guard);
  *  - seeding is one substring-explode aggregation over the word
  *    table with a deterministic TakeOrdered shortlist (count desc,
  *    piece asc) — never a full-vocabulary sort.
  *
  * Determinism is the exact-grid discipline ([[Sgns]]): piece
  * log-probs live on the 6-decimal grid and ride into Viterbi as
  * LONG MICROS, so the DP compares exact integers — bit-identical on
  * any partitioning, any engine, any platform. Ties break by a total
  * rule: higher score, then FEWER pieces, then the LONGER last piece
  * (two candidates at one DP state never share start AND length, so
  * the third key is total). UnigramLmSpec pins `fit` EXACTLY against
  * a sequential in-memory reference and the closure/lossless
  * properties; `q_unigram_seed` oracle-checks the distributed seed
  * statistic, `q_unigram_encode` the corpus-wide apply (the
  * q_bpe_merge / q_bpe_encode pairing).
  */
object UnigramLm {

  /** Hard piece-table ceiling (the [[Sgns.MaxVocab]] stance): the
    * driver holds one (piece, count, logp) row per candidate and
    * every E-step broadcasts the table; a pathological seed fails
    * LOUDLY with sizing arithmetic instead of an executor OOM. */
  val MaxPieces: Int = 1 << 20

  /** Trained model: pieces sorted ascending, log-probs on the
    * 6-decimal grid (carried as micros for the exact DP). */
  case class Model(pieces: Array[String], logp: Array[Double]) {
    @transient lazy val micros: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
      var i = 0
      while (i < pieces.length) {
        m.put(pieces(i), math.round(logp(i) * 1e6)); i += 1
      }
      m
    }
    @transient lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
    /** UNK-as-char fallback cost: strictly worse than every real
      * piece, so real pieces always win; only reachable for
      * characters the training corpus never saw. */
    @transient lazy val unkMicros: Long =
      (if (logp.isEmpty) 0L else math.round(logp.min * 1e6)) - 1000000L
  }

  /** Driver/executor twin of the grid round (6 dp, HALF_UP over the
    * shortest-decimal double representation — Spark's `round`). */
  def round6(x: Double): Double =
    new JBig(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  /** Viterbi segmentation of one word: maximize Σ logp (exact
    * micros); ties → fewer pieces, then the longer last piece.
    * Pure function of (word, model): the E-step, the apply pass, and
    * the spec's sequential reference all call THIS. */
  def viterbi(w: String, model: Model): Seq[String] =
    viterbiImpl(w, model, excludeFullSpan = false)

  /** The best segmentation of a PIECE's own surface string into
    * OTHER pieces — the full-span edge (the piece segmenting as
    * itself) excluded; always exists under the single-char closure.
    * The alternative decomposition [[pruneByLoss]]'s likelihood
    * delta is measured against (Kudo §3.2 / SentencePiece's
    * `PruneSentencePieces` alternatives). */
  private[graft] def altSegmentation(w: String, model: Model): Seq[String] = {
    require(w.length >= 2,
      s"altSegmentation('$w'): single characters have no alternative " +
        "decomposition (and never prune — the closure floor)")
    viterbiImpl(w, model, excludeFullSpan = true)
  }

  private def viterbiImpl(w: String, model: Model,
      excludeFullSpan: Boolean): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val micros = model.micros
    val maxLen = model.maxPieceLen
    val score = new Array[Long](n + 1)
    val count = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Long.MinValue)
    score(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (score(j) != Long.MinValue &&
            !(excludeFullSpan && j == 0 && i == n)) {
          val piece = w.substring(j, i)
          val boxed = micros.get(piece)
          val lp: Long =
            if (boxed != null) boxed.longValue
            else if (i - j == 1) model.unkMicros
            else Long.MinValue
          if (lp != Long.MinValue) {
            val s = score(j) + lp
            val c = count(j) + 1
            // j ASCENDS, so piece length DESCENDS: an equal (s, c)
            // never replaces the earlier longer-last-piece choice
            if (s > score(i) || (s == score(i) && c < count(i))) {
              score(i) = s; count(i) = c; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val cuts = new Array[Int](count(n) + 1)
    var at = n
    var k = count(n)
    while (at > 0) { cuts(k) = at; at = back(at); k -= 1 }
    val out = Seq.newBuilder[String]
    var p = 0
    while (p < count(n)) { out += w.substring(cuts(p), cuts(p + 1)); p += 1 }
    out.result()
  }

  /** Seed candidates: every substring of length 1..maxLen of the
    * distributed (w, f) word table, counted with occurrence
    * multiplicity × word frequency; shortlist = deterministic top
    * `seedSize` by (count desc, piece asc) UNION all single
    * characters (the closure floor — every word stays encodable no
    * matter how hard the shortlist truncates). One aggregation + one
    * TakeOrdered; the word table never collects. */
  def seedCounts(words: DataFrame, maxLen: Int, seedSize: Int): DataFrame = {
    val subs = substringCounts(words, maxLen)
      .fenced() // top-K shortlist + single-char floor both read it
    val top = subs.orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
    val chars = subs.where(length(col("piece")) === 1)
    top.union(chars).groupBy(col("piece")).agg(max(col("cnt")).as("cnt"))
  }

  /** The raw substring-count statistic the seed shortlists — one
    * double explode + a map-side-combined aggregation over the (w, f)
    * table; `q_unigram_seed` oracle-checks THIS distributively (the
    * q_bpe_merge pairing). */
  def substringCounts(words: DataFrame, maxLen: Int): DataFrame =
    words
      .select(col("w"), col("f"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("f"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxLen), length(col("w")) - col("i") + 1))).as("l"))
      .select(col("w").substr(col("i"), col("l")).as("piece"), col("f"))
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))

  /** Candidate table → normalized model: logp = round6(log(c/Σc)).
    * StrictMath.log (fdlibm — bit-identical on every platform, where
    * Math.log may use a platform intrinsic); counts are exact
    * integers, the double division + log is one deterministic
    * operation chain. Shared by [[fit]], [[softFit]], and the spec's
    * sequential references, so the normalization cannot fork. */
  private[graft] def toModel(t: Seq[(String, Long)]): Model = {
    val total = t.iterator.map(_._2).sum.toDouble
    val sorted = t.sortBy(_._1)
    Model(sorted.map(_._1).toArray,
      sorted.map { case (_, c) =>
        round6(StrictMath.log(c / total)) }.toArray)
  }

  /** The count-based shrink step (the pre-r17 rule, kept as the
    * seed-stage shortlist discipline and the spec's disagreement
    * contrast): keep the top `v` multi-char candidates by
    * (count desc, piece asc); single characters never prune
    * (closure). */
  private[graft] def pruneTo(t: Seq[(String, Long)], v: Int)
      : Seq[(String, Long)] = {
    val (chars, multi) = t.partition(_._1.length == 1)
    chars ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, v - chars.length))
  }

  /** The EXACT shrink rule (Kudo §3.2, round 17 — replaces the
    * count-based proxy in BOTH EM variants): prune the pieces whose
    * removal costs the corpus likelihood LEAST. For piece p with
    * post-M-step count c(p), the likelihood delta of removing p is
    * its occurrences re-segmenting as their best ALTERNATIVE
    * decomposition ([[altSegmentation]] — the piece's own surface
    * under the current model with the full-span edge excluded,
    * SentencePiece's `PruneSentencePieces` alternatives):
    *
    *   loss(p) = c(p) × (logp(p) − Σ_{q ∈ alt(p)} logp(q))
    *
    * computed entirely on the integer-micros grid (log-probs are
    * grid micros, counts are exact integers — hard-EM frequencies or
    * soft-EM expected micros; the product goes through BigInt so no
    * corpus scale can wrap the RANKING). Keep the top `v − |chars|`
    * multi-char pieces by (loss desc, piece asc) — a total
    * deterministic order; single characters never prune (closure).
    * Like SentencePiece, the round prunes as a BATCH: alternatives
    * are valued under the pre-prune model, so two pieces may each
    * assume the other survives — the standard approximation, healed
    * by the next E-step re-count.
    *
    * Driver-side cost: |table| ≤ [[MaxPieces]] tiny DPs over strings
    * of ≤ maxLen chars — microseconds against the corpus-scale
    * E-step. */
  private[graft] def pruneByLoss(t: Seq[(String, Long)], v: Int)
      : Seq[(String, Long)] = {
    val (chars, multi) = t.partition(_._1.length == 1)
    val keep = math.max(0, v - chars.length)
    if (multi.length <= keep) return chars ++ multi
    val m = toModel(t)
    val micros = m.micros
    def microsOf(q: String): Long = {
      val b = micros.get(q)
      if (b != null) b.longValue else m.unkMicros
    }
    val loss: Map[String, BigInt] = multi.map { case (p, c) =>
      val altCost = altSegmentation(p, m).iterator.map(microsOf).sum
      p -> (BigInt(c) * BigInt(microsOf(p) - altCost))
    }.toMap
    chars ++ multi.sortBy { case (p, _) => (-loss(p), p) }.take(keep)
  }

  /** Pre-computed shared trainer inputs: the fenced (w, f) table and
    * the collected seed candidate table. [[fit]]/[[softFit]] build
    * this internally; a caller training BOTH variants at one
    * operating point (q_tokenizer_compare) calls [[prepare]] once and
    * passes it to [[fitPrepared]]/[[softFitPrepared]] — the wf
    * projection+fence, the substring-explode seed aggregation, and
    * the TakeOrdered seed collect are IDENTICAL in both trainers by
    * construction (the seed cut is a total deterministic order:
    * cnt DESC, piece ASC over a grouped table), so sharing is
    * result-invisible and saves one corpus-scale fence plus one
    * corpus-scale seed aggregation per extra variant (r19
    * optimization round, guide §1.2: don't compute things twice). */
  case class Prepared(wf: DataFrame, seed: Seq[(String, Long)])

  /** Build [[Prepared]]: project+fence the word table, seed once. */
  def prepare(words: DataFrame, maxLen: Int, seedSize: Int): Prepared = {
    require(maxLen >= 1 && seedSize >= 1,
      s"maxLen=$maxLen seedSize=$seedSize")
    require(seedSize <= MaxPieces,
      s"seed $seedSize exceeds MaxPieces=$MaxPieces: the driver holds one " +
        "(piece, count, logp) row per candidate and every E-step " +
        "broadcasts the table — shortlist harder upstream")
    val spark = words.sparkSession
    import spark.implicits._
    val wf = words.select(col("w").cast("string").as("w"),
      col("f").cast("long").as("f"))
      .where(length(col("w")) >= 1)
      .fenced() // scanned every E-step
    val table: Seq[(String, Long)] =
      seedCounts(wf, maxLen, seedSize).as[(String, Long)].collect()
        .toSeq.sortBy(_._1)
    require(table.nonEmpty, "empty corpus: no seed pieces")
    Prepared(wf, table)
  }

  /** Train over the DISTRIBUTED aggregated (w, f) distinct-word
    * table: seed → `iters` hard-EM rounds (E: cluster-side Viterbi;
    * M: re-count, floor single chars at 1, 3/4-shrink toward
    * `targetV`) → final prune to `targetV` → normalize. */
  def fit(words: DataFrame, targetV: Int, iters: Int = 3, maxLen: Int = 6,
      seedSize: Int = 4096): Model = {
    require(targetV >= 1 && iters >= 1,
      s"targetV=$targetV iters=$iters")
    fitPrepared(prepare(words, maxLen, seedSize), targetV, iters)
  }

  /** [[fit]] body over a [[Prepared]] input — identical semantics. */
  private[graft] def fitPrepared(prep: Prepared, targetV: Int,
      iters: Int): Model = {
    require(targetV >= 1 && iters >= 1, s"targetV=$targetV iters=$iters")
    val wf = prep.wf
    val spark = wf.sparkSession
    import spark.implicits._
    var table: Seq[(String, Long)] = prep.seed
    // ONE planned plan + ONE closure for ALL E-steps (r19, the
    // Sgns/KMeans one-plan precedent): the model reaches the fixed
    // mapPartitions closure through a mutable [[graft.BcSlot]] — the
    // scheduler re-serializes the task binary per job submission, so
    // re-executing the SAME RDD each round reads the handle the
    // driver just swapped in, with no per-round Catalyst pass. The
    // (piece, count) aggregation is a narrow per-partition fold
    // merged on the driver — exact long adds, order-free, so counts
    // are bit-identical to the old grouped sum (and the re-executed
    // plan must stay narrow anyway: an in-plan shuffle would reuse
    // the first round's map outputs). What crosses the wire is the
    // same ≤ seed-size map-side-combined partials the old exchange
    // moved. The old AQE-off/static-partition session toggle is
    // obsolete with the exchange gone.
    val slot = new graft.BcSlot[Model]
    val wfRdd = wf.as[(String, Long)].rdd // planned once
    val countPartials = wfRdd.mapPartitions { it =>
      val model = slot.bc.value
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { case (w, f) =>
        viterbi(w, model).foreach(p => m.update(p, m.getOrElse(p, 0L) + f))
      }
      Iterator.single(m)
    }
    def estep(m: Model): Map[String, Long] = {
      slot.bc = spark.sparkContext.broadcast(m)
      val merged = countPartials.reduce { (a, b) =>
        b.foreach { case (p, c) => a.update(p, a.getOrElse(p, 0L) + c) }
        a
      }
      slot.bc.destroy()
      merged.toMap
    }
    def mstep(t: Seq[(String, Long)], counts: Map[String, Long])
        : Seq[(String, Long)] =
      t.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0L) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L) // closure floor
        else None
      }
    for (_ <- 1 to iters) {
      table = mstep(table, estep(toModel(table)))
      // Kudo's shrink schedule: 3/4 per round, floored at the target
      table = pruneByLoss(table, math.max(targetV, table.length * 3 / 4))
    }
    // final vocabulary + one re-count so the shipped probabilities
    // reflect the shipped vocabulary exactly
    table = pruneByLoss(table, targetV)
    toModel(mstep(table, estep(toModel(table))))
  }

  /** log-sum-exp of two log-domain values — the fixed two-operand
    * form every lattice accumulation below uses, StrictMath
    * transcendentals only (fdlibm is specified bit-for-bit, so the
    * whole forward-backward pass is bit-portable across platforms
    * and JVMs — the determinism story the r15 verdict asked for). */
  private def lse(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else {
      val (hi, lo) = if (a >= b) (a, b) else (b, a)
      hi + StrictMath.log1p(StrictMath.exp(lo - hi))
    }

  /** SOFT E-step for one word (Kudo ACL'18 §3.1's expected counts):
    * forward-backward over the segmentation lattice, returning each
    * piece's expected occurrence count under the segmentation
    * posterior, QUANTIZED to 6-decimal micros.
    *
    * Determinism (the reason hard-EM shipped first, now solved for
    * the soft form): the lattice math is doubles, but every
    * accumulation runs in one fixed order (α with i↑ then j↑, β with
    * i↓ then j↑, γ edges in (j, i) lexicographic order) through
    * [[lse]]'s StrictMath-only kernel — so per-word results are
    * bit-identical on any platform. The only CROSS-ROW arithmetic is
    * then the corpus sum of `micros × freq` INTEGERS, which is
    * order-free — partitioning can never move a bit, exactly the
    * grid-exact discipline that makes the Viterbi variant portable.
    *
    * Piece log-probs enter as micros/1e6 (one exact-integer → double
    * division); unseen single chars get the UNK fallback like
    * [[viterbi]]; unreachable words (impossible under the single-char
    * closure) return empty. */
  def expectedCounts(w: String, model: Model): Seq[(String, Long)] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val micros = model.micros
    val maxLen = model.maxPieceLen
    def lpOf(j: Int, i: Int): Double = {
      val boxed = micros.get(w.substring(j, i))
      if (boxed != null) boxed.longValue / 1e6
      else if (i - j == 1) model.unkMicros / 1e6
      else Double.NaN // marker: no such edge
    }
    val alpha = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = lpOf(j, i)
        if (!lp.isNaN && alpha(j) != Double.NegativeInfinity)
          alpha(i) = lse(alpha(i), alpha(j) + lp)
        j += 1
      }
      i += 1
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return Seq.empty
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var k = i + 1
      val kMax = math.min(n, i + maxLen)
      while (k <= kMax) {
        val lp = lpOf(i, k)
        if (!lp.isNaN && beta(k) != Double.NegativeInfinity)
          beta(i) = lse(beta(i), lp + beta(k))
        k += 1
      }
      i -= 1
    }
    // γ per edge, accumulated per piece in first-seen order, then
    // emitted piece-sorted (a canonical order, so the flatMap row
    // stream is identical on any engine)
    val acc = new java.util.TreeMap[String, Double]()
    var j = 0
    while (j < n) {
      var k = j + 1
      val kMax = math.min(n, j + maxLen)
      while (k <= kMax) {
        val lp = lpOf(j, k)
        if (!lp.isNaN && alpha(j) != Double.NegativeInfinity &&
            beta(k) != Double.NegativeInfinity) {
          val g = StrictMath.exp(alpha(j) + lp + beta(k) - z)
          val p = w.substring(j, k)
          val prev = acc.get(p)
          acc.put(p, if (prev == null) g else prev + g): Unit
        }
        k += 1
      }
      j += 1
    }
    val out = Seq.newBuilder[(String, Long)]
    acc.forEach { (p, g) =>
      val um = math.round(g * 1e6)
      if (um > 0L) out += (p -> um)
    }
    out.result()
  }

  /** SOFT-EM training (Kudo ACL'18 §3.1 — expected counts instead of
    * Viterbi-hard counts), same skeleton and shared shrink/normalize
    * as [[fit]]: seed → `iters` soft-EM rounds → final prune →
    * re-count → normalize. The trained model is applied with the
    * same [[viterbi]]/[[encode]] (SentencePiece's own stance: train
    * soft, segment Viterbi).
    *
    * Distribution split — identical to [[fit]]'s: per round, ONE
    * `mapPartitions` forward-backward pass over the distributed
    * (w, f) table (model via the re-pointed broadcast slot) folding
    * per-partition integer piece counts, merged on the driver; the
    * driver holds only the piece table. The per-row product
    * `micros × f` fits Long to f ≈ 1.4×10¹¹ occurrences of one word
    * form (beyond any real corpus' single-form frequency) and goes
    * through `Math.multiplyExact` so past that bound the task THROWS
    * instead of wrapping silently (r16 advice — the documented bound
    * is now enforced, not assumed); the cross-row SUM accumulates in
    * BigInteger — exact and overflow-free at any corpus size — and
    * fails LOUDLY if a piece's total leaves the Long range the
    * driver table carries. */
  def softFit(words: DataFrame, targetV: Int, iters: Int = 3, maxLen: Int = 6,
      seedSize: Int = 4096): Model = {
    require(targetV >= 1 && iters >= 1,
      s"targetV=$targetV iters=$iters")
    softFitPrepared(prepare(words, maxLen, seedSize), targetV, iters)
  }

  /** [[softFit]] body over a [[Prepared]] input — identical
    * semantics. */
  private[graft] def softFitPrepared(prep: Prepared, targetV: Int,
      iters: Int): Model = {
    require(targetV >= 1 && iters >= 1, s"targetV=$targetV iters=$iters")
    val wf = prep.wf
    val spark = wf.sparkSession
    import spark.implicits._
    var table: Seq[(String, Long)] = prep.seed
    // same one-plan E-step shape as [[fitPrepared]] (see the comment
    // there); partials accumulate in BigInteger — exact at any
    // intermediate magnitude like the old decimal(38,0) sum — and the
    // per-piece Long-range guard is applied to the merged totals,
    // unchanged
    val slot = new graft.BcSlot[Model]
    val wfRdd = wf.as[(String, Long)].rdd // planned once
    val countPartials = wfRdd.mapPartitions { it =>
      val model = slot.bc.value
      val m = scala.collection.mutable.HashMap
        .empty[String, java.math.BigInteger]
      it.foreach { case (w, f) =>
        expectedCounts(w, model).foreach { case (p, um) =>
          val c = java.math.BigInteger.valueOf(Math.multiplyExact(um, f))
          m.update(p, m.get(p).fold(c)(_.add(c)))
        }
      }
      Iterator.single(m)
    }
    def estepSoft(m: Model): Map[String, Long] = {
      slot.bc = spark.sparkContext.broadcast(m)
      val merged = countPartials.reduce { (a, b) =>
        b.foreach { case (p, c) => a.update(p, a.get(p).fold(c)(_.add(c))) }
        a
      }
      slot.bc.destroy()
      merged.iterator.map { case (p, bi) =>
        require(bi.bitLength() < 64,
          s"soft-EM expected-count micros for piece '$p' exceed Long " +
            s"($bi): widen the driver table to BigInt before training " +
            "at this corpus scale")
        p -> bi.longValueExact()
      }.toMap
    }
    def mstepSoft(t: Seq[(String, Long)], counts: Map[String, Long])
        : Seq[(String, Long)] =
      t.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0L) Some(p -> c)
        else if (p.length == 1) Some(p -> 1L) // closure floor (1 micro)
        else None
      }
    for (_ <- 1 to iters) {
      table = mstepSoft(table, estepSoft(toModel(table)))
      table = pruneByLoss(table, math.max(targetV, table.length * 3 / 4))
    }
    table = pruneByLoss(table, targetV)
    toModel(mstepSoft(table, estepSoft(toModel(table))))
  }

  /** Corpus-wide apply: (doc_id, pieces array<string>, n_pieces) —
    * embarrassingly parallel, zero shuffle, model once per task via
    * closure; a per-partition memo collapses repeated words (Zipf
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
              r = viterbi(w, model)
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
