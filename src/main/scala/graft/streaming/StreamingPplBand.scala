package graft.streaming

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.queries.TextQueries

/** Streaming CCNet perplexity banding — the incremental form of
  * `q_text_ppl_band` (r14 verdict stretch 6: the one round-14 batch
  * query without a streaming twin). The batch query has two phases
  * with different streaming natures — the mark-then-sweep split the
  * span-dedup/bitext twins established:
  *
  *  1. MARK (this operator): each arriving document scores against a
  *     FIXED prior-corpus bigram LM (the [[StreamingBitext]]
  *     collected-quantizer stance — CCNet's own KenLM is likewise an
  *     offline artifact its scorer consumes, Wenzek et al. LREC 2020
  *     §3.3). Scoring is STATELESS per document — tokenize, stupid-
  *     backoff per bigram, exact-decimal mean — and [[score]] is
  *     pinned bit-identical to the batch scorer's arithmetic: the
  *     same `Double.toString`-based HALF_UP rounds Spark's `round`
  *     applies (round 6 per bigram, round 4 per doc), the same
  *     decimal(18,6) exact sum, the same `Locale.ROOT` lowercase and
  *     `split(" ", -1)` tokenization as `split(lower(text), " ")`.
  *  2. SWEEP: a document's band (head/middle/tail) is its corpus
  *     position — per-language tercile by (avg_logp DESC, doc_id) —
  *     which does not exist at arrival time. [[sweep]] IS
  *     `TextQueries.pplBandTail`, the identical banding tail the
  *     batch query runs (PrefixSum two-phase rank, never a
  *     per-language window), so stream and batch cannot fork in the
  *     banding math. StreamingPplBandSpec pins swept bands ≡ batch
  *     terciles across micro-batch splits.
  *
  * Scale stance: the model is bigram/unigram TYPE-bounded driver
  * state, guarded loudly at collection
  * ([[TextQueries.bigramLmModelOf]] — the Sgns.MaxVocab rationale; a
  * corpus outgrowing it count-prunes upstream, exactly CCNet's KenLM
  * pruning); the mark stage shuffles nothing (stateless map); the
  * marked store accumulates (doc_id, lang, avg_logp) — three columns
  * per document, orders of magnitude under the corpus — and the
  * sweep's rank scan is the batch tail's own distributed shape. */
object StreamingPplBand {

  /** The fixed reference LM: bigram counts, context counts, unigram
    * counts, and the (n, v) backoff scalars. */
  case class LmModel(bc: Map[(String, String), Long], cc: Map[String, Long],
      uc: Map[String, Long], n: Long, v: Long)

  /** Collect the prior-corpus model (see
    * [[TextQueries.bigramLmModelOf]] for the bound contract). */
  def model(s: SparkSession, d: String): LmModel = {
    val (bc, cc, uc, n, v) = TextQueries.bigramLmModelOf(s, d)
    LmModel(bc, cc, uc, n, v)
  }

  /** A marked document: the sweep's input grain (and the batch
    * scorer's round-4 `avg_logp`). */
  case class DocScore(doc_id: Long, lang: String, avg_logp: Double)

  /** Spark's `round(double, n)`: HALF_UP over the SHORTEST-decimal
    * representation (`BigDecimal.valueOf` ≡ `Double.toString`) — NOT
    * the exact binary expansion; the two differ in hairline cases. */
  private def sparkRound(x: Double, scale: Int): JBig =
    JBig.valueOf(x).setScale(scale, RoundingMode.HALF_UP)

  /** One document's stupid-backoff mean log-score against the fixed
    * model — None for <2-word documents (no bigrams: absent from the
    * batch result too). Bit-identical to the batch plan's
    * `sum(round(logp,6)::decimal(18,6))::double / nb` then
    * `round(um, 4)`. */
  private[graft] def score(m: LmModel, text: String): Option[Double] = {
    if (text == null) return None
    val ws = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
    if (ws.length < 2) return None
    var sum = JBig.ZERO
    var i = 0
    while (i < ws.length - 1) {
      val lp = m.bc.get((ws(i), ws(i + 1))) match {
        case Some(nbc) => math.log(nbc.toDouble / m.cc(ws(i)).toDouble)
        case None => math.log(0.4 *
          ((m.uc.getOrElse(ws(i + 1), 0L) + 1).toDouble / (m.n + m.v).toDouble))
      }
      sum = sum.add(sparkRound(lp, 6))
      i += 1
    }
    val um = sum.doubleValue / (ws.length - 1)
    Some(sparkRound(um, 4).doubleValue)
  }

  /** The stateless MARK stage: streaming (doc_id, lang, text) →
    * (doc_id, lang, avg_logp) at arrival. */
  def scores(spark: SparkSession, docs: DataFrame, m: LmModel)
      : Dataset[DocScore] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        score(m, text).map(DocScore(id, lang, _))
      }
  }

  /** The tercile sweep over the marked store — the IDENTICAL banding
    * tail `q_text_ppl_band` runs. */
  def sweep(s: SparkSession, marked: DataFrame): DataFrame =
    TextQueries.pplBandTail(s,
      marked.select(col("doc_id"), col("lang"), col("avg_logp")))
}
