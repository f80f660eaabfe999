package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Streaming CLASSIFIER EVALUATION — live model-quality monitoring
  * for the learned quality filter (r15 verdict stretch 7): the batch
  * `q_quality_auc` / `q_quality_calibration` close the
  * train→apply→evaluate loop OFFLINE; this twin keeps the same two
  * verdicts current while documents stream in, the
  * mark-then-sweep split of [[StreamingPplBand]]:
  *
  *  1. MARK ([[marks]]): each arriving document projects to its
  *     evaluation grain (doc_id, lang, exact-integer margin, rule
  *     label) through the IDENTICAL batch projection
  *     (`TextQueries.qualityScored` — pure stateless per-row
  *     expressions, streamable as-is), so the streamed scorer cannot
  *     fork from the ○ queries'.
  *  2. SWEEP: both evaluation tails are the batch functions
  *     themselves. The AUC sweeps the accumulated
  *     per-(lang, margin) HISTOGRAM ([[histogram]] — tie-aware
  *     Mann-Whitney needs only group counts, so the histogram form
  *     is EXACT, not an approximation); the reliability deciles
  *     sweep the per-document marked store (the decile boundary
  *     splits margin ties by doc_id — a total order no histogram
  *     carries — so this sweep keeps the PplBand marked-store
  *     stance).
  *
  * Scale stance: the mark stage shuffles nothing (stateless map);
  * the AUC's streaming state is one (nt, np) row per
  * (lang, margin_num) — margin domain, not corpus domain; the
  * marked store accumulates four integers per document (orders of
  * magnitude under the corpus), and both sweeps are the batch
  * tails' own distributed two-phase rank scans (never a
  * per-language window). StreamingQualityEvalSpec pins both swept
  * verdicts ≡ batch across micro-batch splits. */
object StreamingQualityEval {

  /** Stateless MARK: streaming (doc_id, lang, text) documents →
    * the shared evaluation grain. */
  def marks(docs: DataFrame): DataFrame =
    TextQueries.qualityScored(docs)

  /** The domain-bounded histogram aggregation the AUC sweep
    * consumes — as a STREAMING aggregation its state is exactly
    * these rows (run in complete/update mode; no watermark, the
    * histogram never expires). */
  def histogram(marked: DataFrame): DataFrame =
    marked.groupBy(col("lang"), col("margin_num"))
      .agg(count(lit(1)).as("nt"), sum(col("p")).as("np"))

  /** AUC sweep ­— the batch rank tail over the accumulated
    * histogram. */
  def sweepAuc(s: SparkSession, hist: DataFrame): DataFrame =
    TextQueries.aucFromHistogram(s, hist)

  /** Reliability-decile sweep — the batch tail over the marked
    * store. */
  def sweepCalibration(s: SparkSession, marked: DataFrame): DataFrame =
    TextQueries.calibTail(s,
      marked.select(col("doc_id"), col("margin_num"), col("p")))
}
