package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.{PipelineQueries, TextQueries}

/** Streaming MIXTURE PLANNING — the DoReMi domain-reweighting twin
  * (round 17): the batch `q_mixture_doremi` plans the training
  * mixture OFFLINE from the whole corpus; this twin keeps the domain
  * weights current while documents stream in, the
  * [[StreamingQualityEval]] mark-then-sweep split applied to the
  * mixture planner:
  *
  *  1. MARK ([[marks]]): each arriving document projects to its
  *     (lang, margin_num, n_tok) grain through the IDENTICAL batch
  *     scorer (`TextQueries.logregScore` — pure stateless per-row
  *     expressions, the projection StreamingLogregSpec already pins
  *     under readStream), so the streamed signal cannot fork from
  *     the ○ query's.
  *  2. ACCUMULATE ([[domainStats]]): the complete-mode streaming
  *     aggregation whose state IS the |domains|-row exact-integer
  *     stat table — domain-cardinality state, never corpus-scale
  *     (the shared `PipelineQueries.doremiDomainStats`).
  *  3. SWEEP ([[sweep]]): the batch tail itself
  *     (`PipelineQueries.doremiTail`) over the accumulated stats —
  *     one shared softmax/smoothing expression, so stream ≡ batch is
  *     structural.
  *
  * StreamingDoremiSpec pins the swept weights ≡ the batch query
  * row-for-row across micro-batch splits and the state's domain
  * cardinality. */
object StreamingDoremi {

  /** Stateless MARK: streaming (doc_id, lang, text) documents → the
    * shared scoring grain. */
  def marks(docs: DataFrame): DataFrame =
    TextQueries.logregScore(docs)

  /** The domain-bounded stat aggregation (run in complete mode; no
    * watermark — the mixture never expires). */
  def domainStats(marked: DataFrame): DataFrame =
    PipelineQueries.doremiDomainStats(marked)

  /** Weight sweep — the batch DoReMi tail over the accumulated
    * stats. */
  def sweep(dom: DataFrame): DataFrame =
    PipelineQueries.doremiTail(dom)
}
