package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.PipelineQueries

/** Streaming RETRIEVE-THEN-RERANK — the serving form of
  * `q_rag_rerank`: queries arrive as a stream, the chunk corpus is a
  * STATIC index built once (checkpointed postings + hashed-BoW
  * vectors + norms — see `PipelineQueries.RagIndex`), and every
  * micro-batch of queries runs through the IDENTICAL shared
  * derivation (`PipelineQueries.rerankFor`) the batch query uses —
  * stage-1 BM25 candidates from a posting-list equi-join, stage-2
  * exact-integer hashed-cosine rerank, per-query top-k.
  *
  * Why stream ≡ batch holds per prefix, by construction: both run
  * the same `rerankFor` plan, and its scores are PER-QUERY
  * INDEPENDENT — df/idf and all norms are corpus statistics, so
  * scoring any query subset returns exactly the full run's rows for
  * those queries. Feeding queries q₁…qₖ in any micro-batch split
  * therefore accumulates exactly the batch output restricted to
  * {q₁…qₖ} (StreamingRerankSpec pins this per prefix against the
  * oracle-checked `q_rag_rerank`).
  *
  * Delivery contract: a query's term rows arrive WHOLE within one
  * micro-batch (a query split across batches would score its halves
  * independently — the same whole-unit contract as
  * [[StreamingBoilerplate]] documents for documents). Each arriving
  * query is scored once; there is no cross-batch state, so the
  * operator restarts cleanly from any checkpoint.
  *
  * Scale shape: the per-batch work is candidate-bounded — the
  * stream side is |batch queries|·terms rows, every corpus-scale
  * table is read from the static checkpointed index (postings join
  * on term, vectors join on the candidate chunk keys), and the
  * query-side tables are broadcast by construction. This is the
  * serving-latency shape of a production retrieval stack: corpus
  * work at index-build time, per-query work proportional to
  * candidates. */
object StreamingRerank {

  /** Build the static index once, then rerank each micro-batch of
    * streaming (qid, term) rows, handing every non-empty batch's
    * reranked frame to `sink` (already top-k, ordered by qid, rnk). */
  def start(spark: SparkSession, queries: DataFrame, sfDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))(
      sink: DataFrame => Unit): StreamingQuery = {
    val ix = new PipelineQueries.RagIndex(spark, sfDir)
    // force the lazy vector tables at index-build time, not inside
    // the first micro-batch (serving latency belongs to queries, the
    // corpus scan to the build)
    ix.cb.count(): Unit
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val qt = batch.select("qid", "term")
        if (!qt.isEmpty) sink(PipelineQueries.rerankFor(qt, ix))
      }
      .start()
  }
}
