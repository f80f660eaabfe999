package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.queries.SimilarityQueries

/** Streaming ANN SERVING over the persisted IVF index — the
  * [[StreamingRerank]] shape applied to the vector index: the index
  * is built ONCE (trained centroids + the durable cell-partitioned
  * posting store of `q_knn_ivf_persisted`), then every micro-batch
  * of arriving query vectors runs the IDENTICAL shared serving tail
  * (`SimilarityQueries.ivfServe` — probe selection over the
  * k-bounded centroid table, literal cell filter pruning the store
  * scan, exact-cosine top-k).
  *
  * Stream ≡ batch per prefix, by construction: the serving tail is
  * PER-QUERY INDEPENDENT (the model and store are fixed at build
  * time; a query's answer never depends on other queries), so
  * serving any micro-batch split of a query set accumulates exactly
  * the batch answers for those queries — StreamingIvfSpec pins the
  * accumulated stream output row-for-row against
  * `knnIvfPersisted`'s.
  *
  * Delivery contract: one row per query (the whole vector rides in
  * one column), so nothing can split across batches; no cross-batch
  * state, clean restart from any checkpoint. Per-batch work is
  * |batch queries|-scale against the pruned store scan — the
  * serving-latency shape of a production ANN stack: corpus work at
  * index-build time, per-query work proportional to the probed
  * cells.
  *
  * Store-lifetime contract: the serving stream holds the store
  * VERSION that existed at build time, and
  * [[graft.operators.DedupManifest]] retention reclaims a version
  * after TWO further persists of the same store path — so a serving
  * stream outliving two index rebuilds in one session must be
  * restarted onto the new version (a production deployment pins its
  * own store path per index generation; the restart is clean, the
  * operator is stateless). */
object StreamingIvf {

  /** Build the index once, then serve each micro-batch of streaming
    * (vec_id, v) query rows, handing every non-empty batch's top-k
    * frame to `sink` (ordered by q_id, rn). */
  def start(spark: SparkSession, queries: DataFrame, sfDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))(
      sink: DataFrame => Unit): StreamingQuery = {
    val (store, cents) = SimilarityQueries.ivfBuildStore(spark, sfDir)
    store.count(): Unit // force the store write at build time
    queries.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val qs = batch.select(col("vec_id").cast("long"), col("v"))
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1)))
        if (qs.nonEmpty) sink(SimilarityQueries.ivfServe(store, cents, qs))
      }
      .start()
  }
}
