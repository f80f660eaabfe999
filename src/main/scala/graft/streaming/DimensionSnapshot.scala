package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** T5 — the reference's atomic dimension swap, made an explicit
  * consistency guarantee.
  *
  * The reference refreshes its lemma dimension every 12 h by loading
  * the full map and `reset!`-ing ONE atom (`wbdb.clj:51-67`): readers
  * see either the old or the new dimension, never a mix. The plain
  * Spark answer — a static DataFrame re-evaluated per micro-batch
  * ([[StreamingFlagship.enriched]]) — refreshes but does NOT pin: if
  * the underlying table changes while a micro-batch is planning or a
  * retried task re-reads it, one batch can observe two versions.
  *
  * This holder restores the reference's guarantee: [[refresh]] loads
  * and MATERIALIZES a version via eager `localCheckpoint` — lineage is
  * TRUNCATED, so no recompute path back to the mutable source exists;
  * a version can never silently re-read — then swaps one
  * AtomicReference; [[pinned]] is a single volatile read, so every
  * micro-batch joins against exactly one fully-loaded version for its
  * whole lifetime, tagged with `dim_version` for auditability.
  * Superseded versions are freed one refresh LATER (grace window): a
  * batch pinned to version N is long finished by the time version N+2
  * publishes at the reference's 12 h cadence, so its blocks are never
  * pulled out from under a running join.
  *
  * At scale the dimension stays broadcastable (~10⁵–10⁶ rows,
  * [[graft.dim.Dimension]]); one cached copy per 12 h version is the
  * same cost the reference pays for its in-heap map.
  */
final class DimensionSnapshot(load: () => DataFrame) {

  private case class Versioned(version: Long, df: DataFrame)

  private val current = new AtomicReference[Versioned](
    Versioned(0L, materialize(load(), 0L)))

  /** Superseded version awaiting its grace-window release. */
  private val retiring = new AtomicReference[Option[DataFrame]](None)

  private def materialize(df: DataFrame, version: Long): DataFrame =
    // eager localCheckpoint: fully computed BEFORE publication, and
    // lineage-truncated so the version can never re-read the source
    df.withColumn("dim_version", lit(version)).localCheckpoint(true)

  /** The pinned snapshot — one volatile read; stable for as long as
    * the caller holds the reference (a micro-batch reads it once at
    * batch start). */
  def pinned: DataFrame = current.get().df

  def version: Long = current.get().version

  /** Load the next version and swap atomically (the reference's
    * `update-lemmata!`, `wbdb.clj:44-49`: on load failure the old
    * version stays — refresh never tears down a working dimension).
    * Returns the new version number. */
  def refresh(): Long = {
    val prev = current.get()
    val next = Versioned(prev.version + 1, materialize(load(), prev.version + 1))
    current.set(next)
    // free the version superseded one refresh AGO; prev enters the
    // grace window (any batch pinned to it finishes well within one
    // refresh period). Dataset.unpersist is a silent no-op on a local
    // checkpoint (CacheManager never saw it) — release the RDD blocks
    // directly via the bridge shim.
    retiring.getAndSet(Some(prev.df))
      .foreach(org.apache.spark.sql.graft.bridge.freeLocalCheckpoint(_): Unit)
    next.version
  }

  /** Streaming enrichment with per-micro-batch pinning: the snapshot
    * is read ONCE per batch and broadcast — the whole batch joins one
    * version (the `dim_version` column proves it downstream). Sink:
    * epoch-overwrite parquet like `Sinks.appendParquet`. */
  def enrichTo(requests: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery =
    requests.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val dim = pinned // single volatile read pins the version
        batch.join(broadcast(dim), Seq("lemma"), "left_outer")
          .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId"): Unit
      }
      .start()
}
