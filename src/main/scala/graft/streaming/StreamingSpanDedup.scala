package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming duplicated-SPAN marking — the incremental form of
  * `q_dedup_span` (Lee et al. ACL'22 substring dedup), with the dedup
  * family's at-arrival contract (`q_dedup_incremental`'s stance): an
  * arriving gram occurrence is COVERED iff an earlier occurrence of
  * the same gram exists — in a prior micro-batch, an earlier document
  * of this batch, or an earlier position of the same document. The
  * FIRST copy of any passage survives untouched; every later copy is
  * marked. (The batch query instead marks ALL occurrences of a ≥2
  * gram, first included — the global-view vs at-arrival divergence
  * every incremental dedup in this engine documents.)
  *
  * The survivor rule, precisely: per gram digest exactly ONE
  * occurrence is never marked — the first to ARRIVE, with ties
  * inside a micro-batch broken by (doc_id, pos). Under doc_id-
  * MONOTONE delivery (every batch's ids follow all prior batches' —
  * the ingest order of a snapshot/append pipeline, and
  * `q_dedup_incremental`'s contract) arrival order coincides with
  * (doc_id, pos) order, so the covered set is BATCH-SPLIT INVARIANT
  * and equal to "occurrences ordered by (doc_id, pos), covered from
  * the second onward" — which the spec pins per prefix against a
  * sequential reference across different chops. Under OUT-OF-ORDER
  * delivery the per-gram mark COUNT is unchanged (all but one
  * marked) but WHICH copy survives follows arrival, not id — the
  * spec pins that case too.
  *
  * Architecture (mark stream-side, sweep batch-side): the stateful
  * pass keys by gram digest with a single Int of state (occurrences
  * seen — O(distinct grams), the StreamingBoilerplate state class)
  * and emits covered gram-START positions; span-merging and document
  * reassembly need the doc text, so they run as the batch finisher
  * [[clean]] wherever the covered marks meet the document store
  * (foreachBatch, or a sweep join later — the two-phase
  * mark-then-sweep every incremental corpus pipeline uses).
  *
  * Delivery contract: exactly-once per document, whole documents per
  * micro-batch (the [[StreamingBoilerplate]] caveats apply verbatim:
  * for at-least-once sources put a watermarked
  * `dropDuplicates("doc_id")` upstream). */
object StreamingSpanDedup {

  val Gram = 5

  case class GramOcc(dg: Long, doc_id: Long, pos: Int)
  /** A covered gram start in an arriving document. */
  case class CoveredStart(doc_id: Long, pos: Int)

  /** (doc_id, pos, dg): 1-based gram starts of each document —
    * the exact derivation of `q_dedup_span` (shingles + md5 digest),
    * stateless, so it runs on a streaming frame. */
  def gramStarts(docs: DataFrame): DataFrame = docs
    .select(col("doc_id").cast("long").as("doc_id"),
      posexplode(graft.functions.GraftExpressions.shingles(
        lower(col("text")), Gram, dedup = false)).as(Seq("p", "g5")))
    .select(col("doc_id"), (col("p") + 1).cast("int").as("pos"),
      graft.functions.PortableHash.md5Long(col("g5")).as("dg"))

  /** docs: streaming (doc_id, text) → covered gram starts (Append). */
  def coveredStarts(spark: SparkSession, docs: DataFrame): Dataset[CoveredStart] = {
    import spark.implicits._
    gramStarts(docs)
      .select(col("dg"), col("doc_id"), col("pos")).as[GramOcc]
      .groupByKey(_.dg)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[GramOcc], state: GroupState[Int]) => {
          // (doc_id, pos) order WITHIN the batch makes the covered
          // set independent of partitioning, and — under id-monotone
          // delivery — of the batch split (see the class contract):
          // occurrence k (1-based, in arrival order) is covered iff
          // k ≥ 2
          val rows = it.toSeq.sortBy(r => (r.doc_id, r.pos))
          val prior = state.getOption.getOrElse(0)
          state.update(prior + rows.size)
          rows.iterator.zipWithIndex.collect {
            case (r, idx) if prior + idx >= 1 => CoveredStart(r.doc_id, r.pos)
          }
        })
  }

  /** Batch finisher: given documents and their covered gram starts,
    * expand to covered positions, merge maximal runs, cut runs ≥
    * `spanMin`, and reassemble. Delegates to the SHARED sweep behind
    * `q_dedup_span`'s tail (`DedupQueries.spanSweep`), so batch and
    * streaming cleaning semantics cannot drift. Returns (doc_id,
    * n_before, n_removed, n_after, clean_md5, clean_text). */
  def clean(docs: DataFrame, covered: DataFrame, spanMin: Int): DataFrame =
    graft.queries.DedupQueries.spanSweep(docs, covered, Gram, spanMin)
}
