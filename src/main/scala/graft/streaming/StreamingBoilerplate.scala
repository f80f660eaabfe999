package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming boilerplate DETECTOR — the incremental pass-1 of
  * `q_text_boilerplate` (CCNet repeated-paragraph removal): documents
  * stream in, each is cut into the SAME fixed-word lines as the batch
  * query, and a line's 60-bit digest is emitted exactly ONCE — the
  * moment its distinct-document count crosses `minDocs`. The emitted
  * digest stream is the live repeated-line set; the removal pass
  * stays the batch query's stateless HOF projection against a
  * snapshot of that set (the [[DimensionSnapshot]] serving pattern),
  * so batch and stream share both derivations and cannot drift.
  *
  * Why count-only state suffices (the thing that makes this viable):
  * a document arrives WHOLE in one row, and the per-batch prefix
  * dedups (digest, doc_id) within the batch — so each document
  * contributes at most one increment per distinct line globally, and
  * the per-digest state is a single integer, never a doc-id set.
  * State is O(distinct lines); an optional idle TTL bounds it for
  * unbounded runs (an evicted digest that recurs restarts its count —
  * the sliding-horizon trade every streaming frequency pass makes).
  *
  * StreamingBoilerplateSpec pins: cumulative emissions after batch k
  * ≡ the batch pass-1 set over the stream prefix, exactly-once per
  * digest across arbitrary micro-batch splits, and cleaning with the
  * final set ≡ `q_text_boilerplate`'s cleaned output. */
object StreamingBoilerplate {

  /** One threshold crossing: this line is now corpus-boilerplate. */
  case class BoilerHit(dg: Long, ndocs: Int)

  /** The line decomposition shared with the batch query — exposed so
    * stream and batch can never disagree on a boundary. */
  def lines(ws: Column): Column = graft.queries.TextQueries.boilerLines(ws)

  /** docs: streaming (doc_id, text) → digests crossing `minDocs`.
    *
    * Delivery contract: exactly-once per `doc_id` for the stream's
    * lifetime. The state per digest is a bare running count, so a
    * replayed document (at-least-once source) or one re-delivered
    * after an `idleTimeout` eviction double-counts toward `minDocs`
    * undetectably. For replay-prone sources, put a watermarked
    * `dropDuplicates("doc_id")` (or `dropDuplicatesWithinWatermark`)
    * upstream of this pass — per-doc-id dedup state is corpus-sized
    * but watermark-bounded, whereas widening THIS operator's state to
    * a doc-id set per digest would be corpus×lines-sized. */
  def hits(spark: SparkSession, docs: DataFrame,
      minDocs: Int = graft.queries.TextQueries.BoilerMinDocs,
      idleTimeout: Option[String] = None): Dataset[BoilerHit] = {
    import spark.implicits._
    val perDoc = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(array_distinct(lines(split(col("text"), " ")))).as("line"))
      .select(col("doc_id"), graft.functions.PortableHash.md5Long(col("line")).as("dg"))
      .as[(Long, Long)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    perDoc.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (dg: Long, it: Iterator[(Long, Long)], state: GroupState[Int]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.getOrElse(0)
            // distinct docs in this batch for this digest: each doc
            // row arrives whole, so distinct-within-batch makes the
            // global contribution one per document
            val add = it.map(_._1).toSet.size
            val now = prior + add
            state.update(now)
            idleTimeout.foreach(state.setTimeoutDuration)
            if (prior < minDocs && now >= minDocs) Iterator(BoilerHit(dg, now))
            else Iterator.empty
          }
        })
  }
}
