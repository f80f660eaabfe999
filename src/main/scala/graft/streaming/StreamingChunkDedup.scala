package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-first passage dedup — the incremental form of
  * `q_chunk_dedup` (CCNet/C4-style chunk-level dedup): documents
  * stream in, each is cut into non-overlapping `DedupChunk`-char
  * passages by the SAME `chunked` expansion the batch query uses, and
  * every passage occurrence after the first (global packed
  * doc_id·100000 + chunk_ix order, identical to batch) is flagged
  * dropped the moment it arrives. Downstream reassembly can then
  * filter on the emitted keep flags.
  *
  * Why stream ≡ batch holds over any prefix (StreamingChunkDedupSpec
  * pins it): the stateful group key is the passage's 64-bit digest;
  * within a micro-batch the group's rows are processed in packed-key
  * order, and across micro-batches the first batch containing a
  * digest necessarily holds its minimum packed key when documents
  * arrive in doc_id order — so the keeper the stream picks is exactly
  * the batch argmin.
  *
  * Scale shape: state per digest is O(1) (a single Boolean — the
  * keeper's identity need not be retained once claimed), so the state
  * store grows with DISTINCT passages, not occurrences; an optional
  * idle TTL (`idleTimeout`, the [[StreamingSketch]] eviction stance)
  * bounds the store for unbounded runs — an evicted digest that
  * recurs later re-keeps, the standard sliding-horizon trade every
  * streaming dedup makes. The per-row work is one hash + one state
  * lookup; nothing corpus-scaled is ever broadcast or collected.
  */
object StreamingChunkDedup {

  /** One flagged passage: keep = this occurrence is the first. */
  case class ChunkFlag(doc_id: Long, chunk_ix: Int, keep: Boolean)

  /** docs: streaming (doc_id, text) → per-passage keep/drop flags.
    * `chunkSize` mirrors `PipelineQueries.DedupChunk`. */
  def flags(spark: SparkSession, docs: DataFrame,
      chunkSize: Int = graft.queries.PipelineQueries.DedupChunk,
      idleTimeout: Option[String] = None): Dataset[ChunkFlag] = {
    import spark.implicits._
    val ch = graft.queries.PipelineQueries
      .chunked(docs.select(col("doc_id").cast("long").as("doc_id"),
        col("text")), chunkSize, chunkSize)
      // same loud guard as the batch twin (q_chunk_dedup): a document
      // beyond 100000 passages would collide packed keys across
      // documents and silently mis-order keepers — fail instead
      .where(assert_true(col("chunk_ix") < 100000,
        lit("StreamingChunkDedup: document exceeds 100000 passages — " +
          "packed keep-first key would collide")).isNull)
      .select(col("doc_id"), col("chunk_ix"),
        xxhash64(col("chunk")).as("h"),
        (col("doc_id") * 100000L + col("chunk_ix")).as("key"))
      .as[(Long, Int, Long, Long)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ch.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: Long, it: Iterator[(Long, Int, Long, Long)],
            state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(false)
            // batch-identical keeper: packed-key order within the batch
            val out = it.toSeq.sortBy(_._4).map { case (docId, ix, _, _) =>
              val keep = !seen
              seen = true
              ChunkFlag(docId, ix, keep)
            }
            state.update(seen)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }
}
