package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packer — the stateful-streaming form of
  * `q_pack_sequences` (concat-and-chunk token budgeting): documents
  * stream in per shard, and each is assigned the training-sequence id
  * its first token lands in, carrying the shard's running token count
  * across micro-batches as state.
  *
  * State is ONE long per shard (the cumulative token count) — O(1)
  * per key regardless of stream length; the packer never buffers
  * documents. Sequence ids are per-shard (`shard`, `seqId`): packing
  * is inherently sequential, so the scale dimension is the shard
  * count — exactly how a 1000-executor packer run would shard a
  * corpus anyway (one independent pack stream per input partition).
  *
  * Batch ≡ stream: for docs arriving in docId order within a shard,
  * the assignment equals the batch prefix-sum form
  * (`floor(cumExclusive / budget)` — PrefixSum/q_pack_sequences) over
  * the same rows; StreamingPackerSpec pins this. Within a micro-batch
  * the group's rows are sorted by docId first, so equivalence only
  * requires ORDERED DELIVERY ACROSS batches (the replay source's
  * guarantee), not within one.
  */
object StreamingPacker {

  case class PackState(cum: Long)

  case class PackedDoc(shard: String, docId: Long, toks: Long, seqId: Long)

  /** docs: (shard, docId, tokenCount) triples. Emits every document
    * with its assigned per-shard sequence id (Append mode). */
  def pack(spark: SparkSession, docs: Dataset[(String, Long, Long)],
      budget: Long): Dataset[PackedDoc] = {
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    docs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: String, it: Iterator[(String, Long, Long)],
            state: GroupState[PackState]) => {
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = it.toArray.sortBy(_._2).map { case (_, id, toks) =>
            val seqId = cum / budget // floor of the EXCLUSIVE prefix sum
            cum += toks
            PackedDoc(shard, id, toks, seqId)
          }
          state.update(PackState(cum))
          out.iterator
        })
  }
}
