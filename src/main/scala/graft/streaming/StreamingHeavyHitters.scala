package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{HeavyHitters, PortableHash}

/** Streaming Misra–Gries heavy hitters — the stateful-streaming twin
  * of `q_sketch_heavy`'s native aggregate, SHARDED: keys hash-route
  * to `nShards` groups and each shard maintains one ≤ 2m-counter
  * summary over its key subspace. Because a key's whole history lands
  * in exactly one shard, the per-shard summary carries the full
  * Misra–Gries guarantees for its keys with the SHARD's error term:
  *
  *  - est(x) ≤ true(x) ≤ est(x) + err(shard(x));
  *  - err(shard) ≤ mass(shard) / (m+1);
  *  - any x with true(x) > mass(shard(x))/(m+1) is tracked.
  *
  * State is O(nShards · m) TOTAL regardless of stream length or key
  * cardinality — the property that makes corpus-scale frequency
  * tracking viable on unbounded input (the exact `StreamingTopK`
  * holds one counter per distinct key). The same batched-compaction
  * kernel as the batch aggregate ([[HeavyHitters.insert]]) updates
  * the summary, so stream and batch cannot drift; the summary
  * CONTENTS remain arrival-order-dependent, the theorems don't —
  * StreamingHeavyHittersSpec pins the guarantees across arbitrary
  * micro-batch splits (the `q_sketch_heavy` oracle stance, streamed).
  *
  * Emission: the updated shard's full summary per micro-batch
  * (Update mode downstream) — m-bounded rows, a global top-k is the
  * k largest over the latest summary per shard.
  */
object StreamingHeavyHitters {

  case class HhState(keys: Array[String], counts: Array[Long],
      err: Long, mass: Long)

  case class ShardSummary(shard: Int, items: Map[String, Long],
      err: Long, mass: Long)

  /** Deterministic shard of a key — the portable digest, so routing
    * is reproducible across runs/engines (never JVM hashCode). */
  def shardOf(key: String, nShards: Int): Int =
    math.floorMod(PortableHash.digestOf(key), nShards.toLong).toInt

  def heavyHitters(spark: SparkSession, keys: Dataset[String],
      m: Int, nShards: Int): Dataset[ShardSummary] = {
    import spark.implicits._
    require(m >= 1 && nShards >= 1, s"m=$m nShards=$nShards")
    val cap = 2 * m
    keys
      .map(k => (shardOf(k, nShards), k))
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (shard: Int, it: Iterator[(Int, String)], state: GroupState[HhState]) => {
          val prior = state.getOption
          val summary = new HeavyHitters.Summary(
            prior.map(p => mutable.HashMap.from(p.keys.zip(p.counts)))
              .getOrElse(mutable.HashMap.empty),
            prior.map(_.err).getOrElse(0L))
          var mass = prior.map(_.mass).getOrElse(0L)
          it.foreach { case (_, k) =>
            HeavyHitters.insert(summary, k, 1L, cap, m)
            mass += 1
          }
          val entries = summary.counts.toArray.sortBy(_._1)
          state.update(HhState(entries.map(_._1), entries.map(_._2),
            summary.err, mass))
          Iterator.single(ShardSummary(shard, entries.toMap, summary.err, mass))
        })
  }
}
