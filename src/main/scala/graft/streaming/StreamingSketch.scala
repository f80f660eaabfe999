package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.PortableHash

/** Streaming KMV distinct-count sketch — the stateful-streaming form
  * of `q_sketch_kmv`: per group, keep the k smallest distinct portable
  * hashes across micro-batches and emit the running estimate
  * D̂ = (k−1)·P / h_(k) after every update.
  *
  * State is a sorted array of ≤ k longs per group — O(k) memory per
  * key regardless of stream length, the property that makes the
  * operator viable on unbounded input (an exact distinct count would
  * need unbounded state). Mergeable by construction: the k-min set of
  * a union is the k smallest of the merged k-min sets, so the same
  * sketch state could be shuffled/merged across partitions or days.
  *
  * The estimate after processing any prefix equals the BATCH KMV over
  * the same rows (StreamingSketchSpec pins this equivalence) — the
  * batch ≡ stream design stance applied to sketches.
  */
object StreamingSketch {

  case class KmvState(mins: Array[Long], generation: Int = 0)

  /** `generation` counts sketch (re)starts for the key: 0 for a sketch
    * that has seen the key's whole history, incremented each time an
    * idle-timeout eviction was followed by new data (the sketch then
    * restarts empty, and estimates cover only the post-eviction
    * suffix). Consumers needing the batch-equivalence guarantee — the
    * property StreamingSketchSpec pins for the no-timeout path — must
    * check `generation == 0`. */
  case class KmvEstimate(key: String, est: Double, nSeen: Int, generation: Int)

  /** events: (key, rawValue) pairs; emits one estimate per updated key
    * per micro-batch (Update output mode downstream).
    *
    * `idleTimeout` bounds the KEY dimension of the state store: a key
    * with no arrivals for that long has its sketch evicted (processing-
    * time timeout, nothing emitted on eviction). Without it — the
    * default — state is O(k) per key but O(keys) total, which is only
    * viable when the key domain is bounded (the q_sketch_kmv analog:
    * a handful of group values). Pass a timeout for unbounded/churning
    * key domains. */
  def kmvDistinct(spark: SparkSession, events: Dataset[(String, Long)],
      k: Int, idleTimeout: Option[String] = None): Dataset[KmvEstimate] = {
    import spark.implicits._
    require(k >= 2, s"k must be >= 2, got $k")
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        (key: String, it: Iterator[(String, Long)], state: GroupState[KmvState]) => {
          if (state.hasTimedOut) {
            // two-phase eviction: drop the sketch but keep a tiny
            // tombstone carrying the restart counter for one more TTL
            // period, so data arriving shortly after an eviction is
            // marked generation > 0 (not batch-equivalent) instead of
            // silently posing as a full-history sketch; an idle
            // tombstone is removed on its second timeout, after which
            // a restart is indistinguishable from a fresh key (the
            // unavoidable lossiness of TTL state — documented on
            // KmvEstimate.generation)
            val prior = state.getOption
            if (prior.exists(_.mins.nonEmpty)) {
              state.update(KmvState(Array.empty, prior.get.generation + 1))
              idleTimeout.foreach(state.setTimeoutDuration)
            } else state.remove()
            Iterator.empty
          } else {
            val generation = state.getOption.map(_.generation).getOrElse(0)
            val mins = scala.collection.mutable.TreeSet.empty[Long]
            state.getOption.foreach(s => mins ++= s.mins)
            it.foreach { case (_, raw) =>
              val h = PortableHash.digestOf(raw.toString)
              if (mins.size < k) mins += h
              else if (h < mins.last && !mins.contains(h)) {
                mins += h
                mins -= mins.last
              }
            }
            state.update(KmvState(mins.toArray, generation))
            idleTimeout.foreach(state.setTimeoutDuration)
            val est =
              if (mins.size < k) mins.size.toDouble // fewer distincts than k: exact
              else (k - 1).toDouble * PortableHash.P / mins.last
            Iterator.single(KmvEstimate(key, est, mins.size, generation))
          }
        })
  }
}
