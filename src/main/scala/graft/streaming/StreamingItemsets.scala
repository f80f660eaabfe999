package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming frequent-PAIR miner — the incremental form of
  * `q_itemsets_pairs`: documents stream in, each emits the packed
  * rank pairs of its own frequent items (against a PRECOMPUTED item
  * dictionary — the broadcast-model stance: relative minsup needs the
  * corpus count, so the frequent-item universe is trained on a
  * reference corpus like the tokenizer/LM models, while the PAIR
  * counts — the part that actually grows — accumulate incrementally),
  * and a pair is emitted exactly ONCE: the moment its document count
  * crosses `minSupport`. The emitted stream is the live frequent-pair
  * set (template/boilerplate alarms as the corpus grows), decoded
  * back to tokens by the same dictionary.
  *
  * Scale shape: the stateless prefix does everything corpus-sized —
  * tokenize, dictionary filter, map-side pair generation (per-doc
  * C(m,2), m = |doc ∩ F₁|) — so the stateful exchange carries packed
  * longs keyed by pair, and the state per pair is a single running
  * count (never a doc-id set: a document arrives WHOLE in one row and
  * its pairs are distinct by construction, so each document
  * contributes at most one increment per pair — the
  * [[StreamingBoilerplate]] argument). State is O(C(|F₁|,2)) — bounded
  * by the DICTIONARY, not the corpus — so unlike most frequency
  * passes this one needs no TTL to stay bounded; the optional
  * `idleTimeout` exists for dictionary-churn deployments.
  *
  * Delivery contract: exactly-once per pair for the stream's
  * lifetime under an exactly-once source; an at-least-once source
  * double-counts replayed documents undetectably (same trade, and
  * same upstream `dropDuplicatesWithinWatermark` remedy, as
  * [[StreamingBoilerplate]]).
  *
  * StreamingItemsetsSpec pins: cumulative emissions after batch k ≡
  * absolute-threshold batch mining over the stream prefix, exactly
  * once, across arbitrary micro-batch splits, with the final set ≡
  * `q_itemsets_pairs` when `minSupport` equals the batch query's
  * data-derived minsup.
  */
object StreamingItemsets {

  /** One threshold crossing: this packed pair is now frequent. */
  case class PairHit(pk: Long, support: Int)

  /** docs: streaming (doc_id, text) → packed pairs crossing
    * `minSupport`, exactly once each. */
  def hits(spark: SparkSession, docs: DataFrame, dict: Map[String, Long],
      minSupport: Int, idleTimeout: Option[String] = None): Dataset[PairHit] = {
    import spark.implicits._
    val B = graft.queries.ItemsetQueries.PackBase
    val perDoc = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // the batch derivation, driver-free: lowercase (ROOT locale ≡
        // Spark's UTF8String lower on the ASCII token space), split,
        // distinct, dictionary-rank, sort, emit packed i<j pairs
        val rs = text.toLowerCase(java.util.Locale.ROOT)
          .split(" ", -1).distinct.toIndexedSeq
          .flatMap(dict.get).sorted
        for {
          i <- rs.indices
          j <- (i + 1) until rs.length
        } yield (id, rs(i) * B + rs(j))
      }
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    perDoc.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (pk: Long, it: Iterator[(Long, Long)], state: GroupState[Int]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.getOrElse(0)
            // distinct docs in this batch for this pair: a doc's pairs
            // are distinct by construction, so this counts documents
            val add = it.map(_._1).toSet.size
            val now = prior + add
            state.update(now)
            idleTimeout.foreach(state.setTimeoutDuration)
            if (prior < minSupport && now >= minSupport) Iterator(PairHit(pk, now))
            else Iterator.empty
          }
        })
  }
}
