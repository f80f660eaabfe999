package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming row-level sessionization — the stateful-streaming form of
  * `q_sessionize`: events stream in and each is emitted tagged with
  * its per-user session ordinal (gap rule and `(ts, event_id)` order
  * exactly as the batch query).
  *
  * State per user is O(1): the last seen event time and the current
  * session ordinal — nothing buffers, unlike the aggregating
  * `session_window` path, because the ASSIGNMENT form only needs the
  * previous event to decide "same session or next".
  *
  * Ordering contract: events must arrive in `(ts, event_id)` order
  * WITHIN each user across micro-batches (inside a batch the group is
  * sorted here, so only cross-batch order is the caller's contract —
  * the replay/tailer sources deliver it; an out-of-order transport
  * would need a watermark + reorder buffer in front, turning state
  * into O(buffer)). Under that contract the emission after any prefix
  * equals the batch `q_sessionize` over the same rows —
  * StreamingSessionizeSpec pins the equivalence against the real
  * query at sf0.001.
  */
object StreamingSessionizer {

  /** Inactivity gap that closes a session, in microseconds (the batch
    * query's 30 minutes). */
  val GapMicros: Long = 30L * 60 * 1000000L

  case class SessState(lastTsMicros: Long, sid: Long)

  case class SessionRow(event_id: Long, user_id: Long, sid: Long)

  /** events: (userId, eventId, tsMicros). Emits every event's session
    * assignment (Update output mode downstream). */
  def sessionize(spark: SparkSession,
      events: Dataset[(Long, Long, Long)]): Dataset[SessionRow] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, Long, Long)],
            state: GroupState[SessState]) => {
          // within-batch order is established here; cross-batch order
          // is the documented contract
          val sorted = it.toSeq.sortBy { case (_, eventId, ts) => (ts, eventId) }
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
          val out = sorted.map { case (_, eventId, ts) =>
            val newSession =
              st.sid == 0L || ts - st.lastTsMicros >= GapMicros
            st = SessState(ts, if (newSession) st.sid + 1 else st.sid)
            SessionRow(eventId, user, st.sid)
          }
          state.update(st)
          out.iterator
        })
  }
}
