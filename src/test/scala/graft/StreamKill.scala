package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Deterministic mid-stream kill for the exactly-once restart specs
  * (r13 advice): stop the query from a StreamingQueryListener as soon
  * as the committed output crosses the spec's threshold, instead of
  * wall-clock pacing (ratePerSecond + a 30 s poll deadline). The old
  * pacing was host-timing-sensitive in both directions — a fast host
  * could drain the whole file before the kill, a slow host committed
  * nothing inside the deadline; both surfaced as hard failures. The
  * listener reacts at the exact batch boundary where the qualifying
  * commit lands, so the kill follows within ~a batch on any host
  * speed, and the specs' mid-stream guards (something committed,
  * drain NOT complete) stay as loud non-vacuousness checks. */
object StreamKill {

  /** Block until `enough()` holds at a batch boundary of `q`, then
    * stop it. Throws if nothing qualifies within `timeoutSec` (the
    * kill never landed — the spec would otherwise pass vacuously). */
  def afterCommit(spark: SparkSession, q: StreamingQuery,
      enough: () => Boolean, timeoutSec: Int = 120): Unit = {
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryIdle(
          e: StreamingQueryListener.QueryIdleEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == q.id && enough()) q.stop()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      if (!q.awaitTermination(timeoutSec * 1000L)) {
        q.stop()
        throw new AssertionError(
          s"no qualifying commit within ${timeoutSec}s — kill never landed")
      }
    } finally spark.streams.removeListener(listener)
  }
}
