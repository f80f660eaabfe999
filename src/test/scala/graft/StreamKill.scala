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
    } catch {
      // Our own stop() interrupts the stream thread; when the
      // interrupt lands inside an RPC await (e.g. a state-store
      // commit — seen first on the full-outer join, which holds the
      // most state stores per batch) Spark cannot classify it as a
      // benign stop and awaitTermination rethrows STREAM_FAILED
      // wrapping the InterruptedException. That IS the kill landing,
      // not a query failure — the restart assertions downstream still
      // verify exactly-once against the checkpoint this run left.
      case e: org.apache.spark.sql.streaming.StreamingQueryException
          if rootCause(e).isInstanceOf[InterruptedException] => ()
    } finally spark.streams.removeListener(listener)
  }

  @scala.annotation.tailrec
  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null || (t.getCause eq t)) t else rootCause(t.getCause)
}
