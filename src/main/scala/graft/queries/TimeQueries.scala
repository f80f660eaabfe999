package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Q.t

/** SURVEY.md §2.10 — the streaming/time operators in their batch
  * analog form (the reference itself proves batch/stream equivalence,
  * `server.clj:37-48`): tumbling & sliding & session event-time
  * windows (A2 metric analog), and the T1 rate-sampler ("latest event
  * per bucket wins", `http.clj:74-78`).
  *
  * The same Column pipelines run under `readStream` in
  * graft.streaming with `withWatermark` added.
  *
  * DuckDB parity notes: `events.ts` is ns-precision parquet; Spark
  * reads it truncated to µs, so every oracle casts `ts::TIMESTAMP`
  * (µs) before comparing/ordering. Window starts are epoch-aligned on
  * both sides (`window()` ≙ `time_bucket`).
  */
object TimeQueries {

  private val dec = DecimalType(18, 4)

  private val qTumbling = Q("q_window_tumbling",
    """SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS ws,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sv"))
      .select(col("window.start").as("ws"), col("n"), col("sv"))
      .orderBy(col("ws"))
  }

  private val qSliding = Q("q_window_sliding",
    """SELECT ws, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP),
      |                 time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP)
      |                   - INTERVAL 30 MINUTE]) AS ws
      |  FROM events)
      |GROUP BY ws ORDER BY ws""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .orderBy(col("ws"))
  }

  private val qSession = Q("q_window_session",
    """WITH s AS (
      |  SELECT user_id, ts::TIMESTAMP AS tsu,
      |    CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
      |              >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |g AS (
      |  SELECT user_id, tsu,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM s)
      |SELECT user_id, min(tsu) AS session_start, CAST(count(*) AS BIGINT) AS n
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** T1 — "latest event per rate-window wins" sampling: deterministic
    * rank by (event time, id) instead of the reference's racy 1-slot
    * buffer. */
  private val qSampleRate = Q("q_sample_rate",
    """WITH r AS (
      |  SELECT date_trunc('minute', ts::TIMESTAMP) AS m, event_id, event_type,
      |    row_number() OVER (PARTITION BY date_trunc('minute', ts::TIMESTAMP)
      |                       ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT m, event_id, event_type FROM r WHERE rn = 1
      |ORDER BY m""".stripMargin) { (s, d) =>
    val m = date_trunc("minute", col("ts"))
    val w = Window.partitionBy(m).orderBy(col("ts").desc, col("event_id").desc)
    t(s, d, "events")
      .select(m.as("m"), col("event_id"), col("event_type"),
        row_number().over(w).as("rn"))
      .where(col("rn") === 1)
      .drop("rn")
      .orderBy(col("m"))
  }

  val all: Seq[Q] = Seq(qTumbling, qSliding, qSession, qSampleRate)
}
