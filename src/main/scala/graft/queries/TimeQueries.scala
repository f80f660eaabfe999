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

  /** Ticks covered by the meter replay window: 2 hours of 5-second
    * ticks — enough for the 15-minute horizon to cycle several times
    * while keeping the oracle's recursion (inherently sequential on
    * BOTH engines) bounded. */
  private val MeterTicks = 1440L

  /** A2 fidelity — the reference's Dropwizard METER rates
    * (`metrics.clj:6-18`): 1/5/15-minute exponentially-weighted
    * per-second rates per event type, replayed over the stream's
    * first two hours on the meter's own 5-second tick grid (grid
    * origin = first event's tick, per Dropwizard's
    * creation-time-anchored clock; empty ticks participate with n = 0
    * — `tickIfNecessary` catch-up — which is what makes rates decay).
    *
    * Scale shape ([[graft.operators.Ewma]]): the corpus-sized work is
    * the per-tick COUNT (one distributed aggregation); the recursion
    * itself runs over the DENSE tick grid, whose size is bounded by
    * wall-clock (ticks/key = horizon/5 s), parallel across meter keys
    * and sort-streamed within each — never materialized. The oracle
    * is the identical recurrence as a recursive CTE with the same
    * α literals; both sides round to 9 decimals (the arithmetic is
    * bit-identical IEEE ops, rounding is margin). */
  private val qMeterEwma = Q("q_meter_ewma",
    s"""WITH RECURSIVE
       |b AS (SELECT CAST((epoch_us(min(ts::TIMESTAMP)) // 5000000) * 5000000 AS BIGINT) AS t0us
       |      FROM events),
       |ix AS (SELECT event_type AS key,
       |         CAST((epoch_us(ts::TIMESTAMP) - t0us) // 5000000 AS BIGINT) AS i
       |       FROM events, b),
       |cnt AS (SELECT key, i, CAST(count(*) AS BIGINT) AS n FROM ix
       |        WHERE i < $MeterTicks GROUP BY key, i),
       |kk AS (SELECT DISTINCT event_type AS key FROM events),
       |grid AS (SELECT key, CAST(g.i AS BIGINT) AS i FROM kk, range(0, $MeterTicks) AS g(i)),
       |dense AS (SELECT grid.key, grid.i, coalesce(cnt.n, 0) AS n
       |          FROM grid LEFT JOIN cnt USING (key, i)),
       |rec AS (
       |  SELECT key, i, n, n/5.0 AS m1, n/5.0 AS m5, n/5.0 AS m15 FROM dense WHERE i = 0
       |  UNION ALL
       |  SELECT d.key, d.i, d.n,
       |    r.m1 + ${graft.operators.Ewma.A1}*(d.n/5.0 - r.m1),
       |    r.m5 + ${graft.operators.Ewma.A5}*(d.n/5.0 - r.m5),
       |    r.m15 + ${graft.operators.Ewma.A15}*(d.n/5.0 - r.m15)
       |  FROM rec r JOIN dense d ON d.key = r.key AND d.i = r.i + 1)
       |SELECT key AS event_type, i, n, round(m1, 9) AS m1, round(m5, 9) AS m5,
       |  round(m15, 9) AS m15
       |FROM rec ORDER BY event_type, i""".stripMargin) { (s, d) =>
    import graft.operators.Ewma
    val ev = t(s, d, "events")
      .select(col("event_type").as("key"), unix_micros(col("ts")).as("us"))
    val t0 = ev.agg(expr("(min(us) div 5000000) * 5000000").as("t0us"))
    val ix = ev.crossJoin(broadcast(t0)) // 1-row broadcast: grid origin
      .select(col("key"), expr("(us - t0us) div 5000000").as("i"))
      .where(col("i") < MeterTicks)
    val cnt = ix.groupBy(col("key"), col("i")).agg(count(lit(1)).as("n"))
    val grid = ev.select(col("key")).distinct()
      .crossJoin(s.range(MeterTicks).select(col("id").as("i")))
    val dense = grid.join(cnt, Seq("key", "i"), "left_outer")
      .na.fill(0L, Seq("n"))
    Ewma.rates(dense).toDF()
      .select(col("key").as("event_type"), col("i"), col("n"),
        round(col("m1"), 9).as("m1"), round(col("m5"), 9).as("m5"),
        round(col("m15"), 9).as("m15"))
      .orderBy(col("event_type"), col("i"))
  }

  val all: Seq[Q] = Seq(qTumbling, qSliding, qSession, qSampleRate, qMeterEwma)
}
