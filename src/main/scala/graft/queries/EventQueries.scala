package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q.t

/** Product-analytics composites over the event stream — the queries a
  * consumer of the reference's enriched event feed actually serves
  * from it (sessionization, ordered conversion funnel, cohort
  * retention). All reuse §2.10's event-time machinery; DuckDB parity
  * notes as in [[TimeQueries]] (`ts::TIMESTAMP` truncates the
  * ns-precision parquet to the µs Spark reads).
  */
object EventQueries {

  /** Row-level sessionization: every event tagged with its per-user
    * session ordinal (30 min inactivity gap) — the assignment form
    * whose per-SESSION rollup is `q_window_session`; downstream
    * per-session features (position, dwell) join against this.
    * Scale shape: both windows share the `user_id` partitioning
    * (high-cardinality key, no skew concern), so the plan is ONE
    * exchange + one sort feeding lag and the running sum. */
  private val qSessionize = Q("q_sessionize",
    s"""WITH s AS (
       |  SELECT event_id, user_id, ts::TIMESTAMP AS tsu,
       |    CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id
       |                                   ORDER BY tsu, event_id)
       |              >= to_microseconds(${graft.streaming.StreamingSessionizer.GapMicros})
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events)
      |SELECT event_id, user_id,
      |  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |                      ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS sid
      |FROM s ORDER BY event_id""".stripMargin) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // µs precision on both sides: cast-to-long would truncate to
    // seconds and disagree with the oracle's interval compare on
    // sub-second gap edges. The gap constant is shared with the
    // streaming form so the spec-pinned equivalence can't drift; the
    // oracle renders it via to_microseconds so a non-whole-minute
    // tuning can never silently truncate on the SQL side.
    val brk = when(
      unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
        >= graft.streaming.StreamingSessionizer.GapMicros, 1L).otherwise(0L)
    t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("ts"), brk.as("brk"))
      .withColumn("sid",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0))
          + 1L)
      .select(col("event_id"), col("user_id"), col("sid"))
      .orderBy(col("event_id"))
  }

  /** Ordered conversion funnel signup → click → purchase: a user
    * counts toward a stage only if its events occur in causal order
    * (first click AT/after first signup, first purchase at/after that
    * click). Each stage is a filtered partial-agg per user plus an
    * equi-join on `user_id` — co-keyed shuffles end to end, nothing
    * broadcast-dependent, so the same plan holds when the user
    * dimension itself is huge. */
  private val qFunnel = Q("q_funnel",
    """WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS tsu FROM events),
      |s1 AS (SELECT user_id, min(tsu) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.tsu) AS t2 FROM e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.tsu >= s1.t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.tsu) AS t3 FROM e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.tsu >= s2.t2 GROUP BY e.user_id)
      |SELECT stage, n_users FROM (
      |  SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
      |  UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
      |  UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3)
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val e = t(s, d, "events").select(col("user_id"), col("event_type"), col("ts"))
    def firstAtOrAfter(types: String, prev: org.apache.spark.sql.DataFrame,
        prevCol: String, out: String) =
      e.where(col("event_type") === types)
        .join(prev, "user_id")
        .where(col("ts") >= col(prevCol))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as(out))
    val s1 = e.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = firstAtOrAfter("click", s1.select("user_id", "t1"), "t1", "t2")
    val s3 = firstAtOrAfter("purchase", s2.select("user_id", "t2"), "t2", "t3")
    def stage(df: org.apache.spark.sql.DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(s1, "1_signup").union(stage(s2, "2_click")).union(stage(s3, "3_purchase"))
      .orderBy(col("stage"))
  }

  /** Cohort retention: users grouped by first-active day, activity
    * counted per day offset — the (cohort × offset) distinct-user
    * matrix behind every retention curve. Spark plans the
    * count-distinct as the standard two-phase expand (partial agg on
    * (cohort, offset, user) first), so the exchange carries one row
    * per user-day, not per event; the cohort attachment is a co-keyed
    * `user_id` equi-join against a per-user aggregate. */
  private val qRetention = Q("q_retention",
    """WITH e AS (SELECT user_id, date_trunc('day', ts::TIMESTAMP) AS d
      |           FROM events),
      |c AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
      |SELECT c.cohort, CAST(date_diff('day', c.cohort, e.d) AS INT) AS day_offset,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
      |FROM e JOIN c ON e.user_id = c.user_id
      |GROUP BY c.cohort, day_offset
      |ORDER BY c.cohort, day_offset""".stripMargin) { (s, d) =>
    val e = t(s, d, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val c = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    e.join(c, "user_id")
      .groupBy(col("cohort"),
        datediff(col("d"), col("cohort")).cast("int").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** Traffic anomaly detection: hourly event-type counts z-scored
    * against their own trailing 24-hour window (≥ 12 observed hours),
    * |z| > 2.5 flagged — the alerting query a livestream dashboard
    * runs on the reference's feed (spike/outage detection).
    *
    * Determinism: the trailing mean and sample-stddev are derived
    * from EXACT integer window sums (Σn, Σn², k are all BIGINT —
    * counts, not floats), so both engines feed identical integers
    * through the identical double expression; the flag threshold
    * compares the same doubles and display rounds to 4 dp.
    *
    * Scale shape (100 TB): the only fact-sized exchange is the
    * hourly pre-aggregation (map-side combined to |types|·|hours|
    * rows); the trailing window runs per event_type over those tiny
    * per-type series — the skew-prone low-cardinality partition holds
    * hours, not events. */
  private val qAnomaly = Q("q_anomaly",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, h, n,
      |    CAST(count(*) OVER w AS BIGINT) AS k,
      |    CAST(sum(n) OVER w AS BIGINT) AS s,
      |    CAST(sum(n*n) OVER w AS BIGINT) AS sq
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY h
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |scored AS (
      |  SELECT event_type, h, n, k,
      |    CAST(s AS DOUBLE) / k AS mu,
      |    sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * s / k) / (k - 1)) AS sd
      |  FROM stats WHERE k >= 12)
      |SELECT event_type, h, n, round(mu, 4) AS mu,
      |  round((CAST(n AS DOUBLE) - mu) / sd, 4) AS z
      |FROM scored
      |WHERE sd > 0 AND abs((CAST(n AS DOUBLE) - mu) / sd) > 2.5
      |ORDER BY event_type, h""".stripMargin) { (s, d) =>
    val hourly = t(s, d, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-24, -1)
    val stats = hourly.select(col("event_type"), col("h"), col("n"),
      count(lit(1)).over(w).cast("long").as("k"),
      sum(col("n")).over(w).cast("long").as("s"),
      sum(col("n") * col("n")).over(w).cast("long").as("sq"))
    val mu = col("s").cast("double") / col("k")
    val sd = sqrt((col("sq").cast("double") - col("s").cast("double") * col("s") / col("k"))
      / (col("k") - 1))
    val z = (col("n").cast("double") - col("mu")) / col("sd")
    stats.where(col("k") >= 12)
      .select(col("event_type"), col("h"), col("n"), mu.as("mu"), sd.as("sd"))
      .where(col("sd") > 0 && abs(z) > 2.5)
      .select(col("event_type"), col("h"), col("n"),
        round(col("mu"), 4).as("mu"), round(z, 4).as("z"))
      .orderBy(col("event_type"), col("h"))
  }

  val all: Seq[Q] = Seq(qSessionize, qFunnel, qRetention, qAnomaly)
}
