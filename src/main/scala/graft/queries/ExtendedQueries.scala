package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q.t

/** Capability extensions beyond the reference's inventory — operator
  * classes a training-data engine needs that SURVEY.md §2 marks
  * absent: as-of join, range-predicate join, UDTF-style explode,
  * pivot.
  */
object ExtendedQueries {

  /** As-of join, carry-forward formulation: each event is matched to
    * the most recent 'signup' event of the same user at or before its
    * time. The naive formulation is an inequality self-join (quadratic
    * per user); the scalable one is a single window sort per key —
    * `last(_, ignoreNulls)` over an unbounded-preceding frame — which
    * shuffles each key group once. This is the join shape used to
    * attach "latest label/model version as of sample time" in
    * training pipelines. (DuckDB's native ASOF JOIN would be the
    * oracle shortcut; the window form is portable to both engines and
    * is what we ship.) */
  private val qAsof = Q("q_join_asof",
    """WITH w AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS tsu, event_type,
      |    last_value(CASE WHEN event_type = 'signup' THEN ts::TIMESTAMP END
      |               IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      |            ROWS UNBOUNDED PRECEDING) AS last_signup
      |  FROM events)
      |SELECT event_id, user_id, last_signup FROM w
      |WHERE event_type <> 'signup'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    t(s, d, "events")
      .withColumn("last_signup",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("last_signup"))
      .orderBy(col("event_id"))
  }

  /** Equi + range-predicate join: the range condition rides along the
    * equi-key hash join as a post-probe filter — no theta-join
    * explosion. */
  private val qRange = Q("q_join_range",
    """SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
      |FROM lineitem l JOIN orders o
      |  ON l.l_orderkey = o.o_orderkey
      | AND l.l_shipdate > o.o_orderdate
      | AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
      |ORDER BY l.l_orderkey, l.l_linenumber, l.l_shipdate""".stripMargin) { (s, d) =>
    val l = t(s, d, "lineitem")
    val o = t(s, d, "orders")
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderdate"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
  }

  /** UDTF-class operator: explode tokens → global word frequency.
    * Map-side partial aggregation means the shuffle carries one row
    * per distinct word per partition, not one per token. */
  private val qWordCount = Q("q_word_count",
    """SELECT w AS word, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |GROUP BY w ORDER BY n DESC, word LIMIT 20""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  /** Pivot: event counts per day × type. Explicit value list keeps the
    * output schema static (required for both Catalyst planning at
    * scale and oracle column matching). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val qPivot = Q("q_pivot",
    s"""SELECT date_trunc('day', ts::TIMESTAMP) AS day,
       |${EventTypes.map(t =>
          s"  CAST(count(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS $t")
          .mkString(",\n")}
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy(col("day"))
  }

  val all: Seq[Q] = Seq(qAsof, qRange, qWordCount, qPivot)
}
