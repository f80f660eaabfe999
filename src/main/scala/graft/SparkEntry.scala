package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.Flagship
import graft.queries._

/** Driver contract — see SURVEY.md §7.
  *
  * Every operator class from the SURVEY.md §2 inventory (plus the
  * training-data extensions) is exposed as a named query over the
  * testdata tables, with a DuckDB-runnable ANSI-SQL twin where the
  * semantics are portably expressible.
  */
object SparkEntry {

  /** Hourly top-3 lemmata over the enriched flagship stream — the
    * dashboard aggregate a livestream deployment serves from the
    * pipeline's output (composite: full parse/filter/enrich cascade →
    * event-time bucketing → per-key shortlist).
    *
    * Skew shape at scale: `h` (hours) is low-cardinality, but the
    * `rn <= 3` filter makes Catalyst plan a two-stage shortlist —
    * `WindowGroupLimit(Partial)` trims every upstream partition to its
    * own per-hour top-3 BEFORE the `h`-exchange, so the skewed key
    * receives ≤ 3 × partitions rows, not the hour's full lemma set
    * (verified in PLANS.md). */
  private val flagshipHourlyTop = Q("q_flagship_hourly_top",
    s"""WITH f AS (${Flagship.oracle}),
       |c AS (SELECT date_trunc('hour', ts) AS h, lemma,
       |        CAST(count(*) AS BIGINT) AS n
       |      FROM f GROUP BY 1, 2),
       |r AS (SELECT h, lemma, n,
       |        row_number() OVER (PARTITION BY h ORDER BY n DESC, lemma) AS rn
       |      FROM c)
       |SELECT h, lemma, n, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= 3 ORDER BY h, rn""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("h")).orderBy(col("n").desc, col("lemma"))
    Flagship(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("lemma"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("h"), col("lemma"), col("n"), col("rn").cast("int").as("rn"))
      .orderBy(col("h"), col("rn"))
  }

  /** A1/`hidx` through the composite: the reference dimension carries
    * an optional homograph index; loading reduces homographs to the
    * FIRST one (min hidx, absent ≙ 0 — `wbdb.clj:17-28`) and the
    * collector persists the `lemma#hidx` key (`collector.clj:84`).
    * Here a homograph dimension is synthesized from `events` so BOTH
    * tie-break paths are oracle-checked: non-`error` lemmata include a
    * null-hidx record (wins as 0 → bare `lemma` key), `error` carries
    * only indexed homographs (min hidx wins → `lemma#hidx` key). */
  private val flagshipHidx = Q("q_flagship_hidx",
    s"""WITH f AS (${Flagship.oracle}),
       |hraw AS (
       |  SELECT event_type AS lemma,
       |         CASE WHEN event_id % 3 = 0 AND event_type <> 'error' THEN NULL
       |              ELSE CAST(event_id % 3 + 1 AS INT) END AS hidx,
       |         CAST(count(*) AS BIGINT) AS hfreq
       |  FROM events GROUP BY 1, 2),
       |hdim AS (
       |  SELECT lemma, hidx, hfreq FROM hraw
       |  QUALIFY row_number() OVER (PARTITION BY lemma ORDER BY coalesce(hidx, 0)) = 1)
       |SELECT CASE WHEN d.hidx IS NOT NULL
       |            THEN w.lemma || '#' || CAST(d.hidx AS VARCHAR)
       |            ELSE w.lemma END AS lemma_key,
       |       w.ts, d.hidx, d.hfreq
       |FROM (SELECT lemma, ts FROM f) w LEFT JOIN hdim d USING (lemma)
       |ORDER BY lemma_key, ts""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.functions._
    val events = Tables(s, d, "events")
    val hidx = when(pmod(col("event_id"), lit(3)) === 0 && col("event_type") =!= "error",
      lit(null).cast("int"))
      .otherwise((pmod(col("event_id"), lit(3)) + 1).cast("int"))
    val raw = events
      .groupBy(col("event_type").as("lemma"), hidx.as("hidx"))
      .agg(count(lit(1)).cast("long").as("hfreq"))
    val dim = graft.dim.Dimension.dedupBy(raw, "lemma", "hidx")
    val requests = Flagship.logToRequests(Flagship.synthLog(events))
    val key = when(col("hidx").isNotNull,
      concat(col("lemma"), lit("#"), col("hidx").cast("string")))
      .otherwise(col("lemma"))
    requests.join(broadcast(dim), Seq("lemma"), "left_outer")
      .select(key.as("lemma_key"), col("ts"), col("hidx"), col("hfreq"))
      .orderBy(col("lemma_key"), col("ts"))
  }

  /** All engine queries, grouped by module. */
  def all: Seq[Q] =
    Seq(Q("q_flagship", Flagship.oracle)((s, d) => Flagship(s, d)),
      flagshipHourlyTop, flagshipHidx) ++
      RelationalQueries.all ++
      ExtendedQueries.all ++
      TpchQueries.all ++
      SketchQueries.all ++
      StatsQueries.all ++
      TimeQueries.all ++
      TextQueries.all ++
      DedupQueries.all ++
      SimilarityQueries.all ++
      MultimodalQueries.all ++
      PipelineQueries.all ++
      MaintenanceQueries.all ++
      EntityQueries.all ++
      GraphQueries.all ++
      ItemsetQueries.all ++
      EventQueries.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, Some(sql), _) => n -> sql }.toMap
}
