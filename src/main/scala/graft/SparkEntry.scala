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

  /** All engine queries, grouped by module. */
  def all: Seq[Q] =
    Seq(Q("q_flagship", Flagship.oracle)((s, d) => Flagship(s, d)),
      flagshipHourlyTop) ++
      RelationalQueries.all ++
      ExtendedQueries.all ++
      TpchQueries.all ++
      SketchQueries.all ++
      StatsQueries.all ++
      TimeQueries.all ++
      TextQueries.all ++
      DedupQueries.all ++
      SimilarityQueries.all ++
      MultimodalQueries.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, Some(sql), _) => n -> sql }.toMap
}
