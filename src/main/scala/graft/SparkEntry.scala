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

  /** All engine queries, grouped by module. */
  def all: Seq[Q] =
    Seq(Q("q_flagship", Flagship.oracle)((s, d) => Flagship(s, d))) ++
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
