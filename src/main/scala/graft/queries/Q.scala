package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** One engine query: a Spark plan plus (usually) an ANSI-SQL twin the
  * driver runs in DuckDB over the same parquet tables.
  *
  * Conventions that keep the hash compare deterministic across both
  * engines (SURVEY.md §7.4):
  *  - every query ends in an explicit ORDER BY over a key prefix that
  *    makes equal-sort-key rows fully identical;
  *  - every output column is aliased identically on both sides;
  *  - double aggregations go through DECIMAL (exact, order-insensitive)
  *    or `round(…, 4)`; raw doubles only pass through untouched;
  *  - DuckDB-side quirks (NULLS FIRST, '' from regexp_extract misses,
  *    µs vs ns timestamps) are handled explicitly where they appear.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Q {
  /** Oracle-checked query. */
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), fn)

  /** Not SQL-expressible (or not portably) — driver does a weaker
    * rows-only check; correctness is covered by ScalaTest instead. */
  def sparkOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, None, fn)

  /** Shorthand table reader used inside query bodies. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)
}
