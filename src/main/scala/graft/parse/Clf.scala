package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Apache combined-log-format parsing as pure Catalyst column
  * expressions.
  *
  * Reference behavior: `access_log.clj:33-60` (one regex with capture
  * groups → field record), `access_log.clj:49-54` (CLF timestamp with
  * zone offset → UTC instant), `access_log.clj:80,92-93` (any parse
  * failure drops the row, never fails the stream).
  *
  * Spark-first design: each field is a `regexp_extract` over a shared
  * literal pattern — Catalyst common-subexpression elimination keeps a
  * single compiled matcher per generated stage, and the whole parse
  * fuses with up/downstream filters into one WholeStageCodegen span.
  * Non-matching lines yield null fields (PERMISSIVE semantics), so
  * F10 error tolerance is a final `isNotNull` filter, not a try/catch.
  */
object Clf {

  /** Combined log format, RE2-safe (no lookaround) so the DuckDB
    * oracle can run the *identical* pattern. ident/user/protocol are
    * non-capturing (DuckDB regexp_extract only addresses groups 0–9).
    * Groups: 1 ip, 2 timestamp, 3 method, 4 uri, 5 status, 6 size,
    * 7 referrer, 8 user agent. */
  val Pattern: String =
    "^(\\S+) (?:\\S+) (?:\\S+) \\[([^\\]]+)\\] \"(\\w+) (\\S+) (?:[^\"]*)\" (\\d{3}) (\\d+|-) \"([^\"]*)\" \"([^\"]*)\"$"

  /** CLF timestamp layout, e.g. `08/Dec/2024:23:00:18 +0100`. */
  val TsFormat: String = "dd/MMM/yyyy:HH:mm:ss Z"

  /** F1 — cheap substring prefilter, applied BEFORE any regex work
    * (reference: `access_log.clj:16-31,81,113`). Catalyst keeps the
    * authored cheap-first conjunct order, so this short-circuits the
    * expensive parse for the ~99% of lines that are not dictionary
    * page views. */
  def prefilter(line: Column): Column =
    line.contains("GET /wb/") && !line.contains("GET /wb/typeahead")

  /** F2 + F3 — project a line column into the 9-field access-log
    * schema (SURVEY.md §1.2a). One regex match per line via the
    * native [[graft.functions.GraftExpressions.ClfParse]] expression
    * (8 separate `regexp_extract`s would re-match the pattern per
    * field); a non-matching line yields a null struct → null fields,
    * preserving F10 drop semantics. */
  def parse(df: DataFrame, lineCol: String = "line"): DataFrame =
    df.select(graft.functions.GraftExpressions.clf_parse(col(lineCol)).as("_p"))
      .select(
        col("_p.ip").as("ip"),
        // try_* variants: under Spark 4's default ANSI mode the plain
        // forms THROW on a malformed timestamp or a '-' size, killing
        // the job — F10 demands such rows null out and drop instead.
        try_to_timestamp(col("_p.ts_raw"), lit(TsFormat)).as("ts"),
        col("_p.method").as("method"),
        col("_p.uri").as("uri"),
        col("_p.status").as("status"),
        expr("try_cast(_p.size_raw AS BIGINT)").as("size"),
        col("_p.referrer").as("referrer"),
        col("_p.user_agent").as("user_agent"))
}
