package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's filter cascade re-expressed as composable Column
  * predicates (reference: `access_log.clj:62-93`, `collector.clj:87`,
  * `viz.cljs:24-27`).
  *
  * All predicates are stateless codegen'd expressions; Catalyst fuses
  * the whole cascade with the parse into one generated function, and
  * pushes what it can into the scan.
  */
object LogFilters {

  /** F4 — HTTP success only. The reference compares the *string*
    * `"200"` (`access_log.clj:83`); we keep that semantic. */
  def ok(status: Column): Column = status === "200"

  /** F5 — take the URI *path* (query/fragment stripped, as the
    * reference's URI parse does), strip the `/wb/` prefix, split on
    * `/` dropping trailing empty segments (clojure str/split
    * semantics), percent-decode each segment. Decode happens AFTER
    * the split — same order as the reference (`access_log.clj:84-86`)
    * — so an encoded `%2F` cannot create path segments; '+' is
    * protected (the reference decodes %XX only, not form encoding);
    * malformed escapes null out (F10) via try_url_decode. */
  def pathSegments(uri: Column): Column = {
    val path = regexp_replace(uri, "[?#].*", "")
    val rest = regexp_replace(substring(path, 5, Int.MaxValue), "/+$", "")
    transform(split(rest, "/"),
      s => try_url_decode(regexp_replace(s, "\\+", "%2B")))
  }

  /** Head of the decoded path = candidate lemma. */
  def lemmaOf(segments: Column): Column = element_at(segments, 1)

  /** F6 — lemma validity (`access_log.clj:66-68`). */
  def validLemma(lemma: Column): Column =
    length(lemma) > 0 && !startswith(lemma, lit("["))

  /** F7 — main dictionary only: exactly one path segment whose head is
    * not a sub-dictionary page (`access_log.clj:70-72`). */
  val SubDictionaries: Seq[String] =
    Seq("dwb", "dwb2", "etymwb", "wdg", "index", "Wörterbuch")

  def mainDictOnly(segments: Column): Column =
    size(segments) === 1 && !lemmaOf(segments).isin(SubDictionaries: _*)

  /** F8 — bot user-agent filter, full reference fidelity: all 173
    * patterns (lookarounds included) joined into one alternation and
    * matched unanchored against the raw user-agent, exactly as the
    * reference compiles and applies them (`bot-patterns.txt:1-173`,
    * `access_log.clj:62-64,74-76`). See [[BotPatterns]].
    *
    * The oracle twin CANNOT run this pattern (DuckDB's RE2 has no
    * lookaround), so oracle SQL uses the RE2-safe [[BotPattern]]
    * subset; BotPatternsSpec pins that both classifiers agree on
    * every user-agent the flagship synthesizer emits, which is what
    * keeps the flagship oracle exact. */
  val BotPattern: String =
    "(?i)(bot|crawler|crawling|spider|slurp|curl|wget|python-requests|" +
      "httpclient|okhttp|scrapy|archiver|indexer|fetcher|monitoring|" +
      "scanner|preview|headless|phantomjs|facebookexternalhit)"

  /** Per-task memoized match (graft.functions.GraftExpressions
    * .MemoRLike): user-agent cardinality is thousands against billions
    * of rows, so the 173-term alternation runs once per distinct value
    * per executor instead of once per row. Behavior ≡ `rlike`. */
  def isBot(userAgent: Column): Column =
    graft.functions.GraftExpressions.memo_rlike(userAgent, BotPatterns.Joined)

  /** F11 — sink column-width guard (`collector.clj:87`). */
  def fitsDb(lemma: Column): Column = length(lemma) < 128
}
