package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filters.LogFilters._

class LogFiltersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def lemmas(uris: String*): Seq[String] =
    uris.toDF("uri")
      .select(pathSegments(col("uri")).as("segs"))
      .where(mainDictOnly(col("segs")))
      .select(lemmaOf(col("segs")))
      .as[String].collect().toSeq

  test("path split + decode: decode happens after split (F5)") {
    assert(lemmas("/wb/obskur") == Seq("obskur"))
    assert(lemmas("/wb/Bl%C3%A4tter") == Seq("Blätter"))
    // an encoded slash must NOT create a path segment
    assert(lemmas("/wb/a%2Fb") == Seq("a/b"))
    // query string and fragment never reach the lemma (reference
    // takes the parsed URI's :path)
    assert(lemmas("/wb/Haus?edited=1", "/wb/Baum#top") == Seq("Haus", "Baum"))
    // trailing slash is not an extra segment (clojure split semantics)
    assert(lemmas("/wb/Haus/") == Seq("Haus"))
    // '+' is a literal, not form-encoded space
    assert(lemmas("/wb/C%2B%2B", "/wb/a+b") == Seq("C++", "a+b"))
  }

  test("sub-dictionary pages and deep paths are dropped (F7)") {
    assert(lemmas("/wb/dwb", "/wb/wdg", "/wb/etymwb", "/wb/a/b").isEmpty)
    assert(lemmas("/wb/dwbx") == Seq("dwbx")) // prefix alone is fine
  }

  test("lemma validity (F6) and db width guard (F11)") {
    val df = Seq("", "[x", "ok", "a" * 127, "a" * 128).toDF("lemma")
    val kept = df.where(validLemma(col("lemma")) && fitsDb(col("lemma")))
      .as[String].collect().toSeq
    assert(kept == Seq("ok", "a" * 127))
  }

  test("bot filter applies the raw case-sensitive 173-pattern list (F8)") {
    // The reference compiles the lowercase patterns WITHOUT (?i) and
    // re-finds against the raw UA (`access_log.clj:62-64,74-76`).
    // "SCRAPY"/"Opera/9.80" still classify as bots via the generic
    // bare-tool-agent pattern (`^[\w\s...]+(/version)?$`), not via a
    // case-folded "scrapy" — real browser UAs carry ';' or ',' that
    // break that character class. Deeper lookaround coverage lives in
    // BotPatternsSpec.
    val bots = Seq("Googlebot/2.1", "curl/8.0", "SCRAPY", "my-CRAWLER 1.0", "Opera/9.80")
    val humans = Seq(
      "Mozilla/5.0 (X11; Linux) Firefox/120.0",
      "Opera/9.80 (Windows NT 6.1; WOW64) Presto/2.12.388 Version/12.16")
    val df = (bots ++ humans).toDF("ua")
    assert(df.where(isBot(col("ua"))).count() == bots.size)
    assert(df.where(!isBot(col("ua"))).count() == humans.size)
  }

  test("status filter compares the string form like the reference (F4)") {
    val kept = Seq("200", "404", "500", "201").toDF("status")
      .where(ok(col("status"))).count()
    assert(kept == 1)
  }
}
