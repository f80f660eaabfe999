package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filters.{BotPatterns, LogFilters}

/** Full-fidelity F8: the 173-pattern alternation
  * (`bot-patterns.txt:1-173`, compiled `access_log.clj:62-64`, applied
  * `access_log.clj:74-76`) as evaluated by the engine's MemoRLike.
  * Probe strings carry a `;` where needed so the generic
  * `^[\w\s...]+(/version)?$` catch-all pattern cannot mask the
  * lookaround pattern under test. */
class BotPatternsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def bot(uas: String*): Seq[Boolean] =
    uas.toDF("ua").select(LogFilters.isBot(col("ua"))).as[Boolean].collect().toSeq

  test("carries all 173 reference patterns, compiling as one alternation") {
    assert(BotPatterns.All.size == 173)
    // compiles under java.util.regex (lookbehind/lookahead included)
    java.util.regex.Pattern.compile(BotPatterns.Joined)
  }

  test("google guard: lookbehind and lookahead suppress app/channel/pixel") {
    assert(bot("x; google maps") == Seq(true))
    assert(bot("x; channel/google ua") == Seq(false)) // (?<!\schannel/)
    assert(bot("x; googleapp ua") == Seq(false))      // (?!app)
    assert(bot("x; google pixel") == Seq(false))      // (?!\spixel)
  }

  test("http guard: (?<!lib)http") {
    assert(bot("x; http ua") == Seq(true))
    assert(bot("x; libhttp ua") == Seq(false))
  }

  test("bot guard: (?<!\\scu)bots?(\\b|_)") {
    assert(bot("x; mybot ua") == Seq(true))
    assert(bot("somebot_x") == Seq(true))
    assert(bot("x; cubot ua") == Seq(false)) // the cubot phone, not a bot
  }

  test("news guard: (?:^|[^g])news(?!sapphire)") {
    assert(bot("x; newsreader ua") == Seq(true))
    assert(bot("x; newssapphire ua") == Seq(false))
    assert(bot("x; gnews ua") == Seq(false))
  }

  test("generic name/version UA pattern catches bare tool agents") {
    assert(bot("curl/8.4.0") == Seq(true))
    assert(bot("somelib/1.2.3") == Seq(true))
    assert(bot("Mozilla/5.0 (compatible)") == Seq(false)) // '(' blocks ^-anchored run before '/'
  }

  test("real-world UA classification (raw, case-sensitive as the reference)") {
    assert(bot(
      "Googlebot/2.1 (+http://www.google.com/bot.html)", // lowercase 'bot' suffix
      "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/120.0",
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1")
      == Seq(true, false, false))
  }

  test("full list and RE2-safe oracle subset agree on every synthesized UA") {
    // The flagship oracle runs LogFilters.BotPattern (RE2-safe) while
    // the engine runs the full 173-pattern list; the oracle stays
    // exact because the two agree on the synthesizer's UA domain
    // (Flagship.synthLog emits exactly these three).
    val synthUas = Seq(
      "Googlebot/2.1 (+http://www.google.com/bot.html)",
      "curl/8.4.0",
      "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/120.0")
    val full = bot(synthUas: _*)
    val subset = synthUas.toDF("ua")
      .select(col("ua").rlike(LogFilters.BotPattern)).as[Boolean].collect().toSeq
    assert(full == subset)
    assert(full == Seq(true, true, false))
  }
}
