package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.queries.Q.t

/** Training-data text analysis over the `documents` table: language
  * ID (word-gram marker heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex classes), document fingerprinting.
  *
  * All pure per-row column expressions — at 100 TB these fuse into the
  * scan stage with zero shuffles (the final orderBy exists only for
  * oracle hashing).
  */
object TextQueries {

  private def words(c: Column): Column = split(lower(c), " ")

  private def countIn(ws: Column, set: Seq[String]): Column =
    size(filter(ws, w => w.isin(set.map(lit(_)): _*)))

  private val EnMarkers = Seq("the", "a", "of", "and")
  private val DeMarkers = Seq("der", "die", "das", "und")

  private val qLangid = Q("q_text_langid",
    """WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws
      |           FROM documents)
      |SELECT doc_id, lang,
      |  CAST(len(list_filter(ws, x -> x IN ('the','a','of','and'))) AS INT) AS en_score,
      |  CAST(len(list_filter(ws, x -> x IN ('der','die','das','und'))) AS INT) AS de_score,
      |  CASE WHEN len(list_filter(ws, x -> x IN ('der','die','das','und')))
      |            > len(list_filter(ws, x -> x IN ('the','a','of','and'))) THEN 'de'
      |       WHEN len(list_filter(ws, x -> x IN ('the','a','of','and'))) > 0 THEN 'en'
      |       ELSE 'und' END AS predicted
      |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ws = words(col("text"))
    val en = countIn(ws, EnMarkers)
    val de = countIn(ws, DeMarkers)
    t(s, d, "documents").select(
      col("doc_id"), col("lang"),
      en.as("en_score"), de.as("de_score"),
      when(de > en, "de").when(en > 0, "en").otherwise("und").as("predicted"))
      .orderBy(col("doc_id"))
  }

  private val qQuality = Q("q_text_quality",
    """WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws
      |           FROM documents)
      |SELECT doc_id,
      |  CAST(len(ws) AS INT) AS n_words,
      |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |        / CAST(len(ws) AS DOUBLE), 4) AS avg_word_len,
      |  round(CAST(len(list_filter(ws, x -> x IN ('the','a','of','and')))
      |             AS DOUBLE) / CAST(len(ws) AS DOUBLE), 4) AS stop_ratio,
      |  CASE WHEN len(ws) BETWEEN 20 AND 500
      |        AND len(list_filter(ws, x -> x IN ('the','a','of','and'))) > 0
      |       THEN 'good' ELSE 'poor' END AS quality
      |FROM w ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ws = words(col("text"))
    val nw = size(ws)
    val stops = countIn(ws, EnMarkers)
    t(s, d, "documents").select(
      col("doc_id"),
      nw.as("n_words"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double")
        / nw.cast("double"), 4).as("avg_word_len"),
      round(stops.cast("double") / nw.cast("double"), 4).as("stop_ratio"),
      when(nw.between(20, 500) && stops > 0, "good").otherwise("poor").as("quality"))
      .orderBy(col("doc_id"))
  }

  private val qTokens = Q("q_text_tokens",
    """SELECT doc_id,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT)
      |    AS re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Portable fingerprint: md5 over whitespace-normalized text — the
    * exact-dedup key that survives reformatting. */
  private val qFingerprint = Q("q_text_fingerprint",
    """SELECT doc_id,
      |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** Unicode cleaning: NFC canonicalization + accent stripping over a
    * text sample with genuine combining characters (the corpus is
    * ASCII, so an accented suffix is appended to exercise the
    * semantics on every row). */
  private val qNormalize = Q("q_text_normalize",
    """SELECT doc_id,
      |  nfc_normalize(substr(text, 1, 20) || ' Ba' || chr(776) || 'ume') AS norm,
      |  strip_accents(substr(text, 1, 20) || ' Bäume café') AS plain
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.functions.GraftExpressions.{nfc_normalize, strip_accents}
    t(s, d, "documents").select(
      col("doc_id"),
      nfc_normalize(concat(substring(col("text"), 1, 20),
        lit(" Bäume"))).as("norm"),
      strip_accents(concat(substring(col("text"), 1, 20),
        lit(" Bäume café"))).as("plain"))
      .orderBy(col("doc_id"))
  }

  /** Language-model-style n-gram frequency table: top bigrams with
    * counts and corpus share. Shuffle shape at 100 TB: the bigram
    * string never leaves the scan stage un-aggregated — explode feeds
    * a map-side partial count, and only (bigram, partial_n) pairs hit
    * the exchange. Top-k is TakeOrdered, not a full sort. */
  private val qBigrams = Q("q_text_bigrams",
    """WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
      |b AS (SELECT unnest(CASE WHEN len(ws) >= 2
      |        THEN list_transform(generate_series(1, len(ws) - 1),
      |             i -> ws[i] || ' ' || ws[i+1])
      |        ELSE [] END) AS bigram
      |      FROM w),
      |c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bigram),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
      |SELECT bigram, n, CAST(n AS DOUBLE) / total AS share
      |FROM c CROSS JOIN t
      |ORDER BY n DESC, bigram LIMIT 25""".stripMargin) { (s, d) =>
    val bigrams = t(s, d, "documents")
      .select(explode(graft.functions.GraftExpressions.shingles(
        lower(col("text")), 2, dedup = false)).as("bigram"))
    // materialize the (vocabulary-sized) count table once — total is
    // derived from it AND it feeds the crossJoin, so without the
    // checkpoint the corpus scan + explode + groupBy would run twice
    val counts = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val total = counts.agg(sum(col("n")).cast("long").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("bigram"), col("n"),
        (col("n").cast("double") / col("total")).as("share"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(25)
  }

  val all: Seq[Q] = Seq(qLangid, qQuality, qTokens, qFingerprint, qNormalize,
    qBigrams)
}
