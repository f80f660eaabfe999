package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Q.t

/** SURVEY.md §2.3–§2.9 — filters, projections, scalar functions,
  * joins, aggregations, window functions, sorts/limits/sets — each as
  * an oracle-checked query over the testdata tables.
  *
  * Scale notes: every aggregation here is a hash-agg with map-side
  * partial aggregation; joins on (possibly large) fact tables use the
  * shuffle hash/sort-merge path keyed on the join column, while
  * genuinely small build sides are explicitly `broadcast(...)`.
  * Double-typed aggregates go through DECIMAL so results are exact and
  * partition-order-insensitive (float sums are not associative —
  * SURVEY.md §7.4).
  */
object RelationalQueries {

  private val dec = DecimalType(18, 4)

  // ---------------------------------------------------------------- filters

  private val qFilterLike = Q("q_filter_like",
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE contains(text, 'spark') AND NOT contains(text, 'window')
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .where(col("text").contains("spark") && !col("text").contains("window"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val qRegexExtract = Q("q_regex_extract",
    """SELECT event_id,
      |  CAST(nullif(regexp_extract(props, '"k": (\d+)', 1), '') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val x = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
    t(s, d, "events")
      .select(col("event_id"), when(x =!= "", x).cast("int").as("k"))
      .orderBy(col("event_id"))
  }

  private val qTsParse = Q("q_ts_parse",
    """SELECT event_id,
      |  strptime(strftime(ts::TIMESTAMP, '%d/%b/%Y:%H:%M:%S +0000'),
      |           '%d/%b/%Y:%H:%M:%S %z')::TIMESTAMP AS ts_parsed
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .select(col("event_id"),
        to_timestamp(
          concat(date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000")),
          "dd/MMM/yyyy:HH:mm:ss Z").as("ts_parsed"))
      .orderBy(col("event_id"))
  }

  private val qFilterEq = Q("q_filter_eq",
    """SELECT event_id, event_type, value FROM events
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  private val qSplitDecode = Q("q_split_decode",
    // Spark decodes a %-escaped string built from a sanitized token
    // (sanitizing keeps the decode total even if future data carries
    // '%'/'+' in tokens); the oracle mirrors with literal replaces
    // since DuckDB 1.0 has no url_decode.
    """SELECT doc_id, string_split(text, ' ')[1] AS head,
      |  'w ' || regexp_replace(string_split(text, ' ')[1], '[^a-zA-Z0-9]', '', 'g')
      |       || 'ä' AS decoded
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val head = element_at(split(col("text"), " "), 1)
    val safe = regexp_replace(head, "[^a-zA-Z0-9]", "")
    t(s, d, "documents")
      .select(col("doc_id"), head.as("head"),
        url_decode(concat(lit("w%20"), safe, lit("%C3%A4"))).as("decoded"))
      .orderBy(col("doc_id"))
  }

  private val qFilterPrefix = Q("q_filter_prefix",
    """SELECT doc_id, string_split(text, ' ')[1] AS head FROM documents
      |WHERE starts_with(string_split(text, ' ')[1], 's')
      |  AND NOT starts_with(text, '[')
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val head = element_at(split(col("text"), " "), 1)
    t(s, d, "documents")
      .where(startswith(head, lit("s")) && !startswith(col("text"), lit("[")))
      .select(col("doc_id"), head.as("head"))
      .orderBy(col("doc_id"))
  }

  private val qFilterIsin = Q("q_filter_isin",
    """SELECT event_id, event_type FROM events
      |WHERE event_type IN ('view', 'click') ORDER BY event_id""".stripMargin) { (s, d) =>
    t(s, d, "events")
      .where(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  private val qFilterRlike = Q("q_filter_rlike",
    """SELECT doc_id FROM documents
      |WHERE regexp_matches(text, '(^| )(spark|hash)( |$)')
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .where(col("text").rlike("(^| )(spark|hash)( |$)"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  private val qMalformedDrop = Q("q_malformed_drop",
    """WITH e AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 7 = 0 THEN 'not json' ELSE props END AS s
      |  FROM events)
      |SELECT event_id,
      |  CAST(nullif(regexp_extract(s, '"k": (\d+)', 1), '') AS INT) AS k
      |FROM e
      |WHERE nullif(regexp_extract(s, '"k": (\d+)', 1), '') IS NOT NULL
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val raw = when(pmod(col("event_id"), lit(7)) === 0, lit("not json"))
      .otherwise(col("props"))
    val x = regexp_extract(raw, "\"k\": (\\d+)", 1)
    val k = when(x =!= "", x).cast("int")
    t(s, d, "events")
      .select(col("event_id"), k.as("k"))
      .where(col("k").isNotNull)
      .orderBy(col("event_id"))
  }

  private val qFilterLen = Q("q_filter_len",
    """SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS len
      |FROM documents WHERE length(text) < 256 ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .where(length(col("text")) < 256)
      .select(col("doc_id"), col("n_chars"), length(col("text")).cast("long").as("len"))
      .orderBy(col("doc_id"))
  }

  private val qFilterNotnull = Q("q_filter_notnull",
    """SELECT o.o_orderkey, c.c_name
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
      |  ON o.o_custkey = c.c_custkey
      |WHERE c.c_name IS NOT NULL
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer").where(col("c_acctbal") > 0)
    t(s, d, "orders")
      .join(c, col("o_custkey") === col("c_custkey"), "left_outer")
      .where(col("c_name").isNotNull)
      .select(col("o_orderkey"), col("c_name"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------------------- scalar suites

  private val qStringTrunc = Q("q_string_trunc",
    """SELECT doc_id,
      |  CASE WHEN length(text) > 25 THEN substr(text, 1, 25) || '…'
      |       ELSE text END AS t
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents")
      .select(col("doc_id"),
        when(length(col("text")) > 25,
          concat(substring(col("text"), 1, 25), lit("…")))
          .otherwise(col("text")).as("t"))
      .orderBy(col("doc_id"))
  }

  private val qStringFuncs = Q("q_string_funcs",
    """SELECT doc_id, lower(source) AS lo, upper(lang) AS up,
      |  trim(' ' || source || ' ') AS tr,
      |  CAST(length(text) AS BIGINT) AS len, substr(text, 1, 10) AS sub,
      |  replace(source, 'src', 's_') AS rep,
      |  concat_ws('|', lang, source) AS cw, lpad(lang, 5, '_') AS lp,
      |  reverse(lang) AS rev
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    t(s, d, "documents").select(
      col("doc_id"),
      lower(col("source")).as("lo"),
      upper(col("lang")).as("up"),
      trim(concat(lit(" "), col("source"), lit(" "))).as("tr"),
      length(col("text")).cast("long").as("len"),
      substring(col("text"), 1, 10).as("sub"),
      regexp_replace(col("source"), "src", "s_").as("rep"),
      concat_ws("|", col("lang"), col("source")).as("cw"),
      lpad(col("lang"), 5, "_").as("lp"),
      reverse(col("lang")).as("rev"))
      .orderBy(col("doc_id"))
  }

  private val qDateFuncs = Q("q_date_funcs",
    """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dd,
      |  date_trunc('month', o_orderdate) AS mo,
      |  o_orderdate::DATE::TIMESTAMP AS dt,
      |  o_orderdate + INTERVAL 30 DAY AS plus30,
      |  strftime(o_orderdate, '%Y-%m-%d') AS fmt
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"),
      date_trunc("month", col("o_orderdate")).as("mo"),
      // DATE::TIMESTAMP on both sides: a bare DATE renders as
      // '1998-10-03' from Spark parquet but '1998-10-03 00:00:00' from
      // DuckDB fetchdf — same value, different repr, hash risk.
      to_date(col("o_orderdate")).cast("timestamp").as("dt"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"))
      .orderBy(col("o_orderkey"))
  }

  private val qMathFuncs = Q("q_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  round(sqrt(l_extendedprice), 4) AS sq,
      |  round(abs(l_discount - 0.05), 4) AS ab,
      |  least(l_quantity, 25.0) AS le, greatest(l_tax, 0.04) AS gr,
      |  CAST(l_partkey % 7 AS BIGINT) AS md,
      |  round(ln(l_extendedprice + 1), 4) AS lg,
      |  CAST(floor(l_quantity) AS BIGINT) AS fl
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(sqrt(col("l_extendedprice")), 4).as("sq"),
      round(abs(col("l_discount") - 0.05), 4).as("ab"),
      least(col("l_quantity"), lit(25.0)).as("le"),
      greatest(col("l_tax"), lit(0.04)).as("gr"),
      pmod(col("l_partkey"), lit(7)).cast("long").as("md"),
      round(log(col("l_extendedprice") + 1), 4).as("lg"),
      floor(col("l_quantity")).cast("long").as("fl"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val qCondCoalesce = Q("q_cond_coalesce",
    """SELECT event_id,
      |  CASE WHEN value > 100 THEN 'high' WHEN value > 50 THEN 'mid'
      |       ELSE 'low' END AS bucket,
      |  coalesce(nullif(event_type, 'error'), 'unknown') AS et
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    t(s, d, "events").select(
      col("event_id"),
      when(col("value") > 100, "high").when(col("value") > 50, "mid")
        .otherwise("low").as("bucket"),
      coalesce(nullif(col("event_type"), lit("error")), lit("unknown")).as("et"))
      .orderBy(col("event_id"))
  }

  private val qToJson = Q("q_to_json",
    """SELECT event_id,
      |  to_json(struct_pack(event_id := event_id, event_type := event_type)) AS j
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    t(s, d, "events").select(
      col("event_id"),
      to_json(struct(col("event_id"), col("event_type"))).as("j"))
      .orderBy(col("event_id"))
  }

  private val qFromJson = Q("q_from_json",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    t(s, d, "events").select(
      col("event_id"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"))
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------------------ joins

  private val qJoinLeft = Q("q_join_left",
    """SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "left_outer")
      .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("o_orderkey"))
  }

  private val qJoinBroadcast = Q("q_join_broadcast",
    """SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_brand
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, d) =>
    // No forced hint: part is SF-proportional (SF * 200k rows), so the
    // broadcast is AQE's size-based choice — it picks broadcast-hash
    // at every tested SF and degrades to a shuffled join past the
    // threshold instead of OOMing at 1000x.
    t(s, d, "lineitem")
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"), col("p_brand"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val qDimJoin = Q("q_dim_join",
    """SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy(col("c_custkey"))
  }

  private val qJoinSemi = Q("q_join_semi",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val qJoinAnti = Q("q_join_anti",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Full-outer: every supplier and every customer nation-bucketed
    * aggregate survives, matched or not — the join type where both
    * sides can null out. Aggregated first so both inputs are small
    * keyed tables (a raw full-outer of two fact tables is the
    * anti-pattern; at scale you full-outer RESULTS, not facts). */
  private val qJoinFull = Q("q_join_full",
    """WITH c AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust
      |           FROM customer GROUP BY 1),
      |s AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp
      |      FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |ORDER BY nk""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = t(s, d, "supplier").groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("nk") === col("snk"), "full_outer")
      .select(coalesce(col("nk"), col("snk")).as("nk"),
        col("n_cust"), col("n_supp"))
      .orderBy(col("nk"))
  }

  /** Skew-resistant salted join (graft.operators.SkewJoin) — the
    * oracle is the PLAIN join: salting must be a pure physical
    * rewrite with identical results. */
  private val qJoinSalted = Q("q_join_salted",
    """SELECT o.o_orderkey, c.c_name
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    val customer = t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey")
    graft.operators.SkewJoin.salted(t(s, d, "orders"), customer, "o_custkey", salt = 8)
      .select(col("o_orderkey"), col("c_name"))
      .orderBy(col("o_orderkey"))
  }

  // ----------------------------------------------------------- aggregations

  private val qAgg = Q("q_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(l_quantity) AS min_qty, max(l_tax) AS max_tax
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_tax")).as("max_tax"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val qArgminGroup = Q("q_argmin_group",
    // l_linenumber is NOT unique within an order in the testdata, so
    // the argmin is made total in two exact stages: min/max partkey
    // per (order, linenumber), then argmin/argmax over the now-unique
    // linenumber. True lexicographic (linenumber, partkey) order —
    // no arithmetic key folding, which would overflow its digit
    // budget once partkeys reach 1e8 at large scale factors.
    """WITH m AS (
      |  SELECT l_orderkey, l_linenumber,
      |    min(l_partkey) AS pmin, max(l_partkey) AS pmax,
      |    count(*) AS c
      |  FROM lineitem GROUP BY l_orderkey, l_linenumber)
      |SELECT l_orderkey,
      |  min_by(pmin, l_linenumber) AS first_part,
      |  max_by(pmax, l_linenumber) AS last_part,
      |  CAST(sum(c) AS BIGINT) AS n
      |FROM m GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
        count(lit(1)).as("c"))
      .groupBy(col("l_orderkey"))
      .agg(
        min_by(col("pmin"), col("l_linenumber")).as("first_part"),
        max_by(col("pmax"), col("l_linenumber")).as("last_part"),
        sum(col("c")).cast("long").as("n"))
      .orderBy(col("l_orderkey"))
  }

  private val qCount = Q("q_count",
    "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem") { (s, d) =>
    t(s, d, "lineitem").agg(count(lit(1)).as("n"))
  }

  private val qCountDistinct = Q("q_count_distinct",
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS dp,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ds,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("dp"),
        countDistinct(col("l_suppkey")).as("ds"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val qRollup = Q("q_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  private val qCube = Q("q_cube",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** HLL sketch, oracle-checked via its GUARANTEE: the raw estimate
    * is engine-specific bits (DuckDB's HLL would hash differently),
    * but the exact distinct count and the estimate's ±5%-rsd bound
    * are not — so the query emits the exact count plus the
    * Spark-computed `hll_ok` verdict, and the DuckDB twin recomputes
    * the exact count and asserts the bound as the literal it must be.
    * The raw estimate itself stays spec-pinned (ExpressionsSpec). */
  private val qApproxDistinct = Q("q_approx_count_distinct",
    """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
      |  true AS hll_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_exact"),
        approx_count_distinct(col("l_partkey")).as("approx_dp"))
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("approx_dp") - col("n_exact")).cast("double")
          <= lit(0.05) * col("n_exact").cast("double")).as("hll_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Median — the one portable quantile: both engines average the two
    * middle values at p=0.5 (higher quantiles interpolate differently
    * between Spark's percentile and DuckDB's quantile_cont, verified
    * 7.4 vs 7.3 on the same input, so they are NOT oracle-pairable). */
  private val qMedian = Q("q_median",
    """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS med
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(percentile(col("l_quantity"), lit(0.5)), 4).as("med"))
      .orderBy(col("l_returnflag"))
  }

  /** Moment statistics via exact decimal sums: built-in stddev_samp
    * accumulates in streaming float (Welford) whose result depends on
    * partition order; summing x and x² as DECIMAL is exact and
    * order-free, then one identical double formula on both engines
    * gives bit-equal variance/stddev. */
  private val qStatsAgg = Q("q_stats_agg",
    """WITH s AS (
      |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS s2
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round(s1 / n, 4) AS mean,
      |  round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS sd
      |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val agged = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("s1"),
        sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(24, 4)))
          .cast("double").as("s2"))
    agged.select(col("l_returnflag"), col("n"),
      round(col("s1") / col("n"), 4).as("mean"),
      round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 4)
        .as("sd"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- windows

  private val wCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  private val qWindowRownum = Q("q_window_rownum",
    """SELECT o_orderkey, o_custkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey
      |       ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(wCust).as("rn"))
      .orderBy(col("o_orderkey"))
  }

  private val qWindowLag = Q("q_window_lag",
    """SELECT o_orderkey,
      |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev,
      |  lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS nxt
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(wCust).as("prev"),
        lead(col("o_totalprice"), 1).over(wCust).as("nxt"))
      .orderBy(col("o_orderkey"))
  }

  private val qWindowFrame = Q("q_window_frame",
    """SELECT o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"),
        sum(col("o_totalprice").cast(dec))
          .over(wCust.rowsBetween(-2, 0)).cast("double").as("run"))
      .orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------- sort/limit/union

  private val qSort = Q("q_sort",
    """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  private val qTopk = Q("q_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    // orderBy+limit plans as TakeOrderedAndProject — O(k) memory per
    // partition, no global sort at scale.
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  private val qLimit = Q("q_limit",
    """SELECT o_orderkey, o_orderstatus FROM orders
      |ORDER BY o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
      .limit(100)
  }

  private val qUnion = Q("q_union",
    """SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
      |UNION ALL
      |SELECT event_id, event_type, value FROM events WHERE event_type = 'view'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val e = t(s, d, "events").select(col("event_id"), col("event_type"), col("value"))
    e.where(col("event_type") === "click")
      .union(e.where(col("event_type") === "view"))
      .orderBy(col("event_id"))
  }

  val all: Seq[Q] = Seq(
    qFilterLike, qRegexExtract, qTsParse, qFilterEq, qSplitDecode,
    qFilterPrefix, qFilterIsin, qFilterRlike, qMalformedDrop, qFilterLen,
    qFilterNotnull, qStringTrunc, qStringFuncs, qDateFuncs, qMathFuncs,
    qCondCoalesce, qToJson, qFromJson,
    qJoinLeft, qJoinBroadcast, qDimJoin, qJoinSemi, qJoinAnti, qJoinFull,
    qJoinSalted,
    qAgg, qArgminGroup, qCount, qCountDistinct, qRollup, qCube, qApproxDistinct,
    qMedian, qStatsAgg,
    qWindowRownum, qWindowLag, qWindowFrame,
    qSort, qTopk, qLimit, qUnion)
}
