package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.PortableHash
import graft.queries.Q.t
import graft.Fence.FenceOps

/** Statistical analytics beyond the basic moment aggregates
  * (q_stats_agg): exact rank-selected quantiles, correlation /
  * covariance from exact decimal moments, and histogram binning.
  *
  * The portability rule throughout (see q_median's caveat): engines
  * interpolate percentiles differently, so the only cross-engine-exact
  * quantile is RANK SELECTION — pick the value at position
  * ceil(p·n) of the sorted group, no interpolation. Likewise corr/cov
  * are never computed by the engines' float accumulators (order-
  * dependent); they are derived from exact decimal sums in one
  * identically-ordered double expression on both sides.
  */
object StatsQueries {

  /** Exact p25/p50/p75 per group by rank selection. Scale note: the
    * window partitions by the 3-value group key; at 100 TB this uses
    * the same salted two-stage top-k as q_sketch_kmv (values ≤ the
    * per-salt p75 rank survive stage 1) — the single-window form here
    * is the declarative statement of the semantics. */
  private val qQuantile = Q("q_quantile_exact",
    """WITH r AS (
      |  SELECT l_returnflag, l_quantity,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag,
      |  min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN l_quantity END) AS p25,
      |  min(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN l_quantity END) AS p50,
      |  min(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN l_quantity END) AS p75
      |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val wn = Window.partitionBy(col("l_returnflag"))
    def sel(p: Double) =
      min(when(col("rn") === ceil(lit(p) * col("n")).cast("long"), col("l_quantity")))
    t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        row_number().over(w).as("rn"), count(lit(1)).over(wn).as("n"))
      .groupBy(col("l_returnflag"))
      .agg(sel(0.25).as("p25"), sel(0.50).as("p50"), sel(0.75).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  /** Pearson correlation + population covariance of (quantity, price)
    * per group, from exact decimal sums — the engines' own corr/covar
    * accumulate doubles in partition order (nondeterministic across
    * runs, let alone engines). n·Σxy − Σx·Σy etc. are evaluated in
    * ONE identically-ordered double expression on both sides. The
    * squared-price sums carry unscaled decimal values past 2^53, where
    * the decimal→double cast itself double-rounds differently across
    * engines (1-ulp divergence observed at sf0.001) — so the OUTPUTS
    * are rounded to 6 decimals, the same convention as the kNN
    * cosines. Plan shape: a single hash-agg pass (six
    * partial-aggregable sums), no second scan. */
  private val qCorrCov = Q("q_corr_cov",
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS sxy,
      |    sum(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS sx2,
      |    sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS sy2
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS cov_pop,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |       * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val d2 = DecimalType(18, 2)
    val d4 = DecimalType(24, 4)
    val m = t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(d2)).as("sx"),
        sum(col("l_extendedprice").cast(d2)).as("sy"),
        sum((col("l_quantity") * col("l_extendedprice")).cast(d4)).as("sxy"),
        sum((col("l_quantity") * col("l_quantity")).cast(d4)).as("sx2"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast(d4)).as("sy2"))
    val nD = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sx2 = col("sx2").cast("double"); val sy2 = col("sy2").cast("double")
    val num = nD * sxy - sx * sy
    m.select(col("l_returnflag"),
      round(num / (nD * nD), 6).as("cov_pop"),
      round(num / (sqrt(nD * sx2 - sx * sx) * sqrt(nD * sy2 - sy * sy)), 6).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** Histogram binning by floor division (DuckDB 1.0 has no
    * width_bucket; floor(x/w) is the same partition and portable).
    * Bin ids and counts are integers — nothing float-sensitive. */
  private val qHist = Q("q_hist",
    """SELECT CAST(floor(l_extendedprice / 10000) AS INT) AS bin,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupBy(floor(col("l_extendedprice") / 10000).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      .orderBy(col("bin"))
  }

  /** Explicit GROUPING SETS beyond rollup/cube — the ((a,b),(b),())
    * lattice is not a rollup prefix chain, so it exercises the
    * general-form expand operator (Spark 4 `groupingSets` API). */
  private val qGroupingSets = Q("q_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** Deterministic 10% sample by key hash — the scale-correct sampling
    * operator: `df.sample()` draws from a per-partition RNG
    * (irreproducible across engines, runs, and repartitionings),
    * whereas hashing the stable key is reproducible everywhere, keeps
    * all rows of a key together, and needs no coordination. The same
    * portable md5 family as the sketches. */
  private val qSampleHash = Q("q_sample_hash",
    s"""SELECT event_id, event_type FROM events
       |WHERE (${graft.functions.PortableHash.md5LongSql("event_id::VARCHAR")}
       |       % ${graft.functions.PortableHash.P}) % 100 < 10
       |ORDER BY event_id""".stripMargin) { (s, d) =>
    import graft.functions.PortableHash
    t(s, d, "events")
      .where((PortableHash.md5Long(col("event_id").cast("string"))
        % PortableHash.P % 100) < 10)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Single-pass data profiler (the Deequ-style table summary every
    * ingest pipeline runs before training): per column — null count,
    * exact distinct, min/max — emitted long-form. ONE scan: all
    * aggregates compute in one grouped pass (Spark plans the multiple
    * count-distincts via one Expand), and the long form is four
    * projections of that single agg row, not four scans.
    *
    * Cost note: the FOUR exact distincts make that Expand multiply
    * every input row ×4 before the single shuffle — exact-correct and
    * still one scan, but at 100 TB a profiler should run the HLL form
    * instead: [[qProfileApprox]] is this query with
    * `approx_count_distinct`, which drops the Expand entirely (all
    * sketches fold in one ordinary partial agg). This exact form is
    * the oracle-checkable truth the approx twin's spec measures
    * against. */
  private val qProfile = Q("q_profile",
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    count(*) - count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS nd_key,
      |    CAST(min(o_orderkey) AS VARCHAR) AS mn_key, CAST(max(o_orderkey) AS VARCHAR) AS mx_key,
      |    count(*) - count(o_orderstatus) AS nn_st, count(DISTINCT o_orderstatus) AS nd_st,
      |    min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st,
      |    count(*) - count(o_orderdate) AS nn_dt, count(DISTINCT o_orderdate) AS nd_dt,
      |    CAST(min(o_orderdate) AS VARCHAR) AS mn_dt, CAST(max(o_orderdate) AS VARCHAR) AS mx_dt,
      |    count(*) - count(o_totalprice) AS nn_tp, count(DISTINCT o_totalprice) AS nd_tp,
      |    CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mn_tp,
      |    CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mx_tp
      |  FROM orders)
      |SELECT col, CAST(n AS BIGINT) AS n_rows, CAST(n_null AS BIGINT) AS n_null,
      |       CAST(n_distinct AS BIGINT) AS n_distinct, min_s, max_s
      |FROM (
      |  SELECT 'o_orderkey' AS col, n, nn_key AS n_null, nd_key AS n_distinct,
      |         mn_key AS min_s, mx_key AS max_s FROM a
      |  UNION ALL SELECT 'o_orderstatus', n, nn_st, nd_st, mn_st, mx_st FROM a
      |  UNION ALL SELECT 'o_orderdate', n, nn_dt, nd_dt, mn_dt, mx_dt FROM a
      |  UNION ALL SELECT 'o_totalprice', n, nn_tp, nd_tp, mn_tp, mx_tp FROM a)
      |ORDER BY col""".stripMargin) { (s, d) =>
    val o = t(s, d, "orders")
    val a = o.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("o_orderkey"))).as("nn_key"),
      countDistinct(col("o_orderkey")).as("nd_key"),
      min(col("o_orderkey")).cast("string").as("mn_key"),
      max(col("o_orderkey")).cast("string").as("mx_key"),
      (count(lit(1)) - count(col("o_orderstatus"))).as("nn_st"),
      countDistinct(col("o_orderstatus")).as("nd_st"),
      min(col("o_orderstatus")).as("mn_st"),
      max(col("o_orderstatus")).as("mx_st"),
      (count(lit(1)) - count(col("o_orderdate"))).as("nn_dt"),
      countDistinct(col("o_orderdate")).as("nd_dt"),
      min(col("o_orderdate")).cast("string").as("mn_dt"),
      max(col("o_orderdate")).cast("string").as("mx_dt"),
      (count(lit(1)) - count(col("o_totalprice"))).as("nn_tp"),
      countDistinct(col("o_totalprice")).as("nd_tp"),
      round(min(col("o_totalprice")), 2).cast(DecimalType(18, 2)).cast("string").as("mn_tp"),
      round(max(col("o_totalprice")), 2).cast(DecimalType(18, 2)).cast("string").as("mx_tp"))
      .fenced() // one agg row, four projections below
    def row(name: String, p: String) = a.select(
      lit(name).as("col"), col("n").cast("long").as("n_rows"),
      col(s"nn_$p").cast("long").as("n_null"),
      col(s"nd_$p").cast("long").as("n_distinct"),
      col(s"mn_$p").as("min_s"), col(s"mx_$p").as("max_s"))
    row("o_orderkey", "key")
      .union(row("o_orderstatus", "st"))
      .union(row("o_orderdate", "dt"))
      .union(row("o_totalprice", "tp"))
      .orderBy(col("col"))
  }

  /** The 100 TB profiler: [[qProfile]] with `approx_count_distinct`
    * (HyperLogLog++, default 5% rsd) in place of the exact distincts.
    * No Expand — every aggregate including the four sketches folds in
    * ONE ordinary partial aggregation, so input rows are shuffled
    * once, un-multiplied, as partial states. HLL bits are
    * engine-specific (same stance as `q_approx_count_distinct`);
    * ProfileApproxSpec pins every estimate within the sketch's
    * documented error of the exact query's answer, and the Q entry
    * [[qProfileApprox]] composes this operator with the exact
    * profiler so that verdict is ALSO oracle-checked. */
  private[graft] def approxProfile(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "orders").agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("o_orderkey"))).as("nn_key"),
      approx_count_distinct(col("o_orderkey")).as("nd_key"),
      min(col("o_orderkey")).cast("string").as("mn_key"),
      max(col("o_orderkey")).cast("string").as("mx_key"),
      (count(lit(1)) - count(col("o_orderstatus"))).as("nn_st"),
      approx_count_distinct(col("o_orderstatus")).as("nd_st"),
      min(col("o_orderstatus")).as("mn_st"),
      max(col("o_orderstatus")).as("mx_st"),
      (count(lit(1)) - count(col("o_orderdate"))).as("nn_dt"),
      approx_count_distinct(col("o_orderdate")).as("nd_dt"),
      min(col("o_orderdate")).cast("string").as("mn_dt"),
      max(col("o_orderdate")).cast("string").as("mx_dt"),
      (count(lit(1)) - count(col("o_totalprice"))).as("nn_tp"),
      approx_count_distinct(col("o_totalprice")).as("nd_tp"),
      round(min(col("o_totalprice")), 2).cast(DecimalType(18, 2)).cast("string").as("mn_tp"),
      round(max(col("o_totalprice")), 2).cast(DecimalType(18, 2)).cast("string").as("mx_tp"))
      .fenced() // one agg row, four projections below
    def row(name: String, p: String) = a.select(
      lit(name).as("col"), col("n").cast("long").as("n_rows"),
      col(s"nn_$p").cast("long").as("n_null"),
      col(s"nd_$p").cast("long").as("n_distinct"),
      col(s"mn_$p").as("min_s"), col(s"mx_$p").as("max_s"))
    row("o_orderkey", "key")
      .union(row("o_orderstatus", "st"))
      .union(row("o_orderdate", "dt"))
      .union(row("o_totalprice", "tp"))
      .orderBy(col("col"))
  }

  /** Oracle check for the approx profiler via its GUARANTEE (the
    * q_approx_count_distinct stance): the production operator is
    * [[approxProfile]] — one scan, NO Expand, spec-pinned — whose raw
    * HLL estimates can't cross-engine-hash; this entry composes it
    * with the exact profiler (4-row join, both sides one agg row) so
    * every non-estimate column AND the estimate's ±15% (3× rsd)
    * verdict are DuckDB-checked. */
  private val qProfileApprox = Q("q_profile_approx",
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    count(*) - count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS nd_key,
      |    CAST(min(o_orderkey) AS VARCHAR) AS mn_key, CAST(max(o_orderkey) AS VARCHAR) AS mx_key,
      |    count(*) - count(o_orderstatus) AS nn_st, count(DISTINCT o_orderstatus) AS nd_st,
      |    min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st,
      |    count(*) - count(o_orderdate) AS nn_dt, count(DISTINCT o_orderdate) AS nd_dt,
      |    CAST(min(o_orderdate) AS VARCHAR) AS mn_dt, CAST(max(o_orderdate) AS VARCHAR) AS mx_dt,
      |    count(*) - count(o_totalprice) AS nn_tp, count(DISTINCT o_totalprice) AS nd_tp,
      |    CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mn_tp,
      |    CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2)) AS VARCHAR) AS mx_tp
      |  FROM orders)
      |SELECT col, CAST(n AS BIGINT) AS n_rows, CAST(n_null AS BIGINT) AS n_null,
      |       CAST(n_distinct AS BIGINT) AS n_distinct, true AS hll_ok, min_s, max_s
      |FROM (
      |  SELECT 'o_orderkey' AS col, n, nn_key AS n_null, nd_key AS n_distinct,
      |         mn_key AS min_s, mx_key AS max_s FROM a
      |  UNION ALL SELECT 'o_orderstatus', n, nn_st, nd_st, mn_st, mx_st FROM a
      |  UNION ALL SELECT 'o_orderdate', n, nn_dt, nd_dt, mn_dt, mx_dt FROM a
      |  UNION ALL SELECT 'o_totalprice', n, nn_tp, nd_tp, mn_tp, mx_tp FROM a)
      |ORDER BY col""".stripMargin) { (s, d) =>
    val est = approxProfile(s, d)
      .select(col("col"), col("n_distinct").as("nd_est"))
    qProfile.fn(s, d)
      .join(broadcast(est), "col")
      .select(col("col"), col("n_rows"), col("n_null"), col("n_distinct"),
        (abs(col("nd_est") - col("n_distinct")).cast("double")
          <= lit(0.15) * col("n_distinct").cast("double")).as("hll_ok"),
        col("min_s"), col("max_s"))
      .orderBy(col("col"))
  }

  /** Welch's two-sample t-test over every event-type pair — the A/B
    * readout an experimentation pipeline serves from the events
    * stream (and the statistical gate a data-mixture change runs
    * before shipping: did the metric move beyond noise?). Unequal
    * variances assumed (Welch), so no pooled-variance trap; df by
    * Welch–Satterthwaite.
    *
    * Determinism: per-group n/Σx/Σx² are exact DECIMAL sums (order-
    * independent); every downstream quantity — means, sample
    * variances, t, df — is the same double expression tree on both
    * engines from those identical inputs, rounded only for display;
    * the significance verdict compares the unrounded |t| to the
    * z-approximation cutoff 1.96 (all dfs here ≫ 30).
    *
    * Scale shape: ONE map-side-combined groupBy(event_type) carries
    * everything (5 rows out); the pair frame is |types|² — a
    * broadcast-sized self-join of the moment table, nothing
    * fact-scaled after the scan. */
  private val qAbTest = Q("q_ab_test",
    """WITH m AS (
      |  SELECT event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(value AS DECIMAL(18,4))) AS sx,
      |    sum(CAST(value * value AS DECIMAL(27,8))) AS sx2
      |  FROM events GROUP BY event_type),
      |v AS (
      |  SELECT event_type, n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
      |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS s2
      |  FROM m),
      |p AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb,
      |    a.n AS na, b.n AS nb, a.mean AS ma, b.mean AS mb,
      |    a.s2 / CAST(a.n AS DOUBLE) AS qa, b.s2 / CAST(b.n AS DOUBLE) AS qb
      |  FROM v a JOIN v b ON a.event_type < b.event_type)
      |SELECT ta, tb, na, nb,
      |  round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
      |  round((ma - mb) / sqrt(qa + qb), 4) AS t,
      |  round((qa + qb) * (qa + qb)
      |        / (qa * qa / CAST(na - 1 AS DOUBLE)
      |           + qb * qb / CAST(nb - 1 AS DOUBLE)), 1) AS df,
      |  (abs((ma - mb) / sqrt(qa + qb)) > 1.96) AS significant
      |FROM p ORDER BY ta, tb""".stripMargin) { (s, d) =>
    val m = t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).as("sx"),
        sum((col("value") * col("value")).cast(DecimalType(27, 8))).as("sx2"))
    val nD = col("n").cast("double")
    val v = m.select(col("event_type"), col("n"),
      (col("sx").cast("double") / nD).as("mean"),
      ((nD * col("sx2").cast("double")
        - col("sx").cast("double") * col("sx").cast("double"))
        / (nD * (col("n") - 1).cast("double"))).as("s2"))
    val p = v.select(col("event_type").as("ta"), col("n").as("na"),
        col("mean").as("ma"), (col("s2") / col("n").cast("double")).as("qa"))
      .join(v.select(col("event_type").as("tb"), col("n").as("nb"),
        col("mean").as("mb"), (col("s2") / col("n").cast("double")).as("qb")),
        col("ta") < col("tb"))
    val tStat = (col("ma") - col("mb")) / sqrt(col("qa") + col("qb"))
    val dfW = (col("qa") + col("qb")) * (col("qa") + col("qb")) /
      (col("qa") * col("qa") / (col("na") - 1).cast("double")
        + col("qb") * col("qb") / (col("nb") - 1).cast("double"))
    p.select(col("ta"), col("tb"), col("na"), col("nb"),
        round(col("ma"), 4).as("mean_a"), round(col("mb"), 4).as("mean_b"),
        round(tStat, 4).as("t"), round(dfW, 1).as("df"),
        (abs(tStat) > 1.96).as("significant"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Poisson-bootstrap thresholds: ⌊cdf_k(Poisson(1)) · P⌋ as exact
    * integers, so the weight CASE never compares floats — k = 0..4,
    * tail mass (≈0.37%) draws weight 5. */
  private val BootCum = Seq(790015083L, 1580030167L, 1975037709L,
    2106706890L, 2139624185L)
  private val BootB = 16

  /** Distributed BOOTSTRAP confidence intervals via Poisson
    * resampling (Chamandy et al., Google 2012, "Estimating
    * Uncertainty for Massive Data Streams") — the error bars a
    * corpus-statistics job publishes next to its point estimates:
    * instead of materializing B resamples (a shuffle each), every row
    * draws B independent Poisson(1) weights from the portable hash
    * family, so ALL replicas ride ONE map-side-combined aggregation
    * pass — the property that makes bootstrap viable at 100 TB.
    *
    * Determinism end to end: the uniform draw is the integer hash
    * family member compared against integer ⌊cdf·P⌋ thresholds (no
    * float boundary anywhere); replica means round to 6 dp into
    * DECIMAL; the bootstrap SE sums EXACT decimal squared deviations
    * (each rounded to 12 dp first) over the B replicas — no
    * order-dependent float sum at any aggregation. */
  private val qBootstrap = Q("q_stats_bootstrap", {
    val wCase = BootCum.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 5 END")
    s"""WITH r AS (
       |  SELECT event_type, value,
       |    (${PortableHash.md5LongSql("event_id::VARCHAR")} % ${PortableHash.P}) AS h0
       |  FROM events),
       |x AS (SELECT event_type, value, t.rep,
       |        ((2 * t.rep + 1) * h0 + (7 + t.rep * t.rep)) % ${PortableHash.P} AS u
       |      FROM r, unnest(generate_series(0, ${BootB - 1})) AS t(rep)),
       |w AS (SELECT event_type, rep, value, $wCase AS w FROM x),
       |rm AS (SELECT event_type, rep,
       |        CAST(round(CAST(sum(CAST(w * value AS DECIMAL(24,6))) AS DOUBLE)
       |             / CAST(sum(w) AS DOUBLE), 6) AS DECIMAL(18,6)) AS m
       |      FROM w GROUP BY 1, 2),
       |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
       |          / CAST(count(*) AS DOUBLE) AS mean
       |      FROM events GROUP BY 1),
       |mb AS (SELECT event_type,
       |        CAST(sum(m) AS DOUBLE) / $BootB AS mbar,
       |        min(m) AS lo, max(m) AS hi FROM rm GROUP BY 1),
       |sd AS (SELECT rm.event_type,
       |        sqrt(CAST(sum(CAST(round(
       |            (CAST(rm.m AS DOUBLE) - mb.mbar)
       |            * (CAST(rm.m AS DOUBLE) - mb.mbar), 12)
       |          AS DECIMAL(30,12))) AS DOUBLE) / ${BootB - 1}) AS se
       |      FROM rm JOIN mb ON rm.event_type = mb.event_type GROUP BY 1)
       |SELECT pt.event_type, pt.n, round(pt.mean, 4) AS mean,
       |  round(sd.se, 6) AS boot_se,
       |  round(CAST(mb.lo AS DOUBLE), 4) AS boot_lo,
       |  round(CAST(mb.hi AS DOUBLE), 4) AS boot_hi
       |FROM pt JOIN sd ON pt.event_type = sd.event_type
       |        JOIN mb ON pt.event_type = mb.event_type
       |ORDER BY pt.event_type""".stripMargin
  }) { (s, d) =>
    val ev = t(s, d, "events")
    val h0 = (PortableHash.md5Long(col("event_id").cast("string"))
      % PortableHash.P).as("h0")
    val u = ((lit(2) * col("rep") + 1) * col("h0")
      + (lit(7) + col("rep") * col("rep"))) % PortableHash.P
    val wCase = BootCum.zipWithIndex.foldRight(lit(5): Column) {
      case ((t0, k), acc) => when(col("u") < t0, k).otherwise(acc)
    }
    val rm = ev.select(col("event_type"), col("value"), h0)
      .select(col("event_type"), col("value"), col("h0"),
        explode(sequence(lit(0L), lit(BootB - 1L))).as("rep"))
      .select(col("event_type"), col("rep"), col("value"), u.as("u"))
      .select(col("event_type"), col("rep"), col("value"), wCase.as("w"))
      .groupBy(col("event_type"), col("rep"))
      .agg((round(sum((col("w") * col("value")).cast(DecimalType(24, 6)))
        .cast("double") / sum(col("w")).cast("double"), 6))
        .cast(DecimalType(18, 6)).as("m"))
      .fenced() // reused: mbar/lo/hi + the SE pass
    val pt = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 4))).cast("double")
          / count(lit(1)).cast("double")).as("mean"))
    val mb = rm.groupBy(col("event_type"))
      .agg((sum(col("m")).cast("double") / BootB).as("mbar"),
        min(col("m")).as("lo"), max(col("m")).as("hi"))
    val dev = col("m").cast("double") - col("mbar")
    val sd = rm.join(mb, "event_type")
      .groupBy(col("event_type"))
      .agg(sqrt(sum(round(dev * dev, 12).cast(DecimalType(30, 12)))
        .cast("double") / (BootB - 1)).as("se"))
    pt.join(sd, "event_type").join(mb, "event_type")
      .select(col("event_type"), col("n"), round(col("mean"), 4).as("mean"),
        round(col("se"), 6).as("boot_se"),
        round(col("lo").cast("double"), 4).as("boot_lo"),
        round(col("hi").cast("double"), 4).as("boot_hi"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(qQuantile, qCorrCov, qHist, qGroupingSets, qSampleHash,
    qProfile, qProfileApprox, qAbTest, qBootstrap)
}
