package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.queries.Q.t

/** Canonical TPC-H-shaped analytics over the star schema — the
  * workload class a 100 TB deployment actually runs. All monetary
  * aggregates go through DECIMAL(18,4) (exact, partition-order-free);
  * dates are parameterized against the synthetic data's range.
  *
  * Plan shapes to note at scale: Q3/Q5 join fact→dims with the small
  * dims broadcast, so the only fact shuffle is the final group-by;
  * Q6 is a pure scan-filter-aggregate (one stage + one exchange for
  * the singleton result); Q1 is scan + hash-agg.
  *
  * Broadcast policy: explicit `broadcast(...)` hints appear ONLY on
  * build sides whose size is constant in SF — nation (25 rows),
  * region (5 rows), and 1-row aggregates (max-revenue, avg-balance,
  * grand-total). part/supplier/customer grow linearly with the fact
  * (part = SF * 200k), so their joins carry NO hint: AQE's size-based
  * choice broadcasts them at every tested SF but falls back to a
  * shuffled join beyond `spark.sql.autoBroadcastJoinThreshold` —
  * a hard-coded hint there would override that and OOM at 1000x.
  */
object TpchQueries {

  private val dec = DecimalType(18, 4)

  // Exact decimal arithmetic for Q1: the raw columns are true
  // 2-decimal values (double→decimal cast is unambiguous), and all
  // arithmetic stays in decimal, so no engine ever rounds a
  // many-digit double. The FINAL cast is to DOUBLE: both engines
  // round the identical exact decimal to the nearest double, so the
  // bits (and any value-hash) match — whereas a decimal output column
  // hash-diverges across engines on trailing-zero rendering (e.g.
  // '381532.0000' vs '381532.0'). Round-1 evidence: every decimal-
  // output query hash-mismatched, every final-DOUBLE one matched.
  private val q1 = Q("q_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
      |       AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
      |           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |           * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
      |       AS DOUBLE) AS sum_charge,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val out = "double"
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val one = lit(1).cast(DecimalType(3, 2))
    val disc1 = one - col("l_discount").cast(DecimalType(4, 2))
    val tax1 = one + col("l_tax").cast(DecimalType(4, 2))
    t(s, d, "lineitem")
      .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(12, 2))).cast(out).as("sum_qty"),
        sum(price).cast(out).as("sum_base_price"),
        sum(price * disc1).cast(out).as("sum_disc_price"),
        sum(price * disc1 * tax1).cast(out).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q3 = Q("q_tpch_q3",
    """SELECT l.l_orderkey,
      |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue,
      |  o.o_orderdate
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q5 = Q("q_tpch_q5",
    """SELECT n.n_name,
      |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin) { (s, d) =>
    val n = t(s, d, "nation")
    val r = t(s, d, "region").where(col("r_name") === "ASIA")
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q6 = Q("q_tpch_q6",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    t(s, d, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast(dec))
        .cast("double").as("revenue"))
  }

  private val q10 = Q("q_tpch_q10",
    """SELECT c.c_custkey, c.c_name,
      |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue,
      |  n.n_name
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    t(s, d, "lineitem").where(col("l_returnflag") === "R")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Promo-revenue ratio. Both operand sums are exact decimals cast to
    * double, and the 100·a/b arithmetic is written in the same
    * left-to-right order on both engines, so the quotient is
    * bit-identical. */
  private val q14 = Q("q_tpch_q14",
    """SELECT (100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
      |  THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
      |  / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
      |         AS DOUBLE) AS promo_revenue
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin) { (s, d) =>
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)
    t(s, d, "lineitem")
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(dec))).cast("double")
          / sum(rev).cast("double")).as("promo_revenue"))
  }

  /** Q13: distribution of orders-per-customer (customers with zero
    * orders included via the left join). Two aggregations: per-customer
    * count, then count-of-counts — the classic double group-by. */
  private val q13 = Q("q_tpch_q13",
    """WITH c AS (
      |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey)
      |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM c GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q18: large-volume orders — orders whose total quantity exceeds a
    * threshold, with their customer. Quantity sums are exact decimals
    * (threshold compare included) projected as DOUBLE. The HAVING-
    * style filter runs on the aggregated (small) side before the
    * dimension joins. */
  private val q18 = Q("q_tpch_q18",
    """WITH big AS (
      |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 180)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
      |  CAST(b.sum_qty AS DOUBLE) AS sum_qty
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY sum_qty DESC, o.o_orderkey""".stripMargin) { (s, d) =>
    val d2 = DecimalType(18, 2)
    val big = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(d2)).as("sum_qty_dec"))
      .where(col("sum_qty_dec") > lit(180).cast(d2))
    big.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("sum_qty_dec").cast("double").as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** Q7: volume shipping between two nations, by supplier-nation ×
    * customer-nation × ship year. Both nation sides resolve through
    * broadcast dims; the only fact-sized shuffle is the final 3-key
    * group-by. Year extraction stays integer on both engines. */
  private val q7 = Q("q_tpch_q7",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l.l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
      |       AS DOUBLE) AS revenue
      |FROM supplier s
      |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
    val n1 = t(s, d, "nation").select(
      col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, d, "nation").select(
      col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    t(s, d, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8: national market share — NATION_1's share of ECONOMY-part
    * revenue delivered into ASIA, per order year. The share ratio is
    * computed in the identical left-to-right double form on both
    * engines (same discipline as Q14). */
  private val q8 = Q("q_tpch_q8",
    """SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
      |        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
      |           AS DOUBLE) AS mkt_share
      |FROM part p
      |JOIN lineitem l ON p.p_partkey = l.l_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |JOIN region r ON n1.n_regionkey = r.r_regionkey
      |JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY CAST(year(o.o_orderdate) AS INT)
      |ORDER BY o_year""".stripMargin) { (s, d) =>
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)
    val p = t(s, d, "part").where(col("p_type") === "ECONOMY")
    val n1 = t(s, d, "nation").select(
      col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_rkey"))
    val n2 = t(s, d, "nation").select(
      col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val r = t(s, d, "region").where(col("r_name") === "ASIA")
    t(s, d, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(r), col("n1_rkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_1", rev)
        .otherwise(lit(0).cast(dec))).cast("double")
        / sum(rev).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q15: top supplier — the supplier(s) achieving the maximum quarter
    * revenue. The revenue CTE is aggregated BEFORE the max-compare
    * and the dimension join, so the scalar max and the equi-join both
    * run over the (small) per-supplier aggregate, never the fact. */
  private val q15 = Q("q_tpch_q15",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |      AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
      |WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
      |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
    val rev = t(s, d, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.join(broadcast(maxRev), col("total_rev") === col("max_rev"))
      .join(t(s, d, "supplier"), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17 (adapted): small-quantity-order revenue — lineitems of one
    * brand's small parts whose quantity is under 20% of that part's
    * average. The testdata `part` has no `p_container`, so the second
    * predicate is `p_size < 10` (same selectivity role; documented in
    * TESTDATA.md). The per-part average is a fact-side aggregate
    * joined back — at scale the agg output is |part|-sized, far under
    * the fact, and broadcastable. */
  private val q17 = Q("q_tpch_q17",
    """WITH pq AS (
      |  SELECT l_partkey, avg(l_quantity) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
      |  AS avg_yearly
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN pq ON pq.l_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#1' AND p.p_size < 10
      |  AND l.l_quantity < 0.2 * pq.avg_qty""".stripMargin) { (s, d) =>
    val p = t(s, d, "part")
      .where(col("p_brand") === "Brand#1" && col("p_size") < 10)
    val pq = t(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pq_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    t(s, d, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(pq, col("l_partkey") === col("pq_partkey"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(col("l_extendedprice").cast(dec)).cast("double") / lit(7.0))
        .as("avg_yearly"))
  }

  /** Q19 (adapted): discounted revenue under a DISJUNCTION of
    * (brand, size-range, quantity-range) clause triples — the OR-of-
    * ANDs join predicate is the shape this query exists to exercise:
    * Catalyst extracts the common `p_partkey = l_partkey` equi-key
    * (so it still plans a hash join, not a nested loop) and pushes
    * the disjunction's per-side conjuncts (`p_brand IN (...)`,
    * `l_quantity <= 30`) below the join as derived filters. The
    * testdata `part` has no `p_container` and `lineitem` no
    * `l_shipmode`/`l_shipinstruct`, so those conjuncts are dropped
    * and the size ranges stand in for the container classes
    * (documented in TESTDATA.md). */
  private val q19 = Q("q_tpch_q19",
    """SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
      |                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val clause1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val clause2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val clause3 = col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    t(s, d, "lineitem")
      .join(t(s, d, "part"), col("p_partkey") === col("l_partkey"))
      .where(clause1 || clause2 || clause3)
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec))
        .cast("double").as("revenue"))
  }

  /** Q22 (adapted): global-sales opportunity — customers with
    * above-average positive balance and no RECENT orders. Two testdata
    * adaptations (documented in TESTDATA.md): `customer` has no
    * `c_phone`, so the country-code grouping is `c_mktsegment`; every
    * customer has ≥1 order, so the NOT EXISTS is scoped to the final
    * data year (else the query is vacuously empty). Shapes exercised:
    * scalar subquery (broadcast 1-row), anti-join against the
    * date-filtered fact, small group-by. */
  private val q22 = Q("q_tpch_q22",
    """WITH avg_bal AS (
      |  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0)
      |SELECT c.c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer c, avg_bal
      |WHERE c.c_acctbal > avg_bal.a
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
    val avgBal = t(s, d, "customer").where(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("a"))
    t(s, d, "customer")
      .join(broadcast(avgBal))
      .where(col("c_acctbal") > col("a"))
      .join(t(s, d, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  // ---------------------------------------------------------------
  // The remaining eight queries need the `partsupp` table (or lineitem
  // columns) the testdata lacks. They are implemented against a
  // DERIVED partsupp: the distinct (partkey, suppkey) pairs observed
  // in lineitem, with an exact-decimal min price as supplycost and a
  // count-scaled availqty. Both engines derive it with the identical
  // expression, so every query below stays hash-oracle-checked; the
  // defining plan shape of each original (argmin join, correlated
  // EXISTS, HAVING-vs-scalar, NOT IN, nested semi-joins, double
  // correlation) is intact. TESTDATA.md documents each adaptation.
  //
  // Scale shape: the derived ps is |part|×avg-suppliers-per-part —
  // dimension-sized relative to the fact (it is the result of one
  // map-side-combinable group-by over lineitem), so downstream
  // ps-joins shuffle at most dimension volume.

  private val psSql =
    """ps AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    min(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost,
      |    CAST(count(*) AS INT) * 10 AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  private def ps(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem")
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice").cast(DecimalType(12, 2))).as("ps_supplycost"),
        (count(lit(1)).cast("int") * lit(10)).as("ps_availqty"))

  /** Q2 (adapted): minimum-cost supplier per part within a region —
    * the argmin-with-ties correlated subquery. `p_mfgr` is absent, so
    * the projection carries `p_brand`. The per-part min runs over the
    * region-eligible ps only (dimension-sized), joined back on
    * (partkey, cost) so cost ties keep every winning supplier, exactly
    * like the original's correlated `= (SELECT min …)`. */
  private val q2 = Q("q_tpch_q2",
    s"""WITH $psSql,
       |eligible AS (
       |  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
       |         s.s_acctbal, s.s_name, n.n_name
       |  FROM ps
       |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = 'EUROPE'),
       |best AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost
       |         FROM eligible GROUP BY 1)
       |SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
       |       CAST(e.ps_supplycost AS DOUBLE) AS supplycost
       |FROM eligible e
       |JOIN best b ON e.ps_partkey = b.ps_partkey
       |           AND e.ps_supplycost = b.min_cost
       |JOIN part p ON p.p_partkey = e.ps_partkey
       |WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
       |ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
       |LIMIT 100""".stripMargin) { (s, d) =>
    val n = t(s, d, "nation")
    val r = t(s, d, "region").where(col("r_name") === "EUROPE")
    val eligible = ps(s, d)
      .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("ps_partkey"), col("ps_supplycost"),
        col("s_acctbal"), col("s_name"), col("n_name"))
    val best = eligible.groupBy(col("ps_partkey").as("b_partkey"))
      .agg(min(col("ps_supplycost")).as("min_cost"))
    val p = t(s, d, "part")
      .where(col("p_size") === 15 && col("p_type") === "ECONOMY")
    eligible
      .join(best, col("ps_partkey") === col("b_partkey") &&
        col("ps_supplycost") === col("min_cost"))
      .join(p, col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        col("ps_supplycost").cast("double").as("supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q4 (adapted): priority distribution of orders with a late line.
    * `l_commitdate`/`l_receiptdate` are absent, so "late" is a line
    * shipped more than 60 days after the order date — same correlated
    * EXISTS with an inequality on top of the equi-key, which Spark
    * plans as a left-semi hash join with the inequality as a join
    * residual (no fact-sized dedup). */
  private val q4 = Q("q_tpch_q4",
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
    t(s, d, "orders")
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")))
      .join(t(s, d, "lineitem"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q9 (adapted): profit by supplier nation × order year. Profit is
    * computed as `100·revenue − cost·qty` in EXACT decimal (no decimal
    * division anywhere — engines disagree on division result scale),
    * summed, cast to double, and only THEN divided by 100: the final
    * IEEE double division is bit-deterministic on both engines. */
  private val q9 = Q("q_tpch_q9",
    s"""WITH $psSql
       |SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) * 100
       |           - CAST(ps.ps_supplycost AS DECIMAL(18,4))
       |             * CAST(l.l_quantity AS DECIMAL(8,0)))
       |       AS DOUBLE) / 100 AS sum_profit
       |FROM lineitem l
       |JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
       |JOIN part p ON p.p_partkey = l.l_partkey
       |JOIN supplier s ON s.s_suppkey = l.l_suppkey
       |JOIN orders o ON o.o_orderkey = l.l_orderkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |WHERE p.p_name LIKE 'red%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 4)) * lit(100)
    val cost = col("ps_supplycost").cast(DecimalType(18, 4)) *
      col("l_quantity").cast(DecimalType(8, 0))
    val p = t(s, d, "part").where(col("p_name").like("red%"))
    t(s, d, "lineitem")
      .join(ps(s, d), col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg((sum(rev - cost).cast("double") / lit(100)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 (adapted): stock-value concentration — parts whose inventory
    * value in one nation exceeds a fraction of the nation's total: the
    * HAVING-vs-scalar-subquery shape. Both comparison operands are
    * exact decimal sums cast to double BEFORE the ×0.001 (deterministic
    * on both engines). The scalar total is a broadcast single row. */
  private val q11 = Q("q_tpch_q11",
    s"""WITH $psSql,
       |nps AS (
       |  SELECT ps.ps_partkey,
       |         CAST(ps.ps_supplycost AS DECIMAL(18,4)) * ps.ps_availqty AS val
       |  FROM ps
       |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  WHERE n.n_name = 'NATION_1')
       |SELECT ps_partkey, CAST(sum(val) AS DOUBLE) AS value
       |FROM nps GROUP BY ps_partkey
       |HAVING CAST(sum(val) AS DOUBLE) >
       |  (SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM nps)
       |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, d) =>
    val n = t(s, d, "nation").where(col("n_name") === "NATION_1")
    val nps = ps(s, d)
      .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost").cast(DecimalType(18, 4)) * col("ps_availqty")).as("val"))
    val perPart = nps.groupBy(col("ps_partkey"))
      .agg(sum(col("val")).cast("double").as("value"))
    val total = nps.agg((sum(col("val")).cast("double") * lit(0.001)).as("threshold"))
    perPart.join(broadcast(total))
      .where(col("value") > col("threshold"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  /** Q12 (adapted): priority mix by ship class. `l_shipmode` is
    * absent, so `l_returnflag` stands in for the mode pair and the
    * late-line predicate is ship > order date + 30 days — the two-way
    * CASE pivot over a fact–fact join is intact. */
  private val q12 = Q("q_tpch_q12",
    """SELECT l.l_returnflag,
      |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE l.l_returnflag IN ('A','R')
      |  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, d, "lineitem")
      .where(col("l_returnflag").isin("A", "R") &&
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .join(t(s, d, "orders"), col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1).otherwise(0)).as("high_line_count"),
        sum(when(!high, 1).otherwise(0)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** Q16 (adapted): supplier diversity per part class, excluding
    * flagged suppliers — the NOT IN anti-join + count-distinct shape.
    * "Customer complaints" has no analog column, so the exclusion set
    * is suppliers with negative balance (same rare-set role). */
  private val q16 = Q("q_tpch_q16",
    s"""WITH $psSql
       |SELECT p.p_brand, p.p_type, p.p_size,
       |  CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
       |FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
       |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
       |  AND p.p_size IN (1,4,7,10,13,16,19,22)
       |  AND ps.ps_suppkey NOT IN
       |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""".stripMargin) { (s, d) =>
    val p = t(s, d, "part").where(col("p_brand") =!= "Brand#5" &&
      col("p_type") =!= "PROMO" &&
      col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    val flagged = t(s, d, "supplier").where(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    ps(s, d)
      .join(flagged, col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("ps_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q20 (adapted): suppliers in one nation holding excess stock of a
    * part family — the nested semi-join chain. The correlated shipped-
    * quantity subquery becomes a grouped aggregate left-joined back to
    * ps; a missing year's sum is NULL on both engines, so the `>`
    * comparison excludes it identically. l_quantity values are
    * integral, so the double sum is order-exact. */
  private val q20 = Q("q_tpch_q20",
    s"""WITH $psSql
       |SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
       |FROM supplier s
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |WHERE n.n_name = 'NATION_2'
       |  AND s.s_suppkey IN (
       |    SELECT ps.ps_suppkey FROM ps
       |    WHERE ps.ps_partkey IN
       |        (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
       |      AND ps.ps_availqty > (
       |        SELECT 0.5 * sum(l.l_quantity) FROM lineitem l
       |        WHERE l.l_partkey = ps.ps_partkey
       |          AND l.l_suppkey = ps.ps_suppkey
       |          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
       |          AND l.l_shipdate < TIMESTAMP '1997-01-01'))
       |ORDER BY s.s_name""".stripMargin) { (s, d) =>
    val redParts = t(s, d, "part").where(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val shipped = t(s, d, "lineitem")
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .groupBy(col("l_partkey").as("sh_partkey"), col("l_suppkey").as("sh_suppkey"))
      .agg(sum(col("l_quantity")).as("sh_qty"))
    val excess = ps(s, d)
      .join(redParts, col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped, col("ps_partkey") === col("sh_partkey") &&
        col("ps_suppkey") === col("sh_suppkey"), "left")
      .where(col("ps_availqty") > lit(0.5) * col("sh_qty"))
      .select(col("ps_suppkey"))
    val n = t(s, d, "nation").where(col("n_name") === "NATION_2")
    t(s, d, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal").cast("double").as("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** Q21 (adapted): suppliers who alone flagged a multi-supplier
    * finished order — the double-correlated EXISTS / NOT EXISTS.
    * `l_receiptdate`/`l_commitdate` are absent, so "kept waiting" is
    * `l_returnflag = 'R'`. The Spark plan decorrelates both
    * subqueries into ONE per-order aggregate (distinct suppliers,
    * distinct flagged suppliers): EXISTS(other supplier) ⇔ n_supp > 1,
    * NOT EXISTS(other flagged supplier) ⇔ n_rsupp = 1 on a flagged
    * row — one fact shuffle instead of two correlated re-scans. */
  private val q21 = Q("q_tpch_q21",
    """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
      |GROUP BY s.s_name ORDER BY numwait DESC, s.s_name
      |LIMIT 100""".stripMargin) { (s, d) =>
    val stats = t(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("st_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_rsupp"))
    val fOrders = t(s, d, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    t(s, d, "lineitem").where(col("l_returnflag") === "R")
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(stats, col("l_orderkey") === col("st_orderkey"))
      .where(col("n_supp") > 1 && col("n_rsupp") === 1)
      .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val all: Seq[Q] = Seq(q1, q3, q5, q6, q10, q13, q14, q18,
    q7, q8, q15, q17, q19, q22,
    q2, q4, q9, q11, q12, q16, q20, q21)
}
