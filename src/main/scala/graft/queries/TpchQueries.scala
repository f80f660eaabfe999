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
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
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
      .join(broadcast(t(s, d, "supplier")),
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
      .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
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
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
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
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(t(s, d, "orders")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
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
      .join(broadcast(t(s, d, "supplier")), col("supplier_no") === col("s_suppkey"))
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
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(pq), col("l_partkey") === col("pq_partkey"))
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
      .join(broadcast(t(s, d, "part")), col("p_partkey") === col("l_partkey"))
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

  val all: Seq[Q] = Seq(q1, q3, q5, q6, q10, q13, q14, q18,
    q7, q8, q15, q17, q19, q22)
}
