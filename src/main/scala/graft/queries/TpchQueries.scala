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

  val all: Seq[Q] = Seq(q1, q3, q5, q6, q10, q13, q14, q18)
}
