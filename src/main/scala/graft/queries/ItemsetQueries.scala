package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q.t
import graft.Fence.FenceOps

/** Frequent-itemset mining over the document corpus — the SON /
  * Apriori family (public algorithms: Agrawal & Srikant, "Fast
  * Algorithms for Mining Association Rules", VLDB'94; Savasere et
  * al.'s partition-and-merge SON is the distributed framing). A
  * training-data pipeline uses these for template/boilerplate
  * discovery (token sets that co-occur across many documents are
  * navigation chrome, license blocks, SEO spam) and for corpus
  * auditing (which token combinations dominate a source).
  *
  * Transactions = documents; items = distinct lowercase
  * whitespace-split tokens; support = number of documents containing
  * ALL items of the set; minsup = ⌈10% of corpus⌉, derived from the
  * data so the same query text runs at every SF.
  *
  * Scale shape (100 TB): the item universe after the frequent-1 pass
  * is tiny (minsup at corpus fraction f caps |F₁| at 1/f · avg-doc
  * items / distinct ratio — here ≤ 1/0.10 · a few hundred), so F₁ and
  * F₂ broadcast. Candidate generation is MAP-SIDE: each document
  * emits combinations of its OWN frequent items (per-doc cost
  * C(m, 2) / C(m, 3) with m = |doc ∩ F₁|, bounded by |F₁|), so the
  * only shuffles are the two/three groupBy-count aggregations, each
  * with map-side partial aggregation over a key space capped at
  * C(|F₁|, r). Nothing is ever all-pairs in the corpus dimension —
  * cost is linear in documents for fixed minsup fraction. The
  * Apriori candidate prune (every (r−1)-subset of an emitted r-set
  * must itself be frequent) runs as a broadcast semi-join BEFORE the
  * counting shuffle, so on prunable corpora the shuffle volume drops
  * by exactly the pruned fraction; on this synthetic corpus the 30
  * frequent tokens co-occur almost everywhere, so the prune is a
  * no-op by data, not by construction (the oracle needs no prune —
  * by the Apriori property pruning never changes the final answer).
  *
  * Reference anchor: the reference has no itemset operator; this is
  * part of the mandated beyond-reference LLM-pipeline surface
  * (SURVEY.md §2.12 "corpus analytics").
  */
object ItemsetQueries {

  /** Shared SQL prefix: per-doc distinct tokens, data-derived minsup,
    * frequent single items F₁, and the per-doc frequent-item stream. */
  private val itemCtes =
    """w AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ws
      |      FROM documents),
      |n AS (SELECT CAST(ceil(0.10 * count(*)) AS BIGINT) AS minsup FROM w),
      |u AS (SELECT doc_id, unnest(ws) AS tok FROM w),
      |f1 AS (SELECT tok FROM u GROUP BY tok
      |       HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM n)),
      |fu AS (SELECT doc_id, tok FROM u WHERE tok IN (SELECT tok FROM f1))"""
      .stripMargin

  /** Per-doc sorted frequent-item array + broadcast minsup, the shared
    * engine prefix. Returns (per-doc array frame `(doc_id, fs)`,
    * 1-row minsup frame). The array frame is fenced: pairs, triples
    * and rules all re-derive from it, and the frequent-1 aggregation
    * underneath would otherwise re-scan the corpus per consumer. */
  private def freqArrays(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
    val minsup = toks.select(countDistinct(col("doc_id")).as("nd"))
      .select(ceil(col("nd") * lit(0.10)).cast("long").as("minsup"))
    val f1 = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(minsup))
      .where(col("df") >= col("minsup"))
      .select("tok")
    val fs = toks
      .join(broadcast(f1), Seq("tok"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("tok"))).as("fs"))
      .fenced()
    (fs, minsup)
  }

  /** Ordered pairs (a < b) of one sorted array, generated map-side
    * with nested HOFs — no self-join, no shuffle. */
  private def pairCombos(fs: Column): Column =
    flatten(transform(fs, (a, i) =>
      transform(slice(fs, i + 2, size(fs)), b =>
        struct(a.as("a"), b.as("b")))))

  /** Ordered triples (a < b < c), same map-side scheme: for element i
    * pair with j > i, then with every element after j (1-based slice
    * start i+j+3 because b sits at 0-based index i+1+j of `fs`). */
  private def tripleCombos(fs: Column): Column =
    flatten(flatten(transform(fs, (a, i) =>
      transform(slice(fs, i + 2, size(fs)), (b, j) =>
        transform(slice(fs, i + j + lit(3), size(fs)), c =>
          struct(a.as("a"), b.as("b"), c.as("c")))))))

  /** Frequent pairs with support, the F₂ pass. */
  private def freqPairs(fs: DataFrame, minsup: DataFrame): DataFrame =
    fs.select(explode(pairCombos(col("fs"))).as("p"))
      .groupBy(col("p.a").as("item_a"), col("p.b").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(minsup))
      .where(col("support") >= col("minsup"))
      .select("item_a", "item_b", "support")

  private val qPairs = Q("q_itemsets_pairs",
    s"""WITH $itemCtes,
       |fl AS (SELECT doc_id, list_sort(list(tok)) AS fs FROM fu GROUP BY doc_id),
       |pr AS (SELECT unnest(flatten(
       |         list_transform(generate_series(1, len(fs) - 1), i ->
       |           list_transform(generate_series(i + 1, len(fs)), j ->
       |             [fs[i], fs[j]])))) AS p
       |       FROM fl WHERE len(fs) >= 2)
       |SELECT p[1] AS item_a, p[2] AS item_b,
       |       CAST(count(*) AS BIGINT) AS support
       |FROM pr GROUP BY 1, 2
       |HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM n)
       |ORDER BY support DESC, item_a, item_b""".stripMargin) { (s, d) =>
    val (fs, minsup) = freqArrays(s, d)
    freqPairs(fs, minsup)
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
  }

  /** Frequent triples with the real Apriori staging: candidate
    * triples are generated map-side per document, then PRUNED by a
    * broadcast semi-join against the candidate set derived from F₂
    * (join F₂ with itself on the first item, keep (a,b,c) only when
    * (b,c) is also frequent) BEFORE the counting shuffle. The oracle
    * skips the prune — by the Apriori property (support is
    * antimonotone under set inclusion) pruning never changes which
    * triples reach minsup, only how many rows the count shuffles. */
  private val qTriples = Q("q_itemsets_triples",
    s"""WITH $itemCtes,
       |fl AS (SELECT doc_id, list_sort(list(tok)) AS fs FROM fu GROUP BY doc_id),
       |pr AS (SELECT doc_id, unnest(flatten(
       |         list_transform(generate_series(1, len(fs) - 1), i ->
       |           list_transform(generate_series(i + 1, len(fs)), j ->
       |             [fs[i], fs[j]])))) AS p
       |       FROM fl WHERE len(fs) >= 2),
       |tr AS (SELECT pr.p[1] AS a, pr.p[2] AS b, fu.tok AS c
       |       FROM pr JOIN fu ON fu.doc_id = pr.doc_id AND fu.tok > pr.p[2])
       |SELECT a AS item_a, b AS item_b, c AS item_c,
       |       CAST(count(*) AS BIGINT) AS support
       |FROM tr GROUP BY 1, 2, 3
       |HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM n)
       |ORDER BY support DESC, item_a, item_b, item_c""".stripMargin) { (s, d) =>
    val (fs, minsup) = freqArrays(s, d)
    val f2 = freqPairs(fs, minsup)
    // Apriori candidate generation from F₂: (a,b)⋈(a,c) with b<c,
    // kept only if (b,c) ∈ F₂. |F₂| ≤ C(|F₁|,2) — broadcast-sized.
    val cands = f2.select(col("item_a").as("a"), col("item_b").as("b"))
      .join(f2.select(col("item_a").as("a"), col("item_b").as("c")), Seq("a"))
      .where(col("b") < col("c"))
      .join(f2.select(col("item_a").as("b"), col("item_b").as("c")),
        Seq("b", "c"), "left_semi")
    fs.select(explode(tripleCombos(col("fs"))).as("t"))
      .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .join(broadcast(cands), Seq("a", "b", "c"), "left_semi")
      .groupBy(col("a").as("item_a"), col("b").as("item_b"), col("c").as("item_c"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(minsup))
      .where(col("support") >= col("minsup"))
      .select("item_a", "item_b", "item_c", "support")
      .orderBy(col("support").desc, col("item_a"), col("item_b"), col("item_c"))
  }

  /** Association rules a→b over the frequent pairs: confidence =
    * supp(ab)/supp(a), lift = confidence / (supp(b)/n). Both
    * directions of every frequent pair, kept at confidence ≥ 0.75.
    * All ratios are single divisions of identical BIGINTs rounded to
    * 4 places — the Q.scala determinism convention. */
  private val qRules = Q("q_itemsets_rules",
    s"""WITH $itemCtes,
       |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM w),
       |f1c AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM fu GROUP BY tok),
       |fl AS (SELECT doc_id, list_sort(list(tok)) AS fs FROM fu GROUP BY doc_id),
       |pr AS (SELECT unnest(flatten(
       |         list_transform(generate_series(1, len(fs) - 1), i ->
       |           list_transform(generate_series(i + 1, len(fs)), j ->
       |             [fs[i], fs[j]])))) AS p
       |       FROM fl WHERE len(fs) >= 2),
       |f2 AS (SELECT p[1] AS a, p[2] AS b, CAST(count(*) AS BIGINT) AS supp
       |       FROM pr GROUP BY 1, 2
       |       HAVING CAST(count(*) AS BIGINT) >= (SELECT minsup FROM n)),
       |bi AS (SELECT a, b, supp FROM f2
       |       UNION ALL SELECT b, a, supp FROM f2),
       |r AS (SELECT bi.a AS antecedent, bi.b AS consequent, bi.supp AS support,
       |             round(bi.supp::DOUBLE / ca.df, 4) AS confidence,
       |             round((bi.supp::DOUBLE * (SELECT n FROM nd))
       |                   / (ca.df::DOUBLE * cb.df), 4) AS lift
       |      FROM bi JOIN f1c ca ON ca.tok = bi.a JOIN f1c cb ON cb.tok = bi.b)
       |SELECT * FROM r WHERE confidence >= 0.75
       |ORDER BY confidence DESC, antecedent, consequent""".stripMargin) { (s, d) =>
    val (fs, minsup) = freqArrays(s, d)
    val nd = fs.select(count(lit(1)).cast("long").as("n"))
    val f1c = fs.select(explode(col("fs")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val f2 = freqPairs(fs, minsup)
      .select(col("item_a").as("a"), col("item_b").as("b"),
        col("support").as("supp"))
    val bi = f2.union(f2.select(col("b").as("a"), col("a").as("b"), col("supp")))
    bi.join(broadcast(f1c.select(col("tok").as("a"), col("df").as("dfa"))), Seq("a"))
      .join(broadcast(f1c.select(col("tok").as("b"), col("df").as("dfb"))), Seq("b"))
      .crossJoin(broadcast(nd))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("supp").as("support"),
        round(col("supp").cast("double") / col("dfa"), 4).as("confidence"),
        round(col("supp").cast("double") * col("n")
          / (col("dfa").cast("double") * col("dfb")), 4).as("lift"))
      .where(col("confidence") >= 0.75)
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
  }

  val all: Seq[Q] = Seq(qPairs, qTriples, qRules)
}
