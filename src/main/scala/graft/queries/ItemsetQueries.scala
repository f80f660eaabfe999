package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * is tiny (minsup at corpus fraction f caps |F₁| at (avg distinct
  * items per doc)/f), so F₁ — and everything derived from it — is
  * DICTIONARY-ENCODED: each frequent token gets a dense integer rank,
  * per-doc baskets become sorted int arrays, and every candidate
  * itemset is PACKED into one 64-bit key (20 bits per rank, |F₁| <
  * 2²⁰ enforced), so the counting shuffles move longs instead of
  * string structs and map-side combine collapses each partition to
  * ≤ C(|F₁|, r) keys before the exchange. Candidate generation is
  * MAP-SIDE: each document emits combinations of its OWN frequent
  * items (per-doc cost C(m, 2) / C(m, 3) with m = |doc ∩ F₁|) — no
  * self-join, nothing all-pairs in the corpus dimension; cost is
  * linear in documents for fixed minsup fraction. The Apriori
  * candidate prune (every 2-subset of an emitted triple must itself
  * be frequent) runs as a broadcast semi-join on the packed key
  * BEFORE the counting shuffle, so on prunable corpora the shuffle
  * volume drops by exactly the pruned fraction; on this synthetic
  * corpus the 30 frequent tokens co-occur almost everywhere, so the
  * prune is a no-op by data, not by construction. The oracle needs
  * neither the encoding nor the prune — by the Apriori property
  * (support is antimonotone under set inclusion) pruning never
  * changes the final answer, and the rank decode is a broadcast
  * dimension join — so the hash match proves both devices invisible.
  *
  * Reference anchor: the reference has no itemset operator; this is
  * part of the mandated beyond-reference LLM-pipeline surface
  * (SURVEY.md §2.12 "corpus analytics").
  */
object ItemsetQueries {

  /** 20-bit rank packing: itemset {a,b} → a·2²⁰+b, {a,b,c} →
    * a·2⁴⁰+b·2²⁰+c. Injective while |F₁| < 2²⁰ (enforced below).
    * Public (`PackBase`) so the streaming twin packs identically. */
  val PackBase: Long = 1L << 20
  private val B = PackBase

  /** The F₁ rank dictionary as a driver-side map `token → rank` —
    * the broadcast-model form the streaming twin rides to its tasks
    * (the Bpe.encode pattern: a dimension-sized model captured by a
    * stateless stage). Dimension-sized by the minsup argument. */
  def rankDict(s: SparkSession, d: String): Map[String, Long] = {
    val (_, dict, _) = freqRanked(s, d)
    dict.select(col("tok"), col("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

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

  /** Engine prefix: the F₁ rank dictionary `(tok, r)` (broadcast-
    * tiny by the minsup argument), WEIGHTED distinct baskets
    * `(rs, cnt)` — identical sorted rank arrays collapsed with their
    * document multiplicity, so the combinatorial pair/triple explode
    * below runs once per DISTINCT basket and every support is a
    * `sum(cnt)` instead of a `count(*)` (r19: boilerplate-heavy
    * corpora repeat baskets; the collapse is a node-scale exchange
    * that can only shrink the explode) — and the 1-row minsup frame.
    * The basket frame is fenced: pairs, triples and rules all
    * re-derive from it, and the frequent-1 aggregation underneath
    * would otherwise re-scan the corpus per consumer. The rank window
    * runs over the dimension-sized F₁ frame, never the corpus. */
  private def freqRanked(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
    // corpus count straight off the documents scan (NOT the exploded
    // or frequent-filtered frames — a doc with no [frequent] tokens
    // must still count, exactly as the oracle's `count(*) FROM w`)
    val minsup = t(s, d, "documents")
      .select(count(lit(1)).as("nd"))
      .select(ceil(col("nd") * lit(0.10)).cast("long").as("minsup"))
    val dict = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(minsup))
      .where(col("df") >= col("minsup"))
      .select(col("tok"), col("df"),
        (row_number().over(Window.orderBy(col("tok"))) - 1).cast("long").as("r"))
      // 20-bit packing domain guard: |F₁| ≥ 2²⁰ means minsup admits a
      // million-item universe — misconfigured. Fail LOUDLY (raise_error
      // on the first over-cap rank) rather than filter: a silent drop
      // would return incomplete frequent sets in a standalone run where
      // no oracle comparison is there to catch the missing rows.
      .select(col("tok"), col("df"),
        when(col("r") < B, col("r")).otherwise(raise_error(concat(
          lit(s"itemset rank overflow: |F1| exceeds the 2^20 packing cap"
            + " (raise minsup); first over-cap rank "),
          col("r").cast("string")))).as("r"))
      .fenced()
    val rs = toks
      .join(broadcast(dict.select("tok", "r")), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("r"))).as("rs"))
      .groupBy(col("rs"))
      .agg(count(lit(1)).as("cnt"))
      .fenced()
    (rs, dict, minsup)
  }

  /** Spread the basket frame across tasks before a combinatorial
    * explode. The basket frame is BYTE-tiny (sorted rank arrays), so
    * AQE's byte-advisory coalescing packs it into one partition — and
    * the C(m,r) explode then runs as a single straggler task (measured
    * 5.3 s for ~9 M exploded triples at sf0.1, r19). Partitioning must
    * follow the EXPLODED work, which the byte stats cannot see: derive
    * it from Σ C(len(rs), r) — one cheap driver action against the
    * fenced node-scale frame (the PageRank `deg.count()` precedent) —
    * at ~500 k exploded rows per task, capped at the scheduler's
    * parallelism (more tasks than cores only adds scheduling overhead;
    * the explode streams into a spillable partial agg, so per-task
    * memory is bounded regardless of partition size). */
  private def spreadForExplode(rs: DataFrame, arity: Int): DataFrame = {
    val m = size(col("rs")).cast("long")
    // column `/` is double division — keep the falling factorial in
    // long arithmetic and divide by the constant driver-side
    val work = if (arity == 2) m * (m - 1) else m * (m - 1) * (m - 2)
    val total = Option(rs.agg(sum(work)).head.get(0))
      .fold(0L)(_.asInstanceOf[Long]) / (if (arity == 2) 2 else 6)
    val cores = rs.sparkSession.sparkContext.defaultParallelism
    val parts = math.max(1L, math.min(cores.toLong, total / 500000L + 1)).toInt
    if (parts <= 1) rs else rs.repartition(parts, col("rs"))
  }

  /** Packed ordered pairs (rank_a < rank_b) of one sorted rank array,
    * generated map-side with nested HOFs — no self-join, no shuffle,
    * primitive longs only. */
  private def pairPacks(rs: Column): Column =
    flatten(transform(rs, (a, i) =>
      transform(slice(rs, i + 2, size(rs)), b => a * B + b)))

  /** Packed ordered triples (a < b < c), same map-side scheme: for
    * element i pair with j > i, then with every element after j
    * (1-based slice start i+j+3 because b sits at 0-based index
    * i+1+j of `rs`). */
  private def triplePacks(rs: Column): Column =
    flatten(flatten(transform(rs, (a, i) =>
      transform(slice(rs, i + 2, size(rs)), (b, j) =>
        transform(slice(rs, i + j + lit(3), size(rs)), c =>
          a * B * B + b * B + c)))))

  /** Packed frequent pairs `(pk, support)` — the F₂ pass. One
    * long-keyed exchange, map-side combined to ≤ C(|F₁|,2) keys;
    * support sums the collapsed-basket multiplicities. */
  private def freqPairsPacked(rs: DataFrame, minsup: DataFrame): DataFrame =
    spreadForExplode(rs, 2)
      .select(col("cnt"), explode(pairPacks(col("rs"))).as("pk"))
      .groupBy(col("pk"))
      .agg(sum(col("cnt")).as("support"))
      .crossJoin(broadcast(minsup))
      .where(col("support") >= col("minsup"))
      .select("pk", "support")

  /** Broadcast rank→token decode of one packed component. */
  private def decode(df: DataFrame, dict: DataFrame,
      rankCol: Column, as: String): DataFrame =
    df.join(broadcast(dict.select(col("r"), col("tok").as(as))),
      rankCol === col("r")).drop("r")

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
    val (rs, dict, minsup) = freqRanked(s, d)
    val f2 = freqPairsPacked(rs, minsup)
    // unpack with shift/mod — exact long arithmetic (a `/` on longs is
    // DOUBLE division in Spark, and packed triples exceed 2⁵³)
    val a = decode(f2, dict, shiftright(col("pk"), 20), "item_a")
    decode(a, dict, col("pk") % B, "item_b")
      .select("item_a", "item_b", "support")
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
  }

  /** Frequent triples with the real Apriori staging: candidate
    * triples are generated map-side per document as packed longs,
    * then PRUNED by a broadcast semi-join against the packed
    * candidate set derived from F₂ (join F₂ with itself on the first
    * rank, keep (a,b,c) only when (b,c) is also frequent) BEFORE the
    * counting shuffle. The oracle skips the prune — by the Apriori
    * property pruning never changes which triples reach minsup, only
    * how many rows the count shuffles. */
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
    val (rs, dict, minsup) = freqRanked(s, d)
    val f2 = freqPairsPacked(rs, minsup)
    // Apriori candidate generation from F₂, in the packed domain:
    // (a,b)⋈(a,c) with b<c, kept only if (b,c) ∈ F₂.
    // |F₂| ≤ C(|F₁|,2) — broadcast-sized.
    val p2 = f2.select(shiftright(col("pk"), 20).as("a"),
      (col("pk") % B).as("b"))
    val cands = p2
      .join(p2.select(col("a"), col("b").as("c")), Seq("a"))
      .where(col("b") < col("c"))
      .join(p2.select(col("a").as("b"), col("b").as("c")),
        Seq("b", "c"), "left_semi")
      .select((col("a") * B * B + col("b") * B + col("c")).as("tk"))
    val counted = spreadForExplode(rs, 3)
      .select(col("cnt"), explode(triplePacks(col("rs"))).as("tk"))
      .join(broadcast(cands), Seq("tk"), "left_semi")
      .groupBy(col("tk"))
      .agg(sum(col("cnt")).as("support"))
      .crossJoin(broadcast(minsup))
      .where(col("support") >= col("minsup"))
    val a = decode(counted, dict, shiftright(col("tk"), 40), "item_a")
    val ab = decode(a, dict, shiftright(col("tk"), 20) % B, "item_b")
    decode(ab, dict, col("tk") % B, "item_c")
      .select("item_a", "item_b", "item_c", "support")
      .orderBy(col("support").desc, col("item_a"), col("item_b"), col("item_c"))
  }

  /** Association rules a→b over the frequent pairs: confidence =
    * supp(ab)/supp(a), lift = confidence / (supp(b)/n). Both
    * directions of every frequent pair, kept at confidence ≥ 0.75.
    * All ratios are single divisions of identical BIGINTs rounded to
    * 4 places — the Q.scala determinism convention. The per-item
    * document frequencies ride the F₁ dictionary (already counted
    * there); only the pair counts touch the corpus. */
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
    val (rs, dict, minsup) = freqRanked(s, d)
    // all documents, not |rs| — rs only has docs with ≥1 frequent token
    val nd = t(s, d, "documents").select(count(lit(1)).cast("long").as("n"))
    val f2 = freqPairsPacked(rs, minsup)
      .select(shiftright(col("pk"), 20).as("ra"),
        (col("pk") % B).as("rb"), col("support").as("supp"))
    val bi = f2.union(f2.select(col("rb").as("ra"), col("ra").as("rb"), col("supp")))
    bi.join(broadcast(dict.select(col("r").as("ra"),
        col("tok").as("antecedent"), col("df").as("dfa"))), Seq("ra"))
      .join(broadcast(dict.select(col("r").as("rb"),
        col("tok").as("consequent"), col("df").as("dfb"))), Seq("rb"))
      .crossJoin(broadcast(nd))
      .select(col("antecedent"), col("consequent"), col("supp").as("support"),
        round(col("supp").cast("double") / col("dfa"), 4).as("confidence"),
        round(col("supp").cast("double") * col("n")
          / (col("dfa").cast("double") * col("dfb")), 4).as("lift"))
      .where(col("confidence") >= 0.75)
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
  }

  val all: Seq[Q] = Seq(qPairs, qTriples, qRules)
}
