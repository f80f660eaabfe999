package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._
import graft.queries.Q.t
import graft.Fence.FenceOps

/** Training-data deduplication over `documents`:
  *
  *  - exact (hash-groupBy on a content fingerprint — never ship the
  *    full text through the shuffle);
  *  - n-gram Jaccard (inverted-index self-join; the *verification*
  *    path — quadratic in bucket size, so at 100 TB it runs only on
  *    LSH candidates);
  *  - MinHash + LSH banding (the *scale* path: k=32 portable hashes,
  *    8 bands × 4 rows; candidate generation is a single equi-join on
  *    (band, band_hash) — linear shuffle, no all-pairs anywhere);
  *  - SimHash signatures + Hamming-distance pairs.
  *
  * All four are oracle-checked against DuckDB bit-for-bit thanks to
  * the md5-derived portable hash family (graft.functions.PortableHash).
  */
object DedupQueries {

  private val K = 32 // minhash signature length
  private val B = 8  // LSH bands
  private val R = K / B // rows per band
  private[graft] val NGram = 3
  private val SimBits = 32

  // ------------------------------------------------------------- shingling

  /** (doc_id, lang, sh) — distinct word n-gram shingles per document,
    * via the native one-pass Shingles expression (the declarative
    * `transform(sequence(...))` form costs ~15µs/shingle in the
    * lambda interpreter — it dominated the whole query). */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.GraftExpressions.shingles(
        lower(col("text")), NGram, dedup = true)).as("sh"))

  /** DuckDB twin of shingleRows as CTE text (ws → sh). */
  private val shingleCtes: String =
    """ws AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
      |        FROM documents),
      |sh AS (SELECT DISTINCT doc_id, lang,
      |         unnest(CASE WHEN len(w) >= 3
      |                THEN list_transform(generate_series(1, len(w) - 2),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |                ELSE [] END) AS sh
      |       FROM ws)""".stripMargin

  // ----------------------------------------------------------- exact dedup

  private val qExact = Q("q_dedup_exact",
    """SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin) { (s, d) =>
    // Group by the 16-byte fingerprint, not the document body: at
    // 100 TB the shuffle carries hashes, not texts.
    t(s, d, "documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("keep_id"))
  }

  // -------------------------------------------------- exact n-gram Jaccard

  /** Exact n-gram Jaccard over ALL shingle-sharing pairs — the exact
    * small-scale KERNEL, not the scale path: with no df cap, the
    * shingle self-join is quadratic in the hottest shingle bucket
    * (a shingle shared by m documents contributes C(m,2) candidate
    * rows). That is acceptable here because the kernel exists to
    * pin semantics against the oracle bit-for-bit; at corpus scale
    * use `q_dedup_pipeline` (LSH-banded candidates) or
    * `q_sim_allpairs` (df-capped postings), both of which bound the
    * per-feature fanout. The per-document count joins below are
    * shuffled equi-joins on the unique doc id — one row per document
    * is corpus-scaled, never a broadcast. */
  private val qNgram = Q("q_dedup_ngram",
    s"""WITH $shingleCtes,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS ai, b.doc_id AS bi, count(*) AS c
       |  FROM sh a JOIN sh b
       |    ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT ai AS a_id, bi AS b_id,
       |  round(c / (x.n + y.n - c), 4) AS jac
       |FROM pairs JOIN cnt x ON ai = x.doc_id JOIN cnt y ON bi = y.doc_id
       |WHERE c / (x.n + y.n - c) >= 0.5
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    // Materialize the shingle set once — a plain self-join would
    // recompute the split/transform/explode subtree on both sides —
    // and join on a 64-bit shingle hash so the exchanges carry longs,
    // not strings (engine-side only; counts are identical to the
    // oracle's string join up to 2^-64-probability collisions).
    val sh = shingleRows(t(s, d, "documents"))
      .select(col("doc_id"), col("lang"), xxhash64(col("sh")).as("sh"))
      .fenced()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.select(col("doc_id").as("ai"), col("lang"), col("sh"))
      .join(sh.select(col("doc_id").as("bi"), col("lang").as("lb"), col("sh").as("sb")),
        col("sh") === col("sb") && col("lang") === col("lb") && col("ai") < col("bi"))
      .groupBy(col("ai"), col("bi")).agg(count(lit(1)).as("c"))
    val jac = col("c") / (col("na") + col("nb") - col("c"))
    pairs
      .join(cnt.select(col("doc_id").as("ai"), col("n").as("na")), "ai")
      .join(cnt.select(col("doc_id").as("bi"), col("n").as("nb")), "bi")
      .where(jac >= 0.5)
      .select(col("ai").as("a_id"), col("bi").as("b_id"), round(jac, 4).as("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // --------------------------------------------------------- MinHash + LSH

  /** Raw (non-distinct) shingles: min() is idempotent over
    * duplicates, so MinHash needs no dedup — this drops the distinct
    * shuffle AND moves the string→int hash before the aggregation, so
    * only (doc_id, h0: long) ever reaches the exchange. At 100 TB the
    * per-doc shingle strings never leave the scan stage. */
  private def minhashSignature(s: SparkSession, d: String): DataFrame = {
    val h0 = (md5Long(col("sh")) % P).as("h0")
    val aggs = (0 until K).map(i => min(family(col("h0"), i)).as(s"m$i"))
    t(s, d, "documents")
      .select(col("doc_id"),
        explode(graft.functions.GraftExpressions.shingles(
          lower(col("text")), NGram, dedup = false)).as("sh"))
      .select(col("doc_id"), h0)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private def minhashSigSql: String = {
    val h0 = s"(${md5LongSql("sh")} % $P)"
    val mins = (0 until K)
      .map(i => s"min(${familySql("h0", i)}) AS m$i").mkString(",\n         ")
    s"""h AS (SELECT doc_id, $h0 AS h0 FROM sh),
       |sig AS (SELECT doc_id,
       |         $mins
       |        FROM h GROUP BY doc_id)""".stripMargin
  }

  private def bandHash(j: Int): Column =
    md5(concat_ws(",", (0 until R).map(r => col(s"m${j * R + r}").cast("string")): _*))

  private def bandHashSql(j: Int): String = {
    val parts = (0 until R).map(r => s"m${j * R + r}::VARCHAR").mkString(" || ',' || ")
    s"md5($parts)"
  }

  /** The exploded, fenced MinHash band-hash rows (doc_id, band, bh) —
    * the ONE construction of the LSH banding layer, shared by the
    * band-count join (`q_dedup_minhash`), the verified-pair chain
    * (`q_dedup_pipeline`/`q_dedup_cc*`), and the edit-distance verify
    * (`q_dedup_edit`); a single definition so a change to B or the
    * band hash cannot silently diverge the family. */
  private def bandRows(s: SparkSession, d: String): DataFrame =
    minhashSignature(s, d).select(col("doc_id"),
      explode(array((0 until B).map(j =>
        struct(lit(j).as("band"), bandHash(j).as("bh"))): _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
      .fenced()

  /** Distinct band-collision candidate pairs (ai < bi) off
    * [[bandRows]]. */
  private def bandCandidatePairs(s: SparkSession, d: String): DataFrame = {
    val bands = bandRows(s, d)
    bands.select(col("doc_id").as("ai"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("bi"), col("band").as("band2"),
        col("bh").as("bh2")),
        col("band") === col("band2") && col("bh") === col("bh2") &&
          col("ai") < col("bi"))
      .select(col("ai"), col("bi")).distinct()
  }

  private val qMinhash = Q("q_dedup_minhash",
    s"""WITH $shingleCtes,
       |$minhashSigSql,
       |bx AS (
       |${(0 until B).map(j =>
          s"  SELECT doc_id, $j AS band, ${bandHashSql(j)} AS bh FROM sig")
          .mkString("\n  UNION ALL\n")}
       |)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(count(*) AS BIGINT) AS n_bands
       |FROM bx a JOIN bx b
       |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    // band hashes materialize once before the self-join (the signature
    // subtree — shingle + 32 hash-min aggs — is the expensive part)
    val bands = bandRows(s, d)
    bands.select(col("doc_id").as("a_id"), col("band"), col("bh"))
      .join(bands.select(col("doc_id").as("b_id"), col("band").as("band2"),
        col("bh").as("bh2")),
        col("band") === col("band2") && col("bh") === col("bh2") &&
          col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** DuckDB CTE chain ending in `verified(ai, bi, jac)` — the
    * LSH-candidate → exact-Jaccard-verified near-duplicate pair set
    * shared by `q_dedup_pipeline` and `q_dedup_cc`. */
  private def verifiedCtes: String =
    s"""$shingleCtes,
       |$minhashSigSql,
       |bx AS (
       |${(0 until B).map(j =>
          s"  SELECT doc_id, $j AS band, ${bandHashSql(j)} AS bh FROM sig")
          .mkString("\n  UNION ALL\n")}
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ai, b.doc_id AS bi
       |  FROM bx a JOIN bx b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (
       |  SELECT c.ai, c.bi, count(*) AS cc
       |  FROM cand c
       |  JOIN sh s1 ON s1.doc_id = c.ai
       |  JOIN sh s2 ON s2.doc_id = c.bi AND s2.sh = s1.sh
       |  GROUP BY c.ai, c.bi),
       |verified AS (
       |  SELECT ai, bi, cc / (x.n + y.n - cc) AS jac
       |  FROM common JOIN cnt x ON ai = x.doc_id JOIN cnt y ON bi = y.doc_id
       |  WHERE cc / (x.n + y.n - cc) >= 0.5)""".stripMargin

  /** Spark twin of [[verifiedCtes]]: DataFrame of (ai, bi, jac). */
  private[graft] def verifiedPairs(s: SparkSession, d: String): DataFrame = {
    val cand = bandCandidatePairs(s, d)
    val sh = shingleRows(t(s, d, "documents"))
      .select(col("doc_id"), col("sh")).fenced()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.select(col("doc_id").as("ai"), col("sh").as("sha")), "ai")
      .join(sh.select(col("doc_id").as("bi2"), col("sh").as("shb")),
        col("bi") === col("bi2") && col("sha") === col("shb"))
      .groupBy(col("ai"), col("bi")).agg(count(lit(1)).as("cc"))
    val jac = col("cc") / (col("na") + col("nb") - col("cc"))
    // Per-document count joins are shuffled equi-joins on the unique
    // doc id: `cnt` is one row per document — corpus-scaled — so a
    // broadcast hint here would OOM the build side at 100 TB (same
    // bug class as the keep_best labels join fixed in round 5).
    common
      .join(cnt.select(col("doc_id").as("ai"), col("n").as("na")), "ai")
      .join(cnt.select(col("doc_id").as("bi"), col("n").as("nb")), "bi")
      .where(jac >= 0.5)
      .select(col("ai"), col("bi"), jac.as("jac"))
  }

  /** The full production dedup pipeline in one query — the shape that
    * runs at 100 TB: (1) MinHash-LSH candidate generation (linear
    * equi-join on band hashes — never all-pairs), (2) exact Jaccard
    * verification computed ONLY on candidate pairs, (3) keep/drop
    * resolution (drop the higher id, keep its smallest verified
    * partner; the standard single-pass approximation of connected
    * components — `q_dedup_cc` is the exact version). */
  private val qDedupPipeline = Q("q_dedup_pipeline",
    s"""WITH $verifiedCtes
       |SELECT bi AS drop_id, CAST(min(ai) AS BIGINT) AS keep_id,
       |  round(max(jac), 4) AS jac
       |FROM verified GROUP BY bi ORDER BY drop_id""".stripMargin) { (s, d) =>
    verifiedPairs(s, d)
      .groupBy(col("bi").as("drop_id"))
      .agg(min(col("ai")).cast("long").as("keep_id"), round(max(col("jac")), 4).as("jac"))
      .orderBy(col("drop_id"))
  }

  /** Exact duplicate-cluster resolution: connected components over the
    * verified near-duplicate pair graph, each document labelled with
    * the smallest doc_id in its component (the canonical "keeper").
    *
    * Spark side: iterative min-label propagation — labels start as the
    * node's own id and each round take the min over neighbours; the
    * loop is a per-round shuffle join on the (tiny, pair-level) edge
    * set, NOT over the corpus, and converges in ≤ graph-diameter
    * rounds (near-dup clusters are shallow; `localCheckpoint` per
    * round cuts the growing lineage). At 100 TB the edge set after
    * verification is orders of magnitude smaller than the corpus, so
    * the loop's shuffles are negligible next to the one-shot candidate
    * generation. DuckDB twin: recursive transitive closure + min. */
  private val ccOracle: String =
    s"""WITH RECURSIVE $verifiedCtes,
       |e2 AS (SELECT ai AS s, bi AS t FROM verified
       |       UNION ALL SELECT bi, ai FROM verified),
       |reach(s, t) AS (
       |  SELECT s, t FROM e2
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN e2 e ON r.t = e.s),
       |lbl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |        FROM reach GROUP BY s)
       |SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
       |FROM lbl ORDER BY doc_id""".stripMargin

  private def ccQuery(resolver: DataFrame => DataFrame)(
      s: SparkSession, d: String): DataFrame = {
    val edges = verifiedPairs(s, d).select(col("ai"), col("bi")).fenced()
    resolver(edges)
      .select(col("id").as("doc_id"), col("lbl").cast("long").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  private val qDedupCc = Q("q_dedup_cc", ccOracle)(
    ccQuery(graft.operators.ConnectedComponents.resolve))

  /** Same clusters via the diameter-independent alternating
    * large/small-star algorithm — both CC variants are held to the
    * identical recursive-closure oracle. */
  private val qDedupCcStar = Q("q_dedup_cc_star", ccOracle)(
    ccQuery(graft.operators.ConnectedComponents.resolveAlternating))

  /** INCREMENTAL cluster resolution — the ingest form of `q_dedup_cc`
    * (completing the incremental family: exact fingerprints
    * `q_dedup_incremental`, near-text `q_dedup_incremental_near`,
    * embeddings `q_dedup_embed_incremental`, and now the component
    * MERGE step): a new batch brings new verified near-dup edges
    * (new×new and new×prior); the prior corpus already carries a
    * component manifest (doc_id → smallest-id representative). The
    * update CONTRACTS each prior component to its representative —
    * exact because the representative IS the component min, so
    * min-label over {new ids ∪ prior reps} equals min-label over the
    * full union graph — then runs connected components over the
    * contracted NEW-EDGE graph only, and expands merged labels back
    * through the manifest. The per-ingest ITERATIVE work is
    * |new-edge|-scale, never corpus-scale. The manifest travels the
    * REAL deployment path: the prior-side resolution is written to
    * parquet and read back ([[graft.operators.DedupManifest.persist]])
    * before the contraction joins touch it — the write→read loop an
    * ingest N+1 pays against ingest N's store (its derivation cost
    * belongs to the original corpus build, amortized across ingests;
    * ManifestRoundTripSpec drives two CHAINED ingests through the
    * same store and proves them hash-equal to the one-shot batch).
    * Output: the manifest DELTA — every new-batch document in a
    * verified pair, every prior document whose representative
    * changed, and prior manifest-absent singletons drawn into a
    * component; untouched rows never appear (what an ingest commits).
    * Oracle: recursive closure over prior-only and union graphs,
    * emitting rows where the two labelings differ or no prior row
    * exists. */
  private val qDedupCcIncremental = Q("q_dedup_cc_incremental",
    s"""WITH RECURSIVE $verifiedCtes,
       |meta AS (SELECT doc_id, regexp_matches(source, '^src[0-9]$$') AS prior
       |         FROM documents),
       |pe AS (SELECT v.ai, v.bi FROM verified v
       |       JOIN meta a ON v.ai = a.doc_id
       |       JOIN meta b ON v.bi = b.doc_id
       |       WHERE a.prior AND b.prior),
       |pe2 AS (SELECT ai AS s, bi AS t FROM pe
       |        UNION ALL SELECT bi, ai FROM pe),
       |preach(s, t) AS (
       |  SELECT s, t FROM pe2
       |  UNION
       |  SELECT r.s, e.t FROM preach r JOIN pe2 e ON r.t = e.s),
       |plbl AS (SELECT s AS doc_id, least(s, min(t)) AS lbl
       |         FROM preach GROUP BY s),
       |ue2 AS (SELECT ai AS s, bi AS t FROM verified
       |        UNION ALL SELECT bi, ai FROM verified),
       |ureach(s, t) AS (
       |  SELECT s, t FROM ue2
       |  UNION
       |  SELECT r.s, e.t FROM ureach r JOIN ue2 e ON r.t = e.s),
       |ulbl AS (SELECT s AS doc_id, least(s, min(t)) AS lbl
       |         FROM ureach GROUP BY s)
       |SELECT u.doc_id, CAST(u.lbl AS BIGINT) AS cluster_id
       |FROM ulbl u JOIN meta m ON u.doc_id = m.doc_id
       |LEFT JOIN plbl p ON u.doc_id = p.doc_id
       |WHERE (NOT m.prior) OR p.doc_id IS NULL OR p.lbl <> u.lbl
       |ORDER BY u.doc_id""".stripMargin) { (s, d) =>
    val meta = t(s, d, "documents")
      .select(col("doc_id"), col("source").rlike("^src[0-9]$").as("prior"))
    // pair-level frame (verified near-dups + endpoint provenance) —
    // orders of magnitude below corpus scale, fenced once for the
    // three consumers below
    val vp = verifiedPairs(s, d).select(col("ai"), col("bi"))
      .join(meta.select(col("doc_id").as("ai"), col("prior").as("pa")), "ai")
      .join(meta.select(col("doc_id").as("bi"), col("prior").as("pb")), "bi")
      .fenced()
    import graft.operators.DedupManifest
    // the persisted manifest a deployment reads: derived from the
    // prior-only pair graph, WRITTEN to the parquet store and read
    // back — the contraction below consumes the store, not the plan
    val plbl = DedupManifest.persist(
      graft.operators.ConnectedComponents.resolve(
        vp.where(col("pa") && col("pb")).select(col("ai"), col("bi"))),
      DedupManifest.path(s, "cc", d))
    val newEdges = vp.where(!(col("pa") && col("pb")))
    DedupManifest.ccDelta(plbl, newEdges)
      .select(col("doc_id"), col("lbl").cast("long").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** The dedup MANIFEST a corpus build actually ships: every document
    * resolved to its near-dup cluster (singletons included), with the
    * cluster's keeper chosen by QUALITY (most distinct words, ties to
    * the smallest id) rather than the bare min-id rule — what a real
    * pipeline does so the best representative survives. Composition:
    * LSH-verified pairs → connected components (the diameter-
    * independent star variant) → corpus left-join → per-cluster
    * argmax. The per-cluster keeper rides the WindowGroupLimit
    * shortlist; clusters are tiny by construction, the corpus join is
    * keyed on doc_id. The labels side is one row per document that
    * appears in ANY verified near-dup pair — corpus-scaled at a
    * realistic 20–50% dup rate — so it is deliberately NOT
    * broadcast: doc_id is unique and evenly distributed, and a
    * shuffled equi-join on it is the 100 TB-safe plan. */
  private val qDedupKeepBest = Q("q_dedup_keep_best",
    s"""WITH RECURSIVE $verifiedCtes,
       |e2 AS (SELECT ai AS s, bi AS t FROM verified
       |       UNION ALL SELECT bi, ai FROM verified),
       |reach(s, t) AS (
       |  SELECT s, t FROM e2
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN e2 e ON r.t = e.s),
       |lbl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
       |        FROM reach GROUP BY s),
       |docs_q AS (SELECT doc_id,
       |             CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT) AS score
       |           FROM documents),
       |full_lbl AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
       |               d.score
       |             FROM docs_q d LEFT JOIN lbl l USING (doc_id)),
       |rk AS (SELECT *,
       |         row_number() OVER (PARTITION BY cluster_id
       |           ORDER BY score DESC, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY cluster_id) AS n_docs
       |       FROM full_lbl)
       |SELECT CAST(cluster_id AS BIGINT) AS cluster_id, doc_id AS keep_id,
       |       CAST(n_docs AS BIGINT) AS n_docs, score AS keep_score
       |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val edges = verifiedPairs(s, d).select(col("ai"), col("bi")).fenced()
    val labels = graft.operators.ConnectedComponents.resolveAlternating(edges)
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
    val docsQ = t(s, d, "documents").select(col("doc_id"),
      size(array_distinct(split(lower(col("text")), " "))).as("score"))
    val full = docsQ.join(labels.hint("shuffle_merge"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"), col("score"))
    // ONE window spec for both expressions (round 15): the size rides
    // an unbounded frame over the rank ordering, so Spark plans a
    // single WindowExec / single sort over the corpus-scale cluster
    // partitions instead of two passes
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("doc_id"))
    full
      .select(col("doc_id"), col("cluster_id"), col("score"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("n_docs"))
      .where(col("rn") === 1)
      .select(col("cluster_id").cast("long").as("cluster_id"),
        col("doc_id").as("keep_id"), col("n_docs").cast("long").as("n_docs"),
        col("score").as("keep_score"))
      .orderBy(col("cluster_id"))
  }

  // ---------------------------------------------------------------- SimHash

  /** Distinct unigram tokens per doc with their portable digest. */
  private def tokenRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
      .select(col("doc_id"), col("lang"), md5Long(col("tok")).as("h"))

  private[queries] def simhashOf(s: SparkSession, d: String): DataFrame =
    simhashOfN(s, d, SimBits)

  /** `bits`-wide simhash over the 60-bit portable token hash
    * (bits ≤ 60, so no sign-bit cases on either engine). */
  private def simhashOfN(s: SparkSession, d: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 60, s"simhash width $bits outside the 60-bit hash")
    val bitSums = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b"))
    val sig = (0 until bits).map(b =>
      when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    tokenRows(t(s, d, "documents"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), col("lang"), sig.as("simhash"))
  }

  private[queries] def simhashCtes: String = simhashCtesN(SimBits)

  private def simhashCtesN(bits: Int): String = {
    val sums = (0 until bits)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n          ")
    val sig = (0 until bits)
      .map(b => s"CASE WHEN s$b >= 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""tk AS (SELECT DISTINCT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
       |       FROM documents),
       |th AS (SELECT doc_id, lang, ${md5LongSql("tok")} AS h FROM tk),
       |bs AS (SELECT doc_id, lang,
       |          $sums
       |       FROM th GROUP BY doc_id, lang),
       |sg AS (SELECT doc_id, lang, CAST($sig AS BIGINT) AS simhash FROM bs)""".stripMargin
  }

  private val qSimhash = Q("q_dedup_simhash",
    s"""WITH $simhashCtes
       |SELECT doc_id, simhash FROM sg ORDER BY doc_id""".stripMargin) { (s, d) =>
    simhashOf(s, d).select(col("doc_id"), col("simhash")).orderBy(col("doc_id"))
  }

  /** Pigeonhole segmentation for Hamming-banded candidate generation
    * — the simhash counterpart of LSH banding, factored into
    * [[graft.operators.Pigeonhole]] (shared with the 64-bit image
    * dHash dedup, `q_dedup_phash`): exact recall at Hamming ≤ `HamMax`
    * via an equi-join on (segment index, segment value), never
    * all-pairs. */
  /** Scale note (round-10 measurement): a `SimBits`-bit signature's
    * pair graph saturates once C(n,2)·P(Hamming ≤ HamMax) dominates
    * the true near-dup density — for 32 bits at HamMax 6 that is
    * p ≈ 2.7·10⁻⁴, i.e. ~14.7 M random-collision pairs at n = 500 k
    * (HeavyScaleProbe sf1). The production levers, in order: widen
    * the signature (64-bit simhash — the dHash family's width, whose
    * graph stays density-linear at the same n), tighten HamMax, or —
    * when the pair set is only an INTERSECTION operand — never
    * materialize it and evaluate it as a per-pair predicate
    * (`q_dedup_multimodal`'s round-10 plan). */
  private val HamMax = 6
  private val ph = graft.operators.Pigeonhole(SimBits, HamMax)
  private val HamSegs = ph.segments

  private def segmentValue(sig: Column, j: Int): Column =
    ph.segmentValue(sig, j)

  private[queries] val qSimhashPairs = Q("q_dedup_simhash_pairs",
    s"""WITH $simhashCtes
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sg a JOIN sg b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    // Engine side: pigeonhole-banded candidates + exact verify — the
    // SAME output as the oracle's declarative all-pairs formulation
    // (banding is lossless at hamming ≤ HamMax by construction), with
    // the quadratic-per-lang self-join replaced by an equi-join on
    // (seg, seg value, lang). The signature travels with each banded
    // row (one long), so verification needs no join back.
    val sig = simhashOf(s, d).fenced() // reused on both join sides
    val seg = explode(array((0 until HamSegs).map(j =>
      struct(lit(j).as("seg"), segmentValue(col("simhash"), j).as("sv"))): _*))
    val bands = sig.select(col("doc_id"), col("lang"), col("simhash"), seg.as("b"))
      .select(col("doc_id"), col("lang"), col("simhash"),
        col("b.seg").as("seg"), col("b.sv").as("sv"))
    // a pair matching in k segments would surface k times; instead of
    // a distinct() over the (large) candidate set, keep a candidate
    // ONLY at its FIRST matching segment — a pure codegen filter (no
    // earlier segment of the two signatures is bit-identical), so the
    // verify+dedup stage costs zero exchanges
    def segEq(j: Int): Column =
      segmentValue(col("sa"), j) === segmentValue(col("sb"), j)
    val earlierMatch = (0 until HamSegs - 1)
      .map(j => col("seg") > j && segEq(j))
      .reduce(_ || _)
    val ham = bit_count(col("sa").bitwiseXOR(col("sb")))
    bands
      .select(col("doc_id").as("a_id"), col("lang"), col("seg"), col("sv"),
        col("simhash").as("sa"))
      .join(bands.select(col("doc_id").as("b_id"), col("lang").as("lb"),
        col("seg").as("seg2"), col("sv").as("sv2"), col("simhash").as("sb")),
        col("seg") === col("seg2") && col("sv") === col("sv2") &&
          col("lang") === col("lb") && col("a_id") < col("b_id"))
      .where(ham <= HamMax && !earlierMatch)
      .select(col("a_id"), col("b_id"), ham.cast("int").as("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The PRODUCTION simhash operating point (the scale note above,
    * shipped): Manku et al.'s web-scale configuration is a WIDE
    * signature with a tight cut — here 60 bits (the full portable
    * token hash) at Hamming ≤ 3, banded into 4 ~15-bit pigeonhole
    * segments. Where the 32-bit signature's pair graph saturates at
    * n ≈ 500 k (measured: 14.7 M random-collision pairs at synthetic
    * sf1), the 60-bit graph's collision term is ~2⁴⁵× smaller per
    * pair and its segments are wide enough that candidate generation
    * stays density-linear without the combo knob. Same banded plan
    * and first-matching-segment codegen dedup as the 32-bit query;
    * oracle = the declarative all-pairs form over the identical
    * 60-bit construction. */
  private val HamMaxWide = 3
  private val SimBitsWide = 60
  private val phW = graft.operators.Pigeonhole(SimBitsWide, HamMaxWide)

  private val qSimhashWide = Q("q_dedup_simhash_wide",
    s"""WITH ${simhashCtesN(SimBitsWide)}
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sg a JOIN sg b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HamMaxWide
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val sig = simhashOfN(s, d, SimBitsWide).fenced()
    val seg = explode(array((0 until phW.segments).map(j =>
      struct(lit(j).as("seg"), phW.segmentValue(col("simhash"), j).as("sv"))): _*))
    val bands = sig.select(col("doc_id"), col("lang"), col("simhash"), seg.as("b"))
      .select(col("doc_id"), col("lang"), col("simhash"),
        col("b.seg").as("seg"), col("b.sv").as("sv"))
    def segEq(j: Int): Column =
      phW.segmentValue(col("sa"), j) === phW.segmentValue(col("sb"), j)
    val earlierMatch = (0 until phW.segments - 1)
      .map(j => col("seg") > j && segEq(j))
      .reduce(_ || _)
    val ham = bit_count(col("sa").bitwiseXOR(col("sb")))
    bands
      .select(col("doc_id").as("a_id"), col("lang"), col("seg"), col("sv"),
        col("simhash").as("sa"))
      .join(bands.select(col("doc_id").as("b_id"), col("lang").as("lb"),
        col("seg").as("seg2"), col("sv").as("sv2"), col("simhash").as("sb")),
        col("seg") === col("seg2") && col("sv") === col("sv2") &&
          col("lang") === col("lb") && col("a_id") < col("b_id"))
      .where(ham <= HamMaxWide && !earlierMatch)
      .select(col("a_id"), col("b_id"), ham.cast("int").as("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Repeated-passage detection — the positional-n-gram form of exact
    * substring dedup (public technique: Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL'22, which uses a
    * suffix array; the distributed approximation indexes every
    * OVERLAPPING word 5-gram position): a gram occurring in ≥ 2
    * distinct documents marks its positions as duplicated text, and
    * each document reports what fraction of its gram positions is
    * cross-document duplicated — the "duplicate text ratio" pruning
    * signal. Distinct-shingle Jaccard (q_dedup_ngram) measures
    * SET overlap; this measures POSITIONAL coverage, so a document
    * that embeds one viral paragraph in original text scores exactly
    * the paragraph's share.
    *
    * Scale shape: gram strings are digested to 60-bit longs at the
    * scan; the gram-frequency group-by and the position join both key
    * on the digest (map-side combinable; stopword-run hot grams are
    * partial-agg'd before the exchange). The DUPLICATED-digest set is
    * the thing fenced (bounded by the repeated vocabulary); the
    * token-scale position explode is re-derived per consumer rather
    * than materialized to executor disk at corpus scale. */
  private val qDedupSubstring = Q("q_dedup_substring",
    """WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents),
      |g AS (SELECT doc_id,
      |        unnest(CASE WHEN len(w) >= 5
      |               THEN list_transform(generate_series(1, len(w) - 4),
      |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] ||
      |                         ' ' || w[i+3] || ' ' || w[i+4])
      |               ELSE [] END) AS g
      |      FROM ws),
      |dup AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      |pd AS (SELECT doc_id, len(w) - 4 AS n_pos FROM ws WHERE len(w) >= 5),
      |dd AS (SELECT g.doc_id, count(*) AS n_dup
      |       FROM g JOIN dup ON g.g = dup.g GROUP BY g.doc_id)
      |SELECT p.doc_id, CAST(p.n_pos AS BIGINT) AS n_pos,
      |  CAST(coalesce(dd.n_dup, 0) AS BIGINT) AS n_dup,
      |  round(coalesce(dd.n_dup, 0) / CAST(p.n_pos AS DOUBLE), 4) AS dup_ratio
      |FROM pd p LEFT JOIN dd ON p.doc_id = dd.doc_id
      |ORDER BY p.doc_id""".stripMargin) { (s, d) =>
    // `g` is a corpus-token-scale position frame: deliberately NOT
    // checkpointed (materializing it to executor disk is ~1× the
    // corpus at 100 TB — the q_sample_importance lesson). The two
    // gram consumers re-derive it (a scan + explode + map-side work,
    // cheaper than a corpus-scale disk round-trip); the per-doc
    // position COUNT needs no explode at all (n_pos = len − 4), so
    // pd is a plain scan. What IS fenced is the duplicated-digest
    // set — bounded by the repeated vocabulary.
    def g = t(s, d, "documents")
      .select(col("doc_id"),
        explode(graft.functions.GraftExpressions.shingles(
          lower(col("text")), 5, dedup = false)).as("g5"))
      .select(col("doc_id"), md5Long(col("g5")).as("h"))
    val dup = g.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("ndocs"))
      .where(col("ndocs") >= 2).select(col("h"))
      .fenced()
    val pd = t(s, d, "documents")
      .select(col("doc_id"),
        (size(split(lower(col("text")), " ")) - 4).cast("long").as("n_pos"))
      .where(col("n_pos") >= 1)
    val dd = g.join(dup, "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
      .withColumnRenamed("doc_id", "dd_id")
    pd.join(dd, col("doc_id") === col("dd_id"), "left")
      .select(col("doc_id"), col("n_pos"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(coalesce(col("n_dup"), lit(0L)) / col("n_pos").cast("double"), 4)
          .as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------- duplicated-SPAN removal

  /** Minimum duplicated-run length (tokens) worth cutting — the
    * token-granular analog of Lee et al.'s 50-char threshold. */
  private val SpanMin = 8

  /** Duplicated-span REMOVAL with document reassembly — the pass Lee
    * et al. (ACL'22) actually run on training corpora, where
    * [[qDedupSubstring]] only SCORES: find every token position
    * covered by a word 5-gram occurring ≥ 2 times anywhere in the
    * corpus (including within one document — self-repetition is
    * duplicated text too), merge covered positions into maximal runs
    * (gaps-and-islands), CUT runs of ≥ [[SpanMin]] tokens, and
    * reassemble each document from its surviving tokens in order.
    * Short covered runs stay: cutting a 5-token incidental overlap
    * mid-sentence destroys more signal than it removes, which is why
    * the threshold exists in the original. Output: per-document
    * before/removed/after token counts and the md5 of the cleaned
    * text (the digest keeps result rows bounded; the cleaned string
    * itself is one `array_join` away).
    *
    * Scale shape: grams are digested to 60-bit longs at the scan
    * ([[qDedupSubstring]]'s stance); the ≥2 frequency cut is a
    * map-side-combinable digest group-by whose DUPLICATED-digest
    * output (bounded by the repeated vocabulary) is the only fenced
    * frame — the token-scale gram explode is re-derived per consumer
    * instead of materialized to executor disk at corpus scale;
    * coverage is a bounded ×5
    * positional explode of DUPLICATED gram starts only; run-merging
    * is a per-document window (partition = doc_id, bounded by
    * document length — never a corpus-wide window); the reassembly
    * shuffles kept tokens once, keyed by the unique doc_id, with the
    * in-group sort bounded by one document (the q_chunk_dedup
    * reassembly stance). Everything is linear in corpus size. */
  private def dedupSpanSql(prefix: String, src: String): String =
    s"""WITH ${prefix}ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w
       |        FROM $src),
       |tok AS (SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS tw
       |        FROM ws),
       |g AS (SELECT doc_id,
       |        unnest(CASE WHEN len(w) >= 5
       |               THEN list_transform(generate_series(1, len(w) - 4),
       |                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] ||
       |                         ' ' || w[i+3] || ' ' || w[i+4])
       |               ELSE [] END) AS g,
       |        unnest(CASE WHEN len(w) >= 5
       |               THEN generate_series(1, len(w) - 4) ELSE [] END) AS i
       |      FROM ws),
       |dupg AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
       |cov AS (SELECT DISTINCT d.doc_id, d.i + k.range AS pos
       |        FROM g d JOIN dupg USING (g) CROSS JOIN range(0, 5) k),
       |runs AS (SELECT doc_id, pos,
       |           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
       |             AS grp
       |         FROM cov),
       |spans AS (SELECT doc_id, grp FROM runs
       |          GROUP BY doc_id, grp HAVING count(*) >= $SpanMin),
       |rem AS (SELECT r.doc_id, r.pos FROM runs r
       |        JOIN spans s ON s.doc_id = r.doc_id AND s.grp = r.grp),
       |kept AS (SELECT t.doc_id, t.i, t.tw FROM tok t
       |         LEFT JOIN rem r ON r.doc_id = t.doc_id AND r.pos = t.i
       |         WHERE r.pos IS NULL),
       |ka AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_after,
       |         md5(string_agg(tw, ' ' ORDER BY i)) AS clean_md5
       |       FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_before FROM ws)
       |SELECT tot.doc_id, tot.n_before,
       |  tot.n_before - COALESCE(ka.n_after, 0) AS n_removed,
       |  COALESCE(ka.n_after, 0) AS n_after,
       |  COALESCE(ka.clean_md5, md5('')) AS clean_md5
       |FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
       |ORDER BY tot.doc_id""".stripMargin

  private def dedupSpanPlan(docs: DataFrame): DataFrame = {
    // gram starts, 1-based, digested (qDedupSubstring's stance) —
    // token-scale, so re-derived per consumer; only the bounded
    // duplicated-digest set below is fenced
    def grams = docs
      .select(col("doc_id"),
        posexplode(graft.functions.GraftExpressions.shingles(
          lower(col("text")), 5, dedup = false)).as(Seq("p", "g5")))
      .select(col("doc_id"), (col("p") + 1).as("i"), md5Long(col("g5")).as("h"))
    val dupg = grams.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 2).select(col("h"))
      .fenced()
    val dupStarts = grams.join(dupg, "h")
      .select(col("doc_id"), col("i").as("pos"))
    spanSweep(docs, dupStarts, 5, SpanMin)
      .select(col("doc_id"), col("n_before"), col("n_removed"),
        col("n_after"), col("clean_md5"))
      .orderBy(col("doc_id"))
  }

  private val qDedupSpan = Q("q_dedup_span",
    dedupSpanSql("", "documents")) { (s, d) =>
    dedupSpanPlan(t(s, d, "documents").select(col("doc_id"), col("text")))
  }

  /** CTE prefix doubling the corpus for [[qDedupSpanXl]]: the copy is
    * each document with its TOKEN ORDER REVERSED and `doc_id + n` —
    * deterministic and bit-exact on both engines (pure list ops), and
    * unlike an identical copy it does not degenerate into every gram
    * being duplicated: reversed text shares almost no 5-gram with its
    * original, so the duplicated-gram structure stays realistic while
    * n doubles. */
  private val spanXlPrefix: String =
    """docs0 AS (SELECT doc_id, text FROM documents),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs0),
      |documents2 AS (SELECT doc_id, text FROM docs0
      |  UNION ALL
      |  SELECT doc_id + nd.n,
      |    array_to_string(list_reverse(string_split(text, ' ')), ' ')
      |  FROM docs0 CROSS JOIN nd),
      |""".stripMargin

  /** [[qDedupSpan]] over the DOUBLED corpus — the third-size point of
    * the round-12 adaptive-constant sweep applied to the span family:
    * the whole mark/merge/cut/reassemble pipeline re-verified
    * hash-exact at a corpus size (and duplicated-gram density)
    * neither driver SF reaches. */
  private val qDedupSpanXl = Q("q_dedup_span_xl",
    dedupSpanSql(spanXlPrefix, "documents2")) { (s, d) =>
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    // bounded driver action: one count for the copy's id offset
    val n = docs.count()
    dedupSpanPlan(docs.union(docs.select((col("doc_id") + n).as("doc_id"),
      array_join(reverse(split(col("text"), " ")), " ").as("text"))))
  }

  /** Shared SPAN SWEEP — expand covered gram STARTS to positions,
    * merge maximal runs per document (gaps-and-islands), cut runs ≥
    * `spanMin`, reassemble each document from its surviving tokens.
    * The ONE implementation behind both [[qDedupSpan]]'s tail and
    * `streaming.StreamingSpanDedup.clean`, so batch and streaming
    * cleaning semantics cannot drift. Output: (doc_id, n_before,
    * n_removed, n_after, clean_md5, clean_text). */
  private[graft] def spanSweep(docs: DataFrame, starts: DataFrame,
      gram: Int, spanMin: Int): DataFrame = {
    val cov = starts
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (gram - 1))).as("pos"))
      .distinct()
    val runs = cov.withColumn("grp",
      col("pos") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))))
    val spans = runs.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .where(col("len") >= spanMin)
      .select(col("doc_id"), col("grp"))
    val rem = runs.join(spans, Seq("doc_id", "grp"))
      .select(col("doc_id"), col("pos"))
    val ws = docs.select(col("doc_id").cast("long").as("doc_id"),
      split(lower(col("text")), " ").as("w"))
    val tok = ws.select(col("doc_id"), posexplode(col("w")).as(Seq("p", "tw")))
      .select(col("doc_id"), (col("p") + 1).as("pos"), col("tw"))
    val kept = tok.join(rem, Seq("doc_id", "pos"), "left_anti")
    val ka = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_after"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tw")))),
          x => x.getField("tw")), " ").as("clean_text"))
    ws.select(col("doc_id"), size(col("w")).cast("long").as("n_before"))
      .join(ka, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_before"),
        (col("n_before") - coalesce(col("n_after"), lit(0L))).as("n_removed"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // ----------------------------------------- all-pairs cosine (inverted index)

  /** Posting lists longer than this are dropped from the feature
    * space — the stopword-style df pruning that bounds the per-feature
    * join fanout to DfCap² (Bayardo/Ma/Srikant, "Scaling Up All Pairs
    * Similarity Search", WWW'07, use the same most-frequent-feature
    * cut as their first candidate-reduction lever). */
  private[graft] val DfCap = 20
  private[graft] val CosMin = 0.5

  /** All-pairs COSINE similarity over word-3-gram TF vectors — the
    * weighted counterpart of q_dedup_ngram's set Jaccard, i.e. the
    * classic IR sparse-vector similarity join: each document is a
    * sparse TF vector in shingle space, candidate pairs come from an
    * inverted-index self-join (never doc×doc), and the dot product is
    * a grouped integer sum over shared features.
    *
    * Scale shape: the posting table carries (doc_id, 64-bit feature
    * digest, tf) longs only; the df pass and the self-join key on the
    * digest, so every exchange is map-side combinable and
    * feature-partitioned. The df ≤ DfCap cut defines the feature
    * space (norms and dots both use exactly the kept features, so the
    * cosine is exact over that space) and caps any posting list — and
    * with it the worst per-feature fanout — at DfCap², which is what
    * keeps the join linear-ish in corpus size instead of quadratic in
    * the hottest stopword bucket. Norm joins are shuffled equi-joins
    * on the unique doc id, not broadcasts: one row per document is
    * corpus-scaled. Cross-engine determinism: dot and both norms are
    * exact integers summed wrap-free (DECIMAL(38,0) on the engine
    * side matching DuckDB's HUGEINT promotion — a plain long sum
    * would wrap silently on pathologically repetitive documents while
    * the oracle kept counting), each converted to double ONCE; /, *
    * and sqrt over those identical doubles are IEEE-correctly-
    * rounded, so the unrounded threshold compare agrees bit-for-bit. */
  private val qSimAllpairs = Q("q_sim_allpairs",
    s"""WITH ws AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
       |        FROM documents),
       |g AS (SELECT doc_id, lang,
       |    unnest(CASE WHEN len(w) >= 3
       |           THEN list_transform(generate_series(1, len(w) - 2),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |           ELSE [] END) AS g
       |  FROM ws),
       |tf AS (SELECT doc_id, lang, g, CAST(count(*) AS BIGINT) AS tf
       |  FROM g GROUP BY 1, 2, 3),
       |kept AS (SELECT g FROM tf GROUP BY g HAVING count(*) <= $DfCap),
       |k AS (SELECT t.* FROM tf t JOIN kept USING (g)),
       |nrm AS (SELECT doc_id, sum(tf * tf) AS s FROM k GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    sum(a.tf * b.tf) AS dot
       |  FROM k a JOIN k b
       |    ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id,
       |  round(CAST(dot AS DOUBLE)
       |    / sqrt(CAST(x.s AS DOUBLE) * CAST(y.s AS DOUBLE)), 4) AS cos
       |FROM pairs JOIN nrm x ON a_id = x.doc_id JOIN nrm y ON b_id = y.doc_id
       |WHERE CAST(dot AS DOUBLE)
       |  / sqrt(CAST(x.s AS DOUBLE) * CAST(y.s AS DOUBLE)) >= $CosMin
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    // TF postings on the 64-bit digest; checkpointed once — reused by
    // the df cut, both self-join sides, and the norm pass.
    val tf = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.GraftExpressions.shingles(
          lower(col("text")), NGram, dedup = false)).as("g"))
      .groupBy(col("doc_id"), col("lang"), xxhash64(col("g")).as("h"))
      .agg(count(lit(1)).as("tf"))
    val kept = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") <= DfCap).select(col("h"))
    // No broadcast hint: the kept-feature list is vocabulary-scaled.
    // The df-capped feature frame IS fenced despite being
    // ~token-scale: unlike the q_dedup_substring/q_dedup_span gram
    // explodes (re-derived per consumer — one scan + map-side work
    // each), re-deriving `k` costs a corpus SHUFFLE (the per-doc tf
    // groupBy) plus the df join, three times over; at cluster scale
    // the equivalent is persisting the feature table bucketed by `h`
    // once and reading it thrice — a standard inverted-index build.
    val k = tf.join(kept, "h").fenced()
    // DECIMAL(38,0) sums ≙ DuckDB's HUGEINT promotion: wrap-free
    val nrm = k.groupBy(col("doc_id"))
      .agg(sum((col("tf") * col("tf")).cast("decimal(38,0)")).as("s"))
    val pairs = k.select(col("doc_id").as("a_id"), col("lang"), col("h"),
        col("tf").as("ta"))
      .join(k.select(col("doc_id").as("b_id"), col("lang").as("lb"),
          col("h").as("hb"), col("tf").as("tb")),
        col("h") === col("hb") && col("lang") === col("lb") &&
          col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum((col("ta") * col("tb")).cast("decimal(38,0)")).as("dot"))
    val cos = col("dot").cast("double") /
      sqrt(col("sa").cast("double") * col("sb").cast("double"))
    pairs
      .join(nrm.select(col("doc_id").as("a_id"), col("s").as("sa")), "a_id")
      .join(nrm.select(col("doc_id").as("b_id"), col("s").as("sb")), "b_id")
      .where(cos >= CosMin)
      .select(col("a_id"), col("b_id"), round(cos, 4).as("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Incremental NEAR-dup — the daily-ingest form of the dedup
    * pipeline (`q_dedup_incremental` is its exact-fingerprint
    * sibling): flag NEW-snapshot documents that near-duplicate the
    * PRIOR corpus, with the closest prior keeper. Candidate
    * generation is RESTRICTED to new×prior at the band join — the
    * within-batch and prior×prior pair graphs never materialize, so
    * the pass costs |new|-scale band rows joined against the prior
    * band manifest, not a full-corpus self-join re-run per ingest.
    * Verification is the exact-Jaccard kernel on candidates only;
    * the per-new-doc closest keeper is a WindowGroupLimit shortlist
    * (rank over jac desc, prior id — candidates prune to 1 per task
    * before the exchange). The prior BAND manifest travels the real
    * deployment path — written to the band store and read back
    * ([[graft.operators.DedupManifest.persistBucketed]], hash-bucketed
    * by the candidate join key (band, bh) so the ingest join consumes
    * it with zero exchange on the manifest side) before the candidate
    * join probes it, the same persist-once-append-per-ingest loop as
    * the embed twin; prior shingles stay in-plan (verification reads
    * them from the corpus store in production, not from a manifest —
    * shingle rows are corpus-scaled, band rows are not). */
  private val qDedupIncrementalNear = Q("q_dedup_incremental_near",
    s"""WITH $shingleCtes,
       |$minhashSigSql,
       |meta AS (SELECT doc_id, regexp_matches(source, '^src[0-9]$$') AS prior
       |         FROM documents),
       |bx AS (
       |${(0 until B).map(j =>
          s"  SELECT doc_id, $j AS band, ${bandHashSql(j)} AS bh FROM sig")
          .mkString("\n  UNION ALL\n")}
       |),
       |bm AS (SELECT b.doc_id, b.band, b.bh, m.prior
       |       FROM bx b JOIN meta m USING (doc_id)),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS ni, p.doc_id AS pi
       |  FROM bm n JOIN bm p ON n.band = p.band AND n.bh = p.bh
       |  WHERE NOT n.prior AND p.prior),
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (
       |  SELECT c.ni, c.pi, count(*) AS cc
       |  FROM cand c
       |  JOIN sh s1 ON s1.doc_id = c.ni
       |  JOIN sh s2 ON s2.doc_id = c.pi AND s2.sh = s1.sh
       |  GROUP BY c.ni, c.pi),
       |verified AS (
       |  SELECT ni, pi, cc / (x.n + y.n - cc) AS jac
       |  FROM common JOIN cnt x ON ni = x.doc_id JOIN cnt y ON pi = y.doc_id
       |  WHERE cc / (x.n + y.n - cc) >= 0.5),
       |ranked AS (
       |  SELECT ni, pi, jac,
       |    row_number() OVER (PARTITION BY ni ORDER BY jac DESC, pi) AS rn
       |  FROM verified)
       |SELECT ni AS new_id, pi AS dup_of, round(jac, 4) AS jac
       |FROM ranked WHERE rn = 1 ORDER BY new_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val meta = t(s, d, "documents")
      .select(col("doc_id"), col("source").rlike("^src[0-9]$").as("prior"))
    val sig = minhashSignature(s, d)
    val bands = sig.select(col("doc_id"),
      explode(array((0 until B).map(j =>
        struct(lit(j).as("band"), bandHash(j).as("bh"))): _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
      .join(meta, "doc_id")
      .fenced()
    // the prior band manifest, through the persisted store — bucketed
    // by the full candidate join key so the ingest join reads it
    // pre-partitioned (zero exchange on the manifest side, the embed
    // twin's r14 treatment)
    val (_, priorBands) = graft.operators.DedupManifest.persistBucketed(
      bands.where(col("prior")).select(col("doc_id"), col("band"), col("bh")),
      graft.operators.Bucketing.datasetTable("graft_near_bands", d),
      Seq("band", "bh"), buckets = 8)
    val cand = bands.where(!col("prior"))
      .select(col("doc_id").as("ni"), col("band"), col("bh"))
      .join(priorBands.select(col("doc_id").as("pi"),
        col("band").as("band2"), col("bh").as("bh2")),
        col("band") === col("band2") && col("bh") === col("bh2"))
      .select(col("ni"), col("pi")).distinct()
    val sh = shingleRows(t(s, d, "documents"))
      .select(col("doc_id"), col("sh")).fenced()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.select(col("doc_id").as("ni"), col("sh").as("sha")), "ni")
      .join(sh.select(col("doc_id").as("pi2"), col("sh").as("shb")),
        col("pi") === col("pi2") && col("sha") === col("shb"))
      .groupBy(col("ni"), col("pi")).agg(count(lit(1)).as("cc"))
    val jac = col("cc") / (col("na") + col("nb") - col("cc"))
    // per-doc count joins stay shuffled equi-joins (corpus-scaled
    // build sides — the keep_best precedent)
    val w = Window.partitionBy(col("ni")).orderBy(col("jac").desc, col("pi"))
    common
      .join(cnt.select(col("doc_id").as("ni"), col("n").as("na")), "ni")
      .join(cnt.select(col("doc_id").as("pi"), col("n").as("nb")), "pi")
      .where(jac >= 0.5)
      .select(col("ni"), col("pi"), jac.as("jac"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("ni").as("new_id"), col("pi").as("dup_of"),
        round(col("jac"), 4).as("jac"))
      .orderBy(col("new_id"))
  }

  // ----------------------------------------- prefix-filtered Jaccard join

  /** τ as an exact rational (19/20 = 0.95): every threshold decision —
    * prefix length, length filter, final accept — is integer
    * arithmetic, so the Spark candidate set and the DuckDB all-pairs
    * oracle can never disagree on a boundary pair the way
    * `ceil(0.95 · 20) = 20` (IEEE) vs `⌈19⌉ = 19` (ℚ) would. */
  private[graft] val PpNum = 19
  private[graft] val PpDen = 20

  /** Exact Jaccard similarity join via PREFIX FILTERING (Chaudhuri et
    * al. ICDE'06; Xiao et al. WWW'08 "PPJoin") — the deterministic
    * counterpart of MinHash banding: order the vocabulary rarest-
    * first, keep only each document's first |T| − ⌈τ·|T|⌉ + 1 tokens
    * (any pair with J ≥ τ MUST share one of them — the pigeonhole
    * bound), generate candidates from that prefix inverted index, and
    * verify exactly. 100 % recall by theorem, unlike LSH's
    * probabilistic recall; the price is the verify join shipping the
    * two candidate token arrays.
    *
    * Scale shape: token df table is vocabulary-scaled (broadcast);
    * the rarest-first position is a per-document window (doc-sized
    * partitions, one exchange); the candidate self-join keys on the
    * prefix token's rank — fanout is Σ_t prefixdf(t)², the quantity
    * prefix filtering exists to keep far below the full posting
    * fanout (rarest-first ordering puts every document behind its
    * LOWEST-df tokens, never the stopword bucket); the length filter
    * min·den ≥ num·max prunes candidates before the distinct. The
    * final verify is pair-scaled. No all-pairs product anywhere. */
  private val qSimPpjoin = Q("q_sim_ppjoin",
    s"""WITH tk AS (SELECT doc_id, lang,
       |       unnest(list_distinct(string_split(lower(text), ' '))) AS tok
       |     FROM documents),
       |n AS (SELECT doc_id, CAST(count(*) AS INT) AS nt FROM tk GROUP BY 1),
       |c AS (SELECT a.doc_id AS ai, b.doc_id AS bi, CAST(count(*) AS INT) AS inter
       |      FROM tk a JOIN tk b
       |        ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT c.ai AS a_id, c.bi AS b_id,
       |  round(c.inter / CAST(na.nt + nb.nt - c.inter AS DOUBLE), 4) AS jac
       |FROM c JOIN n na ON na.doc_id = c.ai JOIN n nb ON nb.doc_id = c.bi
       |WHERE c.inter * $PpDen >= $PpNum * (na.nt + nb.nt - c.inter)
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val tok = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
    // global rarest-first token order — vocabulary-scaled, broadcast
    val rk = tok.groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
      .withColumn("rk", row_number().over(Window.orderBy(col("dfc"), col("tok"))))
      .select(col("tok"), col("rk"))
    // one corpus exchange: each document as its sorted INT rank array —
    // verification compares hashed ints, never strings, and the prefix
    // below is a per-row slice of the same array (computed once,
    // reused by the prefix explode and both verify sides)
    val rdocs = tok.join(broadcast(rk), "tok")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sort_array(collect_list(col("rk").cast("int"))).as("rks"))
      .select(col("doc_id"), col("lang"), col("rks"),
        size(col("rks")).as("nt"))
      .fenced()
    // ⌈(num·nt)/den⌉ in exact integers
    def ceilTau(nt: Column): Column =
      floor((lit(PpNum) * nt + lit(PpDen - 1)) / lit(PpDen)).cast("int")
    val prefix = rdocs.select(col("doc_id"), col("lang"), col("nt"),
      posexplode(slice(col("rks"), lit(1),
        col("nt") - ceilTau(col("nt")) + 1)))
      .withColumnRenamed("pos", "pp").withColumnRenamed("col", "rkp")
    // positional filter (PPJoin): common tokens all sit at or after the
    // shared token's position in each sorted array, so overlap ≤
    // 1 + min(na − pa, nb − pb); a true pair's FIRST shared prefix
    // token always passes, so any-occurrence-passes is complete.
    // J ≥ num/den ⇔ o·(num+den) ≥ num·(na+nb), applied to the bound.
    val cand = prefix
      .select(col("doc_id").as("ai"), col("lang"), col("rkp"),
        (col("pp") + 1).as("pa"), col("nt").as("na"))
      .join(prefix.select(col("doc_id").as("bi"), col("lang").as("lb"),
          col("rkp").as("rkb"), (col("pp") + 1).as("pb"), col("nt").as("nb")),
        col("rkp") === col("rkb") && col("lang") === col("lb") &&
          col("ai") < col("bi") &&
          least(col("na"), col("nb")) * PpDen >=
            lit(PpNum) * greatest(col("na"), col("nb")) &&
          (lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))) *
            (PpNum + PpDen) >= lit(PpNum) * (col("na") + col("nb")))
      .select(col("ai"), col("bi")).distinct()
    // native O(n+m) merge over the sorted rank arrays — replaces
    // array_intersect's per-row hash-set build + materialized result
    val inter = graft.functions.GraftExpressions
      .sorted_intersect_count(col("ta"), col("tb"))
    val union = size(col("ta")) + size(col("tb")) - inter
    val jac = inter / union.cast("double")
    cand
      .join(rdocs.select(col("doc_id").as("ai"), col("rks").as("ta")), "ai")
      .join(rdocs.select(col("doc_id").as("bi"), col("rks").as("tb")), "bi")
      .where(inter * PpDen >= lit(PpNum) * union)
      .select(col("ai").as("a_id"), col("bi").as("b_id"), round(jac, 4).as("jac"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // --------------------------------------------------- URL canonicalization

  /** Deterministic messy-URL synthesis — the SAME string expression on
    * both engines (hash-certified), so the operator under test is the
    * canonicalizer, not the fixture: host case, a default :443 port,
    * a trailing slash, swapped query-param order, utm_ tracking junk,
    * and a fragment all vary with doc_id while the canonical identity
    * varies only with (source, doc_id mod 50, x, y). */
  /** ONE messy-URL scaffold per engine — the shared messiness knobs
    * (host case via the caller's host expr, :443 on doc_id%7,
    * trailing slash on %3, swapped param order on %2, utm junk on %3,
    * fragment on %5); only host / path / param-value expressions vary
    * between fixtures, so a knob tweak cannot desynchronize the
    * hash-certified pairs. */
  private def messyUrlSql(host: String, path: String, px: String, py: String): String =
    (s"'https://' || $host || " +
      "CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END || " +
      s"$path || " +
      "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || '?' || " +
      s"CASE WHEN doc_id % 2 = 0 THEN 'x=' || $px || '&y=' || $py " +
      s"ELSE 'y=' || $py || '&x=' || $px END || " +
      "CASE WHEN doc_id % 3 = 0 THEN '&utm_source=feed' ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END")

  private def messyUrl(host: Column, path: Column, px: Column, py: Column): Column = {
    val id = col("doc_id")
    concat(lit("https://"), host,
      when(pmod(id, lit(7)) === 0, lit(":443")).otherwise(lit("")),
      path,
      when(pmod(id, lit(3)) === 0, lit("/")).otherwise(lit("")),
      lit("?"),
      when(pmod(id, lit(2)) === 0,
        concat(lit("x="), px, lit("&y="), py))
        .otherwise(concat(lit("y="), py, lit("&x="), px)),
      when(pmod(id, lit(3)) === 0, lit("&utm_source=feed")).otherwise(lit("")),
      when(pmod(id, lit(5)) === 0, lit("#sec")).otherwise(lit("")))
  }

  private def urlRawSql: String = messyUrlSql(
    host = "CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END || '.Example.com'",
    path = "'/a/' || CAST(doc_id % 50 AS VARCHAR)",
    px = "CAST(doc_id % 5 AS VARCHAR)",
    py = "CAST(doc_id % 4 AS VARCHAR)")

  private def urlRaw: Column = {
    val id = col("doc_id")
    messyUrl(
      host = concat(when(pmod(id, lit(2)) === 0, upper(col("source")))
        .otherwise(col("source")), lit(".Example.com")),
      path = concat(lit("/a/"), (id % 50).cast("string")),
      px = (id % 5).cast("string"),
      py = (id % 4).cast("string"))
  }

  /** Clustered-URL fixture for the composed pipeline: every 7th
    * document (doc_id ≡ 6 mod 7) carries the URL of doc_id−6 — an
    * SF-INVARIANT ~14% duplicate rate decoupled from `source` (which
    * is doc_id mod 20, so any mod-5-keyed rule would wipe whole
    * sources). Same scaffold; query params derive from the CLUSTER id
    * so true variants canonicalize together. */
  private val CidSql = "(doc_id - (CASE WHEN doc_id % 7 = 6 THEN 6 ELSE 0 END))"

  private def urlClusterSql: String = messyUrlSql(
    host = "CASE WHEN doc_id % 2 = 0 THEN 'WWW.Example.com' ELSE 'www.example.com' END",
    path = s"'/p/' || CAST($CidSql AS VARCHAR)",
    px = s"CAST($CidSql % 3 AS VARCHAR)",
    py = s"CAST($CidSql % 11 AS VARCHAR)")

  private def urlCluster: Column = {
    val id = col("doc_id")
    val cid = id - when(pmod(id, lit(7)) === 6, 6L).otherwise(0L)
    messyUrl(
      host = when(pmod(id, lit(2)) === 0, lit("WWW.Example.com"))
        .otherwise(lit("www.example.com")),
      path = concat(lit("/p/"), cid.cast("string")),
      px = (cid % 3).cast("string"),
      py = (cid % 11).cast("string"))
  }

  /** The pipeline-facing pair: clustered fixture through the shared
    * canonicalizer. */
  private[graft] def urlCanonClusteredCtes: String = urlCanonCtes(urlClusterSql)
  private[graft] def urlCanonClustered(docs: DataFrame): DataFrame =
    urlCanon(docs, urlCluster)

  /** URL canonicalization + exact URL dedup — the FIRST dedup key of
    * every web-crawl curation pipeline (Common Crawl dedups by
    * canonical URL before any content pass): strip the fragment,
    * lowercase scheme+host, drop the https default port, strip the
    * path's trailing slash, drop utm_* tracking params, and SORT the
    * surviving query params; then exact-group on the canonical form.
    * Every step is a codegen'd built-in string/array expression —
    * per-row in the scan stage; the one exchange is the canonical-key
    * groupBy (at 100 TB key the exchange on the 64-bit digest of the
    * canonical form and carry the string with min(), shrinking
    * shuffle rows to fixed width — same move as q_dedup_exact).
    * The raw URL is synthesized with the IDENTICAL expression on both
    * engines, so the hash match certifies the canonicalizer exactly:
    * 10 raw variants per canonical identity collapse or the count
    * columns disagree. */
  /** The synth→canonicalize CTE chain ending in
    * `ucanon(doc_id, url, canon_url)` — shared by `q_dedup_url` and
    * the composed `q_web_pipeline` oracle. */
  private[graft] def urlCanonCtes: String = urlCanonCtes(urlRawSql)

  private[graft] def urlCanonCtes(rawSql: String): String =
    s"""uu AS (SELECT doc_id, ($rawSql) AS url FROM documents),
       |ub AS (SELECT doc_id, url,
       |        string_split(url, '#')[1] AS base
       |      FROM uu),
       |up AS (SELECT doc_id, url,
       |        string_split(base, '?')[1] AS pre,
       |        coalesce(string_split(base, '?')[2], '') AS q
       |      FROM ub),
       |uh AS (SELECT doc_id, url,
       |        regexp_replace(lower(regexp_extract(pre, '^(https://[^/]+)', 1)),
       |                       ':443$$', '')
       |        || regexp_replace(regexp_extract(pre, '^https://[^/]+(/.*)$$', 1),
       |                          '/$$', '') AS hp,
       |        array_to_string(
       |          list_sort(list_filter(string_split(q, '&'),
       |            x -> x <> '' AND left(x, 4) <> 'utm_')), '&') AS cq
       |      FROM up),
       |ucanon AS (SELECT doc_id, url,
       |        (CASE WHEN cq = '' THEN hp ELSE hp || '?' || cq END) AS canon_url
       |      FROM uh)""" // NO stripMargin: embedded in templates that strip once

  /** Spark twin of [[urlCanonCtes]]: (doc_id, url, canon_url). */
  private[graft] def urlCanon(docs: DataFrame): DataFrame =
    urlCanon(docs, urlRaw)

  private[graft] def urlCanon(docs: DataFrame, raw: Column): DataFrame = {
    val u = docs.select(col("doc_id"), raw.as("url"))
    val base = split(col("url"), "#").getItem(0)
    val pre = split(base, "\\?").getItem(0)
    val q = coalesce(element_at(split(base, "\\?"), 2), lit(""))
    val host = regexp_replace(
      lower(regexp_extract(pre, "^(https://[^/]+)", 1)), ":443$", "")
    val path = regexp_replace(regexp_extract(pre, "^https://[^/]+(/.*)$", 1), "/$", "")
    val cq = array_join(
      sort_array(filter(split(q, "&"),
        x => x =!= "" && substring(x, 1, 4) =!= "utm_")), "&")
    val canon = when(cq === "", concat(host, path))
      .otherwise(concat(host, path, lit("?"), cq))
    u.select(col("doc_id"), col("url"), canon.as("canon_url"))
  }

  private val qDedupUrl = Q("q_dedup_url",
    s"""WITH $urlCanonCtes
       |SELECT canon_url,
       |  CAST(count(*) AS BIGINT) AS n_raw,
       |  CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
       |  CAST(min(doc_id) AS BIGINT) AS keep_id
       |FROM ucanon GROUP BY 1 ORDER BY canon_url""".stripMargin) { (s, d) =>
    urlCanon(t(s, d, "documents"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("url")).as("n_variants"),
        min(col("doc_id")).as("keep_id"))
      .orderBy(col("canon_url"))
  }

  // ------------------------------------------------ template-skeleton dedup

  /** Instruction-TEMPLATE dedup — the curation pass for templated
    * text (synthetic instruction sets, log-derived corpora, form
    * letters): normalize every record to its SKELETON — lowercase,
    * every digit run collapsed to `0`, whitespace collapsed — and
    * exact-group on the skeleton, so ten thousand fills of one
    * template count as ONE training example (the repetition an
    * instruction-tuned model most readily memorizes). The fixture
    * renders templated rows from `events` with the IDENTICAL
    * expression on both engines (the q_dedup_url stance), so the
    * hash match certifies the normalizer: thousands of rows collapse
    * to the handful of true templates, with per-template fill counts
    * and distinct-fill cardinality as the audit columns.
    *
    * Scale shape: normalization is per-row codegen regex/string work
    * fused into the scan; the one exchange is the skeleton-key
    * count-distinct groupBy (digest-keyed at 100 TB, as
    * q_dedup_exact). */
  private val qDedupTemplate = Q("q_dedup_template",
    """WITH r AS (
      |  SELECT event_id,
      |    event_type || ' by user ' || CAST(user_id AS VARCHAR) ||
      |    ' took ' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) ||
      |    ' ms' ||
      |    CASE WHEN user_id % 3 = 0 THEN '  (RETRY scheduled)' ELSE '' END AS raw
      |  FROM events),
      |n AS (SELECT event_id, raw,
      |        trim(regexp_replace(regexp_replace(lower(raw), '[0-9]+', '0', 'g'),
      |                            ' +', ' ', 'g')) AS template
      |      FROM r)
      |SELECT template,
      |  CAST(count(*) AS BIGINT) AS n_fills,
      |  CAST(count(DISTINCT raw) AS BIGINT) AS n_distinct_fills,
      |  CAST(min(event_id) AS BIGINT) AS keep_id
      |FROM n GROUP BY 1 ORDER BY template""".stripMargin) { (s, d) =>
    val raw = concat(col("event_type"), lit(" by user "),
      col("user_id").cast("string"),
      lit(" took "), floor(col("value") * 100).cast("long").cast("string"),
      lit(" ms"),
      when(pmod(col("user_id"), lit(3)) === 0, lit("  (RETRY scheduled)"))
        .otherwise(lit("")))
    val template = trim(regexp_replace(
      regexp_replace(lower(col("raw")), "[0-9]+", "0"), " +", " "))
    t(s, d, "events")
      .select(col("event_id"), raw.as("raw"))
      .select(col("event_id"), col("raw"), template.as("template"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_fills"),
        countDistinct(col("raw")).as("n_distinct_fills"),
        min(col("event_id")).as("keep_id"))
      .orderBy(col("template"))
  }

  // ------------------------------------------- edit-distance verification

  /** Character budget for the edit-distance verify stage: Levenshtein
    * is O(L²) cells (O(k·L) banded), so the verification runs on a
    * fixed document prefix — the standard bounded-cost surrogate (two
    * documents whose first 512 chars are within 20 % edits are
    * near-dups for curation purposes; full-body confirmation is what
    * `q_dedup_pipeline`'s Jaccard stage is for). */
  private val EditPrefix = 512

  /** ⌈0.2 · EditPrefix⌉ — the largest edit count the relative floor
    * can admit, used as the banded-DP early-exit threshold. */
  private val EditMaxLev = 103

  /** MinHash-LSH candidates → EDIT-DISTANCE verification — the other
    * standard two-stage near-dup pipeline (candidates from banding,
    * confirmation by string distance rather than set overlap; the
    * shape record-linkage systems use when token sets are too coarse,
    * e.g. template-y documents whose shingle sets collide).
    *
    * Scale shape: candidate pairs come from the SAME linear band
    * equi-join as `q_dedup_minhash` (never all-pairs), and the verify
    * stage joins candidates to a (doc_id, 512-char prefix) projection
    * — the shuffle carries one bounded prefix per side, never full
    * bodies. The Spark Levenshtein runs the THRESHOLDED form
    * (`levenshtein(a, b, k)` — banded O(k·L) DP that early-exits to
    * -1 past k edits) so a far-apart false-positive candidate costs
    * O(k·L), not O(L²); the oracle computes the plain distance and
    * applies the same cut, and within the threshold the two agree
    * exactly. */
  // --------------------------------------------------- containment dedup

  // Excerpt ids are offset by max(doc_id)+1 — DERIVED, not a constant,
  // so snippets can never collide with real doc ids at any corpus
  // size (a fixed 10⁶ offset would alias against corpora past 1M
  // documents, and both engines computing identically would make the
  // oracle structurally blind to the collision). The engine pays one
  // bounded scalar action; the oracle uses the scalar subquery.

  /** CONTAINMENT-similarity dedup — the asymmetric member of the
    * similarity-join family (allpairs = cosine, ppjoin = Jaccard,
    * this = c(A,B) = |A∩B| / min(|A|,|B|)): finds a document NESTED
    * inside another (a quote, an excerpt page, a syndicated fragment),
    * which symmetric Jaccard structurally misses — a 30-token excerpt
    * of a 400-token source has Jaccard ≈ 0.07 but containment 1.0.
    * The standard curation move is dropping the contained side.
    *
    * The corpus is documents plus an IN-PLAN excerpt of every 4th
    * document (tokens 11–40 — both engines derive the identical
    * snippet, so the oracle checks the detector, not a fixture).
    *
    * Scale shape (the `q_sim_allpairs` stance, all the way): the
    * df ≤ [[DfCap]] cut DEFINES the feature space — containment is
    * measured over kept features, the same semantics as allpairs'
    * cosine (dropping boilerplate features is the standard move, and
    * the cut bounds per-feature join fanout at df²). That stance is
    * what makes one aggregation sufficient: |A∩B| comes straight off
    * the capped self-join's map-side-combined count — no distinct
    * candidate set, no full-set re-verify join (a first cut verified
    * exact full-set containment on capped candidates and spent 8.4 s
    * of a 19 s wall pushing 1.35M candidate pairs × per-doc shingle
    * sets through the verify join at sf0.1 — for semantics the
    * feature-space stance gives anyway, since A ⊆ B implies
    * A∩K ⊆ B∩K for ANY feature filter K: a true excerpt scores 1.0
    * in either space). Per-document kept-set sizes ride shuffled
    * equi-joins on the unique doc id, never a broadcast. Engine joins
    * on 64-bit shingle digests (longs through the exchanges, not
    * strings) — identical to the oracle's string join up to 2⁻⁶⁴
    * collisions, the qNgram precedent. */
  private val qDedupContain = Q("q_dedup_contain",
    s"""WITH d2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents),
       |    array_to_string(string_split(text, ' ')[11:40], ' ')
       |  FROM documents WHERE doc_id % 4 = 0),
       |ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM d2),
       |sh AS (SELECT DISTINCT doc_id,
       |    unnest(CASE WHEN len(w) >= 3
       |           THEN list_transform(generate_series(1, len(w) - 2),
       |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |           ELSE [] END) AS g
       |  FROM ws),
       |kept AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= $DfCap),
       |k AS (SELECT s.* FROM sh s JOIN kept USING (g)),
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY 1),
       |common AS (SELECT a.doc_id AS ai, b.doc_id AS bi,
       |    CAST(count(*) AS BIGINT) AS cc
       |  FROM k a JOIN k b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ct AS (SELECT ai, bi, cc, x.n AS na, y.n AS nb
       |  FROM common JOIN cnt x ON ai = x.doc_id JOIN cnt y ON bi = y.doc_id)
       |SELECT CASE WHEN na <= nb THEN ai ELSE bi END AS inner_id,
       |  CASE WHEN na <= nb THEN bi ELSE ai END AS outer_id,
       |  round(cc / CAST(least(na, nb) AS DOUBLE), 4) AS containment
       |FROM ct WHERE cc / CAST(least(na, nb) AS DOUBLE) >= 0.9
       |ORDER BY inner_id, outer_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val excerptOff = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val ex = docs.where(col("doc_id") % 4 === 0)
      .select((col("doc_id") + excerptOff).as("doc_id"),
        array_join(slice(split(col("text"), " "), 11, 30), " ").as("text"))
    val d2 = docs.select(col("doc_id"), col("text")).unionAll(ex)
    val sh = d2.select(col("doc_id"),
        explode(graft.functions.GraftExpressions.shingles(
          lower(col("text")), NGram, dedup = true)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
    val kept = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") <= DfCap).select(col("h"))
    // the kept-feature index is consumed by cnt and both self-join
    // sides — fence it once (the q_sim_allpairs inverted-index build)
    val k = sh.join(kept, "h").fenced()
    val cnt = k.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = k.select(col("doc_id").as("ai"), col("h"))
      .join(k.select(col("doc_id").as("bi"), col("h").as("hb")),
        col("h") === col("hb") && col("ai") < col("bi"))
      .groupBy(col("ai"), col("bi")).agg(count(lit(1)).as("cc"))
    val ctn = col("cc") / least(col("na"), col("nb")).cast("double")
    common
      .join(cnt.select(col("doc_id").as("ai"), col("n").as("na")), "ai")
      .join(cnt.select(col("doc_id").as("bi"), col("n").as("nb")), "bi")
      .where(ctn >= 0.9)
      .select(
        when(col("na") <= col("nb"), col("ai")).otherwise(col("bi"))
          .as("inner_id"),
        when(col("na") <= col("nb"), col("bi")).otherwise(col("ai"))
          .as("outer_id"),
        round(ctn, 4).as("containment"))
      .orderBy(col("inner_id"), col("outer_id"))
  }

  /** The MinHash-LSH band candidate pairs (ai < bi, distinct) the
    * edit-distance verify stage runs on — [[bandCandidatePairs]],
    * exposed for the recall spec and stage profiling. */
  private[graft] def editCandidates(s: SparkSession, d: String): DataFrame =
    bandCandidatePairs(s, d)

  private val qDedupEdit = Q("q_dedup_edit",
    s"""WITH $shingleCtes,
       |$minhashSigSql,
       |bx AS (
       |${(0 until B).map(j =>
          s"  SELECT doc_id, $j AS band, ${bandHashSql(j)} AS bh FROM sig")
          .mkString("\n  UNION ALL\n")}
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ai, b.doc_id AS bi
       |  FROM bx a JOIN bx b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |p AS (SELECT doc_id, substr(text, 1, $EditPrefix) AS pfx FROM documents),
       |lv AS (
       |  SELECT c.ai, c.bi, levenshtein(x.pfx, y.pfx) AS lev,
       |    greatest(len(x.pfx), len(y.pfx)) AS ln
       |  FROM cand c JOIN p x ON c.ai = x.doc_id JOIN p y ON c.bi = y.doc_id)
       |SELECT ai AS a_id, bi AS b_id, CAST(lev AS BIGINT) AS lev,
       |  round(1 - lev / CAST(ln AS DOUBLE), 4) AS edit_sim
       |FROM lv
       |WHERE lev <= $EditMaxLev AND 1 - lev / CAST(ln AS DOUBLE) >= 0.8
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val cand = editCandidates(s, d)
    val p = t(s, d, "documents")
      .select(col("doc_id"), substring(col("text"), 1, EditPrefix).as("pfx"))
    // Per-document prefix joins are shuffled equi-joins on the unique
    // doc id — corpus-scaled, never a broadcast (keep_best bug class).
    val lv = cand
      .join(p.select(col("doc_id").as("ai"), col("pfx").as("pa")), "ai")
      .join(p.select(col("doc_id").as("bi"), col("pfx").as("pb")), "bi")
      .select(col("ai"), col("bi"),
        levenshtein(col("pa"), col("pb"), EditMaxLev).cast("long").as("lev"),
        greatest(length(col("pa")), length(col("pb"))).as("ln"))
    val sim = lit(1) - col("lev") / col("ln").cast("double")
    lv
      // thresholded levenshtein reports -1 past EditMaxLev — the
      // >= 0 guard IS the oracle's `lev <= EditMaxLev` cut
      .where(col("lev") >= 0 && sim >= 0.8)
      .select(col("ai").as("a_id"), col("bi").as("b_id"), col("lev"),
        round(sim, 4).as("edit_sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val all: Seq[Q] = Seq(qExact, qNgram, qMinhash, qDedupPipeline, qDedupKeepBest, qDedupCc,
    qDedupCcStar, qDedupCcIncremental, qSimhash, qSimhashPairs, qSimhashWide,
    qDedupSubstring, qDedupSpan, qDedupSpanXl, qSimAllpairs, qDedupIncrementalNear,
    qSimPpjoin, qDedupUrl, qDedupTemplate, qDedupEdit, qDedupContain)
}
