package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.PortableHash.md5Long
import graft.queries.Q.t
import graft.Fence.FenceOps

/** Similarity search over the `embeddings` table (64-dim float
  * vectors):
  *
  *  - `q_dedup_embed` — EXACT embedding-cosine near-duplicate pairs
  *    within a `label` block (full-recall verification semantics);
  *  - `q_dedup_embed_lsh` — the scale path: banded random-hyperplane
  *    candidate generation (equi-join, never all-pairs) + exact-cosine
  *    verify, with the oracle running the identical banding;
  *  - `q_knn_brute` — exact brute-force cosine top-k for a query set
  *    (the correctness baseline; O(|Q|·N), broadcast the query side);
  *  - `q_knn_lsh` — random-hyperplane LSH bucketing (the scale path:
  *    each vector hashes to a bucket; candidate generation is an
  *    equi-join on the bucket key); the plane matrix is a
  *    deterministic literal that embeds in the oracle SQL, so buckets
  *    and results are oracle-checked bit-for-bit;
  *  - `q_knn_ivf` — inverted-file ANN with deterministic centroids,
  *    likewise fully oracle-checked.
  *
  * Dot products are computed left-to-right in double on both engines
  * (`aggregate(zip_with(...))` ≙ DuckDB `list_dot_product` over
  * `DOUBLE[]`), so cosine values compare bit-for-bit.
  */
object SimilarityQueries {

  /** Left-to-right double dot product of two array<double> columns —
    * the native codegen kernel ([[graft.functions.GraftExpressions
    * .DotProduct]]), same accumulation order as the HOF
    * `aggregate(zip_with(...))` form and DuckDB `list_dot_product`,
    * so values stay bit-identical to the oracle. */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.dot_product(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** vec_id, label, v (double). */
  private[graft] def vectors(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))

  /** Native one-pass cosine — same l→r accumulation as the oracle's
    * list_dot_product/sqrt composition, so values stay bit-identical. */
  private def cosine(va: Column, vb: Column): Column =
    graft.functions.GraftExpressions.cosine_sim(va, vb)

  private val vectorsCte: String =
    """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |        list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
      |       FROM embeddings)""".stripMargin

  /** DOUBLED corpus — the third oracle point for the adaptive
    * constants ([[clusterBits]], [[semC]]): sf0.01 and sf0.1 exercise
    * at most two values of each, so a threshold-crossing bug in the
    * sizing rules would be invisible to the sweep. The copy is each
    * vector NEGATED with `vec_id + n`: negation is bit-exact on both
    * engines ((-a)·(-b) ≡ a·b per IEEE, norms unchanged, bucket signs
    * flip deterministically), keeps the copy's internal near-dup
    * geometry identical to the original's, and — unlike an identical
    * copy — creates no degenerate cos=1 pairs across halves. At
    * sf0.01 this moves n 500→1000: bits 5→6, C 8→16 — a third value
    * of BOTH constants under the same hash-exact oracle (and a
    * fourth at sf0.1: 2000→4000, bits 7→8, C 32→63). */
  private val vectorsXlCte: String =
    """e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |        list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
      |       FROM embeddings),
      |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e0),
      |e AS (SELECT vec_id, label, v, n2 FROM e0
      |      UNION ALL
      |      SELECT vec_id + n0.n, label, list_transform(v, x -> -x), n2
      |      FROM e0 CROSS JOIN n0)""".stripMargin

  /** Engine twin of [[vectorsXlCte]]: base ∪ negated copy. */
  private def vectorsXl(s: SparkSession, d: String): (DataFrame, Long) = {
    val e = vectors(s, d)
    // bounded driver action: ONE count, returned so callers sizing
    // adaptive constants off the doubled corpus reuse it instead of
    // re-scanning for the same scalar
    val n = t(s, d, "embeddings").count()
    (e.union(e.select((col("vec_id") + n).as("vec_id"), col("label"),
      transform(col("v"), x => -x).as("v"))), 2L * n)
  }

  /** EXACT near-duplicate pairs (cos ≥ 0.4) within a `label` block —
    * the full-recall VERIFICATION semantics, deliberately all-pairs
    * per block.
    *
    * Why this cannot be LSH-blocked without changing the answer: the
    * qualifying pairs in this corpus sit at sim 0.40–0.51 (measured:
    * min 0.4006 at sf0.1), i.e. angle ≈ 60–66°, where the per-plane
    * sign-agreement probability is only ~0.63 — a single 8-plane
    * bucket join would retain ~0.63⁸ ≈ 2.5% of true pairs, and NO
    * hyperplane banding has recall 1 at a fixed cosine threshold
    * (exact dense similarity join is inherently quadratic in the
    * block). So the exact form stays all-pairs-within-block and is
    * the candidate-verification kernel; the 100 TB path is
    * `q_dedup_embed_lsh` below, where BOTH engine and oracle run the
    * same banded candidate generation and the scale shape is an
    * equi-join — use it when approximate recall (documented curve) is
    * acceptable, or feed ITS candidates through THIS verify. */
  private val qDedupEmbed = Q("q_dedup_embed",
    s"""WITH $vectorsCte
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  round(list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)), 4) AS sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val cos = cosine(col("va"), col("vb"))
    e.select(col("vec_id").as("a_id"), col("label"), col("v").as("va"))
      .join(e.select(col("vec_id").as("b_id"), col("label").as("lb"), col("v").as("vb")),
        col("label") === col("lb") && col("a_id") < col("b_id"))
      .where(cos >= 0.4)
      .select(col("a_id"), col("b_id"), round(cos, 4).as("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  // ---------------------------------------------- banded-LSH near-dup pairs

  /** Deterministic ±1 planes for the dedup bands: `DedupBands` bands
    * of `DedupRows` hyperplanes each (OR-of-ANDs amplification, the
    * standard LSH banding construction). Literals, so they embed in
    * the oracle SQL — engine and oracle compute IDENTICAL candidate
    * sets, making the banded query exact-by-construction against its
    * own contract (candidate recall vs the exact query follows the
    * 1−(1−p^r)^b curve, p = 1 − θ/π). */
  private[graft] val DedupBands = 8
  private[graft] val DedupRows = 4
  private[graft] val DedupPlanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(DedupBands * DedupRows, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** 4-bit band value: sign pattern of the band's planes (native
    * [[graft.functions.GraftExpressions.PlaneBits]] kernel — same
    * left-to-right dots as the HOF form, bit-identical buckets). */
  private def bandValue(v: Column, j: Int): Column =
    graft.functions.GraftExpressions.plane_bits(v,
      Array.tabulate(DedupRows)(r => DedupPlanes(j * DedupRows + r)),
      Array.tabulate(DedupRows)(r => 1L << r))

  private def bandValueSql(v: String, j: Int): String =
    (0 until DedupRows).map { r =>
      val plane = DedupPlanes(j * DedupRows + r).map(_.toString).mkString(",")
      s"(CASE WHEN list_dot_product($v, [$plane]::DOUBLE[]) >= 0 THEN ${1L << r} ELSE 0 END)"
    }.mkString(s"(CASE WHEN $v IS NULL THEN NULL ELSE (", " + ", ") END)")
    // the NULL guard keeps the twin bit-identical to PlaneBits'
    // nullSafeEval on malformed rows: a NULL vector buckets to NULL on
    // both engines instead of the oracle's every-CASE-to-ELSE-0 path

  /** The 100 TB near-dup shape: banded-LSH candidate generation (an
    * equi-join on (label, band, band value) — linear-ish in true
    * near-dup density, never all-pairs) followed by exact-cosine
    * verification on candidates only. The oracle runs the identical
    * banding (planes are literals in the SQL), so the result is
    * hash-checked end to end. At p≈0.66 (sim 0.47) the candidate
    * recall vs `q_dedup_embed` is 1−(1−0.66⁴)^8 ≈ 0.80 — the
    * production trade dial is (bands, rows): more bands → recall,
    * more rows → pruning. */
  private val qDedupEmbedLsh = Q("q_dedup_embed_lsh",
    s"""WITH $vectorsCte,
       |bx AS (
       |${(0 until DedupBands).map(j =>
          s"  SELECT vec_id, label, $j AS band, ${bandValueSql("v", j)} AS bv FROM e")
          .mkString("\n  UNION ALL\n")}
       |),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS ai, b.vec_id AS bi
       |  FROM bx a JOIN bx b
       |    ON a.label = b.label AND a.band = b.band AND a.bv = b.bv
       |   AND a.vec_id < b.vec_id)
       |SELECT c.ai AS a_id, c.bi AS b_id,
       |  round(list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)), 4) AS sim
       |FROM cand c JOIN e a ON a.vec_id = c.ai JOIN e b ON b.vec_id = c.bi
       |WHERE list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.4
       |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
    val e = vectors(s, d).fenced() // banded twice + verified against
    val bands = bandRows(e)
    embedVerifiedPairsBetween(bands, bands, e)
      .select(col("ai").as("a_id"), col("bi").as("b_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The banded-LSH row set of a vector frame: (vec_id, label, band,
    * bv) — one row per (vector, band). This IS the band manifest a
    * deployment persists next to the corpus
    * ([[graft.operators.DedupManifest]]): an arriving batch bands
    * itself and equi-joins these rows, never re-banding the prior
    * corpus. */
  private[graft] def bandRows(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label"),
      explode(array((0 until DedupBands).map(j =>
        struct(lit(j).as("band"), bandValue(col("v"), j).as("bv"))): _*)).as("b"))
      .select(col("vec_id"), col("label"), col("b.band").as("band"), col("b.bv").as("bv"))

  /** Verified near-dup pairs between two banded sides over a shared
    * vector store: candidates collide on (label, band, bv) with
    * ai < bi (a pair colliding in k bands appears k times — dedup
    * ids only, cheap longs, then join the vectors back), verified by
    * exact cosine ≥ 0.4. `bx = by` is the full within-corpus pair
    * set (`q_dedup_embed_lsh`); `bx = prior manifest, by = new batch`
    * is the |new|-scale ingest join (`q_dedup_embed_incremental`,
    * ManifestRoundTripSpec's chained runs — prior ids sit below the
    * batch ids, so ai < bi keeps exactly the cross pairs there).
    * Returns (ai, bi, sim) with sim UNROUNDED — callers round for
    * output or rank on the full double. */
  private[graft] def embedVerifiedPairsBetween(
      bx: DataFrame, by: DataFrame, e: DataFrame): DataFrame = {
    val cand = bx.select(col("vec_id").as("ai"), col("label"), col("band"), col("bv"))
      .join(by.select(col("vec_id").as("bi"), col("label").as("lb"),
        col("band").as("band2"), col("bv").as("bv2")),
        col("label") === col("lb") && col("band") === col("band2") &&
          col("bv") === col("bv2") && col("ai") < col("bi"))
      .select(col("ai"), col("bi")).distinct()
    val cos = cosine(col("va"), col("vb"))
    cand
      .join(e.select(col("vec_id").as("ai"), col("v").as("va")), "ai")
      .join(e.select(col("vec_id").as("bi"), col("v").as("vb")), "bi")
      .where(cos >= 0.4)
      .select(col("ai"), col("bi"), cos.as("sim"))
  }

  /** Incremental EMBEDDING dedup — the daily-ingest form of the
    * embedding near-dup pipeline (the `q_dedup_incremental_near`
    * contract applied to vectors): flag NEW-batch vectors that
    * near-duplicate the PRIOR corpus (cos ≥ 0.4), with the closest
    * prior keeper. The split is deterministic on `vec_id` (prior =
    * first ⌈4n/5⌉ ids — the corpus; the last fifth is the arriving
    * batch). Candidate generation is the banded random-hyperplane
    * join RESTRICTED to new×prior — the within-batch and prior×prior
    * pair graphs never materialize, so an ingest pass costs
    * |new|-scale band rows against the prior band manifest. The
    * manifest travels the REAL deployment path: the prior corpus's
    * band rows are written to the band store and read back
    * ([[graft.operators.DedupManifest.persistBucketed]] — hash-
    * bucketed by the candidate join key (label, band, bv), so the
    * ingest join consumes the manifest with ZERO exchange on the
    * manifest side) before the candidate join touches them — the
    * persist-once-append-per-ingest loop of `q_dedup_incremental`'s
    * fingerprint manifest, driven across two chained ingests (and
    * plan-pinned) by ManifestRoundTripSpec. Verification is
    * exact cosine on candidates only; the per-new-vector closest
    * keeper is a row_number shortlist (sim desc, prior id). */
  private val qDedupEmbedIncremental = Q("q_dedup_embed_incremental",
    s"""WITH $vectorsCte,
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |sp AS (SELECT (4 * n + 4) // 5 AS s FROM ns),
       |bx AS (
       |${(0 until DedupBands).map(j =>
          s"  SELECT vec_id, label, $j AS band, ${bandValueSql("v", j)} AS bv FROM e")
          .mkString("\n  UNION ALL\n")}
       |),
       |bm AS (SELECT b.vec_id, b.label, b.band, b.bv, b.vec_id < sp.s AS prior
       |       FROM bx b CROSS JOIN sp),
       |cand AS (
       |  SELECT DISTINCT nw.vec_id AS ni, p.vec_id AS pi
       |  FROM bm nw JOIN bm p
       |    ON nw.label = p.label AND nw.band = p.band AND nw.bv = p.bv
       |  WHERE NOT nw.prior AND p.prior),
       |scored AS (
       |  SELECT c.ni, c.pi,
       |    list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) AS sim
       |  FROM cand c JOIN e a ON a.vec_id = c.ni JOIN e b ON b.vec_id = c.pi
       |  WHERE list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.4),
       |ranked AS (
       |  SELECT ni, pi, sim,
       |    row_number() OVER (PARTITION BY ni ORDER BY sim DESC, pi) AS rn
       |  FROM scored)
       |SELECT ni AS new_id, pi AS dup_of, round(sim, 4) AS sim
       |FROM ranked WHERE rn = 1 ORDER BY new_id""".stripMargin) { (s, d) =>
    val e = vectors(s, d).fenced() // banded + verified against
    // bounded driver action: one count fixes the new/prior split id
    val split = (4L * t(s, d, "embeddings").count() + 4L) / 5L
    val bands = bandRows(e)
    // the band manifest the deployment persists: written to the
    // parquet store and read back — the ingest join below consumes
    // the store (prior ids all sit below `split`, so the helper's
    // ai < bi keeps exactly the prior×new cross pairs)
    // bucketed by the candidate join key prefix: the ingest join
    // below reads the manifest pre-partitioned — zero exchange/sort
    // on the manifest side, only the new batch shuffles
    // bucketed by the FULL candidate join key: stock Spark requires
    // all clustering keys for co-partitioning (a (label, band) prefix
    // would be re-exchanged), so (label, band, bv) is the spec that
    // actually engages
    val (_, priorBands) = graft.operators.DedupManifest.persistBucketed(
      bands.where(col("vec_id") < split),
      graft.operators.Bucketing.datasetTable("graft_embed_bands", d),
      Seq("label", "band", "bv"), buckets = 8)
    val w = Window.partitionBy(col("bi")).orderBy(col("sim").desc, col("ai"))
    embedVerifiedPairsBetween(priorBands, bands.where(col("vec_id") >= split), e)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("bi").as("new_id"), col("ai").as("dup_of"),
        round(col("sim"), 4).as("sim"))
      .orderBy(col("new_id"))
  }

  private val qKnnBrute = Q("q_knn_brute",
    s"""WITH $vectorsCte,
       |qs AS (SELECT * FROM e WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |               c.vec_id) AS rn
       |  FROM qs q JOIN e c ON q.vec_id <> c.vec_id)
       |SELECT q_id, n_id, CAST(rn AS INT) AS rn, round(cos, 6) AS sim
       |FROM scored WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    // Broadcast the (small) query side; the corpus streams through —
    // no shuffle of the corpus at any scale.
    e.join(broadcast(qs), col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Deterministic ±1 random-hyperplane matrix (seeded, engine-side
    * literal — no data dependence). 8 planes → 256 buckets: sized so
    * expected bucket occupancy N/2^bits stays useful at this corpus
    * scale; a production build sizes bits ~ log2(N/target_bucket). */
  private[graft] val LshBits = 8
  private[graft] val Planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(LshBits, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Random-hyperplane bucket for a double-vector column (native
    * codegen kernel; see [[bandValue]]). */
  private[graft] def lshBucket(v: Column): Column =
    graft.functions.GraftExpressions.plane_bits(v, Planes,
      Array.tabulate(LshBits)(j => 1L << j))

  /** DuckDB twin of [[lshBucket]]: the plane matrix is a deterministic
    * literal, so it embeds directly in the oracle SQL; the projection
    * is the same left-to-right double dot product both sides, so the
    * sign — hence the bucket — is bit-identical. */
  private def lshBucketSql(v: String): String =
    (0 until LshBits).map { j =>
      // render the ACTUAL plane values (single source of truth with
      // lshBucket) — re-deriving them here would silently diverge if
      // the planes ever stop being exactly ±1
      val plane = Planes(j).map(_.toString).mkString(",")
      s"(CASE WHEN list_dot_product($v, [$plane]::DOUBLE[]) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(s"(CASE WHEN $v IS NULL THEN NULL ELSE (", " + ", ") END)")
    // NULL guard ≡ PlaneBits.nullSafeEval (see bandValueSql)

  private val qKnnLsh = Q("q_knn_lsh",
    s"""WITH $vectorsCte,
       |b AS (SELECT vec_id, v, n2, ${lshBucketSql("v")} AS bucket FROM e),
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2, bucket AS qb
       |       FROM b WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.q_id, c.vec_id AS n_id,
       |    list_dot_product(q.qv, c.v) / (sqrt(q.qn2) * sqrt(c.n2)) AS cos,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_dot_product(q.qv, c.v) / (sqrt(q.qn2) * sqrt(c.n2)) DESC,
       |               c.vec_id) AS rn
       |  FROM qs q JOIN b c ON c.bucket = q.qb AND c.vec_id <> q.q_id)
       |SELECT q_id, n_id, CAST(rn AS INT) AS rn, round(cos, 6) AS sim
       |FROM scored WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d).withColumn("bucket", lshBucket(col("v")))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.join(broadcast(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket").as("qb"))),
      col("q_id") =!= col("vec_id") && col("bucket") === col("qb"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** IVF-style ANN (second scale path): a coarse quantizer of C=16
    * deterministic centroids (the first C corpus vectors — a stand-in
    * for k-means training) partitions the corpus into inverted lists;
    * queries probe their nprobe=2 nearest lists only. Candidate
    * generation is an equi-join on `list`, so the corpus is scanned
    * once to assign and once per probe hit — never all-pairs. At
    * cluster scale the assignment table is the thing you persist and
    * bucket by `list`.
    *
    * Assignment is a map-side argmax: `max_by` ordered by the
    * TOTALLY-ORDERED struct (cos, −cent_id) — no two candidates of a
    * vector share it, so the aggregate is tie-free and deterministic
    * (bare max_by under cosine ties would not be), and it picks
    * exactly row_number's (cos DESC, cent_id) winner, which keeps the
    * oracle hash. Shape: the partial aggregate collapses each
    * vector's C centroid rows BEFORE the exchange, so the shuffle
    * carries n rows — the crossJoin+window form it replaces shipped
    * n×C rows (each with the full vector) through the exchange, a C×
    * volume factor that dominates at 100 TB of embeddings. Probe
    * ranking (top-nprobe over 10 query vectors) stays row_number —
    * constant-size. */
  // private[graft]: PersistedIvfSpec re-derives the frozen-centroid
  // model and must train with THIS k, not a duplicated literal (r15
  // advice — a drifted copy would train a different model and fail
  // the compaction pin for a confusing reason)
  private[graft] val IvfC = 16
  private val IvfNprobe = 2

  /** Trained-IVF probe width — wider than the literal IVF's because
    * trained cells are BALANCED: see the [[qKnnIvfTrained]] operating-
    * point study (nprobe=4 → recall 0.92 at a 26% candidate fraction). */
  private val IvfNprobeTrained = 4

  private val qKnnIvf = Q("q_knn_ivf",
    s"""WITH $vectorsCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e WHERE vec_id < $IvfC),
       |asg AS (
       |  SELECT vec_id, v, n2, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) DESC,
       |               cent_id) AS arn
       |  FROM e CROSS JOIN cents),
       |assigned AS (SELECT vec_id, v, n2, cent_id AS list FROM asg WHERE arn = 1),
       |prb AS (
       |  SELECT e.vec_id AS q_id, e.v AS qv, e.n2 AS qn2, cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_dot_product(e.v, cv) / (sqrt(e.n2) * sqrt(cn2)) DESC,
       |               cent_id) AS pr
       |  FROM e CROSS JOIN cents WHERE e.vec_id < 10),
       |probes AS (SELECT q_id, qv, qn2, cent_id AS list FROM prb WHERE pr <= $IvfNprobe),
       |scored AS (
       |  SELECT p.q_id, a.vec_id AS n_id,
       |    list_dot_product(p.qv, a.v) / (sqrt(p.qn2) * sqrt(a.n2)) AS cos,
       |    row_number() OVER (PARTITION BY p.q_id
       |      ORDER BY list_dot_product(p.qv, a.v) / (sqrt(p.qn2) * sqrt(a.n2)) DESC,
       |               a.vec_id) AS rn
       |  FROM probes p JOIN assigned a ON a.list = p.list AND a.vec_id <> p.q_id)
       |SELECT q_id, n_id, CAST(rn AS INT) AS rn, round(cos, 6) AS sim
       |FROM scored WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val cents = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val simToCent = cosine(col("v"), col("cv"))
    // inverted-list assignment: nearest centroid per corpus vector,
    // map-side argmax (see scaladoc) — n-row exchange, not n×C
    val assigned = e.crossJoin(cents)
      .withColumn("cs", simToCent)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("v")),
        struct(col("cs"), (-col("cent_id")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.cent_id").as("list"))
    // queries probe their nprobe nearest lists
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qc").desc, col("cent_id"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(cents)
      .withColumn("qc", cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfNprobe)
      .select(col("q_id"), col("qv"), col("cent_id").as("list"))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    assigned.join(broadcast(probes), Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** k∝n quantizer sizing for the SemDeDup query ([[qDedupSemantic]],
    * defined after the adaptive-bucket machinery it now shares with
    * the kNN-graph build): C(n) = max([[SemCMin]], ⌈n/[[SemCell]]⌉),
    * so expected cluster population stays ≈ [[SemCell]] as the corpus
    * grows and the within-cluster all-pairs prune stays ≈ Cell·n/2 —
    * linear, the published SemDeDup recipe. Integer-exact on both
    * engines (ceil by (n+Cell−1)÷Cell, no float round-trip). */
  private[graft] val SemCMin = 8L
  private val SemCell = 64L
  private[graft] def semC(n: Long): Long = math.max(SemCMin, (n + SemCell - 1) / SemCell)

  /** Per-label centroid — the embedding aggregation that trains IVF
    * coarse quantizers and powers class-prototype analyses. Long-form
    * output (label, dim, value) keeps it portable. Exactness: float
    * sums are not associative across partitions, so each element is
    * summed as DECIMAL (order-independent) and only the final mean is
    * cast to double and rounded ([[graft.functions.PortableHash]]
    * stance). Scale shape: posexplode feeds a partial-aggregable
    * (label, dim) groupBy — the exchange carries one decimal per
    * (label, dim, partition), never raw vectors. */
  private val qEmbedCentroid = Q("q_embed_centroid",
    """WITH u AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS dim,
      |         unnest(embedding::DOUBLE[]) AS v
      |  FROM embeddings)
      |SELECT label, CAST(dim AS INT) AS dim,
      |  round(CAST(sum(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS centroid
      |FROM u GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin) { (s, d) =>
    t(s, d, "embeddings")
      .select(col("label"),
        posexplode(asDouble(col("embedding"))).as(Seq("p", "v")))
      .groupBy(col("label"), (col("p") + 1).cast("int").as("dim"))
      .agg(round(sum(col("v").cast("decimal(18,8)")).cast("double")
        / count(lit(1)), 6).as("centroid"))
      .orderBy(col("label"), col("dim"))
  }

  /** Multi-table banded LSH k-NN — the amplification fix for
    * single-bucket LSH's measured 0 recall at this corpus's 60°
    * neighbor regime (AnnRecallSpec): candidates collide in ANY of the
    * `DedupBands` 4-bit band tables (per-band collision p ≈ 0.66⁴ for
    * cos 0.5 ⇒ any-band recall ≈ 1−(1−0.19)⁸ ≈ 0.8), then the exact
    * cosine ranks candidates — candidate-approximation with exact
    * scoring, the combination the recall harness shows wins. Same
    * plane literals as the embed-dedup banding, so fully
    * oracle-checked. Scale shape: 8 equi-joins' worth of band rows
    * (still linear), query side broadcast, no all-pairs. */
  private val qKnnLshMulti = Q("q_knn_lsh_multi",
    s"""WITH $vectorsCte,
       |bx AS (
       |${(0 until DedupBands).map(j =>
          s"  SELECT vec_id, $j AS band, ${bandValueSql("v", j)} AS bv FROM e")
          .mkString("\n  UNION ALL\n")}
       |),
       |qb AS (SELECT vec_id AS q_id, band, bv FROM bx WHERE vec_id < 10),
       |cand AS (SELECT DISTINCT q.q_id, b.vec_id AS n_id
       |         FROM qb q JOIN bx b
       |           ON q.band = b.band AND q.bv = b.bv AND b.vec_id <> q.q_id),
       |scored AS (
       |  SELECT c.q_id, c.n_id,
       |    list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) AS cos,
       |    row_number() OVER (PARTITION BY c.q_id
       |      ORDER BY list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) DESC,
       |               c.n_id) AS rn
       |  FROM cand c JOIN e a ON a.vec_id = c.q_id JOIN e b ON b.vec_id = c.n_id)
       |SELECT q_id, n_id, CAST(rn AS INT) AS rn, round(cos, 6) AS sim
       |FROM scored WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d).fenced() // banded + scored against
    val bands = e.select(col("vec_id"),
      explode(array((0 until DedupBands).map(j =>
        struct(lit(j).as("band"), bandValue(col("v"), j).as("bv"))): _*)).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.bv").as("bv"))
    val qb = bands.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("band").as("qband"), col("bv").as("qbv"))
    val cand = bands.join(broadcast(qb),
      col("band") === col("qband") && col("bv") === col("qbv") &&
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id")).distinct()
    val cos = cosine(col("qv"), col("nv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .join(broadcast(e.select(col("vec_id").as("qe_id"), col("v").as("qv"))
        .where(col("qe_id") < 10)), col("q_id") === col("qe_id"))
      .join(e.select(col("vec_id").as("ne_id"), col("v").as("nv")),
        col("n_id") === col("ne_id"))
      .select(col("q_id"), col("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  // ------------------------------------------------- product quantization

  private val PqM = 4 // subspaces
  private val PqDsub = 16 // dims per subspace (4 × 16 = the 64-dim embedding)
  private val PqK = 16 // codes per subspace; codebook = first PqK vectors

  /** ANN by product quantization with asymmetric distance computation
    * (public technique: Jégou/Douze/Schmid, "Product Quantization for
    * Nearest Neighbor Search", TPAMI'11). The embedding is split into
    * `PqM` subspaces; each database vector is ENCODED as `PqM` small
    * code ids (nearest codebook centroid per subspace by L2) — at
    * 100 TB that is 4 bytes per vector instead of 512, and encoding is
    * one linear scan against a broadcast codebook. Queries never touch
    * database vectors: a per-query LUT of query-subvector × centroid
    * dot products (|q|·PqM·PqK rows — tiny) broadcasts, and scoring a
    * database vector is 4 LUT lookups + 3 adds on its codes, fully
    * codegen. The approximate score ranks; exactness of the oracle
    * compare comes from both engines summing the 4 LUT doubles in the
    * same written order (same discipline as the cosine queries).
    * Codebook = subvectors of the first `PqK` vectors (deterministic,
    * data-independent choice — same rationale as the IVF centroids).
    *
    * Measured recall@5 vs q_knn_brute at sf0.01 (AnnRecallSpec pins
    * these): IVF(nprobe=2) 0.92, multi-table banded LSH 0.72, PQ 0.28, single-bucket LSH 0.0. The spread
    * is the corpus geometry, not a bug: true neighbors sit at
    * cos ≈ 0.5 with the bulk at ≈ 0.45, and PQ approximates the SCORE
    * itself, so quantization noise swamps that margin (K=64 measures
    * the same 0.26), while IVF only approximates the CANDIDATE SET
    * and scores it exactly. The production reading: on low-margin
    * embeddings, prefer candidate-approximation (IVF) over
    * score-approximation (ADC), or rerank PQ shortlists exactly. */
  private val qKnnPq = Q("q_knn_pq",
    s"""WITH $vectorsCte,
       |js AS (SELECT unnest([0,1,2,3]) AS j),
       |sub AS (SELECT vec_id, j,
       |          list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS xs
       |        FROM e, js),
       |csub AS (SELECT vec_id AS cent_id, j,
       |           list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS cs,
       |           list_dot_product(list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub),
       |                            list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub)) AS cn2
       |         FROM e, js WHERE vec_id < $PqK),
       |dist AS (SELECT s.vec_id, s.j, c.cent_id,
       |           c.cn2 - 2 * list_dot_product(s.xs, c.cs) AS dd
       |         FROM sub s JOIN csub c ON s.j = c.j),
       |code AS (SELECT vec_id, j, cent_id AS code FROM (
       |           SELECT vec_id, j, cent_id,
       |             row_number() OVER (PARTITION BY vec_id, j
       |               ORDER BY dd, cent_id) AS rn
       |           FROM dist) WHERE rn = 1),
       |cw AS (SELECT c.vec_id,
       |         max(CASE WHEN j = 0 THEN code END) AS c0,
       |         max(CASE WHEN j = 1 THEN code END) AS c1,
       |         max(CASE WHEN j = 2 THEN code END) AS c2,
       |         max(CASE WHEN j = 3 THEN code END) AS c3,
       |         any_value(e.n2) AS xn2
       |       FROM code c JOIN e ON c.vec_id = e.vec_id
       |       GROUP BY c.vec_id),
       |lut AS (SELECT q.vec_id AS q_id, q.n2 AS qn2, c.j, c.cent_id,
       |          list_dot_product(list_slice(q.v, c.j*$PqDsub+1, c.j*$PqDsub+$PqDsub),
       |                           c.cs) AS qdot
       |        FROM e q JOIN csub c ON true WHERE q.vec_id < 10),
       |scored AS (
       |  SELECT l0.q_id, x.vec_id AS n_id,
       |    (l0.qdot + l1.qdot + l2.qdot + l3.qdot)
       |      / (sqrt(l0.qn2) * sqrt(x.xn2)) AS score
       |  FROM cw x
       |  JOIN lut l0 ON l0.j = 0 AND l0.cent_id = x.c0
       |  JOIN lut l1 ON l1.q_id = l0.q_id AND l1.j = 1 AND l1.cent_id = x.c1
       |  JOIN lut l2 ON l2.q_id = l0.q_id AND l2.j = 2 AND l2.cent_id = x.c2
       |  JOIN lut l3 ON l3.q_id = l0.q_id AND l3.j = 3 AND l3.cent_id = x.c3
       |  WHERE l0.q_id <> x.vec_id),
       |rk AS (SELECT q_id, n_id, score,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY score DESC, n_id) AS rn
       |       FROM scored)
       |SELECT q_id, n_id, CAST(rn AS INT) AS rn, round(score, 6) AS ascore
       |FROM rk WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v")))
    def subspaces(src: DataFrame, idCol: String): DataFrame = src
      .select(col(idCol), explode(array((0 until PqM).map(j =>
        struct(lit(j).as("j"),
          slice(col("v"), j * PqDsub + 1, PqDsub).as("xs"))): _*)).as("s"))
      .select(col(idCol), col("s.j").as("j"), col("s.xs").as("xs"))
    val sub = subspaces(e, "vec_id")
    val csub = subspaces(e.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    // encode: one scan of the corpus against the broadcast codebook
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = sub.join(broadcast(csub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    // codes + the vector's TRUE norm (recorded at encode time — the
    // IVFADC practice that lets ADC rank by cosine, not raw dot)
    val cw = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(e.select(col("vec_id"), col("n2").as("xn2")), "vec_id")
    // per-query LUT: |q| × PqM × PqK rows, broadcast to the scorers
    val lut = subspaces(e.where(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "q_id"), "q_id")
      .join(broadcast(csub), "j")
      .select(col("q_id"), col("j"), col("cent_id"),
        dot(col("xs"), col("cs")).as("qdot"))
    def lutJ(j: Int): DataFrame = lut.where(col("j") === j)
      .select(col("q_id").as(s"q$j"), col("cent_id").as(s"k$j"),
        col("qdot").as(s"d$j"))
    val qn2 = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qn_id"), col("n2").as("qn2"))
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    cw.join(broadcast(lutJ(0)), col("c0") === col("k0"))
      .join(broadcast(lutJ(1)), col("q0") === col("q1") && col("c1") === col("k1"))
      .join(broadcast(lutJ(2)), col("q0") === col("q2") && col("c2") === col("k2"))
      .join(broadcast(lutJ(3)), col("q0") === col("q3") && col("c3") === col("k3"))
      .join(broadcast(qn2), col("q0") === col("qn_id"))
      .where(col("q0") =!= col("vec_id"))
      .select(col("q0").as("q_id"), col("vec_id").as("n_id"),
        ((col("d0") + col("d1") + col("d2") + col("d3"))
          / (sqrt(col("qn2")) * sqrt(col("xn2")))).as("score"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("score"), 6).as("ascore"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Per-dimension covariance of the embedding cloud (dims 1..8 of
    * 64) — the statistics PCA, whitening, and PQ subspace allocation
    * are built on. This declarative form is the exact-decimal ORACLE
    * twin: elements round to 6 dp into DECIMAL(10,6), products and
    * sums stay exact, and the covariance assembles in double from
    * identical exact inputs — bit-equal on both engines, no float
    * tolerance.
    *
    * Scale note: this shape shuffles |pairs|·n element rows and
    * exists for the oracle's sake on a dimension slice;
    * [[graft.operators.Pca]] computes the FULL d×d matrix in one
    * aggregator pass whose exchange carries d(d+1)/2 partials per
    * task, and PcaSpec pins the two against each other. */
  private val qEmbedCov = Q("q_embed_cov",
    """WITH idx AS (SELECT unnest([1,2,3,4,5,6,7,8]) AS i),
      |pairs AS (SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON a.i <= b.i),
      |el AS (
      |  SELECT p.i, p.j,
      |    CAST(round(CAST(e.embedding[p.i] AS DOUBLE), 6) AS DECIMAL(10,6)) AS x,
      |    CAST(round(CAST(e.embedding[p.j] AS DOUBLE), 6) AS DECIMAL(10,6)) AS y
      |  FROM embeddings e CROSS JOIN pairs p),
      |s AS (
      |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy
      |  FROM el GROUP BY i, j)
      |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
      |  round((sxy - sx * sy / n) / (n - 1), 8) AS cov
      |FROM s ORDER BY i, j""".stripMargin) { (s, d) =>
    val idx = (1 to 8)
    val pairs = for { i <- idx; j <- idx if i <= j } yield (i, j)
    val pairsDf = s.createDataFrame(pairs).toDF("i", "j")
    val dec = org.apache.spark.sql.types.DecimalType(10, 6)
    val el = t(s, d, "embeddings")
      .crossJoin(broadcast(pairsDf))
      .select(col("i"), col("j"),
        round(element_at(col("embedding"), col("i")).cast("double"), 6)
          .cast(dec).as("x"),
        round(element_at(col("embedding"), col("j")).cast("double"), 6)
          .cast(dec).as("y"))
    el.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 8)
          .as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** Top-4 PCA projection of the first 20 vectors — the operator's
    * query surface ([[graft.operators.Pca]]: one aggregator pass for
    * the moments, driver-side power iteration, broadcast-model
    * projection scan). An eigenproblem has no ANSI-SQL form, so the
    * raw coordinates are PcaSpec-pinned (vs in-memory reference fit +
    * the exact-decimal covariance twin `q_embed_cov`); this Q entry
    * wraps the projection in its DuckDB-checkable INVARIANTS instead:
    * the centered norm ||x−μ||² (computed by the qEmbedOutlier
    * exact-decimal discipline, genuinely recomputed by the oracle)
    * and Bessel's inequality ||Wᵀ(x−μ)||² ≤ ||x−μ||² over the real
    * projection output — the verdict an engine with wrong centering,
    * non-orthonormal components, or a broken projection would fail. */
  private[graft] def pcaProjection(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Pca
    val vecs = t(s, d, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val spark = s
    import spark.implicits._
    val model = Pca.fit(vecs.as[Array[Double]], d = 64, k = 4)
    Pca.project(t(s, d, "embeddings").where(col("vec_id") < 20),
      "vec_id", "embedding", model)
  }

  private val qEmbedPca = Q("q_embed_pca",
    """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
      |             unnest(embedding::DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT dim,
      |        round(CAST(sum(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS cent
      |      FROM u GROUP BY 1),
      |term AS (SELECT u.vec_id,
      |           CAST(round((u.v - c.cent) * (u.v - c.cent), 12) AS DECIMAL(28,12)) AS t2
      |         FROM u JOIN c ON u.dim = c.dim WHERE u.vec_id < 20)
      |SELECT vec_id, CAST(4 AS INT) AS k,
      |  round(CAST(sum(t2) AS DOUBLE), 6) AS c_norm2, true AS proj_ok
      |FROM term GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
    val projNorm2 = aggregate(col("pc"), lit(0.0), (acc, x) => acc + x * x)
    val proj = pcaProjection(s, d)
      .select(col("vec_id"), projNorm2.as("p_norm2"))
    val u = t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("p", "v")))
    val cent = u.groupBy(col("p"))
      .agg(round(sum(col("v").cast(DecimalType(18, 8))).cast("double") /
        count(lit(1)), 6).as("cent"))
    val cn = u.where(col("vec_id") < 20)
      .join(broadcast(cent), "p")
      .select(col("vec_id"),
        round((col("v") - col("cent")) * (col("v") - col("cent")), 12)
          .cast(DecimalType(28, 12)).as("t2"))
      .groupBy(col("vec_id"))
      .agg(round(sum(col("t2")).cast("double"), 6).as("c_norm2"))
    cn.join(broadcast(proj), "vec_id")
      .select(col("vec_id"), lit(4).as("k"), col("c_norm2"),
        (col("p_norm2") <= col("c_norm2") + lit(1e-3)).as("proj_ok"))
      .orderBy(col("vec_id"))
  }

  /** IVF with TRAINED centroids — the production path: Lloyd's
    * k-means ([[graft.operators.KMeans]], deterministic init, 5
    * rounds) learns the [[IvfC]] coarse cells instead of borrowing
    * the first corpus vectors, corpus vectors land in their L2-
    * nearest cell, queries probe their [[IvfNprobeTrained]] nearest
    * cells, and candidates re-rank by EXACT cosine (so quality loss
    * is candidate-set-only, as with `q_knn_ivf`). The trained
    * centroids are a fixpoint of a 5-round distributed iteration, not
    * SQL-expressible, so the raw result set is AnnRecallSpec-pinned
    * (measured recall 0.92 at this operating point) and the
    * [[qKnnIvfTrained]] Q entry oracle-checks the per-query recall
    * VERDICT against the in-plan brute-force exact top-k instead.
    *
    * Operating point — MEASURED, round-5 seeding study (sf0.01,
    * recall@5 vs brute force over 10 queries):
    *
    *  - seeding does NOT fix the recall gap on this corpus: smallest-
    *    id init / deterministic farthest-point ([[KMeans.seedFarthest]])
    *    / deterministic A-ES d²-weighted k-means++ measured 0.80 /
    *    0.46 / 0.44 at nprobe=2 — the "spread" seedings are WORSE,
    *    not better, and still worse converged (0.88/0.62/0.64 at
    *    nprobe=4, 15 rounds). The cloud is isotropic: there is no
    *    cluster structure to learn, spread/shell-biased seeds pull
    *    centroids away from the bulk where the queries and their
    *    neighbors live, while arbitrary-id seeds (ids uncorrelated
    *    with geometry ≙ uniform draw) stay in it. `seeded = true`
    *    remains the right call when row ids DO correlate with content
    *    (crawl order, shard order) — exactly the degeneracy the flag
    *    exists for.
    *  - what DOES buy recall is probe width against the balanced
    *    trained cells: nprobe 2/3/4 → recall 0.80/0.84/0.92 at
    *    candidate fractions 13/20/26% of the corpus (literal IVF:
    *    0.92 at 12% — on a structureless cloud training cannot beat
    *    well-placed literals, it only equalizes cell sizes). Chosen
    *    point: nprobe=4, recall 0.92, the same recall as literal IVF
    *    with balanced (predictable-latency) cells.
    *
    * Scale shape: training scans the corpus once per round
    * (broadcast-literal centroid expression, one d×k agg per round);
    * assignment and probe are stateless scans against the broadcast
    * model; candidate scoring joins on the cell id — never all-pairs. */
  private[graft] def knnIvfTrained(s: SparkSession, d: String): DataFrame = {
    import graft.operators.KMeans
    val e = vectors(s, d)
    val (assigned, cents, _) =
      KMeans.fit(e.select(col("vec_id"), col("v")), k = IvfC, maxIter = 5)
    val lists = assigned.select(col("id").as("vec_id"), col("cluster").as("list"))
    val centRows = cents.toIndexedSeq.zipWithIndex.map { case (c, j) => (j, c) }
    val centDf = s.createDataFrame(centRows).toDF("cent_id", "cv")
    val l2 = graft.functions.GraftExpressions.sq_dist(col("qv"), col("cv"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qd2"), col("cent_id"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("qd2", l2)
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfNprobeTrained)
      .select(col("q_id"), col("qv"), col("cent_id").as("list"))
    val corpus = e.join(lists, "vec_id").select(col("vec_id"), col("v"), col("list"))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    corpus.join(broadcast(probes), Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Oracle check for the trained-IVF path via its GUARANTEE: the
    * retrieved neighbor ids are a fixpoint of the distributed k-means
    * iteration (not SQL-expressible — the raw result set stays
    * AnnRecallSpec-pinned via [[knnIvfTrained]]), but "each query
    * returns a FULL top-k and individually recalls ≥ `RecallFloor` of
    * the exact brute-force top-k" is a per-query verdict both engines
    * agree on: the brute-force side IS SQL-expressible, so the oracle
    * asserts (k rows retrieved, recall verdict true) per query while
    * Spark computes both from the real IVF output joined against the
    * real exact top-k in one plan. Floor = 0.4 — comfortably under
    * the measured per-query minimum (0.80 at sf0.01, AnnRecallSpec)
    * so borderline float drift can't flip it, far above the 0.0–0.28
    * a broken probe or score-approximation would measure; the oracle
    * run pins the floor verdict at sf0.001/0.01/0.1. */
  private val RecallFloor = 0.4

  private val qKnnIvfTrained = Q("q_knn_ivf_trained",
    s"""WITH $vectorsCte
       |SELECT vec_id AS q_id, CAST(5 AS INT) AS n_ret, true AS recall_ok
       |FROM e WHERE vec_id < 10 ORDER BY q_id""".stripMargin) { (s, d) =>
    val ivf = knnIvfTrained(s, d).select(col("q_id"), col("n_id"))
    val brute = qKnnBrute.fn(s, d).select(col("q_id"), col("n_id"))
    val hits = ivf.join(brute, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    ivf.groupBy(col("q_id")).agg(count(lit(1)).as("n_ret"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_ret").cast("int").as("n_ret"),
        (coalesce(col("n_hit"), lit(0L)).cast("double")
          >= lit(RecallFloor) * lit(5.0)).as("recall_ok"))
      .orderBy(col("q_id"))
  }

  /** PERSISTED-IVF serving (round 15) — the index as a DURABLE store:
    * the trained posting lists are written PARTITIONED BY cell id
    * ([[graft.operators.DedupManifest.persistPartitioned]]) and the
    * query path reads the store back with a literal cell filter, so
    * the serving scan touches ONLY the probed cells' directories
    * (static partition pruning — `PartitionFilters` on the scan, the
    * PersistedIvfSpec pin). That is the property that makes IVF an
    * INDEX at 100 TB: a query reads nprobe/C of the corpus from disk,
    * not a full scan filtered in memory. Build-offline/serve-later is
    * the deployment shape the in-memory [[knnIvfTrained]] cannot
    * express.
    *
    * Probe selection runs DRIVER-SIDE over the k-bounded centroid
    * table (|queries|·nprobe rows — the KMeans-centroid bound) with a
    * sq-dist twin replicating the native [[graft.functions
    * .GraftExpressions.sq_dist]] accumulation exactly (left-to-right
    * double loop), and the same (d², cent_id) tie-break — so the
    * persisted path returns the IDENTICAL rows to [[knnIvfTrained]]
    * (spec-pinned row-for-row). Rerank is the shared exact-cosine
    * top-k. */
  /** The exact sq_dist twin of [[graft.functions.GraftExpressions
    * .sq_dist]] — left-to-right double accumulation, so driver-side
    * probe selection and the in-plan assignment agree bit-for-bit. */
  private[graft] def sqDistLocal(a: Seq[Double], b: Array[Double]): Double = {
    var sAcc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val dd = a(i) - b(i); sAcc += dd * dd; i += 1 }
    sAcc
  }

  /** The SHARED IVF serving tail: driver-side probe selection over
    * the k-bounded centroid table ((d², cent_id) tie-break), a
    * literal cell filter on the store scan (static partition pruning
    * when the store is cell-partitioned), exact-cosine rerank,
    * per-query top-5. Consumed by [[knnIvfPersisted]],
    * [[knnIvfIncremental]] (base ∪ delta store), the compaction pin,
    * and the streaming twin ([[graft.streaming.StreamingIvf]]) — one
    * tail, so none of the four can drift. `queries` is the serving
    * batch: |queries| is request-scale, never corpus-scale. */
  private[graft] def ivfServe(store: DataFrame, cents: Array[Array[Double]],
      queries: Array[(Long, Seq[Double])],
      nprobe: Int = IvfNprobeTrained): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._
    val probes = queries.sortBy(_._1).flatMap { case (q, qv) =>
      cents.zipWithIndex
        .map { case (c, j) => (sqDistLocal(qv, c), j) }.sorted
        .take(nprobe)
        .map { case (_, j) => (q, j, qv) }
    }
    val cells = probes.map(_._2).distinct.sorted.toSeq
    val probesDf = broadcast(probes.toSeq.toDF("q_id", "list", "qv"))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    store
      .where(col("list").isin(cells: _*)) // static partition pruning
      .join(probesDf, Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Trained model + durable cell-partitioned store over the full
    * corpus — the index-BUILD half of [[knnIvfPersisted]], shared
    * with the streaming twin.
    *
    * @param kind store path tag under the session manifest root —
    *   the batch query uses the shared "ivf" store; a SERVING STREAM
    *   passes its own generation tag (r15 advice: [[graft.operators
    *   .DedupManifest]] retention reclaims a shared-path version
    *   after two further persists, which would yank files out from
    *   under a long-lived stream when the query-path store rebuilds) */
  private[graft] def ivfBuildStore(s: SparkSession, d: String,
      kind: String = "ivf"): (DataFrame, Array[Array[Double]]) = {
    import graft.operators.{DedupManifest, KMeans}
    val e = vectors(s, d).fenced() // assignment build + probe queries
    val (assigned, cents, _) =
      KMeans.fit(e.select(col("vec_id"), col("v")), k = IvfC, maxIter = 5)
    val posting = e
      .join(assigned.select(col("id").as("vec_id"), col("cluster").as("list")),
        "vec_id")
      .select(col("list").cast("int").as("list"), col("vec_id"), col("v"))
    val store = DedupManifest
      .persistPartitioned(posting, DedupManifest.path(s, kind, d), Seq("list"))
      .select(col("list").cast("int").as("list"), col("vec_id"), col("v"))
    (store, cents)
  }

  /** The fixed serving query set of the knn family (vec_id < 10). */
  private[graft] def ivfQueries(s: SparkSession, d: String)
      : Array[(Long, Seq[Double])] = {
    val spark = s
    import spark.implicits._
    vectors(s, d).where(col("vec_id") < 10)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
  }

  private[graft] def knnIvfPersisted(s: SparkSession, d: String): DataFrame = {
    val (store, cents) = ivfBuildStore(s, d)
    ivfServe(store, cents, ivfQueries(s, d))
  }

  /** INCREMENTAL index maintenance (round 15) — the day-2 operation
    * of [[knnIvfPersisted]]: vectors keep arriving after the index is
    * built, and retraining + rewriting the whole store per batch is
    * not an option at corpus scale. The classic base+delta shape:
    *
    *  - BASE: posting lists of the prior corpus (first 4/5 by id),
    *    trained on the prior corpus, persisted partitioned by cell —
    *    IMMUTABLE;
    *  - DELTA: the new batch assigned to the FROZEN prior centroids
    *    (an in-plan argmin over the broadcast k-bounded centroid
    *    table — no retraining, the production contract), persisted
    *    partitioned to its own store;
    *  - SERVE: the probe scan UNIONS base and delta under the same
    *    literal cell filter — BOTH sides partition-prune, so the
    *    incremental index keeps the nprobe/C read fraction; a
    *    periodic compaction (re-persist base ∪ delta as the next
    *    base version) is the same persist call — cell membership is
    *    already final at assignment time, so compaction moves files,
    *    never answers.
    *
    * Assignment ties break by (d², cent_id) — identical driver-side
    * (probe selection) and in-plan (delta assignment), so base+delta
    * serving is spec-pinned IDENTICAL to a monolithic index built
    * over the full corpus with the same frozen centroids. */
  private[graft] def knnIvfIncremental(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{DedupManifest, KMeans}
    val spark = s
    import spark.implicits._
    val e = vectors(s, d).fenced() // prior train + delta assign + queries
    val split = (4L * t(s, d, "embeddings").count() + 4L) / 5L
    val prior = e.where(col("vec_id") < split)
    val (assignedPrior, cents, _) =
      KMeans.fit(prior.select(col("vec_id"), col("v")), k = IvfC, maxIter = 5)
    val base = DedupManifest.persistPartitioned(
      prior.join(assignedPrior.select(col("id").as("vec_id"),
          col("cluster").as("list")), "vec_id")
        .select(col("list").cast("int").as("list"), col("vec_id"), col("v")),
      DedupManifest.path(s, "ivfbase", d), Seq("list"))
    // delta: FROZEN-centroid assignment, in-plan argmin with the
    // (d², cent_id) tie-break the probe selection uses
    val centDf = broadcast(cents.toIndexedSeq.zipWithIndex
      .map { case (c, j) => (j, c.toSeq) }.toDF("cent_id", "cv").fenced())
    val l2 = graft.functions.GraftExpressions.sq_dist(col("v"), col("cv"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("cent_id"))
    val delta = DedupManifest.persistPartitioned(
      e.where(col("vec_id") >= split)
        .crossJoin(centDf)
        .withColumn("d2", l2)
        .withColumn("rn", row_number().over(wAssign))
        .where(col("rn") === 1)
        .select(col("cent_id").cast("int").as("list"), col("vec_id"), col("v")),
      DedupManifest.path(s, "ivfdelta", d), Seq("list"))
    def cells(st: DataFrame) =
      st.select(col("list").cast("int").as("list"), col("vec_id"), col("v"))
    // the shared serving tail over base ∪ delta: the literal cell
    // filter prunes BOTH stores
    ivfServe(cells(base).union(cells(delta)), cents, ivfQueries(s, d))
  }

  private val qKnnIvfIncremental = Q("q_knn_ivf_incremental",
    s"""WITH $vectorsCte
       |SELECT vec_id AS q_id, CAST(5 AS INT) AS n_ret, true AS recall_ok
       |FROM e WHERE vec_id < 10 ORDER BY q_id""".stripMargin) { (s, d) =>
    val ivf = knnIvfIncremental(s, d).select(col("q_id"), col("n_id"))
    val brute = qKnnBrute.fn(s, d).select(col("q_id"), col("n_id"))
    val hits = ivf.join(brute, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    ivf.groupBy(col("q_id")).agg(count(lit(1)).as("n_ret"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_ret").cast("int").as("n_ret"),
        (coalesce(col("n_hit"), lit(0L)).cast("double")
          >= lit(RecallFloor) * lit(5.0)).as("recall_ok"))
      .orderBy(col("q_id"))
  }

  /** Oracle = [[qKnnIvfTrained]]'s guarantee stance: the persisted
    * path's raw rows are spec-pinned IDENTICAL to the in-memory
    * trained-IVF plan, and the oracle asserts the per-query recall
    * verdict both engines can compute. */
  private val qKnnIvfPersisted = Q("q_knn_ivf_persisted",
    s"""WITH $vectorsCte
       |SELECT vec_id AS q_id, CAST(5 AS INT) AS n_ret, true AS recall_ok
       |FROM e WHERE vec_id < 10 ORDER BY q_id""".stripMargin) { (s, d) =>
    val ivf = knnIvfPersisted(s, d).select(col("q_id"), col("n_id"))
    val brute = qKnnBrute.fn(s, d).select(col("q_id"), col("n_id"))
    val hits = ivf.join(brute, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    ivf.groupBy(col("q_id")).agg(count(lit(1)).as("n_ret"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_ret").cast("int").as("n_ret"),
        (coalesce(col("n_hit"), lit(0L)).cast("double")
          >= lit(RecallFloor) * lit(5.0)).as("recall_ok"))
      .orderBy(col("q_id"))
  }

  // ---------------------------------------------- IVF maintenance policy

  /** Rewrite a cell once its delta holds ≥ this fraction of the
    * cell's postings: past it, the delta's extra file opens and
    * merge-read overhead on every probe outweigh one rewrite. */
  private[graft] val IvfCompactDeltaFrac = 0.25

  /** …or once the delta has fragmented into this many files per cell
    * (many small ingests), regardless of row fraction: probe cost at
    * corpus scale is file-open-bound before it is row-bound. */
  private[graft] val IvfCompactMaxDeltaFiles = 4L

  /** Planner stand-in for the store's file granularity in the ○
    * query's synthesized manifest (integer-exact on both engines). */
  private val IvfRowsPerFile = 8L

  /** The IVF maintenance DECISION operator (r15 verdict item 5) —
    * the `q_compact_plan` analog for the ANN store: given the
    * per-cell base/delta manifest (posting-row and file counts),
    * emit the REWRITE SET a compaction job would execute — `rewrite`
    * iff the cell has any delta AND (delta fraction ≥
    * [[IvfCompactDeltaFrac]] OR delta files ≥
    * [[IvfCompactMaxDeltaFiles]]). Pairs with the compaction
    * EXECUTION pin: PersistedIvfSpec derives the manifest from the
    * REAL base/delta stores, runs THIS planner, executes its rewrite
    * set, and pins the partially-compacted store answer-identical to
    * the live union (cell membership is final at assignment, so
    * compaction moves files, never answers).
    *
    * Scale shape: the planner runs on METADATA cardinality — one row
    * per cell (k-bounded), never a posting scan; the decision
    * expression is pure per-row arithmetic. The frac comparison uses
    * the same IEEE division on both engines (unrounded), so the
    * boundary cannot fork; only the REPORTED fraction rounds. */
  private[graft] def ivfCompactPlan(manifest: DataFrame): DataFrame = {
    val frac = col("n_delta").cast("double") /
      (col("n_base") + col("n_delta")).cast("double")
    manifest.select(col("list"), col("n_base"), col("n_delta"),
        col("files_base"), col("files_delta"),
        round(frac, 4).as("delta_frac"),
        when(col("n_delta") > 0L &&
            (frac >= lit(IvfCompactDeltaFrac) ||
              col("files_delta") >= lit(IvfCompactMaxDeltaFiles)),
          lit("rewrite")).otherwise(lit("keep")).as("action"))
      .orderBy(col("list"))
  }

  /** ○ anchor for [[ivfCompactPlan]]: the policy runs over a
    * manifest BOTH engines synthesize from `embeddings` by public
    * integer rules (cell = vec_id mod k; delta membership by a
    * Knuth-hash rule whose rate RISES with the cell id, so the
    * rewrite/keep boundary, the n_delta = 0 degenerate, and the
    * file-count trigger are all exercised in one result; files =
    * ⌈rows / [[IvfRowsPerFile]]⌉). The REAL store's manifest is not
    * DuckDB-derivable (cells come from KMeans), so the policy logic
    * is hash-checked here and the real-store integration is the
    * PersistedIvfSpec execution pin — the q_knn_ivf_persisted
    * split of guarantees. */
  private val qIvfCompactPlan = Q("q_ivf_compact_plan",
    s"""WITH m AS (
       |  SELECT vec_id % $IvfC AS list,
       |    CASE WHEN ((vec_id % 97) * 2654435761) % 100 < (vec_id % $IvfC) * 5
       |         THEN 1 ELSE 0 END AS is_delta
       |  FROM embeddings),
       |g AS (SELECT list,
       |        CAST(sum(1 - is_delta) AS BIGINT) AS n_base,
       |        CAST(sum(is_delta) AS BIGINT) AS n_delta
       |      FROM m GROUP BY list),
       |f AS (SELECT list, n_base, n_delta,
       |        (n_base + ${IvfRowsPerFile - 1}) // $IvfRowsPerFile AS files_base,
       |        (n_delta + ${IvfRowsPerFile - 1}) // $IvfRowsPerFile AS files_delta
       |      FROM g)
       |SELECT list, n_base, n_delta, files_base, files_delta,
       |  round(n_delta / CAST(n_base + n_delta AS DOUBLE), 4) AS delta_frac,
       |  CASE WHEN n_delta > 0
       |        AND (n_delta / CAST(n_base + n_delta AS DOUBLE)
       |               >= $IvfCompactDeltaFrac
       |             OR files_delta >= $IvfCompactMaxDeltaFiles)
       |       THEN 'rewrite' ELSE 'keep' END AS action
       |FROM f ORDER BY list""".stripMargin) { (s, d) =>
    // BOUNDED operands (r16 advice): vec_id reduces mod 97 BEFORE the
    // Knuth multiply — the raw product wraps Spark's Long (silently)
    // and errors DuckDB's BIGINT past vec_id ≈ 3.5e9, i.e. within
    // corpus scale; 96 × 2654435761 ≈ 2.5e11 can never wrap either
    // engine (the MultimodalQueries bounded-operand discipline)
    val isDelta =
      ((col("vec_id") % 97L) * lit(2654435761L)) % 100L <
        (col("vec_id") % IvfC) * 5L
    val g = t(s, d, "embeddings")
      .select((col("vec_id") % IvfC).as("list"),
        when(isDelta, 1L).otherwise(0L).as("is_delta"))
      .groupBy(col("list"))
      .agg(sum(lit(1L) - col("is_delta")).as("n_base"),
        sum(col("is_delta")).as("n_delta"))
    // `div` ≙ DuckDB's `//`: exact integer ceiling-division (the
    // q_compact_plan discipline — double `/` + cast would drift at
    // the boundary once counts grow astronomically)
    ivfCompactPlan(g.select(col("list"), col("n_base"), col("n_delta"),
      expr(s"(n_base + ${IvfRowsPerFile - 1}) div $IvfRowsPerFile")
        .as("files_base"),
      expr(s"(n_delta + ${IvfRowsPerFile - 1}) div $IvfRowsPerFile")
        .as("files_delta")))
  }

  /** Fixed dump root for [[qIvfNprobeRecall]]'s serving trace — the
    * path its ORACLE reads back (a static SQL string cannot vary by
    * SF, so the trace is keyed by an SF-identifying aggregate in a
    * subdirectory AND a `corpus_key` column the oracle filters on:
    * concurrent sweeps at different SFs coexist, re-runs at one SF
    * idempotently overwrite). The key is the LINEITEM row count, not
    * the embedding count — round 18: sf0.001 and sf0.01 ship the SAME
    * 500-vector embeddings table, so an embedding-count key COLLIDED
    * across SFs and any sf0.001 run (a bench warm-up, a spec) would
    * silently overwrite the trace an sf0.01 oracle was about to
    * grade; lineitem scales with SF (6k/60k/600k), so the key is
    * collision-proof across every directory this engine sweeps. */
  private[graft] val IvfNprobeDumpDir = "/tmp/graft_oracle/ivf_nprobe_served"

  /** The nprobe↔recall OPERATING CURVE (r16 — the "how nprobe trades
    * recall at scale" half of the IVF lifecycle policy): serve the
    * fixed query set at nprobe ∈ {1, 2, 4, 8, 16} against ONE
    * persisted index build (the shared [[ivfServe]] tail — the same
    * store scan, pruned to nprobe/C of the cells each time) and
    * grade recall@5 against the in-plan exact top-k. The two
    * guarantees a deployment sizes its probe width by, emitted as
    * verdicts both engines can assert:
    *
    *  - `recall_ok`: mean recall clears a per-nprobe floor
    *    (0.2/0.4/0.6/0.8), and at nprobe = C the recall is EXACTLY
    *    1.0 — probing every cell makes the candidate set the full
    *    corpus and the rerank shares the brute-force (cos DESC,
    *    n_id) tie rule, so full-probe serving ≡ exact search is a
    *    structural identity, not a measurement;
    *  - `monotone_ok`: recall never decreases as nprobe widens
    *    (candidate sets are nested — a supersets-only guarantee the
    *    plan must not break).
    *
    * Scale shape: one index build; the five servings differ only in
    * the literal cell filter (1/16 → 16/16 of the store read — the
    * partition-pruning fraction IS the knob); the verdict aggregate
    * is |nprobe|×|queries| rows, folded driver-side at 5 rows. */
  private val qIvfNprobeRecall = Q("q_ivf_nprobe_recall",
    s"""WITH served AS (
       |  SELECT nprobe, q_id, n_id
       |  FROM read_parquet('$IvfNprobeDumpDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT count(*) FROM lineitem)),
       |$vectorsCte,
       |qs AS (SELECT * FROM e WHERE vec_id < 10),
       |truth AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM qs q JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5),
       |graded AS (
       |  SELECT s.nprobe, CAST(count(t.q_id) AS BIGINT) AS n_hit
       |  FROM served s LEFT JOIN truth t
       |    ON s.q_id = t.q_id AND s.n_id = t.n_id
       |  GROUP BY s.nprobe),
       |rec AS (
       |  SELECT nprobe,
       |    n_hit / CAST((SELECT count(*) FROM truth) AS DOUBLE) AS recall
       |  FROM graded)
       |SELECT CAST(nprobe AS INT) AS nprobe,
       |  CAST((SELECT count(*) FROM qs) AS BIGINT) AS n_queries,
       |  (recall >= CASE nprobe WHEN 1 THEN 0.2 WHEN 2 THEN 0.4
       |               WHEN 4 THEN 0.6 WHEN 8 THEN 0.8 ELSE 1.0 END
       |   AND (nprobe <> $IvfC OR recall = 1.0)) AS recall_ok,
       |  (recall >= coalesce(lag(recall) OVER (ORDER BY nprobe), 0.0))
       |    AS monotone_ok
       |FROM rec ORDER BY nprobe""".stripMargin) { (s, d) =>
    val spark = s
    import spark.implicits._
    val (store, cents) = ivfBuildStore(s, d)
    val qs = ivfQueries(s, d)
    val nprobes = Seq(1, 2, 4, 8, 16)
    val served = nprobes.map { np =>
      ivfServe(store, cents, qs, np)
        .select(lit(np).as("nprobe"), col("q_id"), col("n_id"))
    }.reduce(_ union _)
    // PORTABLE SERVING TRACE (r16 verdict item 6 — this query's
    // oracle was the registry's only constants table, because the
    // served lists depend on KMeans cells DuckDB cannot re-derive):
    // dump the (nprobe, q_id, n_id) trace to a fixed location keyed
    // by corpus size (so sweeps at different SFs never clobber each
    // other), and let DuckDB grade it against ITS OWN brute-force
    // truth — the verdicts below are now re-derived from data on
    // both engines. The trace is |nprobe|×|queries|×k rows — request
    // scale, never corpus scale.
    //
    // ATOMIC publish (r17 advice): mode('overwrite') straight onto
    // the final path deletes before it writes, so a concurrent verify
    // at the same corpus size could read zero/partial files; instead
    // the trace lands in a dot-prefixed staging dir (invisible to the
    // oracle's `*/*.parquet` glob — POSIX globs skip leading dots)
    // and a filesystem RENAME publishes it whole. Sibling c<N> dumps
    // from other corpus sizes are pruned once stale (mtime > 6 h —
    // old enough that no live sweep still needs them) so /tmp never
    // accumulates a dump per SF ever swept. (Shared [[publishTrace]].)
    // Key = lineitem count (SF-identifying; embedding counts COLLIDE
    // between sf0.001 and sf0.01 — see [[IvfNprobeDumpDir]])
    val corpusKey = t(s, d, "lineitem").count()
    publishTrace(served, IvfNprobeDumpDir, corpusKey)
    // grade FROM the dump — the engine verdict consumes the same
    // trace the oracle reads, so the two sides cannot see different
    // servings
    val trace = spark.read.parquet(s"$IvfNprobeDumpDir/c$corpusKey")
    // fenced (r19): the truth set is consumed TWICE below — the
    // denominator count and the grading join's broadcast build — and
    // each evaluation of the un-fenced plan re-ran the full
    // brute-force kNN (corpus scan + per-query window)
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      .fenced()
    // recall@5 denominator is the TRUTH-set size (r16 advice: the old
    // returned-row denominator was precision — a narrow probe
    // returning under k rows per query overstated recall)
    val nTruth = brute.count()
    val graded = trace
      .join(broadcast(brute), Seq("q_id", "n_id"), "left")
      .groupBy(col("nprobe"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .as[(Int, Long)].collect().sortBy(_._1)
    // |nprobe| rows on the driver: the floor + nestedness verdicts
    // need the cross-row comparison
    val floors = Map(1 -> 0.2, 2 -> 0.4, 4 -> 0.6, 8 -> 0.8, 16 -> 1.0)
    val recalls = graded.map { case (np, nHit) =>
      (np, nHit.toDouble / nTruth) }
    val out = recalls.zip(0.0 +: recalls.map(_._2).init).map {
      case ((np, r), prev) =>
        (np, qs.length.toLong,
          r >= floors(np) && (np != cents.length || r == 1.0),
          r >= prev)
    }
    out.toSeq.toDF("nprobe", "n_queries", "recall_ok", "monotone_ok")
      .orderBy(col("nprobe"))
  }

  /** Embedding-space outlier detection — the quality gate a corpus
    * build runs before semantic dedup / ANN indexing: a vector far
    * from its label's centroid (corrupt embedding, mislabeled item,
    * encoder failure mode) is flagged by z-scoring its centroid
    * distance against the label's distance population (z ≥ 2).
    *
    * Determinism: the centroid reuses q_embed_centroid's exact-decimal
    * mean (rounded to 6 dp, so both engines subtract the identical
    * double); each squared per-dimension deviation is rounded to
    * 12 dp into DECIMAL(28,12) BEFORE the per-vector sum (float sums
    * are not associative — the decimal sum is order-free), and the
    * distance itself is rounded into DECIMAL(18,6) so the z-score
    * moments (Σd, Σd² as exact decimals) are order-free too; the
    * z expression is then pure double arithmetic over identical
    * operands on both engines, unrounded in the threshold compare.
    *
    * Scale shape (100 TB): two corpus-sized exchanges, both map-side
    * combined — the (label, dim) centroid partials and the per-vec_id
    * term sums; the centroid table (|labels|·d rows) and the
    * |labels|-row moment table broadcast by construction. No vector
    * ever ships twice and nothing corpus-scaled is broadcast. */
  private val qEmbedOutlier = Q("q_embed_outlier",
    """WITH u AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
      |             unnest(embedding::DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT label, dim,
      |        round(CAST(sum(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS cent
      |      FROM u GROUP BY 1, 2),
      |term AS (SELECT u.vec_id, u.label,
      |           CAST(round((u.v - c.cent) * (u.v - c.cent), 12) AS DECIMAL(28,12)) AS t2
      |         FROM u JOIN c ON u.label = c.label AND u.dim = c.dim),
      |dist AS (SELECT vec_id, label,
      |           CAST(round(sqrt(CAST(sum(t2) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS dist
      |         FROM term GROUP BY 1, 2),
      |mom AS (SELECT label, CAST(count(*) AS BIGINT) AS n, sum(dist) AS s1,
      |          sum(dist * dist) AS s2 FROM dist GROUP BY 1)
      |SELECT d.vec_id, d.label, CAST(d.dist AS DOUBLE) AS dist,
      |  round((CAST(d.dist AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n)
      |    / sqrt(CAST(m.s2 AS DOUBLE) / m.n
      |           - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)), 4) AS z
      |FROM dist d JOIN mom m ON d.label = m.label
      |WHERE m.n > 1
      |  AND CAST(m.s2 AS DOUBLE) * m.n > CAST(m.s1 AS DOUBLE) * CAST(m.s1 AS DOUBLE)
      |  AND (CAST(d.dist AS DOUBLE) - CAST(m.s1 AS DOUBLE) / m.n)
      |    / sqrt(CAST(m.s2 AS DOUBLE) / m.n
      |           - (CAST(m.s1 AS DOUBLE) / m.n) * (CAST(m.s1 AS DOUBLE) / m.n)) >= 2.0
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    val u = t(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(asDouble(col("embedding"))).as(Seq("p", "v")))
      .select(col("vec_id"), col("label"),
        (col("p") + 1).cast("int").as("dim"), col("v"))
      .fenced() // reused: centroid pass + deviation terms
    val c = u.groupBy(col("label"), col("dim"))
      .agg(round(sum(col("v").cast("decimal(18,8)")).cast("double")
        / count(lit(1)), 6).as("cent"))
    val dist = u.join(broadcast(c), Seq("label", "dim"))
      .select(col("vec_id"), col("label"),
        round((col("v") - col("cent")) * (col("v") - col("cent")), 12)
          .cast("decimal(28,12)").as("t2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(round(sqrt(sum(col("t2")).cast("double")), 6)
        .cast("decimal(18,6)").as("dist"))
    val mom = dist.groupBy(col("label")).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("dist")).as("s1"), sum(col("dist") * col("dist")).as("s2"))
    val mean = col("s1").cast("double") / col("n")
    val z = (col("dist").cast("double") - mean) /
      sqrt(col("s2").cast("double") / col("n") - mean * mean)
    // Zero-variance guard, identical on both engines: a label with a
    // single vector (or all-equal rounded distances) makes z = 0/0 —
    // Spark's NaN sorts greater-than-everything so `z >= 2.0` would
    // emit a NaN row, while DuckDB's NULL division filters it. Gate
    // both sides on n > 1 AND variance > 0 BEFORE the z compare; the
    // variance test is the same double arithmetic over the same exact
    // decimal moments on each engine, so the predicate bit-matches.
    dist.join(broadcast(mom), "label")
      .where(col("n") > 1 &&
        col("s2").cast("double") * col("n") >
          col("s1").cast("double") * col("s1").cast("double"))
      .where(z >= 2.0)
      .select(col("vec_id"), col("label"),
        col("dist").cast("double").as("dist"), round(z, 4).as("z"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-space benchmark decontamination — the third modality of
    * the decon family (n-gram `q_decontaminate`, perceptual-hash
    * `q_decontaminate_media`, semantic here): flag training vectors
    * whose max cosine against the held-out benchmark set (a fixed,
    * small eval slice — `vec_id % 97 = 0`, the `src0` analog) clears
    * the paraphrase threshold. N-gram decon misses reworded
    * contamination; this pass is the published countermeasure
    * (embedding-similarity decon of public LLM eval hygiene recipes).
    *
    * Scale shape: the bench side is a FIXED-size eval set, so it
    * broadcasts (same stance as `q_decontaminate_media`); the corpus
    * streams through map-side, and the per-vector max/count reduce in
    * the partial aggregate, so the one exchange before the
    * presentation sort carries corpus-VECTOR cardinality, never the
    * n×|bench| score matrix. At 100 TB this is a single scan pass.
    * Cosines are the shared native one-pass [[cosine]] ≙ DuckDB
    * `list_dot_product` l→r double chain, so `max` and the threshold
    * compare are bit-identical; the contaminated flag is decided on
    * the RAW max, rounding only the reported value. */
  private val qDecontaminateSemantic = Q("q_decontaminate_semantic",
    s"""WITH $vectorsCte,
       |b AS (SELECT v, n2 FROM e WHERE vec_id % 97 = 0),
       |s AS (SELECT c.vec_id,
       |        max(list_dot_product(c.v, b.v) / (sqrt(c.n2) * sqrt(b.n2))) AS mx,
       |        sum(CASE WHEN list_dot_product(c.v, b.v) / (sqrt(c.n2) * sqrt(b.n2))
       |                 >= 0.35 THEN 1 ELSE 0 END) AS nh
       |      FROM e c CROSS JOIN b
       |      WHERE c.vec_id % 97 <> 0 GROUP BY c.vec_id)
       |SELECT vec_id, CAST(nh AS BIGINT) AS n_hits, round(mx, 6) AS max_sim,
       |       mx >= 0.35 AS contaminated
       |FROM s ORDER BY vec_id""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val bench = e.where(col("vec_id") % 97 === 0).select(col("v").as("bv"))
    val cos = cosine(col("v"), col("bv"))
    e.where(col("vec_id") % 97 =!= 0)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"), cos.as("cos"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("mx"),
        sum(when(col("cos") >= 0.35, 1L).otherwise(0L)).as("n_hits"))
      .select(col("vec_id"), col("n_hits"), round(col("mx"), 6).as("max_sim"),
        (col("mx") >= 0.35).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  // ------------------------------------------------ hard-negative mining

  private val NegCap = 0.95
  private val NegK = 3

  /** Contrastive HARD-NEGATIVE mining — the training-pair builder of
    * an embedding-model pipeline (the in-batch-negatives literature's
    * offline form: for each anchor, the highest-similarity examples
    * of a DIFFERENT class are the gradient-dominant negatives): per
    * anchor, the top-k different-label neighbors by cosine, capped at
    * cos ≤ 0.95 to exclude mislabeled near-duplicates (a near-dup
    * with a different label is a labeling error, not a hard
    * negative — feeding it to a contrastive loss is actively
    * harmful).
    *
    * Scale shape: `q_knn_brute`'s serving pattern — the fixed anchor
    * slice broadcasts, the corpus streams map-side through the
    * different-label + cap filters, and the per-anchor top-k is a
    * WindowGroupLimit (each task prunes to k before the per-anchor
    * exchange). Cosine is the shared native one-pass kernel, ordered
    * raw and rounded only for display, the knn determinism
    * discipline. */
  private val qMineNegatives = Q("q_mine_negatives",
    s"""WITH $vectorsCte,
       |an AS (SELECT * FROM e WHERE vec_id < 20),
       |scored AS (
       |  SELECT a.vec_id AS q_id, a.label AS q_label,
       |    c.vec_id AS n_id, c.label AS n_label,
       |    list_dot_product(a.v, c.v) / (sqrt(a.n2) * sqrt(c.n2)) AS cos,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY list_dot_product(a.v, c.v) / (sqrt(a.n2) * sqrt(c.n2)) DESC,
       |               c.vec_id) AS rn
       |  FROM an a JOIN e c
       |    ON c.label <> a.label
       |   AND list_dot_product(a.v, c.v) / (sqrt(a.n2) * sqrt(c.n2)) <= $NegCap)
       |SELECT q_id, q_label, n_id, n_label, CAST(rn AS INT) AS rn,
       |  round(cos, 6) AS sim
       |FROM scored WHERE rn <= $NegK ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val an = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("qv"))
    val cos = cosine(col("qv"), col("v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.join(broadcast(an),
        col("label") =!= col("q_label") && cos <= NegCap)
      .select(col("q_id"), col("q_label"), col("vec_id").as("n_id"),
        col("label").as("n_label"), cos.as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= NegK)
      .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
        col("rn").cast("int").as("rn"), round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  // ------------------------------------------- embedding-space clustering

  private val ClusterK = 3       // kNN-graph out-degree
  private val ClusterRounds = 3  // LPA rounds

  /** Adaptive-bucket knobs for the kNN-graph build. Bucket COUNT
    * scales with the corpus (bits from target occupancy) and a hard
    * per-bucket anchor cap bounds fanout even under bucket skew — the
    * two fixes for the fixed-2^8-bucket self-join whose Σ|b|² pair
    * volume grew quadratically with corpus size. */
  private[graft] val ClusterOcc = 16L    // target expected bucket occupancy
  private[graft] val ClusterMinBits = 4
  private[graft] val ClusterMaxBits = 20 // 2^20 buckets ≈ 16M-vector corpora
  private[graft] val ClusterAnchors = 16 // hard per-bucket pair-fanout cap

  /** ±1 plane matrix for the adaptive bucket — [[ClusterMaxBits]]
    * planes generated once; a corpus uses its first `bits(n)`. Kept
    * separate from [[Planes]] so q_knn_lsh's fixed serving bucket is
    * untouched. */
  private[graft] val ClusterPlanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(1137)
    Array.fill(ClusterMaxBits, 64)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** bits(n) = MinBits + |{ j ∈ [MinBits, MaxBits) : n > Occ·2^j }| —
    * the smallest width keeping expected occupancy n/2^bits ≲ Occ,
    * clamped to [MinBits, MaxBits]. Pure integer comparisons (no
    * log2/ceil float round-trip), so engine and oracle can never
    * disagree at power-of-two boundaries. */
  private[graft] def clusterBits(n: Long): Int =
    ClusterMinBits + (ClusterMinBits until ClusterMaxBits)
      .count(j => n > ClusterOcc * (1L << j))

  /** SQL twin of [[clusterBits]] — the thresholds embed as literals.
    * `cnt` is the column holding the population the bucket family is
    * sized for (`n` for the kNN-graph build over vectors, `c` for the
    * semantic-dedup CENTROID table). */
  private def clusterBitsSql(cnt: String = "n"): String =
    (ClusterMinBits until ClusterMaxBits)
      .map(j => s"(CASE WHEN $cnt > ${ClusterOcc * (1L << j)} THEN 1 ELSE 0 END)")
      .mkString(s"($ClusterMinBits + ", " + ", ")")

  /** First-`bits` plane bucket (engine side: `bits` is a driver
    * constant derived from the corpus count; native codegen kernel,
    * see [[bandValue]]). */
  private def clusterBucket(v: Column, bits: Int): Column =
    graft.functions.GraftExpressions.plane_bits(v,
      ClusterPlanes.take(bits), Array.tabulate(bits)(j => 1L << j))

  /** SQL twin: all [[ClusterMaxBits]] plane terms rendered, each
    * masked by `j < bs.bits` — the oracle derives `bits` from its own
    * count of the same table, so buckets stay bit-identical. */
  private def clusterBucketSql(v: String): String =
    (0 until ClusterMaxBits).map { j =>
      val plane = ClusterPlanes(j).map(_.toString).mkString(",")
      s"(CASE WHEN $j < bs.bits AND list_dot_product($v, [$plane]::DOUBLE[]) >= 0" +
        s" THEN ${1L << j} ELSE 0 END)"
    }.mkString(s"(CASE WHEN $v IS NULL THEN NULL ELSE (", " + ", ") END)")
    // NULL guard ≡ PlaneBits.nullSafeEval (see bandValueSql)

  // -------------------------------------------- SemDeDup semantic dedup

  /** Hard per-bucket centroid cap for the semantic-dedup ASSIGNMENT
    * pass — the q_embed_cluster anchor-cap medicine applied to the
    * vector→centroid join: a vector is scored against at most
    * [[SemAnchors]] centroids from its LSH bucket plus the
    * [[SemCMin]] always-present roots, so per-vector assignment work
    * is a CONSTANT (≤ Anchors + CMin cosines) no matter how big the
    * corpus — and C(n) — grow. */
  private[graft] val SemAnchors = 16

  /** Assignment CANDIDATE scores (vec_id, cent_id, cs) — the
    * two-level quantizer that replaced the brute-force n·C(n) pass:
    *
    *  1. the C(n) = [[semC]] centroids (first-C vectors) bucket under
    *     the ADAPTIVE plane family ([[clusterBits]] sized from C, so
    *     expected centroids/bucket ≈ [[ClusterOcc]]), and each bucket
    *     keeps only its [[SemAnchors]] lowest-id centroids — the hard
    *     fanout cap under bucket skew;
    *  2. every vector joins the capped centroids of ITS bucket (an
    *     equi-join on the bucket key — broadcast while the capped
    *     table fits, shuffled-hash beyond; never all-pairs) plus the
    *     [[SemCMin]] root centroids (cent_id < CMin, broadcast — a
    *     non-empty candidate floor for bucket-orphan vectors).
    *
    * Total candidate volume is ≤ (Anchors + CMin)·n by construction —
    * HeavyScaleProbe.semVolumeCheck pins the measured exponent.
    * Cosines are computed BEFORE the per-vector window, so the
    * assignment shuffle carries slim (vec_id, cent_id, cs) rows, not
    * 64-dim vectors. Exposed for the probe and SimilaritySpec. */
  private[graft] def semCandidates(s: SparkSession, d: String): DataFrame =
    semCandidatesFrom(vectors(s, d),
      // bounded driver action: one count sizes quantizer + bucket family
      t(s, d, "embeddings").count())

  private def semCandidatesFrom(e: DataFrame, n: Long): DataFrame = {
    val c = semC(n)
    val bits = clusterBits(c)
    val cents = e.where(col("vec_id") < c)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val capped = cents
      .withColumn("b", clusterBucket(col("cv"), bits))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("cent_id"))))
      .where(col("crk") <= SemAnchors)
      .select(col("b"), col("cent_id"), col("cv"))
    val roots = broadcast(cents.where(col("cent_id") < SemCMin))
    val cs = cosine(col("v"), col("cv"))
    e.select(col("vec_id"), col("v"), clusterBucket(col("v"), bits).as("b"))
      .join(capped, Seq("b"))
      .select(col("vec_id"), col("cent_id"), cs.as("cs"))
      .union(e.select(col("vec_id"), col("v")).crossJoin(roots)
        .select(col("vec_id"), col("cent_id"), cs.as("cs")))
    // a root that is also a bucket anchor yields a duplicate
    // (vec_id, cent_id, cs) row — harmless: the assignment window
    // below ranks duplicates adjacently and arn=1's VALUES are
    // deterministic either way
  }

  /** Nearest candidate centroid per vector — (vec_id, cluster) by
    * map-side max_by over the tie-free (cos, −cent_id) struct order
    * (picks the oracle's row_number (cos DESC, cent_id) winner; the
    * duplicate candidate rows the root∪anchor union can emit carry
    * identical structs, so the max is unaffected), exact on both
    * engines over the IDENTICAL candidate set. The partial aggregate
    * collapses each vector's ≤ Anchors+CMin candidates before the
    * exchange. */
  private[graft] def semAssigned(s: SparkSession, d: String): DataFrame =
    semAssignedFrom(semCandidates(s, d))

  private def semAssignedFrom(candidates: DataFrame): DataFrame =
    candidates
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("cs"), (-col("cent_id")).as("nc"))).as("cluster"))
      .select(col("vec_id"), col("cluster"))

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * cluster the embedding space with a coarse quantizer, then prune
    * near-duplicate pairs WITHIN each cluster only — the clustering
    * bounds every comparison block by design (k ∝ corpus size
    * [[semC]], so cluster population stays roughly constant as the
    * corpus grows), which is what makes within-cluster all-pairs the
    * intended linear-ish scale shape here, unlike a fixed blocking
    * key. Assignment is the CAPPED two-level pass ([[semCandidates]]:
    * LSH-bucketed centroids + root floor, ≤ Anchors+CMin cosines per
    * vector — the hierarchical-quantizer fix for the former
    * brute-force n·C(n) scan, with the oracle running the IDENTICAL
    * candidate generation so assignment stays hash-exact); a vector
    * is dropped when a LOWER-id vector in its cluster sits at cosine
    * ≥ 0.4 (the deterministic keep-first policy standing in for
    * SemDeDup's keep-one-per-neighborhood). Output: the surviving
    * vectors with their cluster. Cross-cluster near-dups are out of
    * contract — that recall loss vs exact dedup is the documented
    * SemDeDup trade, measured for this corpus in SimilaritySpec
    * (pinned floor 0.25; the qualifying pairs sit at cos 0.40–0.48 ≈
    * 60°, the blocking-adversarial regime [[qDedupEmbed]]'s scaladoc
    * derives — SemDeDup's near-1 recall regime is near-identical
    * embeddings, θ→0, where same-bucket+same-choice assignment
    * approaches certainty). */
  /** The capped two-level quantizer ASSIGNMENT as reusable CTE text
    * (references the `e` vector frame; final CTE `asg` exposes
    * (vec_id, cent_id, arn) — arn=1 is the assignment): shared by the
    * SemDeDup twins and [[qMineBitext]], the SQL twin of
    * [[semCandidatesFrom]]→[[semAssignedFrom]]. */
  private val semAsgCtes: String =
    s"""ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |cs AS (SELECT GREATEST($SemCMin, (n + ${SemCell - 1}) // $SemCell) AS c FROM ns),
       |bs AS (SELECT ${clusterBitsSql("c")} AS bits FROM cs),
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e CROSS JOIN cs WHERE vec_id < cs.c),
       |cb AS (SELECT cent_id, cv, cn2, ${clusterBucketSql("cv")} AS b
       |       FROM cents CROSS JOIN bs),
       |cap AS (SELECT cent_id, cv, cn2, b,
       |          row_number() OVER (PARTITION BY b ORDER BY cent_id) AS crk
       |        FROM cb),
       |vb AS (SELECT vec_id, v, n2, ${clusterBucketSql("v")} AS b
       |       FROM e CROSS JOIN bs),
       |cand AS (
       |  SELECT vb.vec_id, cap.cent_id,
       |    list_dot_product(vb.v, cap.cv) / (sqrt(vb.n2) * sqrt(cap.cn2)) AS sc
       |  FROM vb JOIN cap ON vb.b = cap.b AND cap.crk <= $SemAnchors
       |  UNION ALL
       |  SELECT e.vec_id, r.cent_id,
       |    list_dot_product(e.v, r.cv) / (sqrt(e.n2) * sqrt(r.cn2))
       |  FROM e CROSS JOIN cents r WHERE r.cent_id < $SemCMin),
       |asg AS (SELECT vec_id, cent_id,
       |          row_number() OVER (PARTITION BY vec_id
       |            ORDER BY sc DESC, cent_id) AS arn
       |        FROM cand)""".stripMargin

  private def dedupSemanticSql(cte: String): String =
    s"""WITH $cte,
       |$semAsgCtes,
       |a AS (SELECT e.vec_id, x.cluster, e.v, e.n2
       |      FROM (SELECT vec_id, cent_id AS cluster FROM asg WHERE arn = 1) x
       |      JOIN e ON e.vec_id = x.vec_id)
       |SELECT x.vec_id, x.cluster FROM a x
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM a y
       |  WHERE y.cluster = x.cluster AND y.vec_id < x.vec_id
       |    AND list_dot_product(x.v, y.v) / (sqrt(x.n2) * sqrt(y.n2)) >= 0.4)
       |ORDER BY vec_id""".stripMargin

  private def dedupSemanticPlan(e: DataFrame, n: Long): DataFrame = {
    val assigned = semAssignedFrom(semCandidatesFrom(e, n)).join(e, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("cluster"))
    // within-cluster prune: a vector with a lower-id near-neighbor
    // (cos >= 0.4) in its own cluster is dropped — the pair join is an
    // equi-join on `cluster`, whose population the quantizer bounds
    val drops = assigned.select(col("vec_id").as("b_id"), col("cluster"), col("v").as("vb"))
      .join(assigned.select(col("vec_id").as("a_id"), col("cluster"), col("v").as("va")),
        Seq("cluster"))
      .where(col("a_id") < col("b_id") && cosine(col("va"), col("vb")) >= 0.4)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(drops, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
      .orderBy(col("vec_id"))
  }

  private val qDedupSemantic = Q("q_dedup_semantic",
    dedupSemanticSql(vectorsCte)) { (s, d) =>
    dedupSemanticPlan(vectors(s, d), t(s, d, "embeddings").count())
  }

  /** [[qDedupSemantic]] over the DOUBLED corpus ([[vectorsXlCte]]) —
    * the third-size oracle point for [[semC]] (and [[clusterBits]]
    * over the centroid table): at sf0.01 C crosses 8→16, so the
    * quantizer sizing, bucket family, and capped assignment are all
    * re-verified hash-exact at a constant value the two driver SFs
    * never reach. */
  private val qDedupSemanticXl = Q("q_dedup_semantic_xl",
    dedupSemanticSql(vectorsXlCte)) { (s, d) =>
    val (vx, n2) = vectorsXl(s, d)
    dedupSemanticPlan(vx, n2)
  }

  // --------------------------------------------------- bitext mining

  /** Margin-criterion knobs: k neighbors in the denominator average,
    * and the acceptance floor. 1.05 keeps only pairs whose cosine
    * clears their neighborhoods' average by ≥ 5% — the
    * hubness-robust criterion the paper motivates (an absolute
    * cosine threshold misfires where the embedding space has dense
    * hubs; the RATIO to each side's local neighborhood does not). */
  private val BitextK = 4
  private val BitextMarginMin = 1.05

  /** Margin-based BITEXT MINING (public technique: Artetxe & Schwenk,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings", ACL'19) — the parallel-data miner of a multilingual
    * training pipeline: given two sides of a corpus embedded in one
    * space (here the even/odd `label` parity split stands in for the
    * two languages), emit candidate translation pairs scored by the
    * MARGIN — the pair's cosine over the mean of each side's k-NN
    * cosines — keeping mutual best matches above the margin floor
    * (the paper's "intersection" strategy).
    *
    * Scale shape — why candidates are CLUSTER-cosharing, not banded:
    * bitext cannot block on `label` (the pair is cross-language by
    * definition), and an 8×4-bit hyperplane banding without a block
    * key collides ~40% of RANDOM cross pairs (p≈(1/2)⁴ per band,
    * any-of-8) — a constant fraction of |A|×|B|, quadratic at scale.
    * So candidates come from the capped two-level quantizer the
    * SemDeDup family already carries ([[semAssignedFrom]] /
    * [[semAsgCtes]] — k ∝ n cells of ≈ [[SemCell]] expected
    * population): a pair is a candidate iff both sides land in the
    * same cell, so candidate volume is Σ_cells |A_c|·|B_c| ≈
    * Cell·n/4 — LINEAR, the IVF retrieval shape the paper's own
    * systems (FAISS) use. Cross-cell translation pairs are the
    * documented recall trade, the same one [[qDedupSemantic]]'s
    * scaladoc derives.
    *
    * Determinism: cosines are the shared native kernel (bit-identical
    * to `list_dot_product`); each side's k-NN mean sums cosines
    * ROUNDED into DECIMAL(18,6) (order-free — float sums are not
    * associative) and divides as double; the margin is then pure
    * double arithmetic over identical operands, compared unrounded on
    * both engines, with (margin DESC, id) row_number tiebreaks. The
    * denominator-positive guard drops the degenerate
    * all-negative-neighborhood case identically on both engines
    * (division by a near-zero mean would otherwise make the margin an
    * unstable sign-flipping ratio). */
  private val qMineBitext = Q("q_mine_bitext",
    s"""WITH $vectorsCte,
       |$semAsgCtes,
       |asn AS (SELECT x.vec_id, x.cent_id AS cluster, e.label, e.v, e.n2
       |        FROM (SELECT vec_id, cent_id FROM asg WHERE arn = 1) x
       |        JOIN e ON e.vec_id = x.vec_id),
       |sc AS (
       |  SELECT x.vec_id AS ai, y.vec_id AS bi,
       |    list_dot_product(x.v, y.v) / (sqrt(x.n2) * sqrt(y.n2)) AS cos
       |  FROM asn x JOIN asn y ON x.cluster = y.cluster
       |  WHERE x.label % 2 = 0 AND y.label % 2 = 1),
       |ka AS (SELECT ai, CAST(sum(CAST(round(cos, 6) AS DECIMAL(18,6))) AS DOUBLE)
       |           / count(*) AS da
       |       FROM (SELECT ai, cos, row_number() OVER (PARTITION BY ai
       |               ORDER BY cos DESC, bi) AS rk FROM sc) t
       |       WHERE rk <= $BitextK GROUP BY ai),
       |kb AS (SELECT bi, CAST(sum(CAST(round(cos, 6) AS DECIMAL(18,6))) AS DOUBLE)
       |           / count(*) AS db
       |       FROM (SELECT bi, cos, row_number() OVER (PARTITION BY bi
       |               ORDER BY cos DESC, ai) AS rk FROM sc) t
       |       WHERE rk <= $BitextK GROUP BY bi),
       |m AS (SELECT sc.ai, sc.bi, sc.cos,
       |        sc.cos / (0.5 * (ka.da + kb.db)) AS margin
       |      FROM sc JOIN ka ON sc.ai = ka.ai JOIN kb ON sc.bi = kb.bi
       |      WHERE 0.5 * (ka.da + kb.db) > 0),
       |r AS (SELECT ai, bi, cos, margin,
       |        row_number() OVER (PARTITION BY ai ORDER BY margin DESC, bi) AS ra,
       |        row_number() OVER (PARTITION BY bi ORDER BY margin DESC, ai) AS rb
       |      FROM m)
       |SELECT ai AS a_id, bi AS b_id, round(cos, 4) AS cos,
       |  round(margin, 4) AS margin
       |FROM r WHERE ra = 1 AND rb = 1 AND margin >= $BitextMarginMin
       |ORDER BY a_id""".stripMargin) { (s, d) =>
    bitextSweep(bitextScores(s, d)).orderBy(col("a_id"))
  }

  /** The batch candidate SCORE table (ai, bi, cos — unrounded):
    * cross-language same-cluster cosines under the capped two-level
    * quantizer assignment. Shared by [[qMineBitext]] and
    * StreamingBitextSpec (the streaming twin's at-arrival candidate
    * set must equal this frame exactly). */
  private[graft] def bitextScores(s: SparkSession, d: String): DataFrame = {
    val e = vectors(s, d).fenced() // assignment + scoring both read it
    // bounded driver action: one count sizes the quantizer (the
    // q_dedup_semantic stance)
    val asn = semAssignedFrom(semCandidatesFrom(e, t(s, d, "embeddings").count()))
      .join(e, Seq("vec_id"))
      .select(col("vec_id"), col("cluster"), col("label"), col("v"))
    val cos = cosine(col("va"), col("vb"))
    asn.where(pmod(col("label"), lit(2)) === 0)
      .select(col("vec_id").as("ai"), col("cluster"), col("v").as("va"))
      .join(asn.where(pmod(col("label"), lit(2)) === 1)
        .select(col("vec_id").as("bi"), col("cluster"), col("v").as("vb")),
        Seq("cluster"))
      .select(col("ai"), col("bi"), cos.as("cos"))
  }

  /** Margin finalization over a scored cross-language candidate frame
    * (ai, bi, cos) — the mark-then-sweep TAIL shared by
    * [[qMineBitext]] and [[graft.streaming.StreamingBitext]]: per-side
    * k-NN means (decimal-summed over rounded cosines), the Artetxe &
    * Schwenk ratio margin, mutual-best selection, threshold. The
    * streaming twin MARKS candidates at arrival (cluster-resident
    * state, score on second-member arrival) and runs this identical
    * sweep as its finalization batch — so stream and batch cannot
    * fork in the margin math. */
  private[graft] def bitextSweep(scRaw: DataFrame): DataFrame = {
    val sc = scRaw.fenced() // k-NN means + margin windows all read it
    def knnMean(side: String, other: String, out: String) = sc
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(side)).orderBy(col("cos").desc, col(other))))
      .where(col("rk") <= BitextK)
      .groupBy(col(side))
      .agg((sum(round(col("cos"), 6).cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as(out))
    val m = sc
      .join(knnMean("ai", "bi", "da"), "ai")
      .join(knnMean("bi", "ai", "db"), "bi")
      .withColumn("margin", col("cos") / (lit(0.5) * (col("da") + col("db"))))
      .where(lit(0.5) * (col("da") + col("db")) > 0)
    m.withColumn("ra", row_number().over(
        Window.partitionBy(col("ai")).orderBy(col("margin").desc, col("bi"))))
      .withColumn("rb", row_number().over(
        Window.partitionBy(col("bi")).orderBy(col("margin").desc, col("ai"))))
      .where(col("ra") === 1 && col("rb") === 1 &&
        col("margin") >= BitextMarginMin)
      .select(col("ai").as("a_id"), col("bi").as("b_id"),
        round(col("cos"), 4).as("cos"), round(col("margin"), 4).as("margin"))
  }

  /** Collected quantizer for [[graft.streaming.StreamingBitext]]'s
    * at-arrival cluster assignment: (bits, bucket → capped centroid
    * list, root centroids) — EXACTLY [[semCandidatesFrom]]'s candidate
    * generation, materialized once. Driver/broadcast state is
    * quantizer-sized (C(n) = n/[[SemCell]] centroids of the REFERENCE
    * corpus, ≤ [[SemAnchors]] per bucket — the KMeans model-state
    * stance; a deployment trains it on the prior corpus and ships it
    * to the stream, the StreamingPsiGate fixed-reference pattern). */
  private[graft] def bitextModel(s: SparkSession, d: String)
      : (Int, Map[Long, Array[(Long, Array[Double])]], Array[(Long, Array[Double])]) = {
    import s.implicits._
    val e = vectors(s, d)
    val n = t(s, d, "embeddings").count()
    val c = semC(n)
    val bits = clusterBits(c)
    val cents = e.where(col("vec_id") < c)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val capped = cents
      .withColumn("b", clusterBucket(col("cv"), bits))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("cent_id"))))
      .where(col("crk") <= SemAnchors)
      .select(col("b"), col("cent_id"), col("cv"))
      .as[(Long, Long, Array[Double])].collect()
    val roots = cents.where(col("cent_id") < SemCMin)
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val buckets = capped.groupBy(_._1).map { case (b, rows) =>
      b -> rows.map(r => (r._2, r._3)).sortBy(_._1)
    }
    (bits, buckets, roots)
  }

  /** Scala twin of [[clusterBucket]] for the streaming key function —
    * the [[graft.functions.GraftExpressions.planeBitsKernel]] math
    * (left-to-right plane dots, ≥ 0 sign gates the 2^j weight) over
    * [[ClusterPlanes]]. */
  private[graft] def clusterBucketOf(v: Array[Double], bits: Int): Long = {
    var out = 0L
    var j = 0
    while (j < bits) {
      val plane = ClusterPlanes(j)
      require(v.length == plane.length,
        s"plane_bits: vector has ${v.length} dims, planes have ${plane.length}")
      var acc = 0.0
      var i = 0
      while (i < plane.length) { acc += v(i) * plane(i); i += 1 }
      if (acc >= 0) out += 1L << j
      j += 1
    }
    out
  }

  /** Candidate kNN-graph pairs — exposed for HeavyScaleProbe's
    * pair-volume exponent bound. */
  private[graft] def clusterCandidates(s: SparkSession, d: String): DataFrame =
    // bounded driver action: one count to size the bucket family —
    // the same "bounded model state" pattern as k-means centroids
    clusterCandidatesFrom(vectors(s, d), t(s, d, "embeddings").count())

  private def clusterCandidatesFrom(e: DataFrame, n: Long): DataFrame = {
    val bits = clusterBits(n)
    val rkW = Window.partitionBy(col("b"))
      .orderBy(md5Long(col("vec_id").cast("string"))
        % graft.functions.PortableHash.P, col("vec_id"))
    val rk = e
      .select(col("vec_id"), col("v"), clusterBucket(col("v"), bits).as("b"))
      .withColumn("rnk", row_number().over(rkW))
    rk.select(col("vec_id").as("ai"), col("v").as("va"), col("b"),
        col("rnk").as("ra"))
      .join(rk.select(col("vec_id").as("bi"), col("v").as("vb"),
          col("b").as("bb"), col("rnk").as("rb")),
        col("b") === col("bb") && col("ai") < col("bi")
          && (col("ra") <= ClusterAnchors || col("rb") <= ClusterAnchors))
      .select(col("ai"), col("bi"), cosine(col("va"), col("vb")).as("cos"))
  }

  /** Embedding-space CLUSTERING — kNN graph + label propagation, the
    * semantic-grouping composite a curation pipeline runs to organize
    * a corpus by topic (and the graph-side generalization of
    * SemDeDup's cluster-then-prune): candidates from shared
    * ADAPTIVE LSH buckets (never all-pairs), exact-cosine
    * top-[[ClusterK]] neighbors per vector, symmetrized into an
    * undirected kNN graph, then [[graft.operators.LabelProp]]'s
    * deterministic synchronous LPA ([[ClusterRounds]] rounds,
    * min-label ties) — communities out, as the size histogram.
    *
    * Scale shape — the two bounds that keep candidate volume LINEAR:
    * (1) bucket count scales with the corpus ([[clusterBits]]: 2^bits
    * ≈ n/[[ClusterOcc]]), so EXPECTED pair volume Σ_b |b|² ≈ Occ·n;
    * (2) a pair must touch one of its bucket's first
    * [[ClusterAnchors]] members under a hash-random rank, so
    * WORST-CASE pair volume is ≤ Anchors·n even if every vector lands
    * in one bucket (skew/near-dup pile-ups) — the df-cap medicine of
    * q_sim_allpairs applied to the self-join. Non-anchor vectors draw
    * candidates from a uniform [[ClusterAnchors]]-sample of their
    * bucket, the standard capped-candidate-generation trade.
    * HeavyScaleProbe pins the measured pair-volume exponent at
    * synthetic sf1. Per-vector top-k is a WindowGroupLimit; the graph
    * is ≤ 2·k·n edges; LPA rides the PageRank
    * broadcast-vs-co-partition choice. A bucket-singleton vector has
    * no neighbors and is absent from the graph (identical on both
    * engines — standard isolate semantics of a bucketed kNN build). */
  private def embedClusterSql(cte: String): String =
    s"""WITH $cte,
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |bs AS (SELECT ${clusterBitsSql()} AS bits FROM ns),
       |bk AS (SELECT vec_id, v, n2, ${clusterBucketSql("v")} AS b
       |       FROM e CROSS JOIN bs),
       |rk AS (SELECT vec_id, v, n2, b,
       |         row_number() OVER (PARTITION BY b
       |           ORDER BY ${graft.functions.PortableHash.md5LongSql(
                     "CAST(vec_id AS VARCHAR)")} % ${graft.functions.PortableHash.P},
       |                    vec_id) AS rnk
       |       FROM bk),
       |pr AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
       |         list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) AS cos
       |       FROM rk a JOIN rk b ON a.b = b.b AND a.vec_id < b.vec_id
       |         AND (a.rnk <= $ClusterAnchors OR b.rnk <= $ClusterAnchors)),
       |dir AS (SELECT ai AS src, bi AS dst, cos FROM pr
       |        UNION ALL SELECT bi, ai, cos FROM pr),
       |top AS (SELECT src, dst FROM (
       |          SELECT src, dst, row_number() OVER (PARTITION BY src
       |            ORDER BY cos DESC, dst) AS rn
       |          FROM dir) r WHERE rn <= $ClusterK),
       |e2 AS (SELECT DISTINCT src, dst FROM (
       |          SELECT src, dst FROM top
       |          UNION ALL SELECT dst, src FROM top) u),
       |l0 AS (SELECT DISTINCT src AS id, src AS lab FROM e2),
       |${(1 to ClusterRounds).map(k => GraphQueries.lpIterCte(k, "e2")).mkString(",\n")}
       |SELECT lab, CAST(count(*) AS BIGINT) AS sz, CAST(min(id) AS BIGINT) AS min_id
       |FROM l$ClusterRounds GROUP BY lab
       |ORDER BY sz DESC, lab LIMIT 30""".stripMargin

  private def embedClusterPlan(pr: DataFrame): DataFrame = {
    val dir = pr.select(col("ai").as("src"), col("bi").as("dst"), col("cos"))
      .union(pr.select(col("bi").as("src"), col("ai").as("dst"), col("cos")))
    val top = dir
      .withColumn("rn", row_number().over(Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst"))))
      .where(col("rn") <= ClusterK)
      .select(col("src"), col("dst"))
    val e2 = top.union(top.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .fenced() // reused each LPA round
    graft.operators.LabelProp(e2, ClusterRounds)
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("sz"), min(col("id")).as("min_id"))
      .orderBy(col("sz").desc, col("lab"))
      .limit(30)
  }

  private val qEmbedCluster = Q("q_embed_cluster",
    embedClusterSql(vectorsCte)) { (s, d) =>
    embedClusterPlan(clusterCandidates(s, d))
  }

  /** [[qEmbedCluster]] over the DOUBLED corpus ([[vectorsXlCte]]) —
    * the third-size oracle point for [[clusterBits]] over the vector
    * table: at sf0.01 bits crosses 5→6 (and 7→8 at sf0.1), so the
    * adaptive bucket family and anchor-capped candidate join are
    * re-verified hash-exact at widths the two driver SFs never
    * exercise. */
  private val qEmbedClusterXl = Q("q_embed_cluster_xl",
    embedClusterSql(vectorsXlCte)) { (s, d) =>
    val (vx, n2) = vectorsXl(s, d)
    embedClusterPlan(clusterCandidatesFrom(vx, n2))
  }

  // --------------------------------------------------- coreset selection

  private val CoresetM = 3 // kept per cluster, per kind

  /** CORESET selection — the embedding-space data-pruning pass
    * (SSL-prototype pruning, Sorscher et al. 2022; D4 keeps both ends
    * of the difficulty spectrum): per cluster keep the [[CoresetM]]
    * PROTOTYPES (nearest the centroid — the stable, representative
    * core) and the [[CoresetM]] EDGE examples (farthest — the
    * coverage/diversity tail), labeled. The rest of the cluster is
    * the prune candidate set.
    *
    * Scale shape: q_knn_ivf's assignment pattern — centroids
    * broadcast, corpus streams through the cross join, a map-side
    * max_by argmax picks the cluster (n-row exchange — see
    * [[qKnnIvf]]'s scaladoc for the determinism argument); both
    * per-cluster shortlists are
    * rank-filtered windows sharing ONE cluster-keyed exchange (two
    * sort orders, no second shuffle); everything after is
    * shortlist-sized. */
  private val qSampleCoreset = Q("q_sample_coreset",
    s"""WITH $vectorsCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e WHERE vec_id < $IvfC),
       |asg AS (
       |  SELECT vec_id, cent_id,
       |    list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) AS cs,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) DESC,
       |               cent_id) AS arn
       |  FROM e CROSS JOIN cents),
       |assigned AS (SELECT vec_id, cent_id AS list, cs FROM asg WHERE arn = 1),
       |proto AS (SELECT list, 'proto' AS kind, vec_id, cs,
       |    row_number() OVER (PARTITION BY list ORDER BY cs DESC, vec_id) AS rank
       |  FROM assigned),
       |edge AS (SELECT list, 'edge' AS kind, vec_id, cs,
       |    row_number() OVER (PARTITION BY list ORDER BY cs ASC, vec_id) AS rank
       |  FROM assigned)
       |SELECT list, kind, CAST(rank AS INT) AS rank, vec_id,
       |  round(cs, 6) AS sim
       |FROM (SELECT * FROM proto WHERE rank <= $CoresetM
       |      UNION ALL SELECT * FROM edge WHERE rank <= $CoresetM) u
       |ORDER BY list, kind, rank""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val cents = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    // map-side argmax assignment ([[qKnnIvf]]'s form): the tie-free
    // (cos, −cent_id) struct order replays row_number's winner while
    // the partial aggregate keeps the exchange at n rows, not n×C
    val assigned = e.crossJoin(cents)
      .withColumn("cs", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cent_id"), col("cs")),
        struct(col("cs"), (-col("cent_id")).as("nc"))).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("list"), col("best.cs").as("cs"))
    val wProto = Window.partitionBy(col("list")).orderBy(col("cs").desc, col("vec_id"))
    val wEdge = Window.partitionBy(col("list")).orderBy(col("cs").asc, col("vec_id"))
    val ranked = assigned
      .withColumn("rank_p", row_number().over(wProto))
      .withColumn("rank_e", row_number().over(wEdge))
    val proto = ranked.where(col("rank_p") <= CoresetM)
      .select(col("list"), lit("proto").as("kind"),
        col("rank_p").cast("int").as("rank"), col("vec_id"), col("cs"))
    val edge = ranked.where(col("rank_e") <= CoresetM)
      .select(col("list"), lit("edge").as("kind"),
        col("rank_e").cast("int").as("rank"), col("vec_id"), col("cs"))
    proto.union(edge)
      .select(col("list"), col("kind"), col("rank"), col("vec_id"),
        round(col("cs"), 6).as("sim"))
      .orderBy(col("list"), col("kind"), col("rank"))
  }

  /** TWO-STAGE MATRYOSHKA SERVING (Kusupati et al., NeurIPS'22 MRL —
    * the coarse-to-fine pattern every MRL deployment runs): stage 1
    * ranks the corpus by the 16-dim PREFIX cosine (the cheap scan —
    * at 100 TB this reads/computes 1/4 of the vector bytes; with an
    * MRL-trained encoder the prefix is a faithful coarse embedding)
    * and keeps 20 candidates per query; stage 2 re-scores ONLY those
    * candidates with the exact full-dimension cosine and emits the
    * top-5. Same emit-the-approximate-answer oracle stance as
    * q_knn_lsh: DuckDB re-derives the identical two-stage result, so
    * the hash checks the WHOLE architecture (prefix ranking,
    * candidate cut, exact rerank, tie rules).
    *
    * Scale shape: stage 1 ships only (q_id, n_id, prefix-cos) into
    * its per-query window (WindowGroupLimit prunes to 20 per task);
    * stage 2 is a |Q|·20-row broadcast join back against the corpus
    * for full vectors — candidate-bounded, never corpus × corpus.
    * The window never carries vector payloads. */
  private val qKnnMrl = Q("q_knn_mrl",
    s"""WITH $vectorsCte,
       |p AS (SELECT vec_id, v, n2, v[1:16] AS pv FROM e),
       |qs AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2, v[1:16] AS qpv
       |       FROM e WHERE vec_id < 10),
       |c1 AS (SELECT q_id, n_id FROM (
       |    SELECT q.q_id, t.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY list_dot_product(q.qpv, t.pv)
       |                   / (sqrt(list_dot_product(q.qpv, q.qpv))
       |                      * sqrt(list_dot_product(t.pv, t.pv))) DESC,
       |                 t.vec_id) AS rn
       |    FROM qs q JOIN p t ON q.q_id <> t.vec_id)
       |  WHERE rn <= 20),
       |f AS (SELECT c.q_id, c.n_id,
       |        list_dot_product(q.qv, t.v) / (sqrt(q.qn2) * sqrt(t.n2)) AS cos
       |      FROM c1 c
       |      JOIN qs q ON q.q_id = c.q_id
       |      JOIN p t ON t.vec_id = c.n_id),
       |r AS (SELECT q_id, n_id, cos, row_number() OVER
       |        (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
       |      FROM f)
       |SELECT q_id, n_id, CAST(rn AS INT) AS rn, round(cos, 6) AS sim
       |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val qs = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        slice(col("v"), 1, 16).as("qpv"))
    val pcos = cosine(col("qpv"), slice(col("v"), 1, 16))
    val w1 = Window.partitionBy(col("q_id")).orderBy(col("pcos").desc, col("n_id"))
    val c1 = e.join(broadcast(qs.select(col("q_id"), col("qpv"))),
        col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), pcos.as("pcos"))
      .withColumn("rn", row_number().over(w1))
      .where(col("rn") <= 20)
      .select(col("q_id"), col("n_id"))
    val cos = cosine(col("qv"), col("v"))
    val w2 = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    e.select(col("vec_id").as("n_id"), col("v"))
      .join(broadcast(c1), "n_id")
      .join(broadcast(qs.select(col("q_id"), col("qv"))), "q_id")
      .select(col("q_id"), col("n_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w2))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** INT8 SCALAR QUANTIZATION of the embedding corpus with a
    * measured serving-quality audit — the standard 8× memory move of
    * a production ANN stack (FAISS SQ8 / vector-DB int8 codecs):
    * per-vector absmax scale s = max|x|/127, codes = round(x/s)
    * clamped to [−127, 127], then grade what quantization costs:
    *
    *  - `recall`: top-5 under QUANTIZED cosine vs the exact
    *    brute-force top-5. The quantized score is
    *    dot(codes)/(‖cq‖·‖cc‖) — the per-vector scales CANCEL in the
    *    cosine, so the ranking core is pure small-integer arithmetic
    *    (|code| ≤ 127, 64-dim dot ≤ 64·127² ≈ 10⁶ — exact in a
    *    double on both engines, no transcendental drift possible);
    *  - `mse`: per-query-vector reconstruction error Σ(x − c·s)²,
    *    each term quantized to the 12-decimal grid into
    *    DECIMAL(28,12) before the order-free sum.
    *
    * Scale shape (100 TB): quantization is a stateless per-row
    * transform (zero shuffle — at corpus scale this pass rewrites
    * the store at 1/8 the bytes); the recall audit is the
    * request-scale kNN shape (query side broadcast, corpus streams
    * once); the mse audit runs on the 10 serving queries only. */
  /** The int8 absmax codec, factored so [[qEmbedQuantize]] (the
    * audited in-plan transform) and the QUANTIZED POSTING STORE
    * ([[ivfBuildStoreQ8]], round 18) quantize identically — one
    * codec, two consumers, no drift. */
  private[graft] def quantizeScale(v: Column): Column = {
    val absMax = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
    val s0 = absMax / lit(127.0)
    when(s0 === 0.0, lit(1.0)).otherwise(s0)
  }

  /** Codes under [[quantizeScale]]: round(x/s) clamped to ±127, as
    * longs (cast to tinyint at store-write time). */
  private[graft] def quantizeCodes(v: Column, sc: Column): Column =
    transform(v, x =>
      greatest(least(round(x / sc), lit(127)), lit(-127)).cast("long"))

  /** Exact integer dot product of two array<long> code columns. */
  private[graft] def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, p) => acc + p)

  /** Driver-side twin of the codec — BigDecimal HALF_UP is exactly
    * Spark's `round` on doubles, so a query vector quantized on the
    * driver carries the same codes the in-plan transform would
    * produce (spec-pinned by the Q8 serving ≡ in-plan case). */
  private[graft] def quantizeLocal(v: Seq[Double]): (Seq[Long], Long) = {
    val am = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x)))
    val sc = if (am == 0.0) 1.0 else am / 127.0
    val c = v.map { x =>
      val r = java.math.BigDecimal.valueOf(x / sc)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      math.max(-127L, math.min(127L, r))
    }
    (c, c.foldLeft(0L)((a, x) => a + x * x))
  }

  private val qEmbedQuantize = Q("q_embed_quantize",
    s"""WITH $vectorsCte,
       |qz AS (SELECT vec_id, v, n2,
       |        CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
       |             ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
       |        END AS s
       |       FROM e),
       |cd AS (SELECT vec_id, v, n2, s,
       |        list_transform(v,
       |          x -> CAST(greatest(least(round(x / s), 127), -127) AS BIGINT)) AS c
       |       FROM qz),
       |cn AS (SELECT vec_id, c, list_dot_product(c, c) AS qn2 FROM cd),
       |qs AS (SELECT vec_id AS q_id, c AS qc, qn2 AS qqn2
       |       FROM cn WHERE vec_id < 10),
       |top AS (SELECT q_id, n_id FROM (
       |    SELECT q.q_id, t.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY list_dot_product(q.qc, t.c)
       |                   / (sqrt(CAST(q.qqn2 AS DOUBLE))
       |                      * sqrt(CAST(t.qn2 AS DOUBLE))) DESC,
       |                 t.vec_id) AS rn
       |    FROM qs q JOIN cn t ON q.q_id <> t.vec_id)
       |  WHERE rn <= 5),
       |brute AS (SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, t.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, t.v) / (sqrt(q.n2) * sqrt(t.n2)) DESC,
       |                 t.vec_id) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 10) q
       |    JOIN e t ON q.vec_id <> t.vec_id)
       |  WHERE rn <= 5),
       |hits AS (SELECT t.q_id, CAST(count(b.n_id) AS BIGINT) AS n_hit
       |         FROM top t LEFT JOIN brute b
       |           ON b.q_id = t.q_id AND b.n_id = t.n_id
       |         GROUP BY 1),
       |u AS (SELECT vec_id, s, unnest(v) AS x, unnest(c) AS cc
       |      FROM cd WHERE vec_id < 10),
       |mse AS (SELECT vec_id AS q_id,
       |    round(CAST(sum(CAST(round((x - cc * s) * (x - cc * s), 12)
       |      AS DECIMAL(28,12))) AS DOUBLE), 10) AS mse
       |  FROM u GROUP BY 1)
       |SELECT h.q_id, h.n_hit, round(h.n_hit / 5.0, 4) AS recall, m.mse
       |FROM hits h JOIN mse m ON m.q_id = h.q_id
       |ORDER BY h.q_id""".stripMargin) { (s, d) =>
    val e = vectors(s, d)
    val cd = e
      .withColumn("s", quantizeScale(col("v")))
      .withColumn("c", quantizeCodes(col("v"), col("s")))
      .fenced() // quantized once; read by ranking, truth, and mse
    val cn = cd.select(col("vec_id"), col("c"),
      intDot(col("c"), col("c")).as("qn2"))
    val qs = cn.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("c").as("qc"),
        col("qn2").as("qqn2"))
    val score = intDot(col("qc"), col("c")).cast("double") /
      (sqrt(col("qqn2").cast("double")) * sqrt(col("qn2").cast("double")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(score.desc, col("vec_id"))
    val top = cn.join(broadcast(qs), col("q_id") =!= col("vec_id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("vec_id").as("n_id"))
    val brute = qKnnBrute.fn(s, d).select(col("q_id"), col("n_id"),
      lit(1L).as("hit"))
    val hits = top.join(broadcast(brute), Seq("q_id", "n_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    val mse = cd.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("s"),
        explode(zip_with(col("v"), col("c"),
          (x, cc) => struct(x.as("x"), cc.as("cc")))).as("t"))
      .select(col("q_id"),
        round((col("t.x") - col("t.cc") * col("s")) *
          (col("t.x") - col("t.cc") * col("s")), 12)
          .cast("decimal(28,12)").as("term"))
      .groupBy(col("q_id"))
      .agg(round(sum(col("term")).cast("double"), 10).as("mse"))
    hits.join(mse, "q_id")
      .select(col("q_id"), col("n_hit"),
        round(col("n_hit") / lit(5.0), 4).as("recall"), col("mse"))
      .orderBy(col("q_id"))
  }

  /** QUANTIZED (int8) posting store — the production ANN serving
    * shape (r17 verdict item 1): the [[ivfBuildStore]] lifecycle with
    * the [[quantizeScale]]/[[quantizeCodes]] codec applied at WRITE
    * time, so each posting row persists 64 TINYINT codes + one BIGINT
    * norm instead of 64 doubles — an 8× cut of the bytes every probe
    * reads, compounding with the nprobe/C partition-pruning fraction.
    * The per-vector scale is NOT stored: serving ranks by quantized
    * COSINE, where the absmax scales cancel (the [[qEmbedQuantize]]
    * identity), so the integer codes alone carry the ranking and the
    * score core is exact small-integer arithmetic. Centroids stay
    * full-precision (k-bounded model, lives with the store). */
  private[graft] def ivfBuildStoreQ8(s: SparkSession, d: String,
      kind: String = "ivfq8"): (DataFrame, Array[Array[Double]]) = {
    import graft.operators.{DedupManifest, KMeans}
    val e = vectors(s, d).fenced()
    val (assigned, cents, _) =
      KMeans.fit(e.select(col("vec_id"), col("v")), k = IvfC, maxIter = 5)
    val sc = quantizeScale(col("v"))
    val posting = e
      .join(assigned.select(col("id").as("vec_id"), col("cluster").as("list")),
        "vec_id")
      .withColumn("sq", sc)
      .select(col("list").cast("int").as("list"), col("vec_id"),
        quantizeCodes(col("v"), col("sq")).as("cl"))
      .select(col("list"), col("vec_id"),
        col("cl").cast("array<tinyint>").as("c"),
        intDot(col("cl"), col("cl")).as("qn2"))
    val store = DedupManifest
      .persistPartitioned(posting, DedupManifest.path(s, kind, d), Seq("list"))
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("c"), col("qn2"))
    (store, cents)
  }

  /** Serving tail over the QUANTIZED store: identical driver-side
    * probe selection to [[ivfServe]] (full-precision centroids), the
    * same literal cell filter (partition pruning), but the rerank
    * reads only (codes, norm) — never a double vector — and scores by
    * quantized cosine with driver-quantized query codes
    * ([[quantizeLocal]], the same codec as the store write). */
  private[graft] def ivfServeQ8(store: DataFrame, cents: Array[Array[Double]],
      queries: Array[(Long, Seq[Double])],
      nprobe: Int = IvfNprobeTrained): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._
    val probes = queries.sortBy(_._1).flatMap { case (q, qv) =>
      val (qc, qqn2) = quantizeLocal(qv)
      cents.zipWithIndex
        .map { case (c, j) => (sqDistLocal(qv, c), j) }.sorted
        .take(nprobe)
        .map { case (_, j) => (q, j, qc, qqn2) }
    }
    val cells = probes.map(_._2).distinct.sorted.toSeq
    val probesDf = broadcast(probes.toSeq.toDF("q_id", "list", "qc", "qqn2"))
    val score = intDot(col("qc"), col("c").cast("array<long>")).cast("double") /
      (sqrt(col("qqn2").cast("double")) * sqrt(col("qn2").cast("double")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("n_id"))
    store
      .where(col("list").isin(cells: _*)) // static partition pruning
      .join(probesDf, Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), score.as("score"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("score"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  private[graft] def knnIvfQ8(s: SparkSession, d: String): DataFrame = {
    val (store, cents) = ivfBuildStoreQ8(s, d)
    ivfServeQ8(store, cents, ivfQueries(s, d))
  }

  /** Fixed dump root for [[qKnnIvfQ8]]'s serving trace (the
    * [[IvfNprobeDumpDir]] protocol: keyed by the SF-identifying
    * lineitem count, atomic rename publish, stale-sibling pruning). */
  private[graft] val IvfQ8DumpDir = "/tmp/graft_oracle/ivf_q8_served"

  /** Publish a serving trace for a DuckDB-graded oracle: staging dir
    * + atomic rename (no partial reads), stale sibling corpus dumps
    * pruned at 6 h (shared by the nprobe-recall and Q8/OPQ traces).
    *
    * The staging dir lives ONE LEVEL DEEPER than the published key
    * dirs (`root/.stage/c<key>` — r18 advice): the oracles glob
    * `root/&#42;/&#42;.parquet`, and DuckDB's glob DOES match
    * dot-directories, so a sibling `root/.tmp_c<key>` staging write
    * was readable mid-write (duplicate final+staging rows carrying
    * the same corpus_key). At `root/.stage/c<key>/&#42;.parquet` the
    * files sit at depth 3 — structurally outside any two-level glob,
    * whatever the glob's dot semantics. The delete-then-rename gap on
    * the FINAL dir remains (rename-onto-existing is not atomic on
    * HDFS-style stores); it is key-scoped, so after the r18
    * SF-keying fix only a concurrent same-SF reader can see it — the
    * sweep protocol never runs two same-SF grades concurrently. */
  private def publishTrace(df: DataFrame, root: String, key: Long): Unit = {
    val s = df.sparkSession
    val hconf = s.sessionState.newHadoopConf()
    val finalPath = new org.apache.hadoop.fs.Path(s"$root/c$key")
    val stageRoot = new org.apache.hadoop.fs.Path(s"$root/.stage")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$root/.stage/c$key")
    val fs = finalPath.getFileSystem(hconf)
    df.withColumn("corpus_key", lit(key))
      .coalesce(1).write.mode("overwrite").parquet(tmpPath.toString)
    // a pre-r19 run may have left a glob-visible `.tmp_c<key>` sibling
    // carrying this corpus_key — remove it before the key goes live
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/.tmp_c$key"), true): Unit
    fs.delete(finalPath, true): Unit
    require(fs.rename(tmpPath, finalPath),
      s"atomic publish failed: rename $tmpPath -> $finalPath")
    val staleCutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    fs.listStatus(new org.apache.hadoop.fs.Path(root)).foreach { st =>
      val nm = st.getPath.getName
      if (nm == ".stage") {
        // prune abandoned stagings (a crashed publish) by child mtime;
        // never the live key's (it was just renamed away anyway)
        fs.listStatus(stageRoot).foreach { c =>
          if (c.getModificationTime < staleCutoff)
            fs.delete(c.getPath, true): Unit
        }
      } else if (nm != s"c$key" && st.getModificationTime < staleCutoff)
        fs.delete(st.getPath, true): Unit
    }
  }

  /** QUANTIZED-STORE ANN SERVING, graded (r17 verdict item 1): build
    * the int8 posting store once, serve the fixed query set through
    * [[ivfServeQ8]], and grade the served lists against the EXACT
    * brute-force truth — recall measures what int8 scoring plus
    * nprobe-bounded probing together cost. Data-level oracle (the
    * [[qIvfNprobeRecall]] standard): the trace the engine served is
    * dumped for DuckDB, which recomputes the truth set and the grade
    * from scratch — KMeans cells are the only non-derivable part, and
    * they are exactly what the trace carries.
    *
    * Scale shape: index-build cost at build time; per-query work is
    * the probed fraction of an 8×-smaller store; the grade is
    * |Q|×k rows. Measured at sf0.01: mean recall ≥ the trained-IVF
    * path's (int8 cosine is near-lossless at 64 dims — the
    * [[qEmbedQuantize]] audit's finding, now composed end-to-end). */
  private val qKnnIvfQ8 = Q("q_knn_ivf_q8",
    s"""WITH served AS (
       |  SELECT q_id, n_id
       |  FROM read_parquet('$IvfQ8DumpDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT count(*) FROM lineitem)),
       |$vectorsCte,
       |qs AS (SELECT * FROM e WHERE vec_id < 10),
       |truth AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM qs q JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5)
       |SELECT s.q_id, CAST(count(*) AS INT) AS n_ret,
       |  CAST(count(t.n_id) AS BIGINT) AS n_hit,
       |  (CAST(count(t.n_id) AS DOUBLE) >= $RecallFloor * 5.0) AS recall_ok
       |FROM served s LEFT JOIN truth t
       |  ON t.q_id = s.q_id AND t.n_id = s.n_id
       |GROUP BY s.q_id ORDER BY s.q_id""".stripMargin) { (s, d) =>
    val served = knnIvfQ8(s, d).select(col("q_id"), col("n_id"))
    val corpusKey = t(s, d, "lineitem").count()
    publishTrace(served, IvfQ8DumpDir, corpusKey)
    // grade FROM the dump — both engines consume the same trace
    val trace = s.read.parquet(s"$IvfQ8DumpDir/c$corpusKey")
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    trace.join(broadcast(brute), Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).cast("int").as("n_ret"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_ret"), col("n_hit"),
        (col("n_hit").cast("double") >= lit(RecallFloor) * lit(5.0))
          .as("recall_ok"))
      .orderBy(col("q_id"))
  }

  /** IVFPQ nprobe — wider than the plain literal-IVF's 2 because the
    * composed architecture spends its savings differently: ADC makes
    * candidate SCORING nearly free (LUT adds, no vector reads), so a
    * deployment widens the probe and lets the exact rerank stage pay
    * only for the shortlist. */
  private[graft] val IvfPqNprobe = 4

  /** ADC shortlist width fed to the exact rerank (FAISS `k factor`):
    * the low-margin-corpus lesson of [[qKnnPq]] (ADC top-5 alone
    * measures 0.28 recall here) applied as FAISS does — rank MANY by
    * the cheap approximate score, rescore FEW exactly. Measured
    * recall@5 vs brute at sf0.01 along the width axis: 20 → 0.54,
    * 40 → 0.72, 64 → 0.82 (the nprobe=4 candidate ceiling is ≈0.9);
    * 64 is the knee — rerank cost stays |Q|×64 full-vector reads,
    * trivial against the corpus scan at any scale. */
  private[graft] val IvfPqShortlist = 64

  /** COMPOSED IVF+PQ SERVING (Jégou et al., TPAMI'11; the FAISS
    * `IVFPQ` + exact-refine shape — the dominant production ANN
    * architecture): coarse quantizer prunes the corpus to the
    * probed cells, PQ ADC scores every candidate from a 4×16 LUT
    * without touching full vectors, the top-[[IvfPqShortlist]] per
    * query are re-scored with the exact full-dimension cosine, and
    * each served row is graded against the brute-force truth set
    * (`hit`). Codebooks quantize RAW vectors (FAISS
    * `by_residual=false`), which keeps every stage ANSI-derivable —
    * the oracle re-runs the IDENTICAL four-stage plan, so the hash
    * checks assignment, probe choice, codes, LUT scores, shortlist
    * cut, rerank, and the recall grade all at once.
    *
    * Scale shape (100 TB): assignment is the map-side argmax of
    * [[qKnnIvf]] (n-row exchange, never n×C rows); encoding is one
    * corpus scan against the broadcast codebook; ADC candidates are
    * nprobe/C of the corpus and carry only 4 SMALLINT codes + one
    * norm each (the 64×-smaller read that makes IVFPQ the at-scale
    * default); the rerank reads full vectors for |Q|×20 rows only —
    * candidate-bounded, never corpus-bounded. Windows carry scores,
    * never vector payloads (WindowGroupLimit prunes per task). */
  private val ivfPqSql: String =
    s"""WITH $vectorsCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e WHERE vec_id < $IvfC),
       |asg AS (
       |  SELECT vec_id, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) DESC,
       |               cent_id) AS arn
       |  FROM e CROSS JOIN cents),
       |assigned AS (SELECT vec_id, cent_id AS list FROM asg WHERE arn = 1),
       |prb AS (
       |  SELECT e.vec_id AS q_id, cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_dot_product(e.v, cv) / (sqrt(e.n2) * sqrt(cn2)) DESC,
       |               cent_id) AS pr
       |  FROM e CROSS JOIN cents WHERE e.vec_id < 10),
       |probes AS (SELECT q_id, cent_id AS list FROM prb WHERE pr <= $IvfPqNprobe),
       |js AS (SELECT unnest([0,1,2,3]) AS j),
       |sub AS (SELECT vec_id, j,
       |          list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS xs
       |        FROM e, js),
       |csub AS (SELECT vec_id AS cent_id, j,
       |           list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS cs,
       |           list_dot_product(list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub),
       |                            list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub)) AS cn2
       |         FROM e, js WHERE vec_id < $PqK),
       |dist AS (SELECT s.vec_id, s.j, c.cent_id,
       |           c.cn2 - 2 * list_dot_product(s.xs, c.cs) AS dd
       |         FROM sub s JOIN csub c ON s.j = c.j),
       |code AS (SELECT vec_id, j, cent_id AS code FROM (
       |           SELECT vec_id, j, cent_id,
       |             row_number() OVER (PARTITION BY vec_id, j
       |               ORDER BY dd, cent_id) AS rn
       |           FROM dist) WHERE rn = 1),
       |cw AS (SELECT c.vec_id,
       |         max(CASE WHEN j = 0 THEN code END) AS c0,
       |         max(CASE WHEN j = 1 THEN code END) AS c1,
       |         max(CASE WHEN j = 2 THEN code END) AS c2,
       |         max(CASE WHEN j = 3 THEN code END) AS c3,
       |         any_value(e.n2) AS xn2
       |       FROM code c JOIN e ON c.vec_id = e.vec_id
       |       GROUP BY c.vec_id),
       |lut AS (SELECT q.vec_id AS q_id, q.n2 AS qn2, c.j, c.cent_id,
       |          list_dot_product(list_slice(q.v, c.j*$PqDsub+1, c.j*$PqDsub+$PqDsub),
       |                           c.cs) AS qdot
       |        FROM e q JOIN csub c ON true WHERE q.vec_id < 10),
       |cand AS (SELECT p.q_id, a.vec_id AS n_id
       |         FROM probes p JOIN assigned a ON a.list = p.list
       |         WHERE a.vec_id <> p.q_id),
       |adc AS (
       |  SELECT cd.q_id, cd.n_id,
       |    (l0.qdot + l1.qdot + l2.qdot + l3.qdot)
       |      / (sqrt(l0.qn2) * sqrt(x.xn2)) AS score
       |  FROM cand cd JOIN cw x ON x.vec_id = cd.n_id
       |  JOIN lut l0 ON l0.q_id = cd.q_id AND l0.j = 0 AND l0.cent_id = x.c0
       |  JOIN lut l1 ON l1.q_id = cd.q_id AND l1.j = 1 AND l1.cent_id = x.c1
       |  JOIN lut l2 ON l2.q_id = cd.q_id AND l2.j = 2 AND l2.cent_id = x.c2
       |  JOIN lut l3 ON l3.q_id = cd.q_id AND l3.j = 3 AND l3.cent_id = x.c3),
       |short AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, n_id) AS srn
       |    FROM adc) WHERE srn <= $IvfPqShortlist),
       |rr AS (SELECT sh.q_id, sh.n_id,
       |         list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) AS cos
       |       FROM short sh
       |       JOIN e q ON q.vec_id = sh.q_id
       |       JOIN e c ON c.vec_id = sh.n_id),
       |top AS (SELECT q_id, n_id, cos,
       |          row_number() OVER (PARTITION BY q_id
       |            ORDER BY cos DESC, n_id) AS rn
       |        FROM rr),
       |brute AS (SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 10) q
       |    JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5)
       |SELECT t.q_id, t.n_id, CAST(t.rn AS INT) AS rn, round(t.cos, 6) AS sim,
       |  (b.n_id IS NOT NULL) AS hit
       |FROM top t LEFT JOIN brute b ON b.q_id = t.q_id AND b.n_id = t.n_id
       |WHERE t.rn <= 5
       |ORDER BY t.q_id, t.rn""".stripMargin

  private val qKnnIvfPq = Q("q_knn_ivf_pq", ivfPqSql) { (s, d) =>
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v")))
      .fenced() // read by assignment, probes, codes, LUT, rerank
    // stage 1a — coarse assignment: the qKnnIvf map-side argmax
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val simToCent = cosine(col("v"), col("cv"))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", simToCent)
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    // stage 1b — probe selection: request-scale window over the
    // broadcast centroid table
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qc").desc, col("cent_id"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(centsDf)
      .withColumn("qc", cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfPqNprobe)
      .select(col("q_id"), col("cent_id").as("list"))
    // stage 2 — PQ encode: one corpus scan vs the broadcast codebook
    // (pqSubspaces is shared with the persisted-PQ store builder, so
    // the two encodes cannot drift)
    def subspaces(src: DataFrame, idCol: String): DataFrame =
      pqSubspaces(src, idCol)
    val csub = subspaces(e.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = subspaces(e, "vec_id").join(broadcast(csub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val cw = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(e.select(col("vec_id"), col("n2").as("xn2")), "vec_id")
    // stage 3 — ADC over the probed candidates: LUT broadcast, no
    // vector reads
    val lut = subspaces(e.where(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "q_id"), "q_id")
      .join(broadcast(csub), "j")
      .select(col("q_id"), col("j"), col("cent_id"),
        dot(col("xs"), col("cs")).as("qdot"))
    def lutJ(j: Int): DataFrame = lut.where(col("j") === j)
      .select(col("q_id").as(s"q$j"), col("cent_id").as(s"k$j"),
        col("qdot").as(s"d$j"))
    val qn2 = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qn_id"), col("n2").as("qn2"))
    val cand = assigned.join(broadcast(probes), Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
    val adc = cand
      .join(cw.withColumnRenamed("vec_id", "n_id"), "n_id")
      .join(broadcast(lutJ(0)), col("q_id") === col("q0") && col("c0") === col("k0"))
      .join(broadcast(lutJ(1)), col("q_id") === col("q1") && col("c1") === col("k1"))
      .join(broadcast(lutJ(2)), col("q_id") === col("q2") && col("c2") === col("k2"))
      .join(broadcast(lutJ(3)), col("q_id") === col("q3") && col("c3") === col("k3"))
      .join(broadcast(qn2), col("q_id") === col("qn_id"))
      .select(col("q_id"), col("n_id"),
        ((col("d0") + col("d1") + col("d2") + col("d3"))
          / (sqrt(col("qn2")) * sqrt(col("xn2")))).as("score"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= IvfPqShortlist)
      .select(col("q_id"), col("n_id"))
    // stage 4 — exact rerank of the shortlist + brute-truth grade
    val qsv = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cosr = cosine(col("qv"), col("v"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    val top = e.select(col("vec_id").as("n_id"), col("v"))
      .join(broadcast(short), "n_id")
      .join(broadcast(qsv), "q_id")
      .select(col("q_id"), col("n_id"), cosr.as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 5)
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(true).as("hitf"))
    top.join(broadcast(brute), Seq("q_id", "n_id"), "left_outer")
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"),
        coalesce(col("hitf"), lit(false)).as("hit"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** The PQ subspace explode shared by the in-plan IVFPQ and the
    * persisted-PQ store builder. */
  private def pqSubspaces(src: DataFrame, idCol: String): DataFrame = src
    .select(col(idCol), explode(array((0 until PqM).map(j =>
      struct(lit(j).as("j"),
        slice(col("v"), j * PqDsub + 1, PqDsub).as("xs"))): _*)).as("sp"))
    .select(col(idCol), col("sp.j").as("j"), col("sp.xs").as("xs"))

  /** Left-to-right local dot — the driver twin of
    * [[graft.functions.GraftExpressions.dot_product]] (same
    * accumulation order, so driver-computed model values are
    * bit-identical to the in-plan/oracle doubles). */
  private[graft] def dotLocal(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Driver twin of the cosine composition both engines use. */
  private[graft] def cosLocal(a: Seq[Double], b: Seq[Double]): Double =
    dotLocal(a, b) / (math.sqrt(dotLocal(a, a)) * math.sqrt(dotLocal(b, b)))

  /** PERSISTED PQ posting store — the third store of the IVF
    * lifecycle trilogy (full-precision `ivf`, int8 `ivfq8`, and now
    * PQ codes): each posting row is (cell, vec_id, c0..c3 TINYINT,
    * exact norm) — 4 code bytes per vector against 512 full-precision
    * bytes, the 128× read cut that makes IVFPQ the at-scale default —
    * persisted PARTITIONED BY cell. Assignment and codes are the
    * IDENTICAL expressions of the in-plan [[qKnnIvfPq]], so serving
    * from this store reproduces its answers bit-for-bit (that is the
    * ○ query's oracle: the full ANSI IVFPQ plan). */
  private[graft] def ivfBuildStorePq(s: SparkSession, d: String,
      kind: String = "ivfpq"): DataFrame = {
    import graft.operators.DedupManifest
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v"))).fenced()
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    val csub = pqSubspaces(e.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = pqSubspaces(e, "vec_id").join(broadcast(csub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val cw = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(e.select(col("vec_id"), col("n2").as("xn2")), "vec_id")
    val posting = assigned.join(cw, "vec_id")
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("c0").cast("tinyint").as("c0"), col("c1").cast("tinyint").as("c1"),
        col("c2").cast("tinyint").as("c2"), col("c3").cast("tinyint").as("c3"),
        col("xn2"))
    DedupManifest
      .persistPartitioned(posting, DedupManifest.path(s, kind, d), Seq("list"))
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("c0"), col("c1"), col("c2"), col("c3"), col("xn2"))
  }

  /** PERSISTED RESIDUAL-PQ posting store (round 19 — the store for
    * the mode [[qKnnIvfPqR]] measured as the operating point that
    * matters: recall 0.90 at 12 B/vec): identical layout to
    * [[ivfBuildStorePq]] (cell-partitioned, 4 TINYINT codes + exact
    * norm per row), but the codes quantize the RESIDUAL
    * r = v − centroid(cell) against the residual codebook — the
    * FAISS by_residual=true encode, the same expressions as the
    * in-plan ○ query, so store serving reproduces its answers
    * bit-for-bit. */
  private[graft] def ivfBuildStorePqR(s: SparkSession, d: String,
      kind: String = "ivfpqr"): DataFrame = {
    import graft.operators.DedupManifest
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v"))).fenced()
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    val res = e.join(assigned, "vec_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("vec_id"), col("list"), col("n2"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"))
      .fenced() // encode scan + codebook both read it
    def resSub(src: DataFrame, idCol: String): DataFrame =
      pqSubspaces(src.select(col(idCol), col("r").as("v")), idCol)
    val crsub = resSub(res.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = resSub(res, "vec_id").join(broadcast(crsub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val posting = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(res.select(col("vec_id"), col("list"), col("n2").as("xn2")),
        "vec_id")
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("c0").cast("tinyint").as("c0"), col("c1").cast("tinyint").as("c1"),
        col("c2").cast("tinyint").as("c2"), col("c3").cast("tinyint").as("c3"),
        col("xn2"))
    DedupManifest
      .persistPartitioned(posting, DedupManifest.path(s, kind, d), Seq("list"))
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("c0"), col("c1"), col("c2"), col("c3"), col("xn2"))
  }

  /** Serve the fixed query set from the PERSISTED PQ store: model
    * artifacts (centroids, codebook) load k-bounded driver-side — the
    * production shape where the model ships with the index; the LUT
    * is computed on the driver with the same left-to-right arithmetic
    * as the oracle ([[dotLocal]]); candidates are the probed cells'
    * code rows only (partition-pruned, 4 bytes + norm per row); the
    * exact rerank POINT-READS the shortlist ids from the corpus
    * (`vec_id IN (...)` pushed to the parquet scan — |Q|×shortlist
    * ids, the fetch-by-id read every serving stack does last). */
  /** The ADC shortlist FRAME over the persisted PQ store (lazy — the
    * spec plan-checks it: partition-pruned store scan, tinyint code
    * reads, no vector columns): probed cells only, driver-computed
    * LUT, top-[[IvfPqShortlist]] per query by ADC score. */
  /** The driver-resident PQ serving model — what a production stack
    * ships NEXT TO the posting store: the coarse centroids (probe
    * selection + the residual coarse term) and the per-subspace
    * codebook (LUT construction). k-bounded (IvfC + PqM×PqK rows),
    * collected ONCE per index lifetime — never per batch (r18
    * advice: the pq stream leg was re-collecting it every
    * micro-batch). `residual` selects the FAISS by_residual=true
    * ADC decomposition (coarse dot + residual LUT adds). */
  private[graft] case class PqModel(
      cents: Array[(Int, Seq[Double])],
      codebook: Array[(Int, Int, Seq[Double])],
      residual: Boolean)

  /** Load the raw-codebook model ([[qKnnIvfPq]]'s): centroids = first
    * [[IvfC]] vectors, codebook = subspace slices of the first
    * [[PqK]] RAW vectors. */
  private[graft] def loadPqModel(s: SparkSession, d: String): PqModel = {
    val spark = s
    import spark.implicits._
    val e = vectors(s, d)
    val cents: Array[(Int, Seq[Double])] = e.where(col("vec_id") < IvfC)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1).map { case (id, v) => (id.toInt, v) }
    val codebook: Array[(Int, Int, Seq[Double])] =
      pqSubspaces(e.where(col("vec_id") < PqK)
          .withColumnRenamed("vec_id", "cent_id"), "cent_id")
        .select(col("cent_id"), col("j"), col("xs"))
        .as[(Long, Int, Seq[Double])]
        .collect().map { case (c, j, cs) => (c.toInt, j, cs) }
    PqModel(cents, codebook, residual = false)
  }

  /** Load the RESIDUAL-codebook model ([[qKnnIvfPqR]]'s, FAISS
    * by_residual=true): codebook = subspace slices of the first
    * [[PqK]] vectors' residuals r = v − centroid(assigned cell),
    * derived DRIVER-SIDE with the same left-to-right arithmetic and
    * the same (cos DESC, cent_id) assignment tie-break as the
    * in-plan query — bit-identical doubles by construction. */
  private[graft] def loadPqRModel(s: SparkSession, d: String): PqModel = {
    val base = loadPqModel(s, d)
    val spark = s
    import spark.implicits._
    val firstK = vectors(s, d).where(col("vec_id") < PqK)
      .select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    val codebook = firstK.flatMap { case (id, v) =>
      val (_, cv) = base.cents
        .map { case (cid, c) => ((-cosLocal(v, c), cid), c) }
        .minBy(_._1)
      val r = v.indices.map(i => v(i) - cv(i))
      (0 until PqM).map(j =>
        (id.toInt, j, r.slice(j * PqDsub, j * PqDsub + PqDsub): Seq[Double]))
    }
    base.copy(codebook = codebook, residual = true)
  }

  private[graft] def ivfPqStoreShortlist(s: SparkSession, d: String,
      store: DataFrame,
      qsIn: Array[(Long, Seq[Double])] = null,
      modelIn: PqModel = null): DataFrame = {
    val spark = s
    import spark.implicits._
    val model = Option(modelIn).getOrElse(loadPqModel(s, d))
    val cents = model.cents
    val qs = Option(qsIn).getOrElse(ivfQueries(s, d))
    // probe selection: (cosine DESC, cent_id) — identical doubles to
    // the oracle's probe rule
    val probes = qs.flatMap { case (q, qv) =>
      cents.map { case (cid, cv) => (cosLocal(qv, cv), cid) }
        .sortBy { case (c, cid) => (-c, cid) }
        .take(IvfPqNprobe).map { case (_, cid) => (q, cid) }
    }
    val cells = probes.map(_._2).distinct.sorted.toSeq
    val probesDf = broadcast(probes.toSeq.toDF("q_id", "list"))
    // driver LUT: |Q| × PqM × PqK entries, same l→r slice dots
    val lutRows = for {
      (q, qv) <- qs.toSeq
      (cid, j, cs) <- model.codebook
    } yield (q, j, cid,
      dotLocal(qv.slice(j * PqDsub, j * PqDsub + PqDsub), cs))
    val lutDf = lutRows.toDF("q_id", "j", "cent_id", "qdot").fenced()
    def lutJ(j: Int): DataFrame = lutDf.where(col("j") === j)
      .select(col("q_id").as(s"q$j"), col("cent_id").as(s"k$j"),
        col("qdot").as(s"d$j"))
    val qn2Df = broadcast(qs.toSeq
      .map { case (q, qv) => (q, dotLocal(qv, qv)) }.toDF("qn_id", "qn2"))
    // residual ADC: the per-(query, probed-cell) coarse dot joins in
    // on (q_id, list) — |Q|×nprobe driver-computed rows
    val centMap = cents.toMap
    val coarseDf =
      if (!model.residual) null
      else broadcast(probes.toSeq
        .map { case (q, cid) =>
          val qv = qs.find(_._1 == q).get._2
          (q, cid, dotLocal(qv, centMap(cid)))
        }.toDF("co_q", "co_list", "cdot"))
    val cand0 = store.where(col("list").isin(cells: _*)) // partition pruning
      .join(probesDf, Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
    val cand =
      if (model.residual)
        cand0.join(coarseDf,
          col("q_id") === col("co_q") && col("list") === col("co_list"))
      else cand0.withColumn("cdot", lit(0.0))
    val adc = cand
      .join(broadcast(lutJ(0)), col("q_id") === col("q0") && col("c0") === col("k0"))
      .join(broadcast(lutJ(1)), col("q_id") === col("q1") && col("c1") === col("k1"))
      .join(broadcast(lutJ(2)), col("q_id") === col("q2") && col("c2") === col("k2"))
      .join(broadcast(lutJ(3)), col("q_id") === col("q3") && col("c3") === col("k3"))
      .join(qn2Df, col("q_id") === col("qn_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        ((col("cdot") + col("d0") + col("d1") + col("d2") + col("d3"))
          / (sqrt(col("qn2")) * sqrt(col("xn2")))).as("score"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    adc.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= IvfPqShortlist)
      .select(col("q_id"), col("n_id"))
  }

  /** GRADE-FREE PQ serving tail (r18 advice): shortlist + point-read
    * exact rerank ONLY — no brute-force truth pass, no `hit` column —
    * returning the (q_id, n_id, rn, sim) schema every other serving
    * mode emits. This is the production serving path; the graded
    * wrapper [[ivfServePqStore]] exists for the ○ queries whose
    * oracle wants the recall verdict in-row. */
  private[graft] def ivfServePqLean(s: SparkSession, d: String,
      store: DataFrame,
      qsIn: Array[(Long, Seq[Double])] = null,
      modelIn: PqModel = null): DataFrame = {
    val spark = s
    import spark.implicits._
    val e = vectors(s, d)
    val qs = Option(qsIn).getOrElse(ivfQueries(s, d))
    // request-scale collect (≤ |Q| × shortlist ids) enabling the
    // point-read: without it the rerank would scan every corpus
    // vector's bytes to join 640 rows
    val shortRows = ivfPqStoreShortlist(s, d, store, qs, modelIn)
      .as[(Long, Long)].collect()
    val ids = shortRows.map(_._2).distinct.sorted.toSeq
    val shortDf = broadcast(shortRows.toSeq.toDF("q_id", "n_id"))
    val qvDf = broadcast(qs.toSeq.toDF("q_id", "qv"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    e.where(col("vec_id").isin(ids: _*)) // pushed point-read
      .select(col("vec_id").as("n_id"), col("v"))
      .join(shortDf, "n_id")
      .join(qvDf, "q_id")
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"))
      .orderBy(col("q_id"), col("rn"))
  }

  private[graft] def ivfServePqStore(s: SparkSession, d: String,
      store: DataFrame,
      qsIn: Array[(Long, Seq[Double])] = null,
      modelIn: PqModel = null): DataFrame = {
    val top = ivfServePqLean(s, d, store, qsIn, modelIn)
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(true).as("hitf"))
    top.join(broadcast(brute), Seq("q_id", "n_id"), "left_outer")
      .select(col("q_id"), col("n_id"), col("rn"), col("sim"),
        coalesce(col("hitf"), lit(false)).as("hit"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** RESIDUAL-ENCODED IVFPQ (round 18; FAISS `by_residual=true` —
    * the library's actual default): PQ quantizes the RESIDUAL
    * r = v − centroid(cell) instead of the raw vector, because
    * residuals concentrate near zero once the coarse quantizer has
    * absorbed the cell's mean — the same codebook budget then spends
    * its resolution on a much smaller ball. ADC scores decompose as
    * dot(q, v) ≈ dot(q, c_cell) + Σⱼ LUT[q, j, codeⱼ] — one coarse
    * term per probed (query, cell) pair plus the residual LUT adds.
    * Shortlist → exact rerank → brute-truth grade, as [[qKnnIvfPq]].
    *
    * The residual subtraction is ANSI-expressible
    * (`list_transform(generate_series(...), i -> v[i] - cv[i])` ≙
    * Spark `zip_with(v, cv, _ - _)` — elementwise, exact), so the
    * whole by_residual architecture stays hash-checked end to end.
    * Measured at sf0.01 (nprobe=4, shortlist 64): recall@5 **0.90
    * residual vs 0.82 raw-codebook** ([[qKnnIvfPq]]) — the FAISS
    * default earns its keep on this corpus too; that pair is the
    * codebook-design comparison a deployment reads before picking a
    * config.
    *
    * Scale shape: identical to [[qKnnIvfPq]] plus one elementwise
    * subtraction on the encode scan and a |Q|×nprobe coarse-dot
    * table — nothing new shuffles. */
  private val qKnnIvfPqR = Q("q_knn_ivf_pq_r",
    s"""WITH $vectorsCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e WHERE vec_id < $IvfC),
       |asg AS (
       |  SELECT vec_id, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) DESC,
       |               cent_id) AS arn
       |  FROM e CROSS JOIN cents),
       |assigned AS (SELECT vec_id, cent_id AS list FROM asg WHERE arn = 1),
       |prb AS (
       |  SELECT e.vec_id AS q_id, cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_dot_product(e.v, cv) / (sqrt(e.n2) * sqrt(cn2)) DESC,
       |               cent_id) AS pr
       |  FROM e CROSS JOIN cents WHERE e.vec_id < 10),
       |probes AS (SELECT q_id, cent_id AS list FROM prb WHERE pr <= $IvfPqNprobe),
       |res AS (SELECT e.vec_id, a.list, e.n2,
       |          list_transform(generate_series(1, ${PqM * PqDsub}),
       |                         i -> e.v[i] - c.cv[i]) AS r
       |        FROM e JOIN assigned a ON a.vec_id = e.vec_id
       |        JOIN cents c ON c.cent_id = a.list),
       |js AS (SELECT unnest([0,1,2,3]) AS j),
       |rsub AS (SELECT vec_id, j,
       |           list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS xs
       |         FROM res, js),
       |crsub AS (SELECT vec_id AS cent_id, j,
       |            list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS cs,
       |            list_dot_product(list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub),
       |                             list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub)) AS cn2
       |          FROM res, js WHERE vec_id < $PqK),
       |dist AS (SELECT s.vec_id, s.j, c.cent_id,
       |           c.cn2 - 2 * list_dot_product(s.xs, c.cs) AS dd
       |         FROM rsub s JOIN crsub c ON s.j = c.j),
       |code AS (SELECT vec_id, j, cent_id AS code FROM (
       |           SELECT vec_id, j, cent_id,
       |             row_number() OVER (PARTITION BY vec_id, j
       |               ORDER BY dd, cent_id) AS rn
       |           FROM dist) WHERE rn = 1),
       |cw AS (SELECT c.vec_id,
       |         max(CASE WHEN j = 0 THEN code END) AS c0,
       |         max(CASE WHEN j = 1 THEN code END) AS c1,
       |         max(CASE WHEN j = 2 THEN code END) AS c2,
       |         max(CASE WHEN j = 3 THEN code END) AS c3,
       |         any_value(r2.n2) AS xn2, any_value(r2.list) AS list
       |       FROM code c JOIN res r2 ON c.vec_id = r2.vec_id
       |       GROUP BY c.vec_id),
       |lut AS (SELECT q.vec_id AS q_id, q.n2 AS qn2, c.j, c.cent_id,
       |          list_dot_product(list_slice(q.v, c.j*$PqDsub+1, c.j*$PqDsub+$PqDsub),
       |                           c.cs) AS qdot
       |        FROM e q JOIN crsub c ON true WHERE q.vec_id < 10),
       |coarse AS (SELECT p.q_id, p.list, list_dot_product(q.v, c.cv) AS cdot
       |           FROM probes p JOIN e q ON q.vec_id = p.q_id
       |           JOIN cents c ON c.cent_id = p.list),
       |cand AS (SELECT p.q_id, a.vec_id AS n_id, a.list
       |         FROM probes p JOIN assigned a ON a.list = p.list
       |         WHERE a.vec_id <> p.q_id),
       |adc AS (
       |  SELECT cd.q_id, cd.n_id,
       |    (co.cdot + l0.qdot + l1.qdot + l2.qdot + l3.qdot)
       |      / (sqrt(l0.qn2) * sqrt(x.xn2)) AS score
       |  FROM cand cd JOIN cw x ON x.vec_id = cd.n_id
       |  JOIN coarse co ON co.q_id = cd.q_id AND co.list = cd.list
       |  JOIN lut l0 ON l0.q_id = cd.q_id AND l0.j = 0 AND l0.cent_id = x.c0
       |  JOIN lut l1 ON l1.q_id = cd.q_id AND l1.j = 1 AND l1.cent_id = x.c1
       |  JOIN lut l2 ON l2.q_id = cd.q_id AND l2.j = 2 AND l2.cent_id = x.c2
       |  JOIN lut l3 ON l3.q_id = cd.q_id AND l3.j = 3 AND l3.cent_id = x.c3),
       |short AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, n_id) AS srn
       |    FROM adc) WHERE srn <= $IvfPqShortlist),
       |rr AS (SELECT sh.q_id, sh.n_id,
       |         list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) AS cos
       |       FROM short sh
       |       JOIN e q ON q.vec_id = sh.q_id
       |       JOIN e c ON c.vec_id = sh.n_id),
       |top AS (SELECT q_id, n_id, cos,
       |          row_number() OVER (PARTITION BY q_id
       |            ORDER BY cos DESC, n_id) AS rn
       |        FROM rr),
       |brute AS (SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 10) q
       |    JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5)
       |SELECT t.q_id, t.n_id, CAST(t.rn AS INT) AS rn, round(t.cos, 6) AS sim,
       |  (b.n_id IS NOT NULL) AS hit
       |FROM top t LEFT JOIN brute b ON b.q_id = t.q_id AND b.n_id = t.n_id
       |WHERE t.rn <= 5
       |ORDER BY t.q_id, t.rn""".stripMargin) { (s, d) =>
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v"))).fenced()
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qc").desc, col("cent_id"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(centsDf)
      .withColumn("qc", cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfPqNprobe)
      .select(col("q_id"), col("cent_id").as("list"))
    // residuals: elementwise v − centroid(cell), exact on both engines
    val res = e.join(assigned, "vec_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("vec_id"), col("list"), col("n2"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"))
      .fenced() // encode scan + codebook both read it
    def resSub(src: DataFrame, idCol: String): DataFrame =
      pqSubspaces(src.select(col(idCol), col("r").as("v")), idCol)
    val crsub = resSub(res.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = resSub(res, "vec_id").join(broadcast(crsub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val cw = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(res.select(col("vec_id"), col("n2").as("xn2")), "vec_id")
    val lut = pqSubspaces(e.where(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "q_id"), "q_id")
      .join(broadcast(crsub), "j")
      .select(col("q_id"), col("j"), col("cent_id"),
        dot(col("xs"), col("cs")).as("qdot"))
    def lutJ(j: Int): DataFrame = lut.where(col("j") === j)
      .select(col("q_id").as(s"q$j"), col("cent_id").as(s"k$j"),
        col("qdot").as(s"d$j"))
    val coarse = probes
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("q_id").as("co_q"), col("list").as("co_list"),
        dot(col("qv"), col("cv")).as("cdot"))
    val qn2Df = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qn_id"), col("n2").as("qn2"))
    val cand = assigned.join(broadcast(probes), Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("list"))
    val adc = cand
      .join(cw.withColumnRenamed("vec_id", "n_id"), "n_id")
      .join(broadcast(coarse),
        col("q_id") === col("co_q") && col("list") === col("co_list"))
      .join(broadcast(lutJ(0)), col("q_id") === col("q0") && col("c0") === col("k0"))
      .join(broadcast(lutJ(1)), col("q_id") === col("q1") && col("c1") === col("k1"))
      .join(broadcast(lutJ(2)), col("q_id") === col("q2") && col("c2") === col("k2"))
      .join(broadcast(lutJ(3)), col("q_id") === col("q3") && col("c3") === col("k3"))
      .join(broadcast(qn2Df), col("q_id") === col("qn_id"))
      .select(col("q_id"), col("n_id"),
        ((col("cdot") + col("d0") + col("d1") + col("d2") + col("d3"))
          / (sqrt(col("qn2")) * sqrt(col("xn2")))).as("score"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= IvfPqShortlist)
      .select(col("q_id"), col("n_id"))
    val qsv = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    val top = e.select(col("vec_id").as("n_id"), col("v"))
      .join(broadcast(short), "n_id")
      .join(broadcast(qsv), "q_id")
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 5)
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(true).as("hitf"))
    top.join(broadcast(brute), Seq("q_id", "n_id"), "left_outer")
      .select(col("q_id"), col("n_id"), col("rn").cast("int").as("rn"),
        round(col("cos"), 6).as("sim"),
        coalesce(col("hitf"), lit(false)).as("hit"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** THE SERVING-MODE SELECTION REPORT (round 18 — the
    * [[graft.queries.TextQueries]] q_tokenizer_compare stance applied
    * to ANN serving): one plan serves the fixed query set through the
    * three posting-row representations over the IDENTICAL probed
    * candidate set (literal centroids, nprobe = [[IvfPqNprobe]]) and
    * grades each against the brute truth —
    *
    *  - `ivf_full`: exact cosine over double vectors (512 B/vec);
    *  - `ivf_q8`: quantized cosine over int8 codes + norm (72 B/vec —
    *    the [[qEmbedQuantize]] codec, scales cancel);
    *  - `ivf_pq`: ADC shortlist from 4 PQ codes + norm (12 B/vec),
    *    exact rerank of the top-[[IvfPqShortlist]];
    *  - `ivf_pq_r`: the same 12 B/vec with RESIDUAL-encoded codebooks
    *    ([[qKnnIvfPqR]], FAISS by_residual=true) — same bytes, higher
    *    recall (0.90 vs 0.82 at sf0.01): the report's punchline is
    *    that codebook design, not byte budget, closes most of the
    *    PQ↔full gap.
    *
    * The emitted (mode, bytes_per_vec, n_served, n_hit, recall) table
    * is the store-sizing decision a deployment actually makes: how
    * much recall each byte of posting row buys at a fixed probe
    * width. Every stage is ANSI-derivable (literal centroids, the
    * int8 codec, raw-vector codebooks), so DuckDB re-derives the
    * whole three-way report and the hash checks all three serving
    * stacks at once.
    *
    * Scale shape: ONE shared candidate generation (nprobe/C of the
    * corpus, equi-join); each mode adds only its scoring pass over
    * those candidates; windows carry scores, never vectors; the grade
    * is |modes|×|Q|×k rows. */
  private val qAnnModeCompare = Q("q_ann_mode_compare",
    s"""WITH $vectorsCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e WHERE vec_id < $IvfC),
       |asg AS (
       |  SELECT vec_id, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) DESC,
       |               cent_id) AS arn
       |  FROM e CROSS JOIN cents),
       |assigned AS (SELECT vec_id, cent_id AS list FROM asg WHERE arn = 1),
       |prb AS (
       |  SELECT e.vec_id AS q_id, cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_dot_product(e.v, cv) / (sqrt(e.n2) * sqrt(cn2)) DESC,
       |               cent_id) AS pr
       |  FROM e CROSS JOIN cents WHERE e.vec_id < 10),
       |probes AS (SELECT q_id, cent_id AS list FROM prb WHERE pr <= $IvfPqNprobe),
       |cand AS (SELECT p.q_id, a.vec_id AS n_id, a.list
       |         FROM probes p JOIN assigned a ON a.list = p.list
       |         WHERE a.vec_id <> p.q_id),
       |truth AS (SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 10) q
       |    JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5),
       |m1 AS (SELECT q_id, n_id FROM (
       |    SELECT c.q_id, c.n_id,
       |      row_number() OVER (PARTITION BY c.q_id
       |        ORDER BY list_dot_product(q.v, t.v) / (sqrt(q.n2) * sqrt(t.n2)) DESC,
       |                 c.n_id) AS rn
       |    FROM cand c JOIN e q ON q.vec_id = c.q_id
       |    JOIN e t ON t.vec_id = c.n_id)
       |  WHERE rn <= 5),
       |qz AS (SELECT vec_id,
       |        CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
       |             ELSE list_max(list_transform(v, x -> abs(x))) / 127.0
       |        END AS s, v
       |       FROM e),
       |cn AS (SELECT vec_id,
       |         list_transform(v,
       |           x -> CAST(greatest(least(round(x / s), 127), -127) AS BIGINT)) AS c
       |       FROM qz),
       |cn2t AS (SELECT vec_id, c, list_dot_product(c, c) AS qn2 FROM cn),
       |m2 AS (SELECT q_id, n_id FROM (
       |    SELECT c.q_id, c.n_id,
       |      row_number() OVER (PARTITION BY c.q_id
       |        ORDER BY list_dot_product(cq.c, ct.c)
       |                   / (sqrt(CAST(cq.qn2 AS DOUBLE))
       |                      * sqrt(CAST(ct.qn2 AS DOUBLE))) DESC,
       |                 c.n_id) AS rn
       |    FROM cand c JOIN cn2t cq ON cq.vec_id = c.q_id
       |    JOIN cn2t ct ON ct.vec_id = c.n_id)
       |  WHERE rn <= 5),
       |js AS (SELECT unnest([0,1,2,3]) AS j),
       |sub AS (SELECT vec_id, j,
       |          list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS xs
       |        FROM e, js),
       |csub AS (SELECT vec_id AS cent_id, j,
       |           list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS cs,
       |           list_dot_product(list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub),
       |                            list_slice(v, j*$PqDsub+1, j*$PqDsub+$PqDsub)) AS cn2
       |         FROM e, js WHERE vec_id < $PqK),
       |dist AS (SELECT s.vec_id, s.j, c.cent_id,
       |           c.cn2 - 2 * list_dot_product(s.xs, c.cs) AS dd
       |         FROM sub s JOIN csub c ON s.j = c.j),
       |code AS (SELECT vec_id, j, cent_id AS code FROM (
       |           SELECT vec_id, j, cent_id,
       |             row_number() OVER (PARTITION BY vec_id, j
       |               ORDER BY dd, cent_id) AS rn
       |           FROM dist) WHERE rn = 1),
       |cw AS (SELECT c.vec_id,
       |         max(CASE WHEN j = 0 THEN code END) AS c0,
       |         max(CASE WHEN j = 1 THEN code END) AS c1,
       |         max(CASE WHEN j = 2 THEN code END) AS c2,
       |         max(CASE WHEN j = 3 THEN code END) AS c3,
       |         any_value(e.n2) AS xn2
       |       FROM code c JOIN e ON c.vec_id = e.vec_id
       |       GROUP BY c.vec_id),
       |lut AS (SELECT q.vec_id AS q_id, q.n2 AS qn2, c.j, c.cent_id,
       |          list_dot_product(list_slice(q.v, c.j*$PqDsub+1, c.j*$PqDsub+$PqDsub),
       |                           c.cs) AS qdot
       |        FROM e q JOIN csub c ON true WHERE q.vec_id < 10),
       |adc AS (
       |  SELECT cd.q_id, cd.n_id,
       |    (l0.qdot + l1.qdot + l2.qdot + l3.qdot)
       |      / (sqrt(l0.qn2) * sqrt(x.xn2)) AS score
       |  FROM cand cd JOIN cw x ON x.vec_id = cd.n_id
       |  JOIN lut l0 ON l0.q_id = cd.q_id AND l0.j = 0 AND l0.cent_id = x.c0
       |  JOIN lut l1 ON l1.q_id = cd.q_id AND l1.j = 1 AND l1.cent_id = x.c1
       |  JOIN lut l2 ON l2.q_id = cd.q_id AND l2.j = 2 AND l2.cent_id = x.c2
       |  JOIN lut l3 ON l3.q_id = cd.q_id AND l3.j = 3 AND l3.cent_id = x.c3),
       |short AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, n_id) AS srn
       |    FROM adc) WHERE srn <= $IvfPqShortlist),
       |m3 AS (SELECT q_id, n_id FROM (
       |    SELECT sh.q_id, sh.n_id,
       |      row_number() OVER (PARTITION BY sh.q_id
       |        ORDER BY list_dot_product(q.v, t.v) / (sqrt(q.n2) * sqrt(t.n2)) DESC,
       |                 sh.n_id) AS rn
       |    FROM short sh JOIN e q ON q.vec_id = sh.q_id
       |    JOIN e t ON t.vec_id = sh.n_id)
       |  WHERE rn <= 5),
       |res AS (SELECT e.vec_id, a.list, e.n2,
       |          list_transform(generate_series(1, ${PqM * PqDsub}),
       |                         i -> e.v[i] - c.cv[i]) AS r
       |        FROM e JOIN assigned a ON a.vec_id = e.vec_id
       |        JOIN cents c ON c.cent_id = a.list),
       |rsub AS (SELECT vec_id, j,
       |           list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS xs
       |         FROM res, js),
       |crsub AS (SELECT vec_id AS cent_id, j,
       |            list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub) AS cs,
       |            list_dot_product(list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub),
       |                             list_slice(r, j*$PqDsub+1, j*$PqDsub+$PqDsub)) AS cn2
       |          FROM res, js WHERE vec_id < $PqK),
       |rdist AS (SELECT s.vec_id, s.j, c.cent_id,
       |            c.cn2 - 2 * list_dot_product(s.xs, c.cs) AS dd
       |          FROM rsub s JOIN crsub c ON s.j = c.j),
       |rcode AS (SELECT vec_id, j, cent_id AS code FROM (
       |            SELECT vec_id, j, cent_id,
       |              row_number() OVER (PARTITION BY vec_id, j
       |                ORDER BY dd, cent_id) AS rn
       |            FROM rdist) WHERE rn = 1),
       |rcw AS (SELECT c.vec_id,
       |          max(CASE WHEN j = 0 THEN code END) AS c0,
       |          max(CASE WHEN j = 1 THEN code END) AS c1,
       |          max(CASE WHEN j = 2 THEN code END) AS c2,
       |          max(CASE WHEN j = 3 THEN code END) AS c3,
       |          any_value(r2.n2) AS xn2
       |        FROM rcode c JOIN res r2 ON c.vec_id = r2.vec_id
       |        GROUP BY c.vec_id),
       |rlut AS (SELECT q.vec_id AS q_id, q.n2 AS qn2, c.j, c.cent_id,
       |           list_dot_product(list_slice(q.v, c.j*$PqDsub+1, c.j*$PqDsub+$PqDsub),
       |                            c.cs) AS qdot
       |         FROM e q JOIN crsub c ON true WHERE q.vec_id < 10),
       |coarse AS (SELECT p.q_id, p.list, list_dot_product(q.v, c.cv) AS cdot
       |           FROM probes p JOIN e q ON q.vec_id = p.q_id
       |           JOIN cents c ON c.cent_id = p.list),
       |radc AS (
       |  SELECT cd.q_id, cd.n_id,
       |    (co.cdot + l0.qdot + l1.qdot + l2.qdot + l3.qdot)
       |      / (sqrt(l0.qn2) * sqrt(x.xn2)) AS score
       |  FROM cand cd JOIN rcw x ON x.vec_id = cd.n_id
       |  JOIN coarse co ON co.q_id = cd.q_id AND co.list = cd.list
       |  JOIN rlut l0 ON l0.q_id = cd.q_id AND l0.j = 0 AND l0.cent_id = x.c0
       |  JOIN rlut l1 ON l1.q_id = cd.q_id AND l1.j = 1 AND l1.cent_id = x.c1
       |  JOIN rlut l2 ON l2.q_id = cd.q_id AND l2.j = 2 AND l2.cent_id = x.c2
       |  JOIN rlut l3 ON l3.q_id = cd.q_id AND l3.j = 3 AND l3.cent_id = x.c3),
       |rshort AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY score DESC, n_id) AS srn
       |    FROM radc) WHERE srn <= $IvfPqShortlist),
       |m4 AS (SELECT q_id, n_id FROM (
       |    SELECT sh.q_id, sh.n_id,
       |      row_number() OVER (PARTITION BY sh.q_id
       |        ORDER BY list_dot_product(q.v, t.v) / (sqrt(q.n2) * sqrt(t.n2)) DESC,
       |                 sh.n_id) AS rn
       |    FROM rshort sh JOIN e q ON q.vec_id = sh.q_id
       |    JOIN e t ON t.vec_id = sh.n_id)
       |  WHERE rn <= 5),
       |g AS (
       |  SELECT 'ivf_full' AS mode, 512 AS bytes_per_vec, q_id, n_id FROM m1
       |  UNION ALL SELECT 'ivf_q8', 72, q_id, n_id FROM m2
       |  UNION ALL SELECT 'ivf_pq', 12, q_id, n_id FROM m3
       |  UNION ALL SELECT 'ivf_pq_r', 12, q_id, n_id FROM m4)
       |SELECT g.mode, CAST(g.bytes_per_vec AS INT) AS bytes_per_vec,
       |  CAST(count(*) AS BIGINT) AS n_served,
       |  CAST(count(t.n_id) AS BIGINT) AS n_hit,
       |  round(count(t.n_id)
       |    / CAST((SELECT count(*) FROM truth) AS DOUBLE), 4) AS recall
       |FROM g LEFT JOIN truth t ON t.q_id = g.q_id AND t.n_id = g.n_id
       |GROUP BY 1, 2 ORDER BY mode""".stripMargin) { (s, d) =>
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v"))).fenced()
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qc").desc, col("cent_id"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .crossJoin(centsDf)
      .withColumn("qc", cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfPqNprobe)
      .select(col("q_id"), col("cent_id").as("list"))
    val cand = assigned.join(broadcast(probes), Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("list"))
      .fenced() // the shared candidate set, scored four ways
    def top5(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5).select(col("q_id"), col("n_id"))
    }
    // mode 1: exact cosine over double vectors
    val m1 = top5(cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("v")), "n_id")
      .select(col("q_id"), col("n_id"), cosine(col("qv"), col("v")).as("score")))
    // mode 2: quantized cosine over int8 codes (the shared codec)
    val cn = e.withColumn("s", quantizeScale(col("v")))
      .withColumn("c", quantizeCodes(col("v"), col("s")))
      .select(col("vec_id"), col("c"), intDot(col("c"), col("c")).as("qn2"))
      .fenced()
    val qscore = intDot(col("qc"), col("c")).cast("double") /
      (sqrt(col("qqn2").cast("double")) * sqrt(col("qn2").cast("double")))
    val m2 = top5(cand
      .join(cn.select(col("vec_id").as("q_id"), col("c").as("qc"),
        col("qn2").as("qqn2")), "q_id")
      .join(cn.select(col("vec_id").as("n_id"), col("c"), col("qn2")), "n_id")
      .select(col("q_id"), col("n_id"), qscore.as("score")))
    // mode 3: PQ-ADC shortlist + exact rerank (the IVFPQ stack)
    val csub = pqSubspaces(e.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = pqSubspaces(e, "vec_id").join(broadcast(csub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val cw = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(e.select(col("vec_id"), col("n2").as("xn2")), "vec_id")
    val lut = pqSubspaces(e.where(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "q_id"), "q_id")
      .join(broadcast(csub), "j")
      .select(col("q_id"), col("j"), col("cent_id"),
        dot(col("xs"), col("cs")).as("qdot"))
    def lutJ(j: Int): DataFrame = lut.where(col("j") === j)
      .select(col("q_id").as(s"q$j"), col("cent_id").as(s"k$j"),
        col("qdot").as(s"d$j"))
    val qn2Df = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qn_id"), col("n2").as("qn2"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    val short = cand
      .join(cw.withColumnRenamed("vec_id", "n_id"), "n_id")
      .join(broadcast(lutJ(0)), col("q_id") === col("q0") && col("c0") === col("k0"))
      .join(broadcast(lutJ(1)), col("q_id") === col("q1") && col("c1") === col("k1"))
      .join(broadcast(lutJ(2)), col("q_id") === col("q2") && col("c2") === col("k2"))
      .join(broadcast(lutJ(3)), col("q_id") === col("q3") && col("c3") === col("k3"))
      .join(broadcast(qn2Df), col("q_id") === col("qn_id"))
      .select(col("q_id"), col("n_id"),
        ((col("d0") + col("d1") + col("d2") + col("d3"))
          / (sqrt(col("qn2")) * sqrt(col("xn2")))).as("score"))
      .withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= IvfPqShortlist)
      .select(col("q_id"), col("n_id"))
    val m3 = top5(short
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("v")), "n_id")
      .select(col("q_id"), col("n_id"), cosine(col("qv"), col("v")).as("score")))
    // mode 4: residual-encoded PQ (by_residual=true — the qKnnIvfPqR
    // architecture over the same candidates)
    val res = e.join(assigned, "vec_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("vec_id"), col("list"), col("n2"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"))
      .fenced()
    def resSub(src: DataFrame, idCol: String): DataFrame =
      pqSubspaces(src.select(col(idCol), col("r").as("v")), idCol)
    val crsub = resSub(res.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val rcode = resSub(res, "vec_id").join(broadcast(crsub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val rcw = rcode.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("rc0"),
      max(when(col("j") === 1, col("cent_id"))).as("rc1"),
      max(when(col("j") === 2, col("cent_id"))).as("rc2"),
      max(when(col("j") === 3, col("cent_id"))).as("rc3"))
      .join(res.select(col("vec_id"), col("n2").as("rxn2")), "vec_id")
    val rlut = pqSubspaces(e.where(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "q_id"), "q_id")
      .join(broadcast(crsub), "j")
      .select(col("q_id"), col("j"), col("cent_id"),
        dot(col("xs"), col("cs")).as("qdot"))
    def rlutJ(j: Int): DataFrame = rlut.where(col("j") === j)
      .select(col("q_id").as(s"rq$j"), col("cent_id").as(s"rk$j"),
        col("qdot").as(s"rd$j"))
    val coarse = probes
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("q_id").as("co_q"), col("list").as("co_list"),
        dot(col("qv"), col("cv")).as("cdot"))
    val rshort = cand
      .join(rcw.withColumnRenamed("vec_id", "n_id"), "n_id")
      .join(broadcast(coarse),
        col("q_id") === col("co_q") && col("list") === col("co_list"))
      .join(broadcast(rlutJ(0)), col("q_id") === col("rq0") && col("rc0") === col("rk0"))
      .join(broadcast(rlutJ(1)), col("q_id") === col("rq1") && col("rc1") === col("rk1"))
      .join(broadcast(rlutJ(2)), col("q_id") === col("rq2") && col("rc2") === col("rk2"))
      .join(broadcast(rlutJ(3)), col("q_id") === col("rq3") && col("rc3") === col("rk3"))
      .join(broadcast(qn2Df), col("q_id") === col("qn_id"))
      .select(col("q_id"), col("n_id"),
        ((col("cdot") + col("rd0") + col("rd1") + col("rd2") + col("rd3"))
          / (sqrt(col("qn2")) * sqrt(col("rxn2")))).as("score"))
      .withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= IvfPqShortlist)
      .select(col("q_id"), col("n_id"))
    val m4 = top5(rshort
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("v")), "n_id")
      .select(col("q_id"), col("n_id"), cosine(col("qv"), col("v")).as("score")))
    // grade all four against the brute truth
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit")).fenced()
    val nTruth = brute.count()
    def graded(m: DataFrame, mode: String, bytes: Int): DataFrame =
      m.select(lit(mode).as("mode"),
        lit(bytes).cast("int").as("bytes_per_vec"), col("q_id"), col("n_id"))
    val g = graded(m1, "ivf_full", 512)
      .union(graded(m2, "ivf_q8", 72))
      .union(graded(m3, "ivf_pq", 12))
      .union(graded(m4, "ivf_pq_r", 12))
    g.join(broadcast(brute), Seq("q_id", "n_id"), "left_outer")
      .groupBy(col("mode"), col("bytes_per_vec"))
      .agg(count(lit(1)).as("n_served"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("mode"), col("bytes_per_vec"), col("n_served"),
        col("n_hit"),
        round(col("n_hit").cast("double") / lit(nTruth.toDouble), 4)
          .as("recall"))
      .orderBy(col("mode"))
  }

  /** IVFPQ FROM THE PERSISTED STORE — same oracle as [[qKnnIvfPq]]:
    * the store is built by the identical assignment/encode
    * expressions, so serving from durable code rows must reproduce
    * the in-plan ANSI-derived answer bit-for-bit; the DuckDB hash
    * match IS the store round-trip proof (a data-level oracle
    * covering tinyint code persistence, driver LUT arithmetic,
    * partition-pruned candidate reads, and the point-read rerank). */
  private val qKnnIvfPqStore = Q("q_knn_ivf_pq_store", ivfPqSql) { (s, d) =>
    ivfServePqStore(s, d, ivfBuildStorePq(s, d))
  }

  /** The attribute predicate of [[qKnnFiltered]] — a literal metadata
    * constraint (`label = 3`, ~10% selectivity on the fixture) so the
    * whole pre-vs-post comparison stays ANSI-derivable. */
  private[graft] val FltLabel = 3

  /** Posting store WITH FILTERABLE METADATA — the production vector-
    * store layout for attribute-filtered search: each posting row
    * carries the attribute column next to the vector, so a predicate
    * evaluates AT THE STORE SCAN (parquet row-group pruning at
    * scale), composed with the cell partition pruning. Literal
    * centroids ([[qKnnIvfPq]]'s stance) keep assignment
    * oracle-derivable. */
  private[graft] def ivfBuildStoreFlt(s: SparkSession, d: String,
      kind: String = "ivfflt"): DataFrame = {
    import graft.operators.DedupManifest
    val e = vectors(s, d).withColumn("n2", dot(col("v"), col("v"))).fenced()
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("v").as("cv")))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", cosine(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    val posting = e.join(assigned, "vec_id")
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("label"), col("v"))
    DedupManifest
      .persistPartitioned(posting, DedupManifest.path(s, kind, d), Seq("list"))
      .select(col("list").cast("int").as("list"), col("vec_id"),
        col("label"), col("v"))
  }

  /** The probed candidate frame over the filtered-store — (q_id,
    * n_id, label, cos) for every posting row of the probed cells.
    * `private[graft]` so FilteredAnnSpec plan-checks the PREFILTER
    * leg built on it (PartitionFilters prune the cells, PushedFilters
    * carry the label predicate). */
  private[graft] def fltCandidates(s: SparkSession, d: String,
      store: DataFrame): DataFrame = {
    val spark = s
    import spark.implicits._
    val qs = ivfQueries(s, d)
    val cents = loadPqModel(s, d).cents
    val probes = qs.flatMap { case (q, qv) =>
      cents.map { case (cid, cv) => (cosLocal(qv, cv), cid) }
        .sortBy { case (c, cid) => (-c, cid) }
        .take(IvfPqNprobe).map { case (_, cid) => (q, cid, qv) }
    }
    val cells = probes.map(_._2).distinct.sorted.toSeq
    val probesDf = broadcast(probes.toSeq.toDF("q_id", "list", "qv"))
    store.where(col("list").isin(cells: _*)) // static partition pruning
      .join(probesDf, Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("label"),
        cosine(col("qv"), col("v")).as("cos"))
  }

  private def fltTop5(leg: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    leg.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
  }

  /** ATTRIBUTE-FILTERED ANN — predicate + top-k over the persisted
    * IVF store (round 19; the most common production vector-store
    * operation after plain top-k), AS the pre-vs-post-filter decision
    * report a deployment reads:
    *
    *  - `pre` (pre-filtering): the label predicate is pushed INTO the
    *    posting-list scan — candidates are probed-cells ∩ label, and
    *    the top-5 ranks only qualifying vectors. Never starves: it
    *    returns 5 answers whenever the probed cells hold 5 qualifying
    *    rows.
    *  - `post` (post-filtering, the naive form): serve the UNFILTERED
    *    top-5, then drop non-qualifying answers — the k·selectivity
    *    starvation every vector-store doc warns about (at 10%
    *    selectivity, ~0.5 survivors per query).
    *
    * Both legs grade against the FILTERED brute truth (exact top-5
    * among `label = FltLabel`, the |Q|×|corpus∩label| baseline). The
    * emitted per-query row (n_pre, pre_hit, n_post, post_hit,
    * pre_wins) IS the decision: post ⊆ pre by construction (a
    * qualifying answer in the unfiltered top-5 ranks ≤ 5 among
    * qualifying candidates), so `pre_wins` must hold on every row —
    * an invariant the oracle re-derives numerically.
    *
    * Scale shape: the store scan reads nprobe/C of the corpus WITH
    * the attribute predicate applied at the scan (parquet min/max +
    * dictionary row-group pruning on the attribute at 100 TB);
    * windows rank |probed candidates| rows per query; the truth leg
    * is |Q|-bounded broadcast against the label-pruned corpus scan;
    * the report is |Q| rows. */
  private val qKnnFiltered = Q("q_knn_filtered",
    s"""WITH $vectorsCte,
       |cents AS (SELECT vec_id AS cent_id, v AS cv, n2 AS cn2
       |          FROM e WHERE vec_id < $IvfC),
       |asg AS (
       |  SELECT vec_id, cent_id,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY list_dot_product(v, cv) / (sqrt(n2) * sqrt(cn2)) DESC,
       |               cent_id) AS arn
       |  FROM e CROSS JOIN cents),
       |assigned AS (SELECT vec_id, cent_id AS list FROM asg WHERE arn = 1),
       |prb AS (
       |  SELECT e.vec_id AS q_id, cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_dot_product(e.v, cv) / (sqrt(e.n2) * sqrt(cn2)) DESC,
       |               cent_id) AS pr
       |  FROM e CROSS JOIN cents WHERE e.vec_id < 10),
       |probes AS (SELECT q_id, cent_id AS list FROM prb WHERE pr <= $IvfPqNprobe),
       |cand AS (
       |  SELECT p.q_id, a.vec_id AS n_id, c.label,
       |    list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) AS cos
       |  FROM probes p JOIN assigned a ON a.list = p.list
       |  JOIN e c ON c.vec_id = a.vec_id
       |  JOIN e q ON q.vec_id = p.q_id
       |  WHERE a.vec_id <> p.q_id),
       |pre AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY cos DESC, n_id) AS rn
       |    FROM cand WHERE label = $FltLabel) WHERE rn <= 5),
       |post AS (SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id, label,
       |      row_number() OVER (PARTITION BY q_id
       |        ORDER BY cos DESC, n_id) AS rn
       |    FROM cand) WHERE rn <= 5 AND label = $FltLabel),
       |truth AS (SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM (SELECT * FROM e WHERE vec_id < 10) q
       |    JOIN (SELECT * FROM e WHERE label = $FltLabel) c
       |      ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5),
       |qs AS (SELECT vec_id AS q_id FROM e WHERE vec_id < 10),
       |preg AS (SELECT p.q_id, CAST(count(*) AS INT) AS n_pre,
       |    CAST(count(t.n_id) AS INT) AS pre_hit
       |  FROM pre p LEFT JOIN truth t ON t.q_id = p.q_id AND t.n_id = p.n_id
       |  GROUP BY p.q_id),
       |postg AS (SELECT p.q_id, CAST(count(*) AS INT) AS n_post,
       |    CAST(count(t.n_id) AS INT) AS post_hit
       |  FROM post p LEFT JOIN truth t ON t.q_id = p.q_id AND t.n_id = p.n_id
       |  GROUP BY p.q_id)
       |SELECT q.q_id,
       |  COALESCE(n_pre, 0) AS n_pre, COALESCE(pre_hit, 0) AS pre_hit,
       |  COALESCE(n_post, 0) AS n_post, COALESCE(post_hit, 0) AS post_hit,
       |  (COALESCE(pre_hit, 0) >= COALESCE(post_hit, 0)) AS pre_wins
       |FROM qs q LEFT JOIN preg ON preg.q_id = q.q_id
       |LEFT JOIN postg ON postg.q_id = q.q_id
       |ORDER BY q.q_id""".stripMargin) { (s, d) =>
    val spark = s
    import spark.implicits._
    val store = ivfBuildStoreFlt(s, d)
    val cand = fltCandidates(s, d, store)
    val pre = fltTop5(cand.where(col("label") === FltLabel))
      .select(col("q_id"), col("n_id"))
    val post = fltTop5(cand).where(col("label") === FltLabel)
      .select(col("q_id"), col("n_id"))
    val qs = ivfQueries(s, d)
    val qvDf = broadcast(qs.toSeq.toDF("tq_id", "tqv"))
    val truth = fltTop5(vectors(s, d).where(col("label") === FltLabel)
        .crossJoin(qvDf)
        .where(col("tq_id") =!= col("vec_id"))
        .select(col("tq_id").as("q_id"), col("vec_id").as("n_id"),
          cosine(col("tqv"), col("v")).as("cos")))
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    def graded(leg: DataFrame, nCol: String, hitCol: String): DataFrame = leg
      .join(broadcast(truth), Seq("q_id", "n_id"), "left_outer")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).cast("int").as(nCol),
        sum(coalesce(col("hit"), lit(0L))).cast("int").as(hitCol))
    qs.map(_._1).toSeq.toDF("q_id")
      .join(graded(pre, "n_pre", "pre_hit"), Seq("q_id"), "left_outer")
      .join(graded(post, "n_post", "post_hit"), Seq("q_id"), "left_outer")
      .select(col("q_id"),
        coalesce(col("n_pre"), lit(0)).as("n_pre"),
        coalesce(col("pre_hit"), lit(0)).as("pre_hit"),
        coalesce(col("n_post"), lit(0)).as("n_post"),
        coalesce(col("post_hit"), lit(0)).as("post_hit"),
        (coalesce(col("pre_hit"), lit(0)) >=
          coalesce(col("post_hit"), lit(0))).as("pre_wins"))
      .orderBy(col("q_id"))
  }

  /** Fixed dump root for [[qKnnIvfOpq]]'s serving trace (the
    * [[IvfNprobeDumpDir]] protocol: keyed by the SF-identifying
    * lineitem count, atomic deep-staged publish, stale-sibling
    * pruning). */
  private[graft] val IvfOpqDumpDir = "/tmp/graft_oracle/ivf_opq_served"

  /** The OPQ rotation for this corpus — one distributed moment pass +
    * driver eigen/allocation ([[graft.operators.Opq]]); shared with
    * OpqSpec so the spec pins the identical matrix. */
  private[graft] def opqRotation(s: SparkSession, d: String)
      : Array[Array[Double]] = {
    val spark = s
    import spark.implicits._
    val vecs = vectors(s, d).select(col("v")).as[Array[Double]]
    val (_, _, cov) = graft.operators.Pca.momentsOf(vecs, PqM * PqDsub)
    graft.operators.Opq.rotation(cov, PqM)
  }

  /** OPQ-ROTATED residual IVFPQ (round 19 — the next codebook-design
    * rung after [[qKnnIvfPqR]], and a FAISS staple: `OPQ64,IVF…,PQ4`):
    * vectors are rotated by the PARAMETRIC OPQ matrix (Ge et al.
    * CVPR'13 §4 — eigen-decorrelate, then allocate eigen-dimensions
    * to the [[PqM]] subspaces balancing the eigenvalue product), and
    * the ENTIRE residual IVFPQ pipeline of [[qKnnIvfPqR]] runs in
    * rotated space: rotation is orthonormal, so assignment/probing
    * cosines agree with raw space and the exact rerank still reads
    * ORIGINAL vectors. Same 12 B/vec posting budget — the comparison
    * against `ivf_pq_r` in [[qAnnModeCompare]]'s table is pure
    * codebook design at equal bytes.
    *
    * Oracle stance — the [[qIvfNprobeRecall]]/[[qKnnIvfQ8]] DATA-LEVEL
    * recall-verdict standard, because the eigenbasis (driver power
    * iteration) is not ANSI-derivable: the engine dumps the served
    * (q_id, n_id) trace keyed by the SF-identifying lineitem count,
    * and DuckDB independently recomputes the exact brute-force truth
    * and the per-query recall grade from that trace. (The all-ANSI
    * [[qAnnModeCompare]] report deliberately does NOT grow an OPQ row:
    * its oracle would have to read this trace, making a hash-checked
    * query depend on ANOTHER query's side-channel artifact and its
    * sweep ordering — the artifact-coupling the r18 trace-key incident
    * warns about. The cross-mode comparison lives in PLANS.md instead.)
    *
    * Measured at sf0.01 (nprobe=4, shortlist 64): see PLANS.md
    * round-19 notes — on this near-isotropic synthetic fixture the
    * eigen-spectrum is nearly flat, so OPQ's win over plain residual
    * PQ is capped by construction (the paper's gains come from
    * anisotropic real embeddings); the report row documents the
    * measured pair.
    *
    * Scale shape: [[qKnnIvfPqR]]'s plus ONE stateless rotation scan
    * (64 codegen dot products against broadcast literal rows) and a
    * d²-sized moment aggregate at train time — nothing new shuffles. */
  private val qKnnIvfOpq = Q("q_knn_ivf_opq",
    s"""WITH served AS (
       |  SELECT q_id, n_id
       |  FROM read_parquet('$IvfOpqDumpDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT count(*) FROM lineitem)),
       |$vectorsCte,
       |qs AS (SELECT * FROM e WHERE vec_id < 10),
       |truth AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_dot_product(q.v, c.v) / (sqrt(q.n2) * sqrt(c.n2)) DESC,
       |                 c.vec_id) AS rn
       |    FROM qs q JOIN e c ON q.vec_id <> c.vec_id)
       |  WHERE rn <= 5)
       |SELECT s.q_id, CAST(count(*) AS INT) AS n_ret,
       |  CAST(count(t.n_id) AS BIGINT) AS n_hit,
       |  (CAST(count(t.n_id) AS DOUBLE) >= $RecallFloor * 5.0) AS recall_ok
       |FROM served s LEFT JOIN truth t
       |  ON t.q_id = s.q_id AND t.n_id = s.n_id
       |GROUP BY s.q_id ORDER BY s.q_id""".stripMargin) { (s, d) =>
    val rot = opqRotation(s, d)
    val e0 = vectors(s, d)
    // one stateless rotation scan: vr[i] = <v, R_i> (codegen dots
    // against literal rows), norms recomputed in rotated space
    val vr = array(rot.map(r =>
      dot(col("v"), array(r.map(lit(_)): _*))): _*)
    val e = e0.select(col("vec_id"), col("v"), vr.as("r0"))
      .withColumn("n2", dot(col("r0"), col("r0")))
      .fenced()
    val centsDf = broadcast(e.where(col("vec_id") < IvfC)
      .select(col("vec_id").as("cent_id"), col("r0").as("cv")))
    val rcos = graft.functions.GraftExpressions.cosine_sim(col("r0"), col("cv"))
    val assigned = e.crossJoin(centsDf)
      .withColumn("csim", rcos)
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("csim"), (-col("cent_id")).as("nc"))).as("list"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qc").desc, col("cent_id"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("r0").as("qv"))
      .crossJoin(centsDf)
      .withColumn("qc", cosine(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= IvfPqNprobe)
      .select(col("q_id"), col("cent_id").as("list"))
    val res = e.join(assigned, "vec_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("vec_id"), col("list"), col("n2"),
        zip_with(col("r0"), col("cv"), (a, b) => a - b).as("r"))
      .fenced()
    def resSub(src: DataFrame, idCol: String): DataFrame =
      pqSubspaces(src.select(col(idCol), col("r").as("v")), idCol)
    val crsub = resSub(res.where(col("vec_id") < PqK)
      .withColumnRenamed("vec_id", "cent_id"), "cent_id")
      .select(col("cent_id"), col("j"), col("xs").as("cs"),
        dot(col("xs"), col("xs")).as("cn2"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dd"), col("cent_id"))
    val code = resSub(res, "vec_id").join(broadcast(crsub), "j")
      .select(col("vec_id"), col("j"), col("cent_id"),
        (col("cn2") - lit(2) * dot(col("xs"), col("cs"))).as("dd"))
      .withColumn("rn", row_number().over(wCode))
      .where(col("rn") === 1)
    val cw = code.groupBy(col("vec_id")).agg(
      max(when(col("j") === 0, col("cent_id"))).as("c0"),
      max(when(col("j") === 1, col("cent_id"))).as("c1"),
      max(when(col("j") === 2, col("cent_id"))).as("c2"),
      max(when(col("j") === 3, col("cent_id"))).as("c3"))
      .join(res.select(col("vec_id"), col("n2").as("xn2")), "vec_id")
    val lut = pqSubspaces(e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("r0").as("v")), "q_id")
      .join(broadcast(crsub), "j")
      .select(col("q_id"), col("j"), col("cent_id"),
        dot(col("xs"), col("cs")).as("qdot"))
    def lutJ(j: Int): DataFrame = lut.where(col("j") === j)
      .select(col("q_id").as(s"q$j"), col("cent_id").as(s"k$j"),
        col("qdot").as(s"d$j"))
    val coarse = probes
      .join(e.select(col("vec_id").as("q_id"), col("r0").as("qv")), "q_id")
      .join(centsDf.select(col("cent_id").as("list"), col("cv")), "list")
      .select(col("q_id").as("co_q"), col("list").as("co_list"),
        dot(col("qv"), col("cv")).as("cdot"))
    val qn2Df = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qn_id"), col("n2").as("qn2"))
    val cand = assigned.join(broadcast(probes), Seq("list"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("list"))
    val adc = cand
      .join(cw.withColumnRenamed("vec_id", "n_id"), "n_id")
      .join(broadcast(coarse),
        col("q_id") === col("co_q") && col("list") === col("co_list"))
      .join(broadcast(lutJ(0)), col("q_id") === col("q0") && col("c0") === col("k0"))
      .join(broadcast(lutJ(1)), col("q_id") === col("q1") && col("c1") === col("k1"))
      .join(broadcast(lutJ(2)), col("q_id") === col("q2") && col("c2") === col("k2"))
      .join(broadcast(lutJ(3)), col("q_id") === col("q3") && col("c3") === col("k3"))
      .join(broadcast(qn2Df), col("q_id") === col("qn_id"))
      .select(col("q_id"), col("n_id"),
        ((col("cdot") + col("d0") + col("d1") + col("d2") + col("d3"))
          / (sqrt(col("qn2")) * sqrt(col("xn2")))).as("score"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("n_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= IvfPqShortlist)
      .select(col("q_id"), col("n_id"))
    // exact rerank on ORIGINAL vectors (rotation preserves cosine;
    // raw reads keep the rerank identical to every other mode's)
    val qsv = e0.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    val served = e0.select(col("vec_id").as("n_id"), col("v"))
      .join(broadcast(short), "n_id")
      .join(broadcast(qsv), "q_id")
      .select(col("q_id"), col("n_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"))
    val corpusKey = t(s, d, "lineitem").count()
    publishTrace(served, IvfOpqDumpDir, corpusKey)
    // grade FROM the dump — both engines consume the same trace
    val trace = s.read.parquet(s"$IvfOpqDumpDir/c$corpusKey")
    val brute = qKnnBrute.fn(s, d)
      .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
    trace.join(broadcast(brute), Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).cast("int").as("n_ret"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("q_id"), col("n_ret"), col("n_hit"),
        (col("n_hit").cast("double") >= lit(RecallFloor) * lit(5.0))
          .as("recall_ok"))
      .orderBy(col("q_id"))
  }

  val all: Seq[Q] = Seq(qDedupEmbed, qDedupEmbedLsh, qDedupEmbedIncremental,
    qKnnBrute, qKnnLsh, qKnnIvf,
    qEmbedCentroid, qKnnPq, qKnnLshMulti, qDedupSemantic, qDedupSemanticXl,
    qEmbedCov, qEmbedPca, qKnnIvfTrained, qEmbedOutlier, qDecontaminateSemantic,
    qMineNegatives, qMineBitext, qEmbedCluster, qEmbedClusterXl, qSampleCoreset,
    qKnnIvfPersisted, qKnnIvfIncremental, qIvfCompactPlan, qIvfNprobeRecall,
    qEmbedQuantize, qKnnMrl, qKnnIvfPq, qKnnIvfQ8, qKnnIvfPqStore,
    qAnnModeCompare, qKnnIvfPqR, qKnnFiltered, qKnnIvfOpq)
}
