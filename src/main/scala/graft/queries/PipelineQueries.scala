package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftExpressions, PortableHash}
import graft.operators.PrefixSum
import graft.queries.Q.t
import graft.Fence.FenceOps

/** Training-data pipeline operators beyond per-document scoring — the
  * corpus-level passes a 100 TB pretraining build runs between raw
  * crawl and tokenizer: sequence packing, benchmark decontamination,
  * stratified sampling, mixture re-weighting, incremental (cross-
  * snapshot) dedup, and per-language quality quantile filtering.
  *
  * Reference scope note: the reference engine (dwds-livestream) stops
  * at per-event enrichment; these are the extension surface SURVEY.md
  * §2.12 calls for. All oracle twins follow the portability rules of
  * `Q` (explicit total-order ORDER BY, identical aliases, integer or
  * DECIMAL aggregates).
  */
object PipelineQueries {

  /** Tokens-per-sequence budget for packing. */
  private[graft] val SeqBudget = 512

  /** Concat-and-chunk sequence packing: documents in doc_id order are
    * laid head-to-tail and cut into `SeqBudget`-token sequences; a
    * document belongs to the sequence its FIRST token lands in. The
    * global running token count comes from [[PrefixSum.cumsum]] — one
    * range shuffle + broadcast offsets, never a single-partition
    * global window (see PrefixSum scaladoc for the scale argument).
    * Output: per-sequence document count and token mass. */
  private val qPackSequences = Q("q_pack_sequences",
    s"""WITH tok AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (SELECT doc_id, toks,
       |    sum(toks) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM tok)
       |SELECT CAST(floor((cum - toks) / $SeqBudget.0) AS BIGINT) AS seq_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS n_tokens
       |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin) { (s, d) =>
    val tok = t(s, d, "documents").select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    PrefixSum.cumsum(tok, "doc_id", "toks", 8, "cum")
      .withColumn("seq_id",
        floor((col("cum") - col("toks")) / lit(SeqBudget.toDouble)).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy(col("seq_id"))
  }

  /** Shard-sizing divisor for [[qPackBestfit]]: shards =
    * max(4, ceil(n/256)) keeps per-shard document counts bounded as
    * the corpus grows — the knob every per-shard sequential pass in
    * the engine derives from the data (the `semC` pattern). */
  private[graft] val PackShardDocs = 256L

  /** Loud guard on a single pack shard (the
    * [[graft.streaming.StreamingIvf.MaxBatchQueries]] discipline):
    * shard sizing keeps groups ~[[PackShardDocs]]; a pathological
    * hash pileup past this ceiling should fail naming the knob, not
    * OOM an executor. */
  private[graft] val PackMaxShardDocs: Int = 1 << 20

  /** NO-SPLIT sequence packing — the production alternative to
    * [[qPackSequences]]'s concat-and-chunk (which splits documents
    * across training sequences, diluting attention): whole documents
    * pack into [[SeqBudget]]-token bins by BEST-FIT-DECREASING
    * (Krell et al. 2021's packing problem; BFD is the classic
    * near-optimal greedy — ≤ 11/9·OPT + bins), run INDEPENDENTLY PER
    * SHARD so the sequential fill never sees more than a bounded
    * document group. Documents sort (toks DESC, doc_id) within their
    * shard; each goes to the fullest bin that still fits (ties to
    * the lowest bin id), else opens a new bin; oversized documents
    * (toks > budget) get a dedicated overfull bin. The report emits
    * per-bin occupancy plus the per-shard packing efficiency
    * Σtokens/(bins·budget) — the number a pretraining build compares
    * against concat-and-chunk's 1.0 to price the no-split property.
    *
    * Oracle: the IDENTICAL per-shard BFD as a recursive CTE whose
    * state is the bin fill/count lists (lockstep recursion over the
    * per-shard rank; oracle scale is fixture-bounded) — a FULL
    * data-level re-derivation, bins and all, not just the verdict.
    *
    * Scale shape: one count + one hash-shard scan; the pack runs
    * per-shard with ~[[PackShardDocs]]-bounded groups
    * (embarrassingly parallel `flatMapGroups`, state = one bin list
    * per live group); the report exchange carries bin-cardinality
    * rows; the per-shard eff join is shard-cardinality. Nothing is
    * corpus-sequential — the global-BFD alternative would collect n
    * documents onto the driver. */
  private val qPackBestfit = Q("q_pack_bestfit",
    s"""WITH RECURSIVE tok AS (
       |  SELECT ${PortableHash.md5LongSql("CAST(doc_id AS VARCHAR)")} %
       |      (SELECT CAST(GREATEST(4, CEIL(count(*) / $PackShardDocs.0)) AS BIGINT)
       |       FROM documents) AS shard,
       |    doc_id,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS toks
       |  FROM documents),
       |ranked AS (SELECT shard, toks,
       |    row_number() OVER (PARTITION BY shard
       |      ORDER BY toks DESC, doc_id) AS r
       |  FROM tok),
       |cnt AS (SELECT shard, max(r) AS n FROM ranked GROUP BY shard),
       |fill AS (
       |  SELECT shard, 0 AS r, CAST([] AS BIGINT[]) AS fills,
       |    CAST([] AS BIGINT[]) AS nds
       |  FROM (SELECT DISTINCT shard FROM ranked)
       |  UNION ALL
       |  SELECT f.shard, f.r + 1,
       |    CASE WHEN mx IS NULL THEN list_append(f.fills, d.toks)
       |         ELSE f.fills[1:list_position(f.fills, mx)-1]
       |           || [mx + d.toks]
       |           || f.fills[list_position(f.fills, mx)+1:] END,
       |    CASE WHEN mx IS NULL THEN list_append(f.nds, 1::BIGINT)
       |         ELSE f.nds[1:list_position(f.fills, mx)-1]
       |           || [f.nds[list_position(f.fills, mx)] + 1]
       |           || f.nds[list_position(f.fills, mx)+1:] END
       |  FROM fill f JOIN ranked d ON d.shard = f.shard AND d.r = f.r + 1,
       |  LATERAL (SELECT list_max(
       |    list_filter(f.fills, x -> x + d.toks <= $SeqBudget)) AS mx) m),
       |final AS (SELECT f.shard, f.fills, f.nds
       |  FROM fill f JOIN cnt c ON c.shard = f.shard AND f.r = c.n),
       |bins AS (SELECT f.shard AS shard, i - 1 AS bin_id,
       |    f.nds[i] AS n_docs, f.fills[i] AS n_tokens
       |  FROM final f, unnest(generate_series(1, len(f.fills))) AS t(i)),
       |eff AS (SELECT shard, sum(n_tokens) / (count(*) * $SeqBudget.0) AS sheff
       |  FROM bins GROUP BY shard)
       |SELECT b.shard, CAST(b.bin_id AS BIGINT) AS bin_id, b.n_docs,
       |  b.n_tokens, round(b.n_tokens / $SeqBudget.0, 4) AS fill_pct,
       |  round(e.sheff, 4) AS shard_eff
       |FROM bins b JOIN eff e ON e.shard = b.shard
       |ORDER BY b.shard, b.bin_id""".stripMargin) { (s, d) =>
    val spark = s
    import spark.implicits._
    val docs = t(s, d, "documents")
    val n = docs.count()
    val shards = math.max(4L, (n + PackShardDocs - 1) / PackShardDocs)
    val tok = docs.select(
      (PortableHash.md5Long(col("doc_id").cast("string")) % shards)
        .as("shard"),
      col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    val packed = tok.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val ds = it.toArray.sortBy { case (_, id, l) => (-l, id) }
        require(ds.length <= PackMaxShardDocs,
          s"pack shard $shard holds ${ds.length} documents, past " +
            s"PipelineQueries.PackMaxShardDocs=$PackMaxShardDocs — " +
            "shard sizing (PackShardDocs) should have bounded this; " +
            "re-derive shards or raise the guard deliberately")
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        val nds = scala.collection.mutable.ArrayBuffer.empty[Long]
        ds.foreach { case (_, _, l) =>
          var best = -1
          var i = 0
          while (i < fills.length) {
            if (fills(i) + l <= SeqBudget &&
                (best < 0 || fills(i) > fills(best))) best = i
            i += 1
          }
          if (best < 0) { fills += l; nds += 1L }
          else { fills(best) += l; nds(best) += 1L }
        }
        fills.indices.iterator.map(b =>
          (shard, b.toLong, nds(b), fills(b)))
      }
      .toDF("shard", "bin_id", "n_docs", "n_tokens")
      .fenced() // bins feed both the report rows and the eff rollup
    val eff = packed.groupBy(col("shard"))
      .agg((sum(col("n_tokens")).cast("double") /
        (count(lit(1)) * lit(SeqBudget.toDouble))).as("sheff"))
    packed.join(eff, "shard")
      .select(col("shard"), col("bin_id"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / lit(SeqBudget.toDouble), 4)
          .as("fill_pct"),
        round(col("sheff"), 4).as("shard_eff"))
      .orderBy(col("shard"), col("bin_id"))
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word 3-gram with the held-out set (source `src0`), with the
    * overlap count. The join key is the 60-bit portable shingle
    * digest, so exchanges carry longs, never shingle strings; the
    * benchmark side (distinct shingle hashes of the eval set — small
    * by construction) broadcasts. This is the n-gram-overlap
    * decontamination pass of public LLM data recipes (e.g. GPT-3
    * appendix C / the Pile): candidate generation is an equi-join,
    * never a scan of train×bench. */
  private val qDecontaminate = Q("q_decontaminate",
    """WITH ws AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
      |        FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source,
      |         unnest(CASE WHEN len(w) >= 3
      |                THEN list_transform(generate_series(1, len(w) - 2),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
      |                ELSE [] END) AS sh
      |       FROM ws),
      |bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      |FROM sh t JOIN bench b ON t.sh = b.sh
      |WHERE t.source <> 'src0'
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, d) =>
    val sh = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        explode(GraftExpressions.shingles(lower(col("text")), 3, dedup = true))
          .as("sh"))
      .select(col("doc_id"), col("source"), PortableHash.md5Long(col("sh")).as("h"))
    val bench = sh.where(col("source") === "src0").select(col("h")).distinct()
    // shingles are per-doc distinct and bench is distinct, so each
    // shared shingle joins exactly once: count(*) == distinct overlap
    sh.where(col("source") =!= "src0")
      .join(broadcast(bench), "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** Stratified (per-language) deterministic sampling: each language
    * keeps a configured fraction, decided by a portable hash of the
    * doc id — reproducible across engines and runs, no RNG state, and
    * embarrassingly parallel (pure filter, zero shuffles before the
    * presentation sort). The per-stratum rates model down-sampling
    * over-represented languages in a corpus mix. */
  private val qSampleStratified = Q("q_sample_stratified",
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${PortableHash.md5LongSql("CAST(doc_id AS VARCHAR)")} % 1000 <
       |  CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 500
       |            WHEN 'zh' THEN 400 ELSE 1000 END
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val h = PortableHash.md5Long(col("doc_id").cast("string")) % 1000
    val rate = when(col("lang") === "en", 200)
      .when(col("lang") === "de", 500)
      .when(col("lang") === "zh", 400)
      .otherwise(1000)
    t(s, d, "documents")
      .where(h < rate)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Mixture re-weighting: integer up-sampling of under-represented
    * sources (the epoch-multiplier mixing of public LLM recipes —
    * e.g. repeating curated sources 2–3× per epoch). The explode is
    * `sequence(1, wt)` — rows multiply at most ×3, no shuffle until
    * the per-source rollup. Output compares pre/post document and
    * token mass per source. */
  private val qMixtureUpsample = Q("q_mixture_upsample",
    """WITH w AS (SELECT source,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS toks,
      |    CASE WHEN source IN ('src0','src1','src2') THEN 3
      |         WHEN source IN ('src3','src4') THEN 2 ELSE 1 END AS wt
      |  FROM documents),
      |b AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_in
      |      FROM w GROUP BY source),
      |e AS (SELECT source, toks FROM w, unnest(generate_series(1, wt))),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_out,
      |        CAST(sum(toks) AS BIGINT) AS tokens_out
      |      FROM e GROUP BY source)
      |SELECT b.source, b.docs_in, a.docs_out, a.tokens_out
      |FROM b JOIN a ON b.source = a.source ORDER BY b.source""".stripMargin) { (s, d) =>
    val base = t(s, d, "documents").select(col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"),
      when(col("source").isin("src0", "src1", "src2"), 3)
        .when(col("source").isin("src3", "src4"), 2)
        .otherwise(1).as("wt"))
    val before = base.groupBy(col("source")).agg(count(lit(1)).as("docs_in"))
    val after = base
      .select(col("source"), col("toks"),
        explode(sequence(lit(1), col("wt"))).as("copy_n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_out"), sum(col("toks")).as("tokens_out"))
    before.join(after, "source").orderBy(col("source"))
  }

  /** Incremental (cross-snapshot) dedup: documents of the NEW crawl
    * batch (sources src10+) that do not duplicate the PRIOR corpus
    * (src0–src9), by whitespace-normalized md5 fingerprint. The
    * anti-join carries 16-byte hashes only — at 100 TB the prior
    * corpus side is a fingerprint manifest, not the texts, and the
    * join is a hash equi-join (broadcastable when the manifest of the
    * prior snapshot fits, shuffled otherwise). The manifest travels
    * the REAL deployment path: written to the parquet store and read
    * back ([[graft.operators.DedupManifest.persist]]) before the
    * anti-join probes it — the persist-once-probe-per-ingest loop,
    * same stance as the CC/embed incremental queries. */
  private val qDedupIncremental = Q("q_dedup_incremental",
    """WITH f AS (SELECT doc_id, source,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents),
      |prior AS (SELECT DISTINCT fp FROM f
      |          WHERE regexp_matches(source, '^src[0-9]$'))
      |SELECT doc_id, source FROM f
      |WHERE NOT regexp_matches(source, '^src[0-9]$')
      |  AND NOT EXISTS (SELECT 1 FROM prior p WHERE p.fp = f.fp)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val f = t(s, d, "documents").select(col("doc_id"), col("source"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
    val prior = graft.operators.DedupManifest.persist(
      f.where(col("source").rlike("^src[0-9]$")).select(col("fp")).distinct(),
      graft.operators.DedupManifest.path(s, "fp", d))
    f.where(!col("source").rlike("^src[0-9]$"))
      .join(broadcast(prior), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-pruned incremental dedup — identical semantics (and
    * oracle) to [[qDedupIncremental]], but the physical strategy for
    * the regime where the prior snapshot's fingerprint manifest does
    * NOT fit a broadcast hash table. A Bloom filter of the prior
    * fingerprints is compact enough to broadcast at any corpus size
    * (~1.2 GB for 10⁹ keys at 1 % fpp vs ≳ 40 GB for the hash
    * manifest itself), and it has NO false negatives — so a negative
    * probe proves the document is new and it bypasses the join
    * entirely. Only bloom-positive documents (true duplicates plus
    * the fpp sliver) reach the exact fingerprint anti-join, so the
    * shuffle carries candidates, not the corpus. This is the manual
    * form of the bloom-pruned join Spark's own
    * `InjectRuntimeFilter` builds for large shuffle joins, composed
    * from the same native expressions (`BloomFilterAggregate` build
    * over xxhash64, codegen `BloomFilterMightContain` probe — no
    * UDF in the hot path); the sketch itself is one tiny agg row
    * collected to the driver, exactly like a runtime-filter
    * subquery result. Correct by construction regardless of fpp,
    * hence the unchanged exact oracle. */
  private val qDedupBloom = Q("q_dedup_bloom",
    """WITH f AS (SELECT doc_id, source,
      |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
      |  FROM documents),
      |prior AS (SELECT DISTINCT fp FROM f
      |          WHERE regexp_matches(source, '^src[0-9]$'))
      |SELECT doc_id, source FROM f
      |WHERE NOT regexp_matches(source, '^src[0-9]$')
      |  AND NOT EXISTS (SELECT 1 FROM prior p WHERE p.fp = f.fp)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.types.BinaryType
    val f = t(s, d, "documents").select(col("doc_id"), col("source"),
      md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
    // fence the prior fingerprints: three consumers below (count,
    // bloom build, exact verify) would otherwise each rescan the
    // corpus and recompute the md5 normalization
    val prior = f.where(col("source").rlike("^src[0-9]$")).select(col("fp"))
      .fenced()
    // size the bloom from the build side (as InjectRuntimeFilter does
    // from build-side stats): a fixed estimate would saturate on a
    // larger prior manifest and silently stop pruning — still correct,
    // but the whole corpus would flow into the anti-join. NOTE the
    // constructor clamps the estimate at
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems (default
    // 4M); a deployment with a larger manifest raises that conf (and
    // maxNumBits) or the saturation returns above the clamp.
    val nPrior = math.max(prior.count(), 1L)
    val bloomAgg = bridge.column(
      new BloomFilterAggregate(bridge.expression(xxhash64(col("fp"))), nPrior)
        .toAggregateExpression())
    val bloomBytes = prior.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    def mightContain(c: org.apache.spark.sql.Column) = bridge.column(
      new BloomFilterMightContain(Literal.create(bloomBytes, BinaryType),
        new XxHash64(Seq(bridge.expression(c)))))
    val fresh = f.where(!col("source").rlike("^src[0-9]$"))
    if (bloomBytes == null) {
      // empty prior snapshot: nothing to dedup against
      fresh.select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    } else {
      // bloom-negative ⇒ provably absent from prior: no join needed
      val definite = fresh.where(!mightContain(col("fp")))
      // bloom-positive ⇒ candidate: exact anti-join on the sliver only
      val verified = fresh.where(mightContain(col("fp")))
        .join(prior.distinct(), Seq("fp"), "left_anti")
      definite.select(col("doc_id"), col("source"))
        .union(verified.select(col("doc_id"), col("source")))
        .orderBy(col("doc_id"))
    }
  }

  /** Per-source token budget for the selection mix (referenced by
    * PipelineSpec so the spec tracks tuning). */
  private[graft] val TokenBudget = 800L

  /** Token-budget corpus selection: per source, documents are ranked
    * by token count (quality proxy) and admitted while the source's
    * RUNNING token total stays within the budget — the "take the best
    * N tokens per source" cut every mixture recipe ends with.
    *
    * Scale shape: the oracle's declarative form is a running
    * `sum() OVER (PARTITION BY source ...)` across the whole corpus —
    * a low-cardinality-key window that funnels 100 TB through a
    * handful of partitions. The engine instead derives each source's
    * admission threshold from the (source, toks) HISTOGRAM (corpus
    * scan → tiny agg; the running sum runs over histogram buckets,
    * not documents), broadcasts the per-source threshold bucket, and
    * admits documents with a pure filter: strictly-above-threshold
    * docs are in by budget arithmetic, and only the docs AT the
    * threshold bucket (same token count) pass through a window —
    * partitioned per source over the tie group alone. Sources whose
    * total mass fits the budget have no crossing bucket and are kept
    * whole via the left join's null arm. Same exact output, no
    * corpus-wide window. */
  private val qTokenBudget = Q("q_token_budget",
    s"""WITH tok AS (SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (SELECT doc_id, source, toks,
       |    sum(toks) OVER (PARTITION BY source ORDER BY toks DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM tok)
       |SELECT doc_id, source, toks FROM c WHERE cum <= $TokenBudget
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tok = t(s, d, "documents").select(col("doc_id"), col("source"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    // (source, toks) histogram — the running sum below is over THIS
    val wDesc = Window.partitionBy(col("source")).orderBy(col("toks").desc)
    val th = tok.groupBy(col("source"), col("toks"))
      .agg(sum(col("toks")).as("mass"))
      .withColumn("cum", sum(col("mass")).over(wDesc))
      .where(col("cum") > TokenBudget && col("cum") - col("mass") <= TokenBudget)
      .select(col("source"), col("toks").as("t_toks"),
        // docs at the threshold bucket share `toks`, so the admitted
        // count is exact integer division of the remaining budget
        floor((lit(TokenBudget) - (col("cum") - col("mass"))) / col("toks"))
          .as("take"))
    val j = tok.join(broadcast(th), Seq("source"), "left_outer")
    val keepAbove = j.where(col("t_toks").isNull || col("toks") > col("t_toks"))
    // boundary ties: only threshold-bucket docs reach this window
    val wTie = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val keepTies = j.where(col("toks") === col("t_toks"))
      .withColumn("tie_rn", row_number().over(wTie))
      .where(col("tie_rn") <= col("take"))
    keepAbove.select(col("doc_id"), col("source"), col("toks"))
      .union(keepTies.select(col("doc_id"), col("source"), col("toks")))
      .orderBy(col("doc_id"))
  }

  /** Weighted sample size per language. */
  private val WSampleK = 20

  /** Weighted sampling without replacement, k docs per language with
    * inclusion probability ∝ token mass — the weighted draw behind
    * "sample the mixture by token share, not by document count".
    * Algorithm A-ES (Efraimidis & Spirakis, IPL 2006): each item gets
    * priority u^(1/w) for uniform u, and the top-k by priority is the
    * weighted sample. The uniform comes from the portable md5 digest
    * of the doc id — not an RNG — so the draw is reproducible across
    * runs, partitionings, AND engines (the same "seeded sampling"
    * stance as `q_sample_hash`, which this generalizes to weights).
    * Ordering uses ln(u)/w (same order as u^(1/w), one transcendental
    * instead of pow). ln is not IEEE-correctly-rounded, so the JVM
    * and DuckDB libm may differ by an ulp and flip a near-tie: ln(u)
    * is ROUNDED to 9 decimals BEFORE the division (the division
    * itself is correctly rounded over identical operands, so it adds
    * no cross-engine freedom) — rounding the quotient instead would
    * quantize priorities to a fixed 1e-9 grid and collapse long
    * documents (|pri| ~ 1/toks) into doc_id-ordered ties exactly
    * where weights matter most. Same pinning discipline as the other
    * log-based orderings (q_text_pmi/keyness/bm25). Scale shape: the
    * rn ≤ k filter plans as a
    * WindowGroupLimit shortlist — every upstream partition trims to
    * its own top-k per language BEFORE the low-cardinality `lang`
    * exchange, so the skewed key receives ≤ k × partitions rows. */
  private val qSampleWeighted = Q("q_sample_weighted",
    s"""WITH tok AS (SELECT doc_id, lang,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS toks
       |  FROM documents),
       |k AS (SELECT doc_id, lang, toks,
       |    round(ln((${PortableHash.md5LongSql("CAST(doc_id AS VARCHAR)")} % 1000000000
       |        + 1) / 1000000001.0), 9) / toks AS pri
       |  FROM tok),
       |r AS (SELECT doc_id, lang, toks,
       |    row_number() OVER (PARTITION BY lang ORDER BY pri DESC, doc_id) AS rn
       |  FROM k)
       |SELECT lang, doc_id, toks, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= $WSampleK ORDER BY lang, rn""".stripMargin) { (s, d) =>
    val u = (PortableHash.md5Long(col("doc_id").cast("string")) % 1000000000L
      + 1) / lit(1000000001.0)
    val w = Window.partitionBy(col("lang")).orderBy(col("pri").desc, col("doc_id"))
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"))
      .withColumn("pri", round(log(u), 9) / col("toks"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= WSampleK)
      .select(col("lang"), col("doc_id"), col("toks"), col("rn").cast("int").as("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Per-language quality quantile filter: keep each language's top
    * half by token count (proxy quality score), EXACTLY — the
    * "keep the top X% per stratum" pass of quality-driven corpus
    * pruning.
    *
    * Scale shape: a naive `row_number() OVER (PARTITION BY lang ORDER
    * BY score)` windows the ENTIRE corpus by a handful of language
    * keys — low-cardinality skew at 100 TB. Instead the quantile
    * threshold is derived from the (lang, score) HISTOGRAM (corpus-
    * scan → tiny agg), and the doc-level pass is a broadcast-join
    * filter; only the boundary ties (docs exactly AT the threshold
    * score) go through a window, and that window's input is the tie
    * group alone. Same exact output as the oracle's declarative
    * row_number form, no full-corpus window. */
  private val qQualityQuantile = Q("q_quality_quantile",
    """WITH tok AS (SELECT doc_id, lang,
      |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS toks
      |  FROM documents),
      |r AS (SELECT doc_id, lang, toks,
      |    row_number() OVER (PARTITION BY lang ORDER BY toks DESC, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM tok)
      |SELECT doc_id, lang, toks FROM r
      |WHERE rn <= CAST(ceil(n / 2.0) AS BIGINT)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val tok = t(s, d, "documents").select(col("doc_id"), col("lang"),
      size(split(col("text"), "\\s+")).cast("long").as("toks"))
    // (lang, toks) histogram: |langs| × |distinct scores| rows — the
    // windows below run over THIS, not the corpus.
    val wDesc = Window.partitionBy(col("lang")).orderBy(col("toks").desc)
    // per-lang total via an unbounded frame over the SAME spec as the
    // running sum — one WindowExec / one sort (round 15)
    val th = tok.groupBy(col("lang"), col("toks")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wDesc))
      .withColumn("q", ceil(sum(col("cnt")).over(wDesc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
        / lit(2.0)).cast("long"))
      .where(col("cum") >= col("q") && col("cum") - col("cnt") < col("q"))
      .select(col("lang"), col("toks").as("t_toks"),
        (col("q") - (col("cum") - col("cnt"))).as("take"))
    val keepAbove = tok.join(broadcast(th), Seq("lang"))
      .where(col("toks") > col("t_toks"))
    // boundary ties: only docs at exactly the threshold score reach
    // this window — per-lang tie groups, not the corpus
    val wTie = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val keepTies = tok.join(broadcast(th), Seq("lang"))
      .where(col("toks") === col("t_toks"))
      .withColumn("tie_rn", row_number().over(wTie))
      .where(col("tie_rn") <= col("take"))
    keepAbove.select(col("doc_id"), col("lang"), col("toks"))
      .union(keepTies.select(col("doc_id"), col("lang"), col("toks")))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its tokens are under a
    * TARGET domain's unigram LM than under the full-corpus proposal
    * LM, then keep the top-k. Here the target is the `src0` slice;
    * both LMs are Laplace-smoothed over the shared vocabulary.
    *
    * Per-token log importance ratio
    *   ln((ct+1)/(Nt+V)) − ln((cp+1)/(Np+V))
    * is rounded to 6 dp into DECIMAL(18,6) before the per-doc mean,
    * so the aggregation is exact and order-free; ranking is by the
    * 4-dp-rounded mean with doc_id tiebreak.
    *
    * Scale shape (100 TB): both count tables are vocabulary-sized
    * map-side-combined aggs that join back as broadcasts; corpus
    * totals are one broadcast scalar row; scoring is a single token-
    * level scan + per-doc agg (one exchange of (doc_id, decimal));
    * top-k is TakeOrdered. The hashed-feature variant DSIR uses for
    * an unbounded vocab swaps the join key for
    * `PortableHash.md5Long(w) % buckets` — nothing else changes. */
  private val qSampleImportance = Q("q_sample_importance",
    """WITH tok AS (SELECT doc_id, source,
      |               unnest(string_split(lower(text), ' ')) AS w
      |             FROM documents),
      |tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS ct
      |        FROM tok WHERE source = 'src0' GROUP BY w),
      |prop AS (SELECT w, CAST(count(*) AS BIGINT) AS cp
      |         FROM tok GROUP BY w),
      |tots AS (SELECT
      |    (SELECT CAST(count(*) AS BIGINT) FROM tok WHERE source = 'src0') AS nt,
      |    (SELECT CAST(count(*) AS BIGINT) FROM tok) AS np,
      |    (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM tok) AS v),
      |scored AS (
      |  SELECT t.doc_id, t.source,
      |    CAST(round(
      |      ln(CAST(COALESCE(g.ct, 0) + 1 AS DOUBLE) / CAST(tots.nt + tots.v AS DOUBLE))
      |      - ln(CAST(p.cp + 1 AS DOUBLE) / CAST(tots.np + tots.v AS DOUBLE)), 6)
      |    AS DECIMAL(18,6)) AS lr
      |  FROM tok t
      |  LEFT JOIN tgt g ON t.w = g.w
      |  JOIN prop p ON t.w = p.w
      |  CROSS JOIN tots)
      |SELECT doc_id, source, CAST(count(*) AS INT) AS n_tokens,
      |  round(CAST(sum(lr) AS DOUBLE) / count(*), 4) AS score
      |FROM scored GROUP BY doc_id, source
      |ORDER BY score DESC, doc_id LIMIT 500""".stripMargin) { (s, d) =>
    // `tok` is deliberately NOT checkpointed: materializing the
    // exploded corpus×tokens frame to executor disk is ~10× the corpus
    // at 100 TB (and was measured competing with shuffle dirs for
    // local disk in the full bench). The things worth fencing are the
    // two VOCABULARY-sized count tables — each a map-side-combined agg
    // over one re-derived token scan — and the 1-row totals, which
    // fold out of `prop`/`tgt` rather than costing a third corpus
    // pass. Net: 3 cheap scans of the raw documents, zero
    // corpus-scale materialization.
    def tok = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
    val tgt = tok.where(col("source") === "src0")
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("ct"))
      .fenced()
    val prop = tok.groupBy(col("w")).agg(count(lit(1)).cast("long").as("cp"))
      .fenced()
    // totals from the vocab tables: nt = Σct, np = Σcp, v = |prop| —
    // identical values to aggregating the token stream directly
    val tots = tgt.agg(coalesce(sum(col("ct")), lit(0L)).cast("long").as("nt"))
      .crossJoin(prop.agg(coalesce(sum(col("cp")), lit(0L)).cast("long").as("np"),
        count(lit(1)).cast("long").as("v")))
      .fenced()
    val lr = round(
      log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
        / (col("nt") + col("v")).cast("double"))
        - log((col("cp") + 1).cast("double")
          / (col("np") + col("v")).cast("double")), 6).cast("decimal(18,6)")
    tok.join(broadcast(tgt), Seq("w"), "left_outer")
      .join(broadcast(prop), Seq("w"))
      .crossJoin(broadcast(tots))
      .select(col("doc_id"), col("source"), lr.as("lr"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("lr")).as("slr"))
      .select(col("doc_id"), col("source"), col("cnt").cast("int").as("n_tokens"),
        round(col("slr").cast("double") / col("cnt"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(500)
  }

  /** Temperature-based mixture sampling (the multilingual-training
    * α-smoothing, α = 0.5): each source keeps documents at rate
    * (n_source / n_largest)^α, flattening the size distribution
    * toward the small sources. The keep decision is a deterministic
    * hash thin — md5-derived uniform vs ⌊rate·10⁹⌋ — so both engines
    * select the IDENTICAL document set (no RNG anywhere). √ of a
    * ratio of exact BIGINTs and the floor are IEEE-deterministic.
    *
    * Scale shape: source counts are a tiny broadcast; the keep filter
    * is a stateless codegen'd predicate on the scan (no shuffle at
    * all for the selection itself — the only exchange is the final
    * per-source audit agg). */
  private val qMixtureTemperature = Q("q_mixture_temperature",
    s"""WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       |            FROM documents GROUP BY source),
       |mx AS (SELECT max(n) AS m FROM cnt),
       |thr AS (SELECT c.source, c.n,
       |          CAST(floor(sqrt(CAST(c.n AS DOUBLE) / CAST(mx.m AS DOUBLE))
       |                     * 1000000000) AS BIGINT) AS cut
       |        FROM cnt c CROSS JOIN mx),
       |kept AS (
       |  SELECT d.source, count(*) AS k
       |  FROM documents d JOIN thr ON d.source = thr.source
       |  WHERE ${PortableHash.md5LongSql("CAST(d.doc_id AS VARCHAR)")}
       |        % 1000000000 < thr.cut
       |  GROUP BY d.source)
       |SELECT t.source, t.n AS n_orig,
       |  CAST(COALESCE(k.k, 0) AS BIGINT) AS n_kept,
       |  CAST(t.cut AS DOUBLE) / 1e9 AS rate
       |FROM thr t LEFT JOIN kept k ON t.source = k.source
       |ORDER BY t.source""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    val cnt = docs.groupBy(col("source")).agg(count(lit(1)).cast("long").as("n"))
    val mx = cnt.agg(max(col("n")).as("m"))
    val thr = cnt.crossJoin(broadcast(mx))
      .select(col("source"), col("n"),
        floor(sqrt(col("n").cast("double") / col("m").cast("double"))
          * 1000000000L).cast("long").as("cut"))
    val kept = docs.join(broadcast(thr.select(col("source"), col("cut"))), "source")
      .where(PortableHash.md5Long(col("doc_id").cast("string"))
        % 1000000000L < col("cut"))
      .groupBy(col("source")).agg(count(lit(1)).as("k"))
    thr.join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("n").as("n_orig"),
        coalesce(col("k"), lit(0L)).cast("long").as("n_kept"),
        (col("cut").cast("double") / lit(1e9)).as("rate"))
      .orderBy(col("source"))
  }

  /** DoReMi-style domain reweighting (Xie et al., NeurIPS 2023 —
    * "Doremi: optimizing data mixtures speeds up language model
    * pretraining"), the one-shot closed form: full DoReMi runs
    * exponentiated-gradient ascent on domain weights against a
    * proxy model's per-domain EXCESS LOSS; with a STATIC excess
    * signal the T-step EG update w ∝ u·exp(η·Σ excess) collapses to
    * a single softmax over the excess vector, smoothed toward
    * uniform — α_d = (1−s)·softmax(excess)_d + s/k (the paper's
    * smoothing, s = 0.1, η folded into the static signal). The
    * excess proxy here is the learned quality filter's per-domain
    * margin deficit (max domain score − domain score, so the
    * HARDEST domains upweight — DoReMi's core move), computed from
    * exact integer margin/token sums so the double division is
    * bit-identical on both engines.
    *
    * Determinism: domain scores are one double division from exact
    * BIGINT sums; exp(excess) is quantized to the 12-decimal grid
    * and summed as DECIMAL(38,12) (order-free — the k-row softmax
    * denominator cannot drift with partitioning); the reported
    * weight rounds at 6 dp.
    *
    * Scale shape (100 TB): ONE corpus-scale exchange — the per-doc
    * margin aggregation is a stateless scan and the domain collapse
    * is map-side combined to |domains| rows; everything after
    * (window max, softmax, smoothing) is domain-cardinality
    * arithmetic, the KMeans-centroid scale class. */
  /** The per-domain statistic DoReMi consumes — exact BIGINT sums
    * over the shared logreg marks. As a STREAMING aggregation
    * (complete mode) its state is |domains| rows; shared by the ○
    * batch query and [[graft.streaming.StreamingDoremi]] so the two
    * cannot drift. */
  private[graft] def doremiDomainStats(marked: DataFrame): DataFrame =
    marked.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("margin_num")).cast("long").as("s_margin"),
        sum(col("n_tok")).cast("long").as("s_tok"))

  /** The domain-cardinality DoReMi math (excess → grid-quantized
    * softmax → uniform smoothing) over accumulated
    * (lang, n_docs, s_margin, s_tok) stats — the SHARED sweep tail
    * (the StreamingQualityEval split: mark at arrival, sweep with
    * the batch function). */
  private[graft] def doremiTail(dom: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // unpartitioned windows are safe HERE: they run over the
    // |domains|-row aggregate, never the corpus (the rank-scan
    // |languages| stance)
    val w = Window.partitionBy()
    val score = col("s_margin").cast("double") /
      (col("s_tok").cast("double") * lit(1024.0))
    dom.select(col("lang"), col("n_docs"),
        (max(score).over(w) - score).as("excess"))
      .select(col("lang"), col("n_docs"), col("excess"),
        round(exp(col("excess")), 12).cast("decimal(38,12)").as("w"))
      .select(col("lang"), col("n_docs"),
        round(col("excess"), 6).as("excess"),
        round(lit(0.9) * (col("w").cast("double") /
            sum(col("w")).over(w).cast("double")) +
          lit(0.1) / count(lit(1)).over(w), 6).as("weight"))
      .orderBy(col("lang"))
  }

  private val qMixtureDoremi = Q("q_mixture_doremi",
    """WITH tk AS (
      |  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, lang,
      |    CAST(sum((('0x'||substr(md5(w),1,15))::BIGINT % 256) * 2654435761 % 1024 - 512) AS BIGINT) AS margin_num,
      |    CAST(count(*) AS BIGINT) AS n_tok
      |  FROM tk GROUP BY doc_id, lang),
      |dom AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(margin_num) AS BIGINT) AS s_margin,
      |    CAST(sum(n_tok) AS BIGINT) AS s_tok
      |  FROM m GROUP BY lang),
      |sc AS (SELECT lang, n_docs,
      |         CAST(s_margin AS DOUBLE) / (CAST(s_tok AS DOUBLE) * 1024.0)
      |           AS score
      |       FROM dom),
      |ex AS (SELECT lang, n_docs, max(score) OVER () - score AS excess
      |       FROM sc),
      |wr AS (SELECT lang, n_docs, excess,
      |         CAST(round(exp(excess), 12) AS DECIMAL(38,12)) AS w
      |       FROM ex)
      |SELECT lang, n_docs, round(excess, 6) AS excess,
      |  round(0.9 * (CAST(w AS DOUBLE) / CAST(sum(w) OVER () AS DOUBLE))
      |        + 0.1 / count(*) OVER (), 6) AS weight
      |FROM wr ORDER BY lang""".stripMargin) { (s, d) =>
    doremiTail(doremiDomainStats(TextQueries.logregScore(t(s, d, "documents"))))
  }

  /** Deterministic train/val/test assignment (98/1/1) with a per-
    * source audit — the split every training build makes exactly once
    * and must be able to REPRODUCE forever after: membership is a
    * pure function of the document id (md5-derived bucket 0–99), so
    * re-running on a grown corpus never reassigns an old document,
    * adding a column/engine never moves the boundary, and the
    * val/test sets stay leakage-stable across snapshots (the property
    * that makes hash-splits the standard over random splits).
    *
    * Scale shape: the assignment is a stateless codegen'd expression
    * on the scan — zero shuffles for the split itself; only the audit
    * aggregates (source × split counts and token mass) exchange, and
    * those are map-side combined to |sources|·3 rows. */
  private val qSplitTrain = Q("q_split_train",
    s"""WITH tagged AS (
       |  SELECT source, n_chars,
       |    CASE ${PortableHash.md5LongSql("CAST(doc_id AS VARCHAR)")} % 100
       |      WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split
       |  FROM documents)
       |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars
       |FROM tagged GROUP BY source, split
       |ORDER BY source, split""".stripMargin) { (s, d) =>
    val bucket = PortableHash.md5Long(col("doc_id").cast("string")) % 100
    t(s, d, "documents")
      .select(col("source"), col("n_chars"),
        when(bucket === 0, "val").when(bucket === 1, "test")
          .otherwise("train").as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).cast("long").as("chars"))
      .orderBy(col("source"), col("split"))
  }

  /** Distribution-drift detection: the two-sample Kolmogorov–Smirnov
    * statistic between the focus source's length distribution and the
    * rest of the corpus — the monitoring gate a pipeline runs between
    * snapshots (did this source's documents change shape?).
    *
    * EXACT arithmetic throughout: with group sizes n_a, n_b and
    * cumulative counts ca(x), cb(x), the sup-gap maximization runs
    * over the INTEGER numerators |ca·n_b − cb·n_a| (max of exact
    * BIGINTs — no float compare anywhere); D itself is one double
    * division of the winning numerator at the very end. The oracle
    * hash-matches bit-for-bit. Domain bound: the BIGINT numerator is
    * exact only while n_a·n_b < 2^63 (~3e9 rows on EACH side); beyond
    * that Spark's Long wraps silently while DuckDB errors — the
    * streaming twin ([[graft.streaming.StreamingKsGate]]) computes
    * the gap in BigInt and fails loudly at that bound instead.
    *
    * Scale shape (100 TB): per-value counts are one map-side-combined
    * groupBy; BOTH cumulative distributions come from
    * [[graft.operators.PrefixSum.cumsum]] — the two-phase range scan,
    * never a single-task global ORDER BY window; group totals join in
    * as a broadcast scalar; the sup is a plain max aggregate. */
  private val qQualityKs = Q("q_quality_ks",
    """WITH a AS (SELECT n_chars AS x FROM documents WHERE source = 'src0'),
      |b AS (SELECT n_chars AS x FROM documents WHERE source <> 'src0'),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM a),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
      |vals AS (SELECT DISTINCT x FROM (SELECT x FROM a UNION ALL SELECT x FROM b) u),
      |cdf AS (
      |  SELECT v.x,
      |    CAST((SELECT count(*) FROM a WHERE a.x <= v.x) AS BIGINT) AS ca,
      |    CAST((SELECT count(*) FROM b WHERE b.x <= v.x) AS BIGINT) AS cb
      |  FROM vals v),
      |gaps AS (SELECT x,
      |           abs(ca * (SELECT n FROM nb) - cb * (SELECT n FROM na)) AS g
      |         FROM cdf)
      |SELECT (SELECT n FROM na) AS n_a, (SELECT n FROM nb) AS n_b,
      |  CAST(max(g) AS BIGINT) AS d_num,
      |  round(CAST(max(g) AS DOUBLE)
      |        / ((SELECT n FROM na) * (SELECT n FROM nb)), 6) AS ks_d
      |FROM gaps""".stripMargin) { (s, d) =>
    val focus = col("source") === "src0"
    val tagged = t(s, d, "documents").select(
      col("n_chars").cast("long").as("x"),
      when(focus, 1L).otherwise(0L).as("ia"),
      when(focus, 0L).otherwise(1L).as("ib"))
    val per = tagged.groupBy(col("x"))
      .agg(sum(col("ia")).as("cnt_a"), sum(col("ib")).as("cnt_b"))
    val withCa = PrefixSum.cumsum(per, "x", "cnt_a", 8, "ca")
    val withCb = PrefixSum.cumsum(withCa, "x", "cnt_b", 8, "cb")
    val tot = tagged.agg(sum(col("ia")).cast("long").as("n_a"),
      sum(col("ib")).cast("long").as("n_b"))
    withCb.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("ca") * col("n_b") - col("cb") * col("n_a")).as("g"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("g")).cast("long").as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") / (col("n_a") * col("n_b")), 6)
          .as("ks_d"))
  }

  /** PSI bin width over the n_chars feature. */
  private val PsiBin = 64L

  /** POPULATION STABILITY INDEX between the prior corpus (src0–src9)
    * and the new crawl batch (src10+), over binned document length —
    * the standard production drift score next to [[qQualityKs]]'s
    * two-sample KS: where KS answers "are these the same
    * distribution?" with a single sup-gap, PSI decomposes the drift
    * per bin ((p−q)·ln(p/q), summable, the score ML monitoring alerts
    * on at 0.1/0.25 thresholds), so the report says WHERE the mass
    * moved. Laplace smoothing (+1 per bin over n+B) keeps empty bins
    * finite on both engines.
    *
    * Determinism: bin counts are exact integers (width-[[PsiBin]]
    * integer division of n_chars); p and q divide identical longs as
    * doubles, the ln runs over the identical quotient, and each term
    * rounds to 6 dp — the [[TextQueries]] log-family discipline (pmi,
    * keyness). The overall PSI (`psi_total`, identical on every row)
    * is the EXACT DECIMAL SUM of the 6 dp terms — order-free, so both
    * engines agree bit-for-bit without any float-sum order
    * dependence, and the scalar equals
    * [[graft.streaming.StreamingPsiGate]]'s verdict from the same
    * counts by construction (the r13 stretch: both surfaces now
    * expose the alert-ready number, not just the decomposition).
    *
    * Scale shape: one partial-aggregable groupBy on the bin key (the
    * exchange carries ≤ |bins| rows per upstream partition), a 1-row
    * totals frame broadcast back — nothing corpus-scaled past the
    * scan. */
  private val qQualityPsi = Q("q_quality_psi",
    s"""WITH b AS (
       |  SELECT n_chars // $PsiBin AS bin,
       |    CASE WHEN regexp_matches(source, '^src[0-9]$$') THEN 1 ELSE 0 END AS ia,
       |    CASE WHEN regexp_matches(source, '^src[0-9]$$') THEN 0 ELSE 1 END AS ib
       |  FROM documents),
       |c AS (SELECT bin, CAST(sum(ia) AS BIGINT) AS ca,
       |        CAST(sum(ib) AS BIGINT) AS cb
       |      FROM b GROUP BY bin),
       |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
       |        CAST(count(*) AS BIGINT) AS nbins FROM c),
       |terms AS (
       |  SELECT c.bin, c.ca AS cnt_prior, c.cb AS cnt_cur,
       |    round(((c.ca + 1.0) / (t.na + t.nbins) - (c.cb + 1.0) / (t.nb + t.nbins))
       |      * ln(((c.ca + 1.0) / (t.na + t.nbins))
       |            / ((c.cb + 1.0) / (t.nb + t.nbins))), 6) AS psi_term
       |  FROM c CROSS JOIN t),
       |tt AS (SELECT CAST(sum(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE)
       |         AS psi_total FROM terms)
       |SELECT terms.bin, terms.cnt_prior, terms.cnt_cur, terms.psi_term,
       |  tt.psi_total
       |FROM terms CROSS JOIN tt ORDER BY bin""".stripMargin) { (s, d) =>
    val prior = col("source").rlike("^src[0-9]$")
    val b = t(s, d, "documents").select(
      (col("n_chars").cast("long") / PsiBin).cast("long").as("bin"),
      when(prior, 1L).otherwise(0L).as("ia"),
      when(prior, 0L).otherwise(1L).as("ib"))
    val c = b.groupBy(col("bin"))
      .agg(sum(col("ia")).cast("long").as("ca"), sum(col("ib")).cast("long").as("cb"))
      .fenced() // totals + per-bin terms both read it
    val tot = c.agg(sum(col("ca")).cast("long").as("na"),
      sum(col("cb")).cast("long").as("nb"), count(lit(1)).cast("long").as("nbins"))
    val p = (col("ca") + 1.0) / (col("na") + col("nbins"))
    val q = (col("cb") + 1.0) / (col("nb") + col("nbins"))
    val terms = c.crossJoin(broadcast(tot))
      .select(col("bin"), col("ca").as("cnt_prior"), col("cb").as("cnt_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
    // the alert scalar: exact decimal sum of the grid terms —
    // order-free, bins-scale, identical to StreamingPsiGate's verdict
    val total = terms.agg(
      sum(col("psi_term").cast("decimal(18,6)")).cast("double").as("psi_total"))
    terms.crossJoin(broadcast(total))
      .orderBy(col("bin"))
  }

  /** Chunk window/stride (chars): 25% overlap, the standard RAG
    * retrieval-chunking shape. */
  private[graft] val ChunkSize = 256
  private[graft] val ChunkStride = 192

  /** Shared chunk expansion, Spark side: one (doc_id, chunk_ix, chunk)
    * row per `size`-char chunk at `stride` offsets — a pure per-row
    * explode (no shuffle). The `greatest(…, 0)` guard pins
    * empty-document semantics to one empty chunk on BOTH engines
    * (Spark's `sequence(0, -1)` would otherwise DESCEND while
    * DuckDB's generate_series returns empty); every chunking query
    * goes through here / [[chunkCte]] so the boundary and guard
    * semantics cannot fork between them. */
  private[graft] def chunked(docs: DataFrame, stride: Int, size: Int): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          greatest(floor((length(col("text")) - 1) / stride).cast("int"),
            lit(0)))).as("k"))
      .select(col("doc_id"), col("k").cast("int").as("chunk_ix"),
        col("text").substr(col("k") * lit(stride) + 1, lit(size)).as("chunk"))

  /** DuckDB twin of [[chunked]], as CTE body text. */
  private def chunkCte(stride: Int, size: Int): String =
    s"""SELECT d.doc_id, CAST(t.k AS INT) AS chunk_ix,
       |    substr(d.text, CAST(t.k * $stride + 1 AS INT), $size) AS chunk
       |  FROM documents d,
       |    unnest(generate_series(0,
       |      greatest(CAST(floor((length(d.text) - 1) / $stride) AS INT), 0))) AS t(k)""".stripMargin

  /** Sliding-window document chunking — the retrieval/embedding
    * pre-pass every RAG corpus build runs: each document becomes
    * ⌈n/stride⌉ overlapping chunks with stable (doc_id, chunk_ix)
    * identity, so chunk embeddings and chunk-level dedup join back to
    * their source. Pure per-row expansion (explode over a computed
    * index sequence — no shuffle but the oracle sort); output size is
    * corpus chars × (size/stride) ≈ 1.33×. */
  private val qChunkDocs = Q("q_chunk_docs",
    s"""WITH ch AS (${chunkCte(ChunkStride, ChunkSize)})
       |SELECT doc_id, chunk_ix, chunk FROM ch
       |ORDER BY doc_id, chunk_ix""".stripMargin) { (s, d) =>
    chunked(t(s, d, "documents"), ChunkStride, ChunkSize)
      .orderBy(col("doc_id"), col("chunk_ix"))
  }

  /** The retrieval query set: (query id, term) — the literal,
    * bounded-by-construction side of retrieval scoring. */
  private[graft] val RagQueries = Seq(
    "qa" -> "spark", "qa" -> "table", "qa" -> "join",
    "qb" -> "hash", "qb" -> "merge", "qb" -> "sort",
    "qc" -> "stream", "qc" -> "window", "qc" -> "batch")
  private[graft] val RagTopK = 5

  /** Multi-query BM25 retrieval over the RAG chunks — the serving
    * shape of a retrieval corpus: for each query in a fixed query
    * set, the top-k chunks by BM25 (k₁ = 1.2, b = 0.75, BM25+ idf),
    * ranked per query with a (doc_id, chunk_ix) tiebreak. Differs
    * from q_text_bm25 in granularity (chunks, not documents) and in
    * shape (N queries ranked independently in one plan, the
    * batch-scoring form of a retrieval benchmark run).
    *
    * Determinism: the q_text_bm25 discipline — each term contribution
    * is the identical double expression tree on both engines, rounded
    * to 6 dp into DECIMAL(18,6) before the per-(query, chunk) sum, so
    * ranking compares exact decimals; only display rounds to 4.
    *
    * Scale shape (100 TB): chunk-term tf is the one corpus-sized
    * exchange (map-side combined); the query-term table (|Q|·terms
    * rows) and its df row per term are broadcast by construction;
    * chunk lengths join on the chunk key; corpus stats are a
    * broadcast scalar. Per-query top-k is a rank-filtered window over
    * |Q| partitions — Spark plans it as WindowGroupLimit, so every
    * task prunes to k rows per query BEFORE the single-partition-
    * per-query exchange; the full candidate list never ships.
    *
    * A query none of whose terms occurs in the corpus contributes no
    * output rows: its ranking is the empty set, not placeholder rows
    * (identical on both engines). */
  /** The BM25 CTE chain (ch → … → rk, every candidate ranked) —
    * shared by q_rag_retrieve (rnk ≤ RagTopK) and q_rag_rerank
    * (stage-1 candidates rnk ≤ RerankCand). NO stripMargin: embedded
    * in templates that strip once. */
  private def bm25Ctes: String =
    s"""ch AS (${chunkCte(ChunkStride, ChunkSize)}),
       |tk AS (SELECT doc_id, chunk_ix,
       |    unnest(string_split(lower(chunk), ' ')) AS term FROM ch),
       |tf AS (SELECT doc_id, chunk_ix, term, CAST(count(*) AS BIGINT) AS n
       |  FROM tk GROUP BY 1, 2, 3),
       |dl AS (SELECT doc_id, chunk_ix, CAST(sum(n) AS BIGINT) AS len
       |  FROM tf GROUP BY 1, 2),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
       |       CAST(sum(len) AS BIGINT) AS toklen FROM dl),
       |qt AS (SELECT * FROM (VALUES ${RagQueries
              .map { case (q, t) => s"('$q', '$t')" }.mkString(", ")})
       |       AS v(qid, term)),
       |qdf AS (SELECT t.term, CAST(count(*) AS BIGINT) AS dfreq
       |  FROM tf t JOIN (SELECT DISTINCT term FROM qt) q ON t.term = q.term
       |  GROUP BY 1),
       |contrib AS (SELECT q.qid, t.doc_id, t.chunk_ix,
       |    CAST(round(
       |      ln(1 + (CAST(st.nd - f.dfreq AS DOUBLE) + 0.5)
       |             / (CAST(f.dfreq AS DOUBLE) + 0.5))
       |      * (CAST(t.n AS DOUBLE) * 2.2)
       |      / (CAST(t.n AS DOUBLE)
       |         + 1.2 * (0.25 + 0.75 * (CAST(l.len * st.nd AS DOUBLE)
       |                                 / CAST(st.toklen AS DOUBLE)))), 6)
       |    AS DECIMAL(18,6)) AS c
       |  FROM tf t
       |  JOIN qt q ON t.term = q.term
       |  JOIN qdf f ON t.term = f.term
       |  JOIN dl l ON t.doc_id = l.doc_id AND t.chunk_ix = l.chunk_ix
       |  CROSS JOIN st),
       |sc AS (SELECT qid, doc_id, chunk_ix, sum(c) AS sc
       |  FROM contrib GROUP BY 1, 2, 3),
       |rk AS (SELECT qid, doc_id, chunk_ix, sc, row_number() OVER
       |    (PARTITION BY qid ORDER BY sc DESC, doc_id, chunk_ix) AS rnk
       |  FROM sc)"""

  private val qRagRetrieve = Q("q_rag_retrieve",
    s"""WITH $bm25Ctes
       |SELECT qid, CAST(rnk AS INT) AS rnk, doc_id, chunk_ix,
       |  round(CAST(sc AS DOUBLE), 4) AS score
       |FROM rk WHERE rnk <= $RagTopK ORDER BY qid, rnk""".stripMargin) { (s, d) =>
    bm25Ranked(s, d)
      .where(col("rnk") <= RagTopK)
      .select(col("qid"), col("rnk").cast("int").as("rnk"),
        col("doc_id"), col("chunk_ix"),
        round(col("sc").cast("double"), 4).as("score"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** STATIC retrieval index — the corpus-side tables of the BM25 +
    * rerank chain, fenced with localCheckpoint so every consumer
    * (both batch queries per run, and [[graft.streaming.StreamingRerank]]
    * per micro-batch) reuses them without re-scanning the corpus. The
    * dense-vector tables (`cb`/`cnorm`) are lazy: q_rag_retrieve never
    * pays for them. */
  private[graft] final class RagIndex(s: org.apache.spark.sql.SparkSession, d: String) {
    private def tk: DataFrame =
      chunked(t(s, d, "documents"), ChunkStride, ChunkSize)
        .select(col("doc_id"), col("chunk_ix"),
          explode(split(lower(col("chunk")), " ")).as("term"))
    /** (doc_id, chunk_ix, term, n) postings. */
    val tf: DataFrame = tk
      .groupBy(col("doc_id"), col("chunk_ix"), col("term"))
      .agg(count(lit(1)).as("n"))
      .fenced() // reused: chunk lengths + query-term df + scoring
    /** Chunk lengths + corpus stats (chunk-count-sized; derived from
      * the checkpointed postings, no corpus re-scan). */
    val dl: DataFrame = tf.groupBy(col("doc_id"), col("chunk_ix"))
      .agg(sum(col("n")).cast("long").as("len"))
    val st: DataFrame = dl.agg(count(lit(1)).cast("long").as("nd"),
      sum(col("len")).cast("long").as("toklen"))
    /** Hashed bag-of-words chunk vectors (bucket = digest mod
      * [[EmbDim]]) and their exact integer norms. Derived from the
      * FENCED postings, not from a second corpus-scale chunk+explode
      * pass (r19 optimization round, guide §1.2): per (doc, chunk,
      * bucket), Σ n over the bucket's terms ≡ the raw term-instance
      * count — both order-free exact long sums, so the frame is
      * bit-identical while the whole tk re-scan disappears. */
    lazy val cb: DataFrame = tf
      .groupBy(col("doc_id"), col("chunk_ix"),
        (PortableHash.md5Long(col("term")) % EmbDim).as("b"))
      .agg(sum(col("n")).cast("long").as("cn"))
      .fenced() // reused: dots + chunk norms
    lazy val cnorm: DataFrame = cb.groupBy(col("doc_id"), col("chunk_ix"))
      .agg(sum(col("cn") * col("cn")).cast("long").as("n2c"))
  }

  /** Spark twin of [[bm25Ctes]] for an arbitrary query set: every
    * (query, chunk) candidate with its exact-decimal BM25 score and
    * per-query rank. Scores are per-query independent (df is a
    * corpus statistic), so scoring a query subset yields exactly the
    * full run's rows for those queries — the property that makes the
    * streaming twin ≡ batch per prefix. */
  private[graft] def bm25For(qt: DataFrame, ix: RagIndex): DataFrame = {
    val qdf = ix.tf.join(broadcast(qt.select(col("term")).distinct()), "term")
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("dfreq"))
    val idf = log(lit(1) + ((col("nd") - col("dfreq")).cast("double") + 0.5)
      / (col("dfreq").cast("double") + 0.5))
    val contrib = round(
      idf * (col("n").cast("double") * 2.2)
        / (col("n").cast("double")
          + lit(1.2) * (lit(0.25) + lit(0.75)
            * ((col("len") * col("nd")).cast("double")
              / col("toklen").cast("double")))), 6).cast("decimal(18,6)")
    ix.tf.join(broadcast(qt), "term")
      .join(broadcast(qdf), "term")
      .join(ix.dl, Seq("doc_id", "chunk_ix"))
      .crossJoin(broadcast(ix.st))
      .select(col("qid"), col("doc_id"), col("chunk_ix"), contrib.as("c"))
      .groupBy(col("qid"), col("doc_id"), col("chunk_ix"))
      .agg(sum(col("c")).as("sc"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("sc").desc, col("doc_id"), col("chunk_ix"))))
  }

  private def bm25Ranked(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    bm25For(RagQueries.toDF("qid", "term"), new RagIndex(s, d))
  }

  /** Passage size (chars) for chunk-level dedup: NON-overlapping
    * (stride = size), unlike the retrieval chunks above — overlapping
    * chunks cannot be concatenated back into a document. */
  private[graft] val DedupChunk = 128

  /** Cross-document passage dedup with document reconstruction — the
    * CCNet/C4-style pass that removes boilerplate and duplicated
    * passages while keeping the rest of each document: documents are
    * cut into non-overlapping `DedupChunk`-char passages, every exact
    * passage occurrence after the first (global (doc_id, chunk_ix)
    * order) is dropped, and each document is re-assembled from its
    * surviving passages, reporting kept/dropped counts.
    *
    * Scale shape: the keep-first argmin groups on the passage's
    * 64-bit digest (map-side combinable `min`, longs in the
    * exchange), and the flag join is a shuffled digest equi-join —
    * nothing corpus-scaled is broadcast. Only the final per-document
    * reassembly re-shuffles passage text, once, keyed by the unique
    * doc_id; the in-group sort is bounded by a single document's
    * chunk count. The scalar keep-first key packs chunk_ix into
    * doc_id*100000+chunk_ix (DuckDB 1.0's min_by can't take a struct,
    * so both engines use the same packed key); a document beyond
    * 100000 passages (12.8 MB) would collide keys across documents,
    * so the engine side carries an `assert_true(chunk_ix < 100000)`
    * that fails the job LOUDLY instead of silently mis-deduping —
    * the filter passes every legal row untouched. */
  private val qChunkDedup = Q("q_chunk_dedup",
    s"""WITH ch AS (${chunkCte(DedupChunk, DedupChunk)}),
       |keyed AS (SELECT doc_id, chunk_ix, chunk,
       |    doc_id * 100000 + chunk_ix AS key FROM ch),
       |keeper AS (SELECT chunk, min(key) AS keep_key FROM keyed GROUP BY chunk),
       |flags AS (SELECT k.doc_id, k.chunk_ix, k.chunk, k.key = q.keep_key AS keep
       |  FROM keyed k JOIN keeper q ON k.chunk = q.chunk)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       |  coalesce(string_agg(CASE WHEN keep THEN chunk END, ''
       |    ORDER BY chunk_ix), '') AS clean_text
       |FROM flags GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val ch = chunked(t(s, d, "documents"), DedupChunk, DedupChunk)
      // loud guard on the packed-key domain: passes every legal row,
      // fails the job if a document ever exceeds 100000 passages
      .where(assert_true(col("chunk_ix") < 100000,
        lit("q_chunk_dedup: document exceeds 100000 passages — " +
          "packed keep-first key would collide")).isNull)
      .withColumn("key", col("doc_id") * 100000L + col("chunk_ix"))
      .withColumn("h", xxhash64(col("chunk")))
    val keeper = ch.groupBy(col("h")).agg(min(col("key")).as("keep_key"))
    ch.join(keeper, "h")
      .withColumn("keep", col("key") === col("keep_key"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("chunk_ix"), col("chunk"))))),
          x => x.getField("chunk")), "").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Epoch-shuffle shard count. At production scale this is the
    * data-loader worker count (thousands); 8 here keeps the oracle
    * grid readable. The construction's parallelism does NOT depend on
    * it (see the query scaladoc). */
  private[graft] val EpochShards = 8

  /** Seed literal for the epoch permutation — a new epoch is a new
    * seed, nothing else changes. */
  private[graft] val EpochSeed = "ep7"

  /** Deterministic epoch shuffle: the reproducible global permutation
    * of the corpus every training run needs between epochs, sharded
    * for data-loader consumption. The permutation key is a pure
    * function of (seed, doc_id) — portable md5, no RNG state — so it
    * is identical across engines, runs, resumes, and repartitionings
    * (`df.orderBy(rand())` is none of those); changing the seed
    * literal gives the next epoch an uncorrelated order via md5
    * avalanche.
    *
    * Scale shape: shard = hash % nShards; position-within-shard comes
    * from the [[PrefixSum.cumsumBy]] two-phase scan over the
    * composite (shard, hv, doc_id) order — range partitioning splits
    * even ONE shard across many tasks, so parallelism is independent
    * of nShards (a `row_number` window PARTITION BY shard — what the
    * oracle SQL literally says — would funnel corpus/nShards rows
    * through single tasks, the low-cardinality-window anti-pattern
    * the token-budget and quantile passes also avoid). The per-shard
    * start offsets are an nShards-bounded aggregate broadcast back;
    * within-shard rank = global running count − shard offset. The
    * trailing ORDER BY is the oracle-determinism presentation sort. */
  private val qShuffleEpoch = Q("q_shuffle_epoch",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    ${PortableHash.md5LongSql(s"'$EpochSeed:' || doc_id::VARCHAR")} AS hv
       |  FROM documents)
       |SELECT CAST(hv % $EpochShards AS INT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY hv % $EpochShards
       |                          ORDER BY hv, doc_id) AS BIGINT) AS pos,
       |  doc_id
       |FROM h ORDER BY shard, pos""".stripMargin) { (s, d) =>
    val hv = PortableHash.md5Long(
      concat(lit(s"$EpochSeed:"), col("doc_id").cast("string")))
    val sharded = t(s, d, "documents")
      .select(col("doc_id"), hv.as("hv"))
      .withColumn("shard", (col("hv") % EpochShards).cast("int"))
      .withColumn("one", lit(1L))
    val cum = PrefixSum.cumsumBy(sharded,
      Seq("shard", "hv", "doc_id"), "one", 8, "cum")
    // first row of each shard has cum = rows-before-shard + 1
    val offs = cum.groupBy(col("shard")).agg((min(col("cum")) - 1L).as("off"))
    cum.join(broadcast(offs), "shard")
      .select(col("shard"), (col("cum") - col("off")).as("pos"),
        col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Seed for the within-band curriculum shuffle. */
  private val CurriculumSeed = "cur3"

  /** Curriculum data ordering (Bengio et al. ICML'09, the
    * length-as-difficulty schedule of GPT-style pretraining warmups):
    * a GLOBAL training order that presents easy documents first —
    * difficulty bands from a per-row proxy (here n_chars literals;
    * any scored band works), deterministically shuffled WITHIN each
    * band by the portable seeded hash so the curriculum is
    * reproducible across runs and resumes (same contract as
    * `q_shuffle_epoch`; a new stage = a new seed).
    *
    * Scale shape: the global position over (band, hv, doc_id) comes
    * from the [[PrefixSum.cumsumBy]] two-phase scan — the oracle SQL
    * writes the corpus-wide `row_number() OVER (ORDER BY …)` this
    * query exists to AVOID (a single-task global window at scale);
    * the band CASE is a codegen'd per-row literal compare, and no
    * corpus-scale frame is ever broadcast. */
  private val qCurriculum = Q("q_curriculum",
    s"""WITH h AS (
       |  SELECT doc_id,
       |    CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS band,
       |    ${PortableHash.md5LongSql(s"'$CurriculumSeed:' || doc_id::VARCHAR")} AS hv
       |  FROM documents)
       |SELECT CAST(row_number() OVER (ORDER BY band, hv, doc_id) AS BIGINT) AS pos,
       |  CAST(band AS INT) AS band, doc_id
       |FROM h ORDER BY pos""".stripMargin) { (s, d) =>
    val hv = PortableHash.md5Long(
      concat(lit(s"$CurriculumSeed:"), col("doc_id").cast("string")))
    val banded = t(s, d, "documents")
      .select(col("doc_id"),
        when(col("n_chars") < 200, 0).when(col("n_chars") < 400, 1)
          .otherwise(2).as("band"),
        hv.as("hv"))
      .withColumn("one", lit(1L))
    PrefixSum.cumsumBy(banded, Seq("band", "hv", "doc_id"), "one", 8, "pos")
      .select(col("pos"), col("band"), col("doc_id"))
      .orderBy(col("pos"))
  }

  /** The END-TO-END data-loader build the corpus family exists for,
    * composed as ONE query: quality gate (`q_quality_gate`'s fused
    * 5-signal keep-set) → deterministic epoch shuffle
    * (`q_shuffle_epoch`'s seeded portable-hash permutation into
    * [[EpochShards]] loader shards) → sequence packing
    * (`q_pack_sequences`'s concat-and-chunk at [[SeqBudget]] tokens,
    * here WITHIN each shard in permuted order — what a loader worker
    * actually consumes). Output: per (shard, sequence) document count
    * and token mass.
    *
    * Scale shape — the composition adds NO corpus-scale exchange
    * beyond its stages' own: the gate and the token count are
    * per-row expressions fused into the one corpus scan (zero
    * shuffles, filter before anything moves); the shuffle+pack order
    * (shard, hv, doc_id) needs exactly the ONE range repartition of
    * the [[PrefixSum.cumsumBy]] two-phase scan (position AND running
    * token count come from the same pass — composing the stages
    * SAVES the second scan a sequential pipeline would run); the
    * per-shard offsets are an [[EpochShards]]-bounded broadcast; the
    * final per-(shard, seq) rollup is map-side combined. The oracle
    * SQL writes the per-shard window this plan exists to avoid
    * (range partitioning on the composite key splits one shard
    * across many tasks — parallelism independent of shard count). */
  private val qLoaderPipeline = Q("q_loader_pipeline",
    s"""${TextQueries.GateSignalsSql},
       |k AS (
       |  SELECT doc_id FROM s
       |  WHERE len_ok AND marker_ok AND rep_ok AND pii_ok AND lr_ok),
       |tok AS (
       |  SELECT d.doc_id,
       |    ${PortableHash.md5LongSql(s"'$EpochSeed:' || d.doc_id::VARCHAR")} AS hv,
       |    CAST(len(regexp_split_to_array(d.text, '\\s+')) AS BIGINT) AS toks
       |  FROM documents d JOIN k USING (doc_id)),
       |c AS (
       |  SELECT CAST(hv % $EpochShards AS INT) AS shard, doc_id, toks,
       |    sum(toks) OVER (PARTITION BY hv % $EpochShards
       |      ORDER BY hv, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM tok)
       |SELECT shard, CAST(floor((cum - toks) / $SeqBudget.0) AS BIGINT) AS seq_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS n_tokens
       |FROM c GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
      .withColumn("toks", size(split(col("text"), "\\s+")).cast("long"))
    val kept = TextQueries.gateSignals(docs, carry = Seq("toks"))
      .where(col("len_ok") && col("marker_ok") && col("rep_ok") &&
        col("pii_ok") && col("lr_ok"))
      .select(col("doc_id"), col("toks"))
    val hv = PortableHash.md5Long(
      concat(lit(s"$EpochSeed:"), col("doc_id").cast("string")))
    val sharded = kept
      .withColumn("hv", hv)
      .withColumn("shard", (col("hv") % EpochShards).cast("int"))
    val cum = PrefixSum.cumsumBy(sharded,
      Seq("shard", "hv", "doc_id"), "toks", 8, "cum")
    // per-shard token offset = running total just before the shard's
    // first document; EpochShards rows, broadcast back
    val offs = cum.groupBy(col("shard"))
      .agg(min(col("cum") - col("toks")).as("off"))
    cum.join(broadcast(offs), "shard")
      .select(col("shard"),
        floor((col("cum") - col("off") - col("toks")) / lit(SeqBudget.toDouble))
          .cast("long").as("seq_id"),
        col("toks"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy(col("shard"), col("seq_id"))
  }

  // ------------------------------------------------- web-curation funnel

  /** The composed WEB-CURATION funnel — the crawl-side counterpart of
    * `q_loader_pipeline` (which composes the loader side): URL-
    * canonical dedup → corpus-frequency boilerplate removal → the
    * 5-signal quality gate ON THE CLEANED TEXT → exact content dedup,
    * reported as the per-source funnel (the drop accounting a crawl
    * curation run publishes). Every stage is the SAME shared
    * derivation its standalone query uses (`DedupQueries.urlCanon`,
    * `TextQueries.boilerLines`, `TextQueries.gateSignals`, the
    * q_dedup_exact md5 group) — the composition adds ordering, not
    * reimplementation, so a green funnel certifies the stages
    * compose, and stage order matters: the boilerplate frequency
    * table is computed over the URL-KEPT corpus (dup pages would
    * otherwise vote their own chrome past the threshold), and the
    * gate reads cleaned text (boilerplate inflates length and
    * repetition signals).
    *
    * Scale shape: each stage keeps its own audited shape (canonical-
    * key groupBy; digest-set broadcast + map-side rewrite; zero-
    * shuffle gate; md5-key groupBy); the composition's only
    * additions are doc_id keep-set equi-joins (corpus-keyed,
    * shuffled — never broadcast, keep-sets are corpus-scaled) and
    * one source-grain funnel aggregate. */
  private val qWebPipeline = Q("q_web_pipeline",
    s"""WITH ${DedupQueries.urlCanonClusteredCtes},
       |ukeep AS (SELECT min(doc_id) AS doc_id FROM ucanon GROUP BY canon_url),
       |d1 AS (SELECT d.doc_id, d.text, d.lang, d.source
       |       FROM documents d JOIN ukeep USING (doc_id)),
       |${TextQueries.boilerCtes("d1")},
       |d2 AS (SELECT d1.doc_id, bcl.cleaned AS text, d1.lang, d1.source
       |       FROM d1 JOIN bcl USING (doc_id)),
       |${TextQueries.gateSignalsCtes("d2")},
       |gk AS (SELECT doc_id FROM s
       |       WHERE len_ok AND marker_ok AND rep_ok AND pii_ok AND lr_ok),
       |d3 AS (SELECT d2.* FROM d2 JOIN gk USING (doc_id)),
       |fin AS (SELECT min(doc_id) AS doc_id FROM d3 GROUP BY md5(text)),
       |d4 AS (SELECT d3.* FROM d3 JOIN fin USING (doc_id))
       |SELECT a.source,
       |  a.n_docs,
       |  coalesce(b.n_url, 0) AS n_url,
       |  coalesce(c.n_gate, 0) AS n_gate,
       |  coalesce(e.n_final, 0) AS n_final,
       |  coalesce(e.chars_final, 0) AS chars_final
       |FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |      FROM documents GROUP BY 1) a
       |LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_url
       |           FROM d1 GROUP BY 1) b USING (source)
       |LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_gate
       |           FROM d3 GROUP BY 1) c USING (source)
       |LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_final,
       |             CAST(sum(length(text)) AS BIGINT) AS chars_final
       |           FROM d4 GROUP BY 1) e USING (source)
       |ORDER BY source""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents")
    // stage 1: URL-canonical dedup (keep min doc_id per canonical URL)
    val ukeep = DedupQueries.urlCanonClustered(docs)
      .groupBy(col("canon_url")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val d1 = docs.join(ukeep, Seq("doc_id"), "left_semi")
      .fenced() // reused: boiler freq + rewrite + funnel count
    // stage 2: boilerplate removal over the KEPT corpus — the SAME
    // shared derivation as q_text_boilerplate (boilerLined/boilerSet/
    // boilerCleaned), so the funnel cannot drift from the standalone
    val lined = TextQueries.boilerLined(d1, Seq("lang", "source"))
    val d2 = lined.crossJoin(broadcast(TextQueries.boilerSet(lined)))
      .select(col("doc_id"), col("lang"), col("source"),
        TextQueries.boilerCleaned.as("text"))
      .fenced() // reused: gate + exact dedup + funnel count
    // stage 3: the 5-signal gate on the CLEANED text
    val gOk = col("len_ok") && col("marker_ok") && col("rep_ok") &&
      col("pii_ok") && col("lr_ok")
    val gk = TextQueries.gateSignals(d2).where(gOk).select(col("doc_id"))
    val d3 = d2.join(gk, Seq("doc_id"), "left_semi")
    // stage 4: exact content dedup (keep min doc_id per md5)
    val fin = d3.groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val d4 = d3.join(fin, Seq("doc_id"), "left_semi")
    // the funnel report
    def cnt(df: DataFrame, name: String) =
      df.groupBy(col("source")).agg(count(lit(1)).as(name))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(cnt(d1, "n_url_r"), Seq("source"), "left_outer")
      .join(cnt(d3, "n_gate_r"), Seq("source"), "left_outer")
      .join(d4.groupBy(col("source")).agg(count(lit(1)).as("n_final_r"),
        sum(length(col("text"))).as("chars_r")), Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_url_r"), lit(0L)).as("n_url"),
        coalesce(col("n_gate_r"), lit(0L)).as("n_gate"),
        coalesce(col("n_final_r"), lit(0L)).as("n_final"),
        coalesce(col("chars_r"), lit(0L)).as("chars_final"))
      .orderBy(col("source"))
  }

  // ----------------------------------------------- retrieve-then-rerank

  private val RerankCand = 20 // stage-1 BM25 candidates per query
  private val EmbDim = 64     // hashed bag-of-words embedding width

  /** Two-stage HYBRID retrieval — the canonical serving shape of a
    * production RAG stack (lexical recall, dense precision): stage 1
    * takes the BM25 top-[[RerankCand]] per query from the SHARED
    * [[bm25Ctes]]/[[bm25Ranked]] chain, stage 2 re-ranks those
    * candidates by cosine in a [[EmbDim]]-dim hashed bag-of-words
    * embedding space (the feature-hashing trick: bucket =
    * portable-digest mod dim; integer counts, so dot and both norms
    * are EXACT integers and the cosine is one double division —
    * bit-identical cross-engine, the q_sim_allpairs discipline).
    *
    * Scale shape: the rerank touches ONLY candidate-scaled data —
    * |Q|·[[RerankCand]] rows join the chunk-bucket vectors on the
    * chunk key; the corpus-scale work (chunk tf) is the same single
    * pass stage 1 already paid, and the query-side vectors are
    * literal-sized broadcasts. A candidate sharing no bucket with
    * its query keeps cosine 0 (left join), not a dropped row —
    * rerank is a permutation of stage 1's candidate set, never a
    * filter. */
  /** The rerank CTE chain (cand → … → rr, reranked candidates with
    * per-query ranks) on top of [[bm25Ctes]] — shared by
    * q_rag_rerank (the ranking itself) and q_rag_eval (the ranking
    * graded). NO stripMargin: embedded in templates that strip
    * once. */
  private def rerankCtes: String =
    s"""cand AS (SELECT qid, doc_id, chunk_ix, sc FROM rk WHERE rnk <= $RerankCand),
       |cb AS (SELECT tk.doc_id, tk.chunk_ix,
       |         (${PortableHash.md5LongSql("term")} % $EmbDim) AS b,
       |         CAST(count(*) AS BIGINT) AS cn
       |       FROM tk GROUP BY 1, 2, 3),
       |cnorm AS (SELECT doc_id, chunk_ix, CAST(sum(cn * cn) AS BIGINT) AS n2c
       |          FROM cb GROUP BY 1, 2),
       |qb AS (SELECT qid, (${PortableHash.md5LongSql("term")} % $EmbDim) AS b,
       |         CAST(count(*) AS BIGINT) AS qn
       |       FROM qt GROUP BY 1, 2),
       |qnorm AS (SELECT qid, CAST(sum(qn * qn) AS BIGINT) AS n2q
       |          FROM qb GROUP BY 1),
       |dots AS (SELECT c.qid, c.doc_id, c.chunk_ix,
       |           CAST(sum(qb.qn * cb.cn) AS BIGINT) AS dot
       |         FROM cand c
       |         JOIN qb ON qb.qid = c.qid
       |         JOIN cb ON cb.doc_id = c.doc_id AND cb.chunk_ix = c.chunk_ix
       |                AND cb.b = qb.b
       |         GROUP BY 1, 2, 3),
       |scored AS (SELECT c.qid, c.doc_id, c.chunk_ix, c.sc,
       |             CAST(coalesce(d.dot, 0) AS DOUBLE)
       |               / sqrt(CAST(qn.n2q AS DOUBLE) * CAST(cn.n2c AS DOUBLE)) AS cos
       |           FROM cand c
       |           LEFT JOIN dots d ON d.qid = c.qid AND d.doc_id = c.doc_id
       |                           AND d.chunk_ix = c.chunk_ix
       |           JOIN qnorm qn ON qn.qid = c.qid
       |           JOIN cnorm cn ON cn.doc_id = c.doc_id AND cn.chunk_ix = c.chunk_ix),
       |rr AS (SELECT qid, doc_id, chunk_ix, sc, cos, row_number() OVER
       |         (PARTITION BY qid ORDER BY cos DESC, doc_id, chunk_ix) AS rnk
       |       FROM scored)"""

  private val qRagRerank = Q("q_rag_rerank",
    s"""WITH $bm25Ctes,
       |$rerankCtes
       |SELECT qid, CAST(rnk AS INT) AS rnk, doc_id, chunk_ix,
       |  round(cos, 6) AS cos, round(CAST(sc AS DOUBLE), 4) AS bm25
       |FROM rr WHERE rnk <= $RagTopK ORDER BY qid, rnk""".stripMargin) { (s, d) =>
    import s.implicits._
    rerankFor(RagQueries.toDF("qid", "term"), new RagIndex(s, d))
  }

  /** 1/log₂(rank+1) — the NDCG position discount, computed ONCE in
    * Scala and rendered as a literal into BOTH engines' expressions
    * (the lshBucketSql single-source-of-truth stance: a double
    * literal's shortest decimal representation parses back to the
    * identical double, so the two engines never compute a
    * transcendental independently). */
  private def ndcgDisc(r: Int): Double = 1.0 / (math.log(r + 1) / math.log(2.0))

  private def ndcgDiscSqlCase(v: String): String =
    (1 to RagTopK).map(r => s"WHEN $r THEN ${ndcgDisc(r)}")
      .mkString(s"CASE $v ", " ", " ELSE 0.0 END")

  /** Retrieval-quality EVALUATION — the grading half of the RAG
    * family (q_rag_retrieve ranks, q_rag_rerank re-ranks, THIS
    * grades the reranked ranking): per query, NDCG@[[RagTopK]] with
    * FULL judgments (the ideal ranking draws from every relevant
    * chunk in the corpus, not just the retrieved list) and MRR, the
    * two metrics a retrieval benchmark (BEIR/MTEB-style) reports.
    * Relevance is graded and deterministic: rel(q, chunk) = how many
    * of the query's terms the chunk REPEATS (chunk tf ≥ 2; bare
    * presence saturates on this corpus — every common term appears
    * in ~80% of chunks, so a presence grade would score every
    * ranking 1.0), 1..3 at the 3-term query set, gain = 2^rel − 1.
    *
    * Determinism: gains are exact integers; the position discount is
    * a shared Scala-computed literal table ([[ndcgDisc]] — neither
    * engine computes a log); each DCG term quantizes to the
    * 12-decimal grid into DECIMAL(28,12) before the per-query sum
    * (order-free), and the final NDCG division is one double op over
    * identical decimals.
    *
    * Scale shape (100 TB): relevance judgments come from the SAME
    * postings frame the BM25 index holds (an inverted-index
    * candidate join — postings-bounded, never a corpus × queries
    * product); the system list is |Q|·k rows; the ideal ranking is a
    * per-query window over the judged set with WindowGroupLimit
    * pruning to k per task. */
  private val qRagEval = Q("q_rag_eval",
    s"""WITH $bm25Ctes,
       |$rerankCtes,
       |rel AS (
       |  SELECT q.qid, f.doc_id, f.chunk_ix, CAST(count(*) AS BIGINT) AS rel
       |  FROM tf f JOIN qt q ON f.term = q.term
       |  WHERE f.n >= 2
       |  GROUP BY 1, 2, 3),
       |gt AS (SELECT qid, doc_id, chunk_ix, rel,
       |         CASE rel WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END AS gain
       |       FROM rel),
       |sys AS (
       |  SELECT r.qid, r.rnk, coalesce(g.gain, 0) AS gain,
       |    coalesce(g.rel, 0) AS rel
       |  FROM rr r LEFT JOIN gt g
       |    ON g.qid = r.qid AND g.doc_id = r.doc_id AND g.chunk_ix = r.chunk_ix
       |  WHERE r.rnk <= $RagTopK),
       |dcg AS (SELECT qid,
       |    sum(CAST(round(gain * ${ndcgDiscSqlCase("rnk")}, 12)
       |        AS DECIMAL(28,12))) AS dcg
       |  FROM sys GROUP BY 1),
       |mrrt AS (SELECT qid, round(1.0 / min(rnk), 6) AS mrr
       |         FROM sys WHERE rel >= 1 GROUP BY 1),
       |ideal AS (SELECT qid, gain, row_number() OVER
       |    (PARTITION BY qid ORDER BY rel DESC, doc_id, chunk_ix) AS irnk
       |  FROM gt),
       |idcg AS (SELECT qid,
       |    sum(CAST(round(gain * ${ndcgDiscSqlCase("irnk")}, 12)
       |        AS DECIMAL(28,12))) AS idcg
       |  FROM ideal WHERE irnk <= $RagTopK GROUP BY 1),
       |nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel FROM gt GROUP BY 1)
       |SELECT n.qid, n.n_rel,
       |  round(CAST(d.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6) AS ndcg,
       |  coalesce(m.mrr, 0.0) AS mrr
       |FROM nrel n JOIN dcg d ON d.qid = n.qid JOIN idcg i ON i.qid = n.qid
       |LEFT JOIN mrrt m ON m.qid = n.qid
       |ORDER BY n.qid""".stripMargin) { (s, d) =>
    import s.implicits._
    val ix = new RagIndex(s, d)
    val qt = RagQueries.toDF("qid", "term")
    def discOf(rnk: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (2 to RagTopK).foldLeft(when(rnk === 1, lit(ndcgDisc(1)))) {
        case (acc, r) => acc.when(rnk === r, lit(ndcgDisc(r)))
      }.otherwise(lit(0.0))
    val gt = ix.tf.where(col("n") >= 2).join(broadcast(qt), "term")
      .groupBy(col("qid"), col("doc_id"), col("chunk_ix"))
      .agg(count(lit(1)).cast("long").as("rel"))
      .withColumn("gain",
        when(col("rel") === 1, 1L).when(col("rel") === 2, 3L).otherwise(7L))
      .fenced() // consumed by sys grading, ideal ranking, and n_rel
    val sys = rerankFor(qt, ix)
      .select(col("qid"), col("doc_id"), col("chunk_ix"), col("rnk"))
      .join(gt, Seq("qid", "doc_id", "chunk_ix"), "left_outer")
      .select(col("qid"), col("rnk"),
        coalesce(col("gain"), lit(0L)).as("gain"),
        coalesce(col("rel"), lit(0L)).as("rel"))
    val dcg = sys.groupBy(col("qid"))
      .agg(sum(round(col("gain") * discOf(col("rnk")), 12)
        .cast("decimal(28,12)")).as("dcg"))
    val mrrt = sys.where(col("rel") >= 1).groupBy(col("qid"))
      .agg(round(lit(1.0) / min(col("rnk")), 6).as("mrr"))
    val idcg = gt
      .withColumn("irnk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("rel").desc, col("doc_id"), col("chunk_ix"))))
      .where(col("irnk") <= RagTopK)
      .groupBy(col("qid"))
      .agg(sum(round(col("gain") * discOf(col("irnk")), 12)
        .cast("decimal(28,12)")).as("idcg"))
    val nrel = gt.groupBy(col("qid"))
      .agg(count(lit(1)).cast("long").as("n_rel"))
    nrel.join(dcg, "qid").join(idcg, "qid")
      .join(mrrt, Seq("qid"), "left_outer")
      .select(col("qid"), col("n_rel"),
        round(col("dcg").cast("double") / col("idcg").cast("double"), 6)
          .as("ndcg"),
        coalesce(col("mrr"), lit(0.0)).as("mrr"))
      .orderBy(col("qid"))
  }

  /** The full retrieve-then-rerank chain for an arbitrary query set —
    * the ONE derivation shared by the batch `q_rag_rerank` and the
    * streaming serving twin ([[graft.streaming.StreamingRerank]]), so
    * the two cannot drift. Per-query independent (see [[bm25For]]):
    * reranking a query subset returns exactly the full run's rows for
    * those queries. */
  private[graft] def rerankFor(qt: DataFrame, ix: RagIndex): DataFrame = {
    val cand = bm25For(qt, ix).where(col("rnk") <= RerankCand)
      .select(col("qid"), col("doc_id"), col("chunk_ix"), col("sc"))
      // ≤ |Q|·RerankCand rows — bounded; referenced by the dot pass
      // AND the final assembly, so fence off the whole BM25 subtree
      .fenced()
    val qb = qt.select(col("qid"),
        (PortableHash.md5Long(col("term")) % EmbDim).as("b"))
      .groupBy(col("qid"), col("b")).agg(count(lit(1)).cast("long").as("qn"))
    val qnorm = qb.groupBy(col("qid")).agg(sum(col("qn") * col("qn")).cast("long").as("n2q"))
    val dots = cand
      .join(broadcast(qb), "qid")
      .join(ix.cb, Seq("doc_id", "chunk_ix", "b"))
      .groupBy(col("qid"), col("doc_id"), col("chunk_ix"))
      .agg(sum(col("qn") * col("cn")).cast("long").as("dot"))
    val cos = coalesce(col("dot"), lit(0L)).cast("double") /
      sqrt(col("n2q").cast("double") * col("n2c").cast("double"))
    cand
      .join(dots, Seq("qid", "doc_id", "chunk_ix"), "left_outer")
      .join(broadcast(qnorm), "qid")
      .join(ix.cnorm, Seq("doc_id", "chunk_ix"))
      .select(col("qid"), col("doc_id"), col("chunk_ix"), col("sc"), cos.as("cos"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("doc_id"), col("chunk_ix"))))
      .where(col("rnk") <= RagTopK)
      .select(col("qid"), col("rnk").cast("int").as("rnk"),
        col("doc_id"), col("chunk_ix"), round(col("cos"), 6).as("cos"),
        round(col("sc").cast("double"), 4).as("bm25"))
      .orderBy(col("qid"), col("rnk"))
  }

  val all: Seq[Q] = Seq(qPackSequences, qPackBestfit, qDecontaminate,
    qSampleStratified,
    qMixtureUpsample, qDedupIncremental, qDedupBloom, qTokenBudget,
    qQualityQuantile, qSampleWeighted, qSampleImportance, qMixtureTemperature,
    qSplitTrain, qMixtureDoremi, qQualityKs, qQualityPsi, qChunkDocs, qChunkDedup, qRagRetrieve,
    qShuffleEpoch, qCurriculum, qLoaderPipeline, qWebPipeline, qRagRerank,
    qRagEval)
}
