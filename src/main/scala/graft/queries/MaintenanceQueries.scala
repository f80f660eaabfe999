package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Q.t

/** Table-maintenance operators at query granularity: SCD-style
  * dimension snapshot merge (the batch form of the reference's 12 h
  * dimension refresh — `wbdb.clj:51-67` swaps a full re-scan; at
  * warehouse scale the swap becomes a MERGE classifying each key) and
  * Z-order layout statistics (the multi-column data-skipping layout;
  * single-column range layout is `operators.Compaction`).
  */
object MaintenanceQueries {

  /** Dimension snapshot merge: classify every entity of the NEW
    * snapshot (latest state per user over all events) against the OLD
    * snapshot (latest state as of the cut timestamp) as
    * insert / update / unchanged — the Type-1 SCD merge a 12 h
    * dimension refresh performs. Deletes cannot occur here (the new
    * snapshot's key set is a superset by construction), so the full
    * outer join degenerates to v2-left; the full-outer form is kept
    * because a real CDC feed has deletes.
    *
    * Scale shape: both snapshots reduce events by user_id windows
    * (high-cardinality partition key — no skew), and the merge is one
    * equi-join on the entity key; nothing is driver-side. */
  private val qDimMerge = Q("q_dim_merge",
    """WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value
      |            FROM events),
      |v1 AS (SELECT user_id, value FROM (
      |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM ev WHERE ts < TIMESTAMP '2024-01-02') WHERE rn = 1),
      |v2 AS (SELECT user_id, value FROM (
      |    SELECT user_id, value, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM ev) WHERE rn = 1)
      |SELECT coalesce(v2.user_id, v1.user_id) AS user_id,
      |  CASE WHEN v1.user_id IS NULL THEN 'insert'
      |       WHEN v2.value <> v1.value THEN 'update'
      |       ELSE 'unchanged' END AS status,
      |  v1.value AS old_value, v2.value AS new_value
      |FROM v1 FULL OUTER JOIN v2 ON v1.user_id = v2.user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    def latest(src: org.apache.spark.sql.DataFrame, uid: String, v: String) = src
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id").as(uid), col("value").as(v))
    val v1 = latest(ev.where(
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))),
      "u1", "old_value")
    val v2 = latest(ev, "u2", "new_value")
    v1.join(v2, col("u1") === col("u2"), "full_outer")
      .select(coalesce(col("u2"), col("u1")).as("user_id"),
        when(col("u1").isNull, "insert")
          .when(col("new_value") =!= col("old_value"), "update")
          .otherwise("unchanged").as("status"),
        col("old_value"), col("new_value"))
      .orderBy(col("user_id"))
  }

  /** Bits per dimension of the Z-curve (8 → 16-bit z-values). */
  private val ZBits = 8

  /** Z-order (Morton) bucketing statistics: interleave the low 8 bits
    * of two join keys and bucket the curve into 16 ranges; the output
    * min/max per bucket shows the property Z-layout exists for — each
    * curve range bounds BOTH dimensions, so files written in z order
    * carry tight per-file min/max on every z'd column and parquet
    * row-group skipping prunes on any of them (the multi-column
    * generalization of `operators.Compaction`'s single-key range
    * layout; public technique per the Delta/Iceberg OPTIMIZE ZORDER
    * docs and Morton 1966). Pure integer bit-math — identical on both
    * engines. */
  private val qZorder = Q("q_zorder", {
    val terms = (0 until ZBits).flatMap { b =>
      Seq(s"((px >> $b) & 1) * ${1L << (2 * b)}",
        s"((py >> $b) & 1) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")
    s"""WITH p AS (SELECT l_partkey % 256 AS px, l_suppkey % 256 AS py
       |           FROM lineitem),
       |z AS (SELECT px, py, $terms AS zv FROM p)
       |SELECT CAST(floor(zv / 4096.0) AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(px) AS BIGINT) AS min_px, CAST(max(px) AS BIGINT) AS max_px,
       |  CAST(min(py) AS BIGINT) AS min_py, CAST(max(py) AS BIGINT) AS max_py
       |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin
  }) { (s, d) =>
    val px = col("l_partkey") % 256
    val py = col("l_suppkey") % 256
    def zval(x: Column, y: Column): Column =
      (0 until ZBits).flatMap { b =>
        Seq(shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)),
          shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
      }.reduce(_ + _)
    t(s, d, "lineitem")
      .select(px.as("px"), py.as("py"))
      .withColumn("zv", zval(col("px"), col("py")))
      .groupBy(floor(col("zv") / lit(4096.0)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("px")).cast("long").as("min_px"),
        max(col("px")).cast("long").as("max_px"),
        min(col("py")).cast("long").as("min_py"),
        max(col("py")).cast("long").as("max_py"))
      .orderBy(col("bucket"))
  }

  /** Incremental materialized-view refresh — the other standing
    * maintenance job of a warehouse deployment (beside the SCD merge
    * above): a per-(event_type, day) aggregate MV kept current by
    * MERGING the delta's partial aggregate states into the stored MV,
    * never recomputing from history. All measures are algebraic —
    * count and sum merge by +, min/max by least/greatest — so the
    * refresh is exact by construction, and the oracle recomputes the
    * view from scratch over the union to prove it. The cut timestamp
    * is `q_dim_merge`'s snapshot boundary; each group is additionally
    * classified insert / update / unchanged — the write-set a MERGE
    * INTO would apply (an 'unchanged' group's row needn't be
    * rewritten). The cut sits INSIDE a day (noon) so the boundary
    * day genuinely straddles it and all three classes occur — a
    * day-aligned cut would make 'update' structurally impossible at
    * the day grain.
    *
    * Scale shape: in production the pre-cut side IS the stored MV
    * (view-cardinality rows read back, zero recompute — here it is
    * derived in-plan for the oracle); the recurring cost is the
    * delta's map-side-combined aggregate (delta-scale scan, one
    * view-grain exchange) + a view-cardinality merge join. History
    * never re-aggregates — the point of the operator. Decimal sums
    * per the shared discipline, so the merged total is bit-equal to
    * the recompute. */
  private val qMvRefresh = Q("q_mv_refresh",
    """WITH ev AS (SELECT event_type, ts::TIMESTAMP AS ts, value FROM events),
      |mvfull AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
      |    min(value) AS min_v, max(value) AS max_v,
      |    sum(CASE WHEN ts < TIMESTAMP '2024-01-02 12:00:00' THEN 1 ELSE 0 END) AS n_old,
      |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-02 12:00:00' THEN 1 ELSE 0 END) AS n_new
      |  FROM ev GROUP BY 1, 2)
      |SELECT event_type, day, n, sum_v, min_v, max_v,
      |  CASE WHEN n_old = 0 THEN 'insert'
      |       WHEN n_new = 0 THEN 'unchanged' ELSE 'update' END AS status
      |FROM mvfull ORDER BY event_type, day""".stripMargin) { (s, d) =>
    val cut = lit("2024-01-02 12:00:00").cast("timestamp")
    val ev = t(s, d, "events").select(col("event_type"), col("ts"), col("value"))
    def viewAgg(df: org.apache.spark.sql.DataFrame, p: String) = df
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as(s"${p}_n"),
        sum(col("value").cast("decimal(18,4)")).as(s"${p}_sum"),
        min(col("value")).as(s"${p}_min"),
        max(col("value")).as(s"${p}_max"))
    val mv = viewAgg(ev.where(col("ts") < cut), "m")     // the stored MV stand-in
    val delta = viewAgg(ev.where(col("ts") >= cut), "d") // the refresh input
    // the state MERGE itself: + for count/sum, least/greatest for the
    // bounds (both null-skipping), classification from side presence
    mv.join(delta, Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("m_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
        (coalesce(col("m_sum"), lit(0).cast("decimal(18,4)")) +
          coalesce(col("d_sum"), lit(0).cast("decimal(18,4)")))
          .cast("double").as("sum_v"),
        least(col("m_min"), col("d_min")).as("min_v"),
        greatest(col("m_max"), col("d_max")).as("max_v"),
        when(col("m_n").isNull, "insert")
          .when(col("d_n").isNull, "unchanged")
          .otherwise("update").as("status"))
      .orderBy(col("event_type"), col("day"))
  }

  // ------------------------------------------------- compaction planning

  private val CompactTarget = 600000L // planner target bytes per output file

  /** Small-file COMPACTION PLANNING — the decision half of the
    * OPTIMIZE/maintenance job whose physical half is
    * `operators.Compaction` (CompactionSpec): given a partitioned
    * file manifest, assign fragments to target-size output groups by
    * the greedy sequential fill over a size-descending order —
    * bucket(f) = ⌊cumulative-bytes-before(f) / target⌋ within each
    * partition, the deterministic form of Delta OPTIMIZE's bin
    * packing. Output is the write-set: per (partition, bucket) the
    * file count, byte total, and fill factor a rewrite job would
    * execute.
    *
    * The manifest here is synthesized from the fact at (returnflag,
    * linestatus, orderkey-shard) granularity with integer byte sizes
    * (count·100 — deterministic, no float sums); in production it is
    * the table's real file listing. Scale shape: the manifest
    * aggregate is the only fact-scale stage (map-side combinable);
    * everything after runs on METADATA cardinality — the per-
    * partition window orders a bounded file list, never rows. */
  private val qCompactPlan = Q("q_compact_plan",
    s"""WITH f AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
       |             l_orderkey % 16 AS fk,
       |             CAST(count(*) * 100 AS BIGINT) AS bytes
       |           FROM lineitem GROUP BY 1, 2, 3),
       |o AS (SELECT rf, bytes,
       |        coalesce(sum(bytes) OVER (
       |          PARTITION BY rf ORDER BY bytes DESC, ls, fk
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |      FROM f)
       |SELECT rf, CAST(cb // $CompactTarget AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(bytes) AS BIGINT) AS bytes,
       |  round(sum(bytes) / $CompactTarget.0, 4) AS fill
       |FROM o GROUP BY 1, 2 ORDER BY rf, bucket""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val f = t(s, d, "lineitem")
      .groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        (col("l_orderkey") % 16).as("fk"))
      .agg((count(lit(1)) * 100).as("bytes"))
    val w = Window.partitionBy(col("rf"))
      .orderBy(col("bytes").desc, col("ls"), col("fk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    f.withColumn("cb", coalesce(sum(col("bytes")).over(w), lit(0L)))
      // `div` ≙ DuckDB's `//`: exact integer division — double `/` +
      // cast would drift at the k·target−1 boundary once cb ≳ 4.5e15
      .groupBy(col("rf"), expr(s"cb div $CompactTarget").as("bucket"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        round(sum(col("bytes")) / lit(CompactTarget.toDouble), 4).as("fill"))
      .orderBy(col("rf"), col("bucket"))
  }

  /** Corpus SNAPSHOT DIFF — content-level change-data-capture between
    * two crawl snapshots: the delta manifest (added / deleted /
    * changed documents) an incremental corpus build consumes instead
    * of reprocessing the full snapshot. This is the CONTENT
    * counterpart of [[qDimMerge]] (which classifies latest ENTITY
    * state and structurally cannot see deletes here): both sides are
    * document sets keyed by doc_id, equality is the md5 content
    * digest, and all three delta classes are live at every SF.
    *
    * Snapshot derivation (IDENTICAL expressions on both engines, so
    * the oracle checks the DIFF operator, not a fixture): current =
    * documents minus doc_id ≡ 5 (mod 13) — those rows become
    * `deleted`; prior = documents minus doc_id ≡ 3 (mod 11) — those
    * become `added`; prior text for doc_id ≡ 2 (mod 7) carries a
    * draft suffix — those become `changed`.
    *
    * Scale shape (100 TB): the md5 digests are computed INSIDE each
    * snapshot's scan stage, so the full-outer join exchanges only
    * (doc_id, 32-char digest) rows — document text never shuffles.
    * One sort-merge join on doc_id is the whole pass; recurring
    * snapshots bucketed by doc_id (`operators.Bucketing`) co-locate
    * it with zero exchange. The output is the DELTA ONLY — `same`
    * rows (the overwhelming mass between adjacent crawls) are
    * filtered before the sink, never materialized downstream; a
    * mis-classification cannot hide there, since a changed/added/
    * deleted row wrongly read as `same` is a missing output row the
    * hash comparison catches. */
  private val qSnapshotDiff = Q("q_snapshot_diff",
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |cur AS (SELECT doc_id, md5(text) AS cur_md5 FROM docs
      |        WHERE doc_id % 13 <> 5),
      |prior AS (SELECT doc_id,
      |    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' (rev1)' ELSE text END)
      |      AS prior_md5
      |  FROM docs WHERE doc_id % 11 <> 3),
      |delta AS (
      |  SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
      |    CASE WHEN p.doc_id IS NULL THEN 'added'
      |         WHEN c.doc_id IS NULL THEN 'deleted'
      |         WHEN p.prior_md5 <> c.cur_md5 THEN 'changed'
      |         ELSE 'same' END AS status,
      |    p.prior_md5, c.cur_md5
      |  FROM prior p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id)
      |SELECT doc_id, status, prior_md5, cur_md5 FROM delta
      |WHERE status <> 'same' ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    // Presence flags, NOT digest NULL-ness, drive the added/deleted
    // split (the oracle keys off p.doc_id/c.doc_id): a NULL-text row
    // present in both snapshots has NULL digests on both sides and
    // must classify through the changed/same md5 compare (where the
    // non-null-safe <> makes it 'same', as the oracle's does).
    val cur = docs.where(pmod(col("doc_id"), lit(13)) =!= 5)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("cur_md5"),
        lit(true).as("in_cur"))
    val priorText = when(pmod(col("doc_id"), lit(7)) === 2,
      concat(col("text"), lit(" (rev1)"))).otherwise(col("text"))
    val prior = docs.where(pmod(col("doc_id"), lit(11)) =!= 3)
      .select(col("doc_id"), md5(priorText.cast("binary")).as("prior_md5"),
        lit(true).as("in_prior"))
    prior.join(cur, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_prior").isNull, "added")
          .when(col("in_cur").isNull, "deleted")
          .when(col("prior_md5") =!= col("cur_md5"), "changed")
          .otherwise("same").as("status"),
        col("prior_md5"), col("cur_md5"))
      .where(col("status") =!= "same")
      .orderBy(col("doc_id"))
  }

  /** SCD TYPE-2 history build — the interval-versioned counterpart of
    * `q_dim_merge`'s Type-1 classify: for each entity, the sequence of
    * DISTINCT consecutive states across three dimension snapshots
    * (cuts at Jan 8 / 16 / 24 — all three SFs span the full month),
    * each version carrying [valid_from_snap, valid_to_snap) and an
    * is_current flag — the versioned-dimension table a warehouse keeps
    * so facts can join "the supplier AS OF the order date". Presence
    * is monotone here (a snapshot is latest-state-so-far, so a key
    * never disappears) — a real CDC feed adds closes-on-delete, the
    * same lead() column.
    *
    * Scale shape: the three snapshots are derived in-plan from the
    * event history FOR THE ORACLE (the q_dim_merge / q_mv_refresh
    * stance — production reads the stored version table and merges
    * ONE new snapshot); everything is keyed by the entity: one
    * (snap, user) window over the cut-joined events, then
    * dimension-grain lag/lead windows per user — high-cardinality
    * partition keys, no corpus-wide window, nothing driver-side. */
  private val qDimScd2 = Q("q_dim_scd2",
    """WITH ev AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, value
      |            FROM events),
      |cuts(snap, cut) AS (VALUES
      |  (1, TIMESTAMP '2024-01-08'), (2, TIMESTAMP '2024-01-16'),
      |  (3, TIMESTAMP '2024-01-24')),
      |snapshots AS (SELECT snap, user_id, value FROM (
      |    SELECT c.snap, e.user_id, e.value,
      |      row_number() OVER (PARTITION BY c.snap, e.user_id
      |        ORDER BY e.ts DESC, e.event_id DESC) AS rn
      |    FROM ev e JOIN cuts c ON e.ts < c.cut) WHERE rn = 1),
      |marked AS (SELECT user_id, snap, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY snap) AS pv,
      |    lag(snap) OVER (PARTITION BY user_id ORDER BY snap) AS ps
      |  FROM snapshots),
      |vers AS (SELECT user_id, snap AS vf, value
      |  FROM marked WHERE ps IS NULL OR value <> pv)
      |SELECT user_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY vf)
      |    AS BIGINT) AS version,
      |  value,
      |  CAST(vf AS BIGINT) AS valid_from_snap,
      |  CAST(lead(vf) OVER (PARTITION BY user_id ORDER BY vf)
      |    AS BIGINT) AS valid_to_snap,
      |  lead(vf) OVER (PARTITION BY user_id ORDER BY vf) IS NULL
      |    AS is_current
      |FROM vers
      |ORDER BY user_id, version""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = t(s, d, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val cuts = Seq(1 -> "2024-01-08", 2 -> "2024-01-16", 3 -> "2024-01-24")
      .map { case (i, day) =>
        (i, java.sql.Timestamp.valueOf(s"$day 00:00:00"))
      }.toDF("snap", "cut")
    val wSnap = Window.partitionBy(col("snap"), col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val snapshots = ev.join(broadcast(cuts), col("ts") < col("cut"))
      .withColumn("rn", row_number().over(wSnap))
      .where(col("rn") === 1)
      .select(col("snap"), col("user_id"), col("value"))
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("snap"))
    val vers = snapshots
      .withColumn("pv", lag(col("value"), 1).over(wUser))
      .withColumn("ps", lag(col("snap"), 1).over(wUser))
      .where(col("ps").isNull || col("value") =!= col("pv"))
      .select(col("user_id"), col("snap").as("vf"), col("value"))
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("vf"))
    vers
      .select(col("user_id"),
        row_number().over(wVer).cast("long").as("version"),
        col("value"),
        col("vf").cast("long").as("valid_from_snap"),
        lead(col("vf"), 1).over(wVer).cast("long").as("valid_to_snap"),
        lead(col("vf"), 1).over(wVer).isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val all: Seq[Q] =
    Seq(qDimMerge, qZorder, qMvRefresh, qCompactPlan, qSnapshotDiff, qDimScd2)
}
