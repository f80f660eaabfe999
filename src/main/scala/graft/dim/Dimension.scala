package graft.dim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension-side preparation (reference: `wbdb.clj:12-40`).
  *
  * The reference loads the full MySQL `lemma ⋈ article` join into an
  * in-memory map and argmin-dedups homographs once at load time — a
  * build-side reduction applied BEFORE the per-event probe. Catalyst
  * will not invent that ordering, so the engine authors it explicitly:
  * dedup the (small) dimension first, then broadcast it into the
  * enrichment join. At 100 TB of facts the dimension stays ~10⁵–10⁶
  * rows, i.e. always broadcastable; the fact side never shuffles.
  */
object Dimension {

  /** A1 — argmin-per-group homograph dedup (`wbdb.clj:20-28`): per
    * `key`, keep the record minimizing `ord` (nulls rank as 0, like
    * the reference treats a missing hidx). The reference's tie-break
    * is map-iteration order; we make it a deterministic total order by
    * tie-breaking on the remaining columns (documented fix,
    * SURVEY.md §7.5).
    */
  def dedupBy(dim: DataFrame, key: String, ord: String): DataFrame = {
    val rest = dim.columns.filter(_ != key).toSeq
    val payload = struct(rest.map(col): _*)
    val order = struct(coalesce(col(ord), lit(0)) +: rest.map(col): _*)
    dim.groupBy(col(key))
      .agg(min_by(payload, order).as("_r"))
      .select(col(key) +: rest.map(c => col("_r." + c).as(c)): _*)
  }
}
