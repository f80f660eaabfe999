package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (fact) side, replicate
  * the build side per salt bucket.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default here) already splits oversized sort-merge partitions
  * at runtime; this operator is the *authored* fallback for the cases
  * AQE can't fix — a broadcast-ineligible build side probed by a fact
  * table whose key distribution is pathological (one lemma = 30% of
  * all page views is the realistic shape for dictionary traffic).
  *
  * `fact ⋈ dim on k` becomes
  * `(fact + salt∈[0,S)) ⋈ (dim × [0,S)) on (k, salt)` — each hot key
  * spreads over S reducers; dim rows replicate S× (acceptable when
  * |dim| ≪ |fact|, the stream–static enrichment shape).
  */
object SkewJoin {

  def salted(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full outer would emit `salt` null-padded rows per
    // unmatched dim key (the dim side is replicated per bucket)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"salted join supports fact-preserving join types only, got $joinType")
    val f = fact.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salt)))
    val d = dim.withColumn("_salt", explode(array((0 until salt).map(lit(_)): _*)))
    f.join(d, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
