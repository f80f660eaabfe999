package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Pigeonhole
import graft.queries.MultimodalQueries
import graft.Fence.FenceOps

/** Measures the pigeonhole SEGMENT-WIDTH knob (PLANS.md round-9
  * named it as "the standard knob if a corpus ever pushes the verify
  * stage to dominance"; this probe gives the claim its numbers): on
  * the real dHash signature corpus at sf0.1 and the synthetic sf1,
  * compare the default banding (s = h+1 segments, ~13-bit keys)
  * against the widened Manku constructions (s segments, keys = every
  * (s−h)-subset concatenated):
  *
  *   s=5 c=1 →  5 keys/doc, ~13-bit keys   (the shipped default)
  *   s=6 c=2 → 15 keys/doc, ~21-bit keys
  *   s=8 c=4 → 70 keys/doc,  32-bit keys
  *
  * Recall is EXACT for all three (≥ s−h clean segments ⇒ one clean
  * subset — the probe REQUIRES identical verified-pair sets), so the
  * trade is pure: banding fanout (rows into the candidate exchange)
  * vs random collision mass (candidate pairs the 8-byte XOR verify
  * must reject). Usage: runMain graft.PigeonholeKnobProbe
  */
object PigeonholeKnobProbe {
  private val H = 4

  private def measure(spark: SparkSession, sig: DataFrame, segments: Int)
      : (Long, Long, Long, Long) = {
    val ph = Pigeonhole(64, H, segments)
    val bands = sig.select(col("doc_id"), col("phash"),
      explode(array(ph.combos.indices.map(ix =>
        struct(lit(ix).as("cx"), ph.comboValue(col("phash"), ix).as("cv"))): _*))
        .as("b"))
      .select(col("doc_id"), col("phash"),
        col("b.cx").as("cx"), col("b.cv").as("cv"))
    val cand = bands.select(col("doc_id").as("a_id"), col("phash").as("sa"),
        col("cx"), col("cv"))
      .join(bands.select(col("doc_id").as("b_id"), col("phash").as("sb"),
        col("cx").as("cx2"), col("cv").as("cv2")),
        col("cx") === col("cx2") && col("cv") === col("cv2") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("sa"), col("sb"))
      .fenced()
    val raw = cand.count()
    val pairs = cand.dropDuplicates("a_id", "b_id")
    val distinct = pairs.count()
    val verified = pairs
      .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= H).count()
    (ph.combos.size.toLong * sig.count(), raw, distinct, verified)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(logLevel = "ERROR")
    val sf1 = HeavyScaleProbe.ensureSf1(spark)
    for ((label, dir) <- Seq("sf0.1" -> "/root/testdata/sf0.1", "sf1" -> sf1)) {
      val sig = MultimodalQueries.phashSig(spark, dir)
      var lastVerified = -1L
      var lastCollisions = Long.MaxValue
      for (s <- Seq(5, 6, 8)) {
        val (fanout, raw, distinct, verified) = measure(spark, sig, s)
        val collisions = distinct - verified
        println(f"KNOB $label%-6s s=$s c=${s - H} fanout=$fanout%9d " +
          f"rawHits=$raw%9d candPairs=$distinct%9d verified=$verified%7d " +
          f"collisions=$collisions%9d")
        // exact recall: every widening must find the IDENTICAL pairs
        require(lastVerified < 0 || verified == lastVerified,
          s"recall changed at s=$s: $verified vs $lastVerified")
        // and the knob must actually buy collision mass down
        require(collisions < lastCollisions,
          s"collision mass did not drop at s=$s: $collisions vs $lastCollisions")
        lastVerified = verified
        lastCollisions = collisions
      }
    }
    spark.stop()
  }
}
