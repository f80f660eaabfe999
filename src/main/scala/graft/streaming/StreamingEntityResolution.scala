package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GraftExpressions

/** Streaming record linkage — the ingest form of
  * `q_entity_resolution`: as listings arrive, each is scored against
  * the residents of its blocks and match pairs stream out the moment
  * the second member arrives. This is the production shape for a
  * catalog that grows record-by-record: a new listing is linked
  * against the standing corpus without any corpus×corpus rework.
  *
  * Equivalence contract (pinned by StreamingEntityResolutionSpec):
  * under MONOTONE-ID ingest (ids non-decreasing across micro-batches
  * — the natural order of autoincrement/skolem ingest keys, and the
  * fixture's), the distinct emitted (ai, bi, score) set over any
  * prefix equals the batch `matchPairs` graph on the same listings.
  * The batch sorted-neighborhood window pairs each listing with the
  * PREVIOUS ≤ W members of its block in id order; with monotone
  * arrival that is exactly "the last ≤ W residents at arrival time",
  * so the stream needs only a W-deep buffer per block — BOUNDED state
  * (W · two blocking legs rows per block), vs the unbounded
  * all-residents state an unwindowed formulation would need. Out of
  * order WITHIN a micro-batch is fine (the group sorts its batch
  * slice); out of order ACROSS batches degrades gracefully to
  * "scored against the current window" — the same recall caveat
  * sorted-neighborhood itself has.
  *
  * Scale stance: the stateless prefix explodes each listing into its
  * two blocking-leg keys, so the only stateful exchange carries two
  * key-value rows per listing; per-group work is ≤ W scorings; the
  * scoring kernel is the SAME `jaroWinklerOf` object the batch
  * expression calls, and rounding is the same HALF_UP-to-4 grid — the
  * two paths cannot drift. A pair whose listings share both blocks is
  * emitted by both legs with identical scores; downstream dedups
  * (the [[StreamingDedup]] contract — plain distinct).
  */
object StreamingEntityResolution {

  case class MatchPair(ai: Long, bi: Long, score: Double)

  /** `size` rides as its canonical string (integer-cast) so a NULL
    * size survives the tuple encoder — a primitive Int field would
    * throw on it and kill the query. */
  private[streaming] case class Rec(id: Long, name: String, typ: String,
    size: String)

  private[streaming] case class Block(recs: Vector[Rec])

  /** Mirrors the batch scorer exactly — including its NULL algebra:
    * composite JW (0.6 name + 0.2 type [weight surrendered when
    * either side is empty OR NULL — Catalyst's `null =!= ""` is null,
    * so `when` falls through to 0 / den 0.8] + 0.2 size-equality
    * [`null === x` is null → no credit, even for null = null]);
    * a NULL name makes the batch composite NULL, which the threshold
    * filter drops — mirrored as a never-matching score. HALF_UP to 4
    * decimals ≡ Spark's `round(num / den, 4)`. */
  private def score(a: Rec, b: Rec): Double = {
    if (a.name == null || b.name == null) return -1.0
    def jw(x: String, y: String): Double =
      GraftExpressions.jaroWinklerOf(
        UTF8String.fromString(x), UTF8String.fromString(y))
    val bothTyped = a.typ != null && a.typ.nonEmpty &&
      b.typ != null && b.typ.nonEmpty
    val num = 0.6 * jw(a.name, b.name) +
      (if (bothTyped) 0.2 * jw(a.typ, b.typ) else 0.0) +
      (if (a.size != null && a.size == b.size) 0.2 else 0.0)
    val den = 0.8 + (if (bothTyped) 0.2 else 0.0)
    // java BigDecimal.valueOf (the canonical-string grid), NOT scala
    // BigDecimal(double) (the exact-binary grid): Catalyst's Round on
    // DoubleType rounds via valueOf, and the two grids differ exactly
    // on boundary values (the StreamingMoments r11 lesson)
    java.math.BigDecimal.valueOf(num / den)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** listings: streaming DataFrame with (id, name, brand, typ, size)
    * → match pairs ≥ `threshold`. `w` is the sorted-neighborhood
    * depth (the batch query's W). */
  def pairs(spark: SparkSession, listings: DataFrame,
      threshold: Double = 0.93, w: Int = 10,
      idleTimeout: Option[String] = None): Dataset[MatchPair] = {
    import spark.implicits._
    val sep = "\u0001" // unambiguous key join: "B1"+"2" != "B12"+""
    // per-field null TAG before joining: concat_ws silently DROPS null
    // elements together with their separator, so ('B1', NULL, '7') and
    // ('B1', '7', NULL) would collide into one block — while the batch
    // twin's Window.partitionBy keys NULL as its own group per column.
    // Tagging (n = null, v<value> otherwise) keeps the streaming block
    // key injective over the same tuples the batch window partitions on.
    def tagged(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("n")).otherwise(concat(lit("v"), c.cast("string")))
    val keyed = listings
      .select(col("id"), col("name"), col("typ"),
        col("size").cast("string").as("size"),
        explode(array(
          concat_ws(sep, lit("A"), tagged(col("brand")), tagged(col("typ")),
            tagged(col("size"))),
          concat_ws(sep, lit("B"), tagged(col("brand")), tagged(col("name")))))
          .as("bk"))
      .as[(Long, String, String, String, String)]
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed
      .groupByKey(_._5)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: String, it: Iterator[(Long, String, String, String, String)],
            state: GroupState[Block]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var recs = state.getOption.map(_.recs).getOrElse(Vector.empty)
            val out = Seq.newBuilder[MatchPair]
            // deterministic order within the micro-batch slice; the
            // cross-batch order is the caller's monotone-id contract
            it.toSeq.sortBy(_._1).foreach { case (id, name, typ, size, _) =>
              if (!recs.exists(_.id == id)) {
                val r = Rec(id, name, typ, size)
                recs.foreach { o =>
                  val sc = score(o, r)
                  if (sc >= threshold)
                    out += MatchPair(math.min(o.id, r.id),
                      math.max(o.id, r.id), sc)
                }
                recs = (recs :+ r).takeRight(w) // W-deep window, bounded
              }
            }
            state.update(Block(recs))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
        })
  }
}
