package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a custom typed aggregate — the UDAF extension
  * point (SURVEY.md §2.11) demonstrated with a sketch a training-data
  * pipeline actually needs (approximate term frequencies without a
  * full groupBy over the vocabulary).
  *
  * Determinism: counter updates are additive and the merge is an
  * element-wise sum, so the result is independent of partitioning and
  * merge order — which makes this sketch *oracle-checkable*: the
  * DuckDB twin recomputes the same d×w counter matrix with the same
  * portable hash family (PortableHash) and must agree exactly.
  *
  * Input is the already-hashed token digest (h0 = md5Long mod P), so
  * the aggregator is pure integer math; d rows × w buckets of Long.
  */
object CountMin {

  val D = 4    // hash rows
  val W = 256  // buckets per row

  /** Bucket of digest h0 in row i. */
  def bucket(h0: Long, i: Int): Int =
    (((PortableHash.aCoef(i) * h0 + PortableHash.bCoef(i)) % PortableHash.P) % W).toInt

  class CmsAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](D * W)
    override def reduce(buf: Array[Long], h0: Long): Array[Long] = {
      var i = 0
      while (i < D) { buf(i * W + bucket(h0, i)) += 1; i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate from a finished sketch. */
  def estimate(sketch: Array[Long], h0: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < D) {
      val c = sketch(i * W + bucket(h0, i))
      if (c < best) best = c
      i += 1
    }
    best
  }
}
