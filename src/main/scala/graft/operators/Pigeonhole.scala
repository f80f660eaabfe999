package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pigeonhole segmentation of a fixed-width bit signature for
  * Hamming-banded candidate generation (public technique: Manku/Jain/
  * Das Sarma, "Detecting Near-Duplicates for Web Crawling", WWW'07
  * §3): split a `bits`-wide signature into `maxHamming`+1 contiguous
  * segments — a pair at Hamming distance ≤ `maxHamming` has its
  * differing bits in at most `maxHamming` segments, so AT LEAST ONE
  * segment is bit-identical. Candidate generation is therefore an
  * exact-recall equi-join on (segment index, segment value): linear-ish
  * in true near-dup density, never all-pairs.
  *
  * Shared by `q_dedup_simhash_pairs` (32-bit text simhash) and
  * `q_dedup_phash` (64-bit image dHash) — the segmentation is pure
  * arithmetic on the signature column, so both stay inside whole-stage
  * codegen.
  */
final case class Pigeonhole(bits: Int, maxHamming: Int) {
  val segments: Int = maxHamming + 1

  /** (bit offset, width) per segment; first `bits % segments` segments
    * get one extra bit. */
  val segBounds: Seq[(Int, Int)] = {
    val base = bits / segments
    val extra = bits % segments
    val widths = (0 until segments).map(j => base + (if (j < extra) 1 else 0))
    widths.scanLeft(0)(_ + _).init.zip(widths)
  }

  /** Segment `j` of the signature as an unsigned value. Unsigned
    * shift so a 64-bit signature's sign bit never sign-extends into
    * the mask; the mask itself is safe for every width < 64 (and a
    * single 64-wide segment needs no mask). */
  def segmentValue(sig: Column, j: Int): Column = {
    val (off, w) = segBounds(j)
    val shifted = shiftrightunsigned(sig, off)
    if (w == 64) shifted
    else shifted.bitwiseAND(lit((1L << w) - 1))
  }

  /** JVM twin of [[segmentValue]] — bit-identical to the Column form
    * by construction (same bounds, same unsigned shift); for JVM-side
    * probes and references that must agree with the SQL banding. */
  def segmentValueLong(sig: Long, j: Int): Long = {
    val (off, w) = segBounds(j)
    val shifted = sig >>> off
    if (w == 64) shifted else shifted & ((1L << w) - 1)
  }
}
