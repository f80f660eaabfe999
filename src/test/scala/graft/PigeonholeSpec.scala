package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pigeonhole

/** The widened pigeonhole construction (segment-width knob): exact
  * recall at every segment count, Column ≡ JVM twin, and the classic
  * banding as the s = h+1 special case. */
class PigeonholeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val H = 4

  private def rng = new scala.util.Random(41)

  /** Deterministic signature pairs at Hamming exactly `d`. */
  private def pairsAt(d: Int, n: Int): Seq[(Long, Long)] = {
    val r = rng
    (0 until n).map { _ =>
      val a = r.nextLong()
      var b = a
      var flipped = Set.empty[Int]
      while (flipped.size < d) {
        val k = r.nextInt(64)
        if (!flipped.contains(k)) { flipped += k; b ^= (1L << k) }
      }
      (a, b)
    }
  }

  test("exact recall: every pair within Hamming <= h shares a combo key, for s = 5, 6, 8") {
    for (s <- Seq(5, 6, 8); d <- 0 to H) {
      val ph = Pigeonhole(64, H, s)
      pairsAt(d, 200).foreach { case (a, b) =>
        val shared = ph.combos.indices.exists(ix =>
          ph.comboValueLong(a, ix) == ph.comboValueLong(b, ix))
        assert(shared, f"s=$s d=$d: no shared combo for $a%016x / $b%016x")
      }
    }
  }

  test("default segments is the classic per-segment banding") {
    val ph = Pigeonhole(64, H)
    assert(ph.segments === H + 1)
    assert(ph.combos === (0 until 5).map(Seq(_)))
    val r = rng
    (0 until 100).foreach { _ =>
      val sig = r.nextLong()
      (0 until 5).foreach { j =>
        assert(ph.comboValueLong(sig, j) === ph.segmentValueLong(sig, j))
      }
    }
  }

  test("comboValue Column form is bit-identical to the JVM twin") {
    import spark.implicits._
    val sigs = { val r = rng; Seq.fill(300)(r.nextLong()) }
    for (s <- Seq(5, 6, 8)) {
      val ph = Pigeonhole(64, H, s)
      val df = sigs.toDF("sig").select(col("sig") +:
        ph.combos.indices.map(ix => ph.comboValue(col("sig"), ix).as(s"c$ix")): _*)
      df.collect().foreach { row =>
        val sig = row.getLong(0)
        ph.combos.indices.foreach { ix =>
          assert(row.getLong(ix + 1) === ph.comboValueLong(sig, ix),
            f"s=$s combo $ix of $sig%016x")
        }
      }
    }
  }

  test("widened keys genuinely widen: combo widths grow with s - h") {
    for (s <- Seq(5, 6, 8)) {
      val ph = Pigeonhole(64, H, s)
      val keyBits = ph.combos.map(_.map(j => ph.segBounds(j)._2).sum)
      assert(keyBits.forall(_ >= (s - H) * (64 / s)), s"s=$s: $keyBits")
      assert(ph.combos.size === (s - H match {
        case 1 => s
        case c => ((s - c + 1) to s).product / (1 to c).product
      }))
    }
  }
}
