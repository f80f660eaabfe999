package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HeavyHitters
import graft.functions.HeavyHitters.Summary

/** Pins the raw Misra–Gries summary the `q_sketch_heavy` oracle can
  * only see through its theorem verdicts: exactness below capacity,
  * the three guarantees on adversarial streams, and their
  * merge-order INDEPENDENCE (the contents may differ between merge
  * orders; the theorems may not). */
class HeavyHittersSpec extends AnyFunSuite {

  private val M = 8
  private val Cap = 2 * M

  private def fresh() = new Summary(mutable.HashMap.empty, 0L)

  private def feed(s: Summary, items: Seq[String]): Summary = {
    items.foreach(HeavyHitters.insert(s, _, 1L, Cap, M))
    s
  }

  private def exact(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def checkGuarantees(s: Summary, items: Seq[String]): Unit = {
    val truth = exact(items)
    val n = items.size.toLong
    assert(s.counts.size <= Cap, "summary exceeded capacity")
    assert(s.err <= n / (M + 1), s"err ${s.err} above mass bound ${n / (M + 1)}")
    truth.foreach { case (k, t) =>
      val est = s.counts.getOrElse(k, 0L)
      assert(est <= t, s"$k: est $est above true $t")
      assert(t <= est + s.err, s"$k: true $t above est $est + err ${s.err}")
      if (t > n / (M + 1))
        assert(est > 0, s"heavy key $k (true $t > ${n / (M + 1)}) evicted")
    }
    // absent keys: the same bounds, est = 0
    assert(s.counts.getOrElse("never-seen", 0L) == 0L)
  }

  test("below capacity the summary is exact with zero error") {
    val items = (1 to 10).flatMap(i => Seq.fill(i)(s"w$i"))
    val s = feed(fresh(), Random.shuffle(items))
    assert(s.err == 0L)
    assert(s.counts.toMap == exact(items))
  }

  test("guarantees hold on a skewed stream with heavy churn") {
    val rnd = new Random(7)
    // 3 heavy keys + a long uniform tail of 500 distinct light keys
    val items = rnd.shuffle(
      Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma") ++
        (1 to 1000).map(i => s"tail${i % 500}"))
    checkGuarantees(feed(fresh(), items), items)
  }

  test("guarantees survive arbitrary merge orders (contents may not)") {
    val rnd = new Random(13)
    val items = rnd.shuffle(
      Seq.fill(500)("hot") ++ Seq.fill(250)("warm") ++
        (1 to 1200).map(i => s"cold${rnd.nextInt(300)}"))
    val parts = items.grouped(97).toSeq.map(p => feed(fresh(), p))
    def mergeAll(order: Seq[Summary]): Summary =
      order.map(copySummary).reduce(HeavyHitters.mergeInto(_, _, M))
    val leftToRight = mergeAll(parts)
    val reversed = mergeAll(parts.reverse)
    checkGuarantees(leftToRight, items)
    checkGuarantees(reversed, items)
    // the theorem-level view agrees even when raw contents differ
    assert(leftToRight.counts.getOrElse("hot", 0L) > 0)
    assert(reversed.counts.getOrElse("hot", 0L) > 0)
  }

  private def copySummary(s: Summary): Summary =
    new Summary(s.counts.clone(), s.err)

  test("compact keeps at most m entries and accounts the subtraction") {
    val s = fresh()
    (1 to Cap + 1).foreach(i => s.counts.update(s"k$i", i.toLong))
    val massBefore = s.counts.values.sum + s.err
    HeavyHitters.compact(s, M)
    assert(s.counts.size <= M)
    assert(s.err > 0)
    // mass only shrinks (subtractions are accounted once in err)
    assert(s.counts.values.sum + s.err <= massBefore)
  }

  test("end-to-end through the Catalyst aggregate on a real plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(29)
    val items = rnd.shuffle(
      Seq.fill(600)("big") ++ Seq.fill(300)("mid") ++
        (1 to 2000).map(i => s"small${rnd.nextInt(400)}"))
    val df = items.toDF("k").repartition(8)
    val row = df.agg(HeavyHitters.sketch(col("k"), M).as("hh"))
      .select(col("hh.items").as("items"), col("hh.err").as("err"))
      .head()
    val est = row.getMap[String, Long](0)
    val err = row.getLong(1)
    val truth = exact(items)
    val n = items.size.toLong
    assert(err <= n / (M + 1))
    truth.foreach { case (k, t) =>
      val e = est.getOrElse(k, 0L)
      assert(e <= t && t <= e + err, s"$k: est $e true $t err $err")
      if (t > n / (M + 1)) assert(e > 0, s"heavy key $k evicted")
    }
    // serialization boundary actually exercised: 8 partials merged
    assert(est.size <= Cap)
  }
}
