package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall harness for the three ANN paths against the exact
  * brute-force baseline — "measure, don't guess" applied to
  * approximation quality. The pinned floors/ceilings document the
  * measured behavior on this corpus's geometry (near-tie cosine
  * margins — see q_knn_pq scaladoc): IVF ≈ 0.92 because it
  * approximates only the candidate set and scores exactly; PQ ≈ 0.28
  * because ADC approximates the score itself; single-bucket LSH ≈ 0
  * at this similarity regime (its own scaladoc predicts ~2.5%
  * co-bucket probability for 60° pairs). */
class AnnRecallSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def topSetsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def topSets(name: String): Map[Long, Set[Long]] =
    topSetsOf(SparkEntry.queries(name)(spark, sf))

  private def recallsOf(m: Map[Long, Set[Long]],
      brute: Map[Long, Set[Long]]): Iterable[Double] =
    brute.map { case (q, bs) =>
      bs.intersect(m.getOrElse(q, Set.empty)).size.toDouble / bs.size
    }

  private def meanRecall(method: String, brute: Map[Long, Set[Long]]): Double = {
    val rs = recallsOf(topSets(method), brute)
    rs.sum / rs.size
  }

  test("measured recall@5 of each ANN path vs brute force") {
    val brute = topSets("q_knn_brute")
    assert(brute.size == 10)
    val trainedSets = topSetsOf(
      graft.queries.SimilarityQueries.knnIvfTrained(spark, sf))
    val ivf = meanRecall("q_knn_ivf", brute)
    val ivfTrained = {
      val rs = recallsOf(trainedSets, brute); rs.sum / rs.size
    }
    // the oracle-checked entry's per-query floor must hold with margin
    val perQueryMin = recallsOf(trainedSets, brute).min
    info(f"trained-IVF per-query min recall@5: $perQueryMin%.2f")
    assert(perQueryMin >= 0.4, s"per-query recall under the q_knn_ivf_trained floor: $perQueryMin")
    val pq = meanRecall("q_knn_pq", brute)
    val lsh = meanRecall("q_knn_lsh", brute)
    val lshMulti = meanRecall("q_knn_lsh_multi", brute)
    info(f"recall@5: ivf=$ivf%.2f ivf_trained=$ivfTrained%.2f " +
      f"lsh_multi=$lshMulti%.2f pq=$pq%.2f lsh=$lsh%.2f")
    assert(ivf >= 0.85, s"IVF recall regressed: $ivf")
    // nprobe=4 operating point (see q_knn_ivf_trained's seeding study:
    // measured 0.92; seeding changes don't buy recall on this corpus,
    // probe width does)
    assert(ivfTrained >= 0.85, s"trained-IVF recall regressed: $ivfTrained")
    assert(lshMulti >= 0.6, s"multi-table LSH recall regressed: $lshMulti")
    assert(pq >= 0.20, s"PQ recall regressed: $pq")
    // candidate-approximation (exact scoring) must beat
    // score-approximation here — the documented reading of this
    // corpus's low-margin geometry; banding amplification must beat
    // the single 8-bit bucket (measured 0.72 vs 0.00)
    assert(ivf > pq && lshMulti > pq && pq > lsh)
  }
}
