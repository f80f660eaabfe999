package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions.jaro_winkler

/** Pins the [[graft.functions.GraftExpressions.JaroWinkler]] kernel to
  * DuckDB's `jaro_winkler_similarity` (the oracle-side function
  * `q_entity_resolution` scores with) and the ER pipeline's structural
  * invariants. The expected values below were read DIRECTLY from
  * DuckDB v1.0.0 — including its two deviations from the textbook
  * definition (either side empty ⇒ 0.0, even for two empties) — after
  * a 25k-random-pair sweep found zero other disagreements with the
  * standard boost-0.7 / prefix-4 / p=0.1 variant. */
class EntityResolutionSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  private val pinned: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("old ring", "cold ring", 0.9629629629629629),
    ("small ring", "samll ring", 0.97),
    ("", "", 0.0),
    ("a", "", 0.0),
    ("abc", "abc", 1.0),
    ("ECONOMY", "STANDARD", 0.4226190476190476),
    ("large bolt", "large plate", 0.9054545454545454),
    ("red widget", "red widgte", 0.98),
    ("hot plate", "hot plat", 0.9777777777777777),
    ("x", "y", 0.0),
    ("ab", "ba", 0.0),
    ("Brand#17", "Brand#71", 0.975),
    ("promo anodized tin", "PROMO ANODIZED TIN", 0.40740740740740744))

  test("JaroWinkler matches DuckDB jaro_winkler_similarity on pinned pairs") {
    val got = pinned.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    pinned.zip(got).foreach { case ((a, b, want), v) =>
      assert(math.abs(v - want) <= 1e-12, s"jw('$a','$b') = $v, want $want")
    }
  }

  test("JaroWinkler survives CODEGEN_ONLY and handles nulls") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val got = pinned.map { case (a, b, _) => (a, b) }
        .toDF("a", "b")
        .select(jaro_winkler(col("a"), col("b")))
        .as[Double].collect().toSeq
      pinned.zip(got).foreach { case ((a, b, want), v) =>
        assert(math.abs(v - want) <= 1e-12, s"jw('$a','$b') = $v, want $want")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val n = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option("y")))
      .toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b")).as("j"))
    assert(n.where(col("j").isNotNull).count() == 0)
  }

  test("ER pipeline: every planted variant lands in a multi-listing entity") {
    val res = queries.EntityQueries.all.head.fn(spark, Sf)
      .select(col("entity_id"), col("n_listings")).collect()
    assert(res.nonEmpty)
    // singletons never reach the match graph — every reported entity
    // is a genuine multi-listing cluster
    assert(res.forall(_.getLong(1) >= 2L))
    // every planted variant ALWAYS matches its source (V1 worst case:
    // an adjacent transposition on a 7-char name scores 0.974 > 0.93;
    // V2 scores exactly 1.0 through the null-aware denominator), and
    // its source joins the same cluster — so the clustered-listing
    // total must cover all variants plus their distinct sources.
    // Confusable merges only coalesce clusters; they never shed a
    // member, so this floor is exact regardless of merging.
    val n = Tables(spark, Sf, "part").count()
    val v1 = (0L until n).count(_ % 5 == 0)
    val v2 = (0L until n).count(_ % 10 == 0)
    val sources = v1 // every %10 source is also a %5 source
    val clustered = res.map(_.getLong(1)).sum
    assert(clustered >= v1 + v2 + sources,
      s"$clustered clustered listings < ${v1 + v2 + sources} planted")
  }

  test("JaroWinkler properties: symmetry, [0,1] range, identity") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](gen: Gen[A], n: Int): Seq[A] =
      Iterator.from(0).map(i => gen(Gen.Parameters.default, Seed(i.toLong)))
        .take(n).flatten.toSeq
    val sGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
      .map(_.mkString.take(30))
    val pairs = samples(Gen.zip(sGen, sGen), 500)
    import graft.functions.GraftExpressions.jaroWinklerOf
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    pairs.foreach { case (a, b) =>
      val ab = jaroWinklerOf(u(a), u(b))
      // symmetry: the match window and transposition count are
      // direction-independent
      assert(ab == jaroWinklerOf(u(b), u(a)), s"asym '$a' '$b'")
      assert(ab >= 0.0 && ab <= 1.0, s"range '$a' '$b' -> $ab")
    }
    // identity is 1.0 for any NONEMPTY string (empty ⇒ 0.0, the
    // pinned DuckDB deviation)
    samples(sGen, 100).filter(_.nonEmpty).foreach { a =>
      assert(jaroWinklerOf(u(a), u(a)) == 1.0, s"identity '$a'")
    }
    assert(jaroWinklerOf(u(""), u("")) == 0.0)
  }

  test("sorted-neighborhood keeps the clustered population linearly bounded") {
    // candidates are <= 2 passes * W per listing, match edges are a
    // subset of candidates, and a clustered listing needs at least one
    // edge — so the clustered population can never exceed 2 * (2*W*L)
    // endpoints no matter how skewed a block gets. The real point of
    // the windowing is the candidate bound; this asserts its visible
    // consequence on the query output.
    val n = Tables(spark, Sf, "part").count()
    val listings = n + (0L until n).count(_ % 5 == 0) +
      (0L until n).count(_ % 10 == 0)
    val clustered = queries.EntityQueries.all.head.fn(spark, Sf)
      .agg(sum(col("n_listings"))).as[Long].head()
    assert(clustered <= listings) // every listing counted at most once
  }
}
