package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Reference union-find, driver-side. */
  private def ufLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("min-label propagation equals union-find on random graphs") {
    val genEdges = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      // b is drawn from n-1 values and shifted past a — no filter, no
      // discard blowup at small n (a `b if b != a` filter discards
      // (2/3)^40 of samples at n=2 and can make ScalaCheck give up)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b0 <- Gen.choose(0L, n.toLong - 1)
      } yield (a, if (b0 >= a) b0 + 1 else b0))
    } yield edges
    val prop = Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = ConnectedComponents.resolve(edges.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        got == ufLabels(edges)
      }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("chain graph converges to the minimum endpoint") {
    // worst diameter for label propagation: a path 9-8-...-0
    val chain = (0L until 9L).map(i => (i + 1, i))
    val got = ConnectedComponents.resolve(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 10 && got.values.forall(_ == 0L))
  }

  test("alternating large/small-star equals union-find on random graphs") {
    val genEdges = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(1, 35)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b0 <- Gen.choose(0L, n.toLong - 1)
      } yield (a, if (b0 >= a) b0 + 1 else b0))
    } yield edges
    val prop = Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = ConnectedComponents.resolveAlternating(edges.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        got == ufLabels(edges)
      }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("alternating variant handles the adversarial long chain") {
    val chain = (0L until 40L).map(i => (i + 1, i))
    val got = ConnectedComponents.resolveAlternating(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("incremental contraction identity on random prior/new splits") {
    // The identity q_dedup_cc_incremental rests on: with each prior
    // component contracted to its REPRESENTATIVE (= its min id),
    // min-label CC over {contracted new edges} expanded back through
    // the prior labeling equals min-label CC over the full union
    // graph. Adversarial shapes the corpus may not exercise — new
    // node as the new global min, chains alternating prior/new,
    // multi-component merges — all land here via random splits.
    val genCase = for {
      n <- Gen.choose(2, 30)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b0 <- Gen.choose(0L, n.toLong - 1)
      } yield (a, if (b0 >= a) b0 + 1 else b0))
      priorMask <- Gen.listOfN(n + 1, Gen.prob(0.6))
    } yield (edges, priorMask.zipWithIndex.collect {
      case (true, i) => i.toLong
    }.toSet)
    val prop = Prop.forAll(genCase) { case (edges, prior) =>
      edges.isEmpty || {
        val priorEdges = edges.filter(e => prior(e._1) && prior(e._2))
        val newEdges = edges.filterNot(e => prior(e._1) && prior(e._2))
        val plbl = ufLabels(priorEdges)
        def rep(x: Long): Long =
          if (prior(x)) plbl.getOrElse(x, x) else x
        val clbl = ufLabels(newEdges.map(e => (rep(e._1), rep(e._2))))
        val want = ufLabels(edges)
        // every union-graph node's label, reconstructed incrementally
        want.forall { case (node, lbl) =>
          val r = rep(node)
          clbl.getOrElse(r, r) == lbl
        }
      }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
