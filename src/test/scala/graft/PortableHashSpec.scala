package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PortableHash

class PortableHashSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("digestOf (numeric path) equals the hex-parse form and the SQL md5Long % P") {
    def hexForm(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % PortableHash.P
    }
    val samples = Seq("", "a", "lemma", "Bäume", "x" * 300) ++
      (0 until 200).map(i => s"w$i")
    samples.foreach(s => assert(PortableHash.digestOf(s) == hexForm(s), s))
    // and against the Spark SQL expression itself
    val df = samples.toDF("s")
      .select((PortableHash.md5Long(org.apache.spark.sql.functions.col("s"))
        % PortableHash.P).as("h"))
    assert(df.as[Long].collect().toSeq == samples.map(PortableHash.digestOf))
  }

  test("md5Long is deterministic, non-negative, and < 2^60") {
    val vals = Seq("a", "b", "obskur", "", "ä-umlaut").toDF("s")
      .select(PortableHash.md5Long(org.apache.spark.sql.functions.col("s")))
      .as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 60)))
    assert(vals.distinct.length == vals.length)
  }

  test("hash family members stay within [0, P) for arbitrary digests") {
    val gen = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    val samples = Iterator.from(0)
      .map(i => gen(Gen.Parameters.default, Seed(i.toLong)))
      .take(200).flatten.toSeq
    assert(samples.nonEmpty)
    samples.foreach { x =>
      val h0 = math.floorMod(x, PortableHash.P)
      (0 until 32).foreach { i =>
        val m = (PortableHash.aCoef(i) * h0 + PortableHash.bCoef(i)) % PortableHash.P
        assert(m >= 0 && m < PortableHash.P)
      }
    }
  }
}
