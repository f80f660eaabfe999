package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions._
import graft.queries.SimilarityQueries

class ExpressionsSpec extends AnyFunSuite {
  import TestSpark.{spark, Sf}
  import spark.implicits._

  test("Shingles expression equals the declarative transform(sequence(...)) form") {
    val docs = Tables(spark, Sf, "documents").limit(200)
    val ws = split(lower(col("text")), " ")
    val declarative = docs.select(col("doc_id"),
      explode(when(size(ws) >= 3,
        array_distinct(transform(sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
            element_at(ws, i + 2)))))
        .otherwise(array().cast("array<string>"))).as("sh"))
    val native = docs.select(col("doc_id"),
      explode(shingles(lower(col("text")), 3, dedup = true)).as("sh"))
    assert(native.exceptAll(declarative).count() == 0)
    assert(declarative.exceptAll(native).count() == 0)
  }

  test("Shingles handles short and empty inputs") {
    val out = Seq("", "one", "a b", "a b c", "a b c d")
      .toDF("t").select(shingles(col("t"), 3, dedup = false).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq(), Seq(), Seq(), Seq("a b c"), Seq("a b c", "b c d")))
  }

  test("PlaneBits equals the per-plane HOF sign composition bit-for-bit") {
    import graft.functions.GraftExpressions.plane_bits
    // real ±1 planes (the q_embed_cluster family) on real vectors
    val planes = graft.queries.SimilarityQueries.ClusterPlanes.take(11)
    val weights = Array.tabulate(11)(j => 1L << j)
    val hof = planes.zip(weights).map { case (p, w) =>
      val plane = array(p.map(lit(_)): _*)
      val d = aggregate(zip_with(col("v"), plane, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(d >= 0, lit(w)).otherwise(lit(0L))
    }.reduce(_ + _)
    val e = Tables(spark, Sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val cmp = e.select(plane_bits(col("v"), planes, weights).as("native"),
      hof.as("hofv"))
    assert(cmp.where(col("native") =!= col("hofv")).count() == 0)
    // CODEGEN_ONLY: a broken doGenCode must throw, not silently
    // fall back to interpreted dispatch in every LSH bucket build
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try assert(cmp.where(col("native") =!= col("hofv")).count() == 0)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("SqDist equals the HOF aggregate/zip_with formulation bit-for-bit") {
    import graft.functions.GraftExpressions.sq_dist
    val e = Tables(spark, Sf, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ai"), col("v").as("va"))
    val b = e.select(col("vec_id").as("bi"), col("v").as("vb"))
    val hof = aggregate(zip_with(col("va"), col("vb"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
    val cmp = a.join(b, col("ai") < col("bi"))
      .select(sq_dist(col("va"), col("vb")).as("native"), hof.as("hofv"))
    assert(cmp.where(col("native") =!= col("hofv")).count() == 0)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try assert(cmp.where(col("native") =!= col("hofv")).count() == 0)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("DotProduct equals the HOF aggregate/zip_with formulation bit-for-bit") {
    import graft.functions.GraftExpressions.dot_product
    val e = Tables(spark, Sf, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ai"), col("v").as("va"))
    val b = e.select(col("vec_id").as("bi"), col("v").as("vb"))
    val hof = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val cmp = a.join(b, col("ai") < col("bi"))
      .select(dot_product(col("va"), col("vb")).as("native"), hof.as("hofv"))
    assert(cmp.where(col("native") =!= col("hofv")).count() == 0)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try assert(cmp.where(col("native") =!= col("hofv")).count() == 0)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("CosineSim equals the HOF aggregate/zip_with formulation bit-for-bit") {
    val e = Tables(spark, Sf, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("ai"), col("v").as("va"))
    val b = e.select(col("vec_id").as("bi"), col("v").as("vb"))
    val pairs = a.join(b, col("ai") < col("bi"))
    val hofDot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val hofN = (v: org.apache.spark.sql.Column) =>
      aggregate(zip_with(v, v, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cmp = pairs.select(
      cosine_sim(col("va"), col("vb")).as("native"),
      (hofDot / (sqrt(hofN(col("va"))) * sqrt(hofN(col("vb"))))).as("hof"))
    assert(cmp.where(col("native") =!= col("hof")).count() == 0)
  }

  test("LogregMargin equals the HOF aggregate formulation, edge tokens included") {
    import graft.functions.PortableHash
    def hof(text: org.apache.spark.sql.Column) = {
      def wnum(w: org.apache.spark.sql.Column) =
        PortableHash.md5Long(w) % 256L * 2654435761L % 1024L - 512L
      aggregate(split(lower(text), " "), lit(0L), (acc, w) => acc + wnum(w))
    }
    // corpus rows + adversarial token shapes: empty string (one empty
    // token), runs of spaces, leading/trailing spaces, unicode case
    val edges = Seq("", " ", "  ", "a  b", " x", "x ", "ÄÖÜ Straße",
      "MiXeD CaSe  ", "数据 处理").toDF("text")
    val docs = Tables(spark, Sf, "documents").select(col("text"))
      .unionAll(edges)
    val rows = docs.select(
      logreg_margin(col("text"), 256L, 2654435761L).as("native"),
      hof(col("text")).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    // and via the SQL registration (exercises the extension + codegen)
    edges.createOrReplaceTempView("lr_edges")
    val sqlRows = spark.sql(
      "SELECT logreg_margin(text, 256, 2654435761) AS m FROM lr_edges").collect()
    val direct = edges.select(
      logreg_margin(col("text"), 256L, 2654435761L).as("m")).collect()
    assert(sqlRows.map(_.getLong(0)).toSeq == direct.map(_.getLong(0)).toSeq)
    // CODEGEN_ONLY forbids the interpreted fallback: a broken
    // doGenCode would throw here instead of silently degrading the
    // gate's hottest loop to interpreted dispatch
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val forced = edges.select(
        logreg_margin(col("text"), 256L, 2654435761L).as("m")).collect()
      assert(forced.map(_.getLong(0)).toSeq == direct.map(_.getLong(0)).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("ClfParse equals per-field regexp_extract") {
    import graft.parse.Clf
    val lines = graft.pipeline.Flagship
      .synthLog(Tables(spark, Sf, "events")).limit(2000)
    def g(i: Int) = {
      val x = regexp_extract(col("line"), Clf.Pattern, i)
      when(x =!= "", x)
    }
    val declarative = lines.select(g(1).as("ip"), g(4).as("uri"), g(5).as("status"),
      g(8).as("user_agent"))
    val native = Clf.parse(lines).select("ip", "uri", "status", "user_agent")
    assert(native.exceptAll(declarative).count() == 0)
    assert(declarative.exceptAll(native).count() == 0)
  }

  test("UriLemma equals the declarative split+url_decode form") {
    import graft.filters.LogFilters
    val uris = Seq("/wb/obskur", "/wb/Bl%C3%A4tter", "/wb/a%2Fb", "/wb/",
      "/wb/a/b", "/wb/dwb/x", "/wb/x/", "/wb/%5Bbad").toDF("uri")
    val declarative = uris.select(
      size(LogFilters.pathSegments(col("uri"))).as("nseg"),
      LogFilters.lemmaOf(LogFilters.pathSegments(col("uri"))).as("lemma"))
    val native = uris.select(uri_lemma(col("uri")).as("u"))
      .select(col("u.nseg").as("nseg"), col("u.lemma").as("lemma"))
    assert(native.exceptAll(declarative).count() == 0)
    assert(declarative.exceptAll(native).count() == 0)
  }

  test("UriLemma drops (nulls) undecodable lemmata instead of failing (F10)") {
    val out = Seq("/wb/bad%GG").toDF("uri")
      .select(uri_lemma(col("uri")).as("u")).select("u.lemma")
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("MemoRLike equals rlike on the bot pattern, nulls included") {
    import graft.filters.LogFilters.BotPattern
    val uas = Seq(
      Some("Googlebot/2.1 (+http://www.google.com/bot.html)"),
      Some("Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/120.0"),
      Some("curl/8.4.0"), Some("CURL/8"), Some("weird Spider v1"),
      Some(""), Some("bot"), Some("abbots"), // substring 'bot' inside a word still matches rlike
      None, Some("python-requests/2"), Some("x" * 500))
    val df = uas.toDF("ua")
    // memoized vs built-in, row by row (repeat rows to exercise the cache)
    val big = df.union(df).union(df)
    val got = big.select(
      memo_rlike(col("ua"), BotPattern).as("memo"),
      col("ua").rlike(BotPattern).as("builtin")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getBoolean(0) == r.getBoolean(1))
    }
  }

  test("approx_count_distinct lands within 5% of exact") {
    import spark.implicits._
    // raw estimate vs exact — the bound the query's hll_ok column encodes
    val approx = Tables(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("dp"))
      .as[(String, Long)].collect().toMap
    val exact = Tables(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("dp"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.05)
    }
    // and the oracle-checked query reports exactly that verdict
    val rows = SparkEntry.queries("q_approx_count_distinct")(spark, Sf)
      .as[(String, Long, Boolean)].collect()
    assert(rows.map(r => r._1 -> r._2).toMap === exact)
    assert(rows.forall(_._3), "hll_ok false somewhere")
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(7)
    val cases: Seq[(Seq[Int], Seq[Int])] =
      Seq( // adversarial shapes first
        (Seq.empty[Int], Seq.empty[Int]),
        (Seq.empty[Int], Seq(1, 2, 3)),
        (Seq(1, 2, 3), Seq(4, 5, 6)), // disjoint
        (Seq(1, 2, 3), Seq(1, 2, 3)), // identical
        (Seq(1), Seq(1)),
        (Seq(Int.MinValue, 0, Int.MaxValue), Seq(Int.MinValue, Int.MaxValue))
      ) ++ (1 to 200).map { _ =>
        def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60)).distinct.sorted
        (arr(), arr())
      }
    val df = cases.toDF("a", "b").localCheckpoint()
    val rows = df.select(
      sorted_intersect_count(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // CODEGEN_ONLY: a broken doGenCode must throw, not silently
    // degrade the ppjoin verify to interpreted dispatch
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val forced = df.select(
        sorted_intersect_count(col("a"), col("b")).as("n")).collect()
      assert(forced.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
