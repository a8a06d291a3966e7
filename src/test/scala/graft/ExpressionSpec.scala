package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExpressions._

class ExpressionSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("rolling_hash matches the reference fold") {
    def ref(s: String, m: Long = 1000000007L): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c) % m)
    val inputs = Seq("hello world", "", "a", "the quick brown fox")
    val got = inputs.toDF("s").select(rolling_hash(col("s"))).as[Long].collect()
    assert(got.toSeq == inputs.map(ref(_)))
  }

  test("rolling_hash survives codegen over real data") {
    val df = Tables.documents(spark, sf)
      .select(rolling_hash(lower(col("text"))).as("h"))
    val n = df.filter(col("h") >= 0).count()
    assert(n == Tables.documents(spark, sf).count())
  }

  test("custom functions are SQL-callable via GraftExtensions") {
    val h = spark.sql("SELECT graft_rolling_hash('hello world') AS h")
      .as[Long].first()
    assert(h == "hello world".foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L))
    val s = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .as[Double].first()
    assert(math.abs(s - 1.0) < 1e-12)
  }

  test("cosine_sim computes correct values") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(2.0, 4.0))).toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("hyperplane_bands equals the composed sign-bit formulation bit-for-bit") {
    import graft.functions.Hyperplanes
    val bits = 6
    val nBands = 4
    val rows = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        Hyperplanes.allBands(col("v"), nBands, bits).as("bands"))
      .as[(Long, Seq[Double], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, v, bands) =>
      assert(bands.length == nBands)
      // independent reference: same LCG planes, same index-order dot
      for (b <- 0 until nBands) {
        var expect = 0L
        for (j <- 0 until bits) {
          val base = (b * bits + j) * Hyperplanes.Dim
          var dot = 0.0
          for (d <- v.indices)
            dot += v(d) * Hyperplanes.component(base + d)
          if (dot >= 0) expect |= (1L << j)
        }
        assert(bands(b) == expect, s"band $b mismatch")
      }
    }
  }

  test("hyperplane_bands fails loudly on short vectors, null elements, wrong types") {
    import graft.functions.GraftExpressions.hyperplane_bands
    // short vector: silent zero-padding would shift the LSH bucket
    val short = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
    val eShort = intercept[Exception] {
      short.select(hyperplane_bands(col("v"), 2, 4)).collect()
    }
    assert(eShort.getMessage.contains("expected 64")
      || eShort.getCause != null && eShort.getCause.getMessage.contains("expected 64"))
    // null element: silently reading 0.0 would do the same
    val withNull = Seq(Tuple1((0 until 64).map(i =>
      if (i == 7) null.asInstanceOf[java.lang.Double] else java.lang.Double.valueOf(i))))
      .toDF("v")
    val eNull = intercept[Exception] {
      withNull.select(hyperplane_bands(col("v"), 2, 4)).collect()
    }
    assert(eNull.getMessage.contains("null element")
      || eNull.getCause != null && eNull.getCause.getMessage.contains("null element"))
    // wrong element type: analysis-time failure, not a cast crash
    val wrong = Seq(Tuple1(Seq("a", "b"))).toDF("v")
    val eType = intercept[Exception] {
      wrong.select(hyperplane_bands(col("v"), 2, 4)).collect()
    }
    assert(eType.getMessage.toLowerCase.contains("array<double>")
      || eType.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("tokens() segments CJK scripts per codepoint, identically to the DuckDB mirror") {
    import graft.functions.TextFunctions.tokens
    // expected arrays are the verified output of the DuckDB mirror
    // (duckToksSql) on the same strings — cross-engine equivalence is
    // pinned here because the synthetic corpus is ASCII-only and the
    // driver's oracle can't exercise these paths
    val cases = Seq(
      "hello 世界 world" -> Seq("hello", "世", "界", "world"),
      "日本語のテキストです" -> Seq("日", "本", "語", "の", "テ", "キ", "ス", "ト", "で", "す"),
      "한국어 텍스트 test" -> Seq("한", "국", "어", "텍", "스", "트", "test"),
      "mixed中文and english" -> Seq("mixed", "中", "文", "and", "english"),
      "ひらがなカタカナ漢字" -> Seq("ひ", "ら", "が", "な", "カ", "タ", "カ", "ナ", "漢", "字"),
      "plain ascii  text" -> Seq("plain", "ascii", "text"))
    val got = cases.map(_._1).toDF("text")
      .select(tokens(col("text"))).as[Seq[String]].collect()
    cases.zip(got).foreach { case ((in, expect), actual) =>
      assert(actual == expect, s"'$in' tokenized as $actual, expected $expect")
    }
  }

  test("cosine_sim agrees with the HOF formulation on embeddings") {
    val e = Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").crossJoin(e.as("b"))
    val diff = pairs.select(
      abs(cosine_sim(col("a.v"), col("b.v")) -
        graft.functions.VectorFunctions.dot(col("a.v"), col("b.v")) /
          (sqrt(graft.functions.VectorFunctions.dot(col("a.v"), col("a.v"))) *
            sqrt(graft.functions.VectorFunctions.dot(col("b.v"), col("b.v"))))).as("d"))
      .agg(max(col("d"))).as[Double].first()
    assert(diff < 1e-12)
  }
}
