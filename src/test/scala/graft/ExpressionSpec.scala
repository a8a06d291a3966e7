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

  test("packed_pairs/packed_triples index kernels equal the nested-HOF enumeration") {
    // the A32/A49 basket rewrite contract: i<j (and i<j<k) index
    // combinations over sequence(0, n-1), payloads re-attached by
    // element_at, must emit exactly the pairs/triples the interpreted
    // flatten(transform(transform(slice))) chains produced, in order
    val df = Seq(Seq("a", "b", "c", "d"), Seq("x"), Seq("m", "n"))
      .toDF("bs")
    val hofPairs = df.select(explode(expr(
      """flatten(transform(bs, (x, i) ->
        |  transform(slice(bs, i + 2, size(bs) - i - 1),
        |    y -> struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .select(col("p.a"), col("p.b")).as[(String, String)].collect().toSeq
    val kernelPairs = df.select(col("bs"),
        explode(packed_pairs(sequence(lit(0L),
          (size(col("bs")) - 1).cast("long")))).as("p"))
      .select(
        element_at(col("bs"), shiftrightunsigned(col("p"), 32).cast("int") + 1),
        element_at(col("bs"),
          col("p").bitwiseAND(lit(0xFFFFFFFFL)).cast("int") + 1))
      .as[(String, String)].collect().toSeq
    assert(kernelPairs == hofPairs)
    val hofTriples = df.select(explode(expr(
      """flatten(flatten(transform(bs, (x, i) ->
        |  transform(slice(bs, i + 2, size(bs) - i - 1), (y, j) ->
        |    transform(slice(bs, i + j + 3, size(bs) - i - j - 2),
        |      z -> struct(x AS a, y AS b, z AS c))))))""".stripMargin)).as("t"))
      .select(col("t.a"), col("t.b"), col("t.c"))
      .as[(String, String, String)].collect().toSeq
    val kernelTriples = df.select(col("bs"),
        explode(packed_triples(sequence(lit(0L),
          (size(col("bs")) - 1).cast("long")))).as("t"))
      .select(
        element_at(col("bs"), shiftrightunsigned(col("t"), 42).cast("int") + 1),
        element_at(col("bs"), shiftrightunsigned(col("t"), 21)
          .bitwiseAND(lit(0x1FFFFFL)).cast("int") + 1),
        element_at(col("bs"),
          col("t").bitwiseAND(lit(0x1FFFFFL)).cast("int") + 1))
      .as[(String, String, String)].collect().toSeq
    assert(kernelTriples == hofTriples)
  }

  test("packed kernels fail loudly on out-of-range values and reject null elements") {
    // range guard: packing would corrupt pairs silently, so both
    // kernels throw instead
    val bad = Seq(Tuple1(Seq(1L, -2L, 3L))).toDF("xs")
    val ePair = intercept[Exception] {
      bad.select(packed_pairs(col("xs"))).collect()
    }
    assert(ePair.getMessage.contains("outside")
      || ePair.getCause != null && ePair.getCause.getMessage.contains("outside"))
    val big = Seq(Tuple1(Seq(1L << 22, 2L))).toDF("xs")
    val eTriple = intercept[Exception] {
      big.select(packed_triples(col("xs"))).collect()
    }
    assert(eTriple.getMessage.contains("outside")
      || eTriple.getCause != null && eTriple.getCause.getMessage.contains("outside"))
    // containsNull=true input: analysis-time rejection (r17 ADVICE —
    // a null element used to NPE opaquely at eval)
    val withNull = Seq(Tuple1(Seq[java.lang.Long](1L, null, 3L))).toDF("xs")
    val eNull = intercept[Exception] {
      withNull.select(packed_pairs(col("xs"))).collect()
    }
    assert(eNull.getMessage.toLowerCase.contains("null")
      || eNull.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("vocab_hits equals the filter/array_contains HOF (multiplicity, null elements, empty)") {
    val vocab = Seq("the", "a", "of")
    val df = Seq(
      Seq("the", "cat", "the", "a"),
      Seq("dog"),
      Seq.empty[String]).toDF("toks")
    val vocabArr = array(vocab.map(lit): _*)
    val hof = df.select(
      size(filter(col("toks"), t => array_contains(vocabArr, t))))
      .as[Int].collect().toSeq
    val kernel = df.select(vocab_hits(col("toks"), vocab))
      .as[Int].collect().toSeq
    assert(kernel == hof)
    // null elements count as not-in (array_contains -> null -> dropped
    // by filter), and a null array yields null either way
    val withNull = Seq(Tuple1(Seq[String]("the", null, "a")),
      Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
    val hofN = withNull.select(
      size(filter(col("toks"), t => array_contains(vocabArr, t))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    val kernelN = withNull.select(vocab_hits(col("toks"), vocab))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(kernelN == hofN)
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
