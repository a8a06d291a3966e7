package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{FeatureOps, Tuning}

class TuningSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("a fitted pipeline round-trips through save/load with identical predictions") {
    // the ship-the-model contract: a tuned pipeline persisted to the
    // warehouse and reloaded in a fresh process must score identically
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{HashingTF, StringIndexer, Tokenizer}
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"), col("lang"))
    val indexer = new StringIndexer().setInputCol("lang").setOutputCol("label")
      .setStringOrderType("alphabetAsc")
    val tok = new Tokenizer().setInputCol("text").setOutputCol("toks")
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features").setNumFeatures(256)
    val lr = new LogisticRegression().setMaxIter(10).setTol(1e-4)
    val model = new Pipeline().setStages(Array(indexer, tok, tf, lr)).fit(docs)
    val out = java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(out)
    val back = PipelineModel.load(out)
    val a = model.transform(docs).select("doc_id", "prediction")
      .as[(Long, Double)].collect().toMap
    val b = back.transform(docs).select("doc_id", "prediction")
      .as[(Long, Double)].collect().toMap
    assert(a.nonEmpty && a == b, "reloaded model predictions diverged")
  }

  test("q_ols_multi: published coefficients recompose bit-for-bit from driver-side exact moments; quantized fit tracks the unquantized solve") {
    import org.apache.spark.sql.functions.col
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        org.apache.spark.sql.functions.round(col("l_discount") * 100).cast("long"),
        org.apache.spark.sql.functions.round(col("l_tax") * 100).cast("long"),
        org.apache.spark.sql.functions.round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val n = BigInt(rows.length)
    def S(f: ((Long, Long, Long, Long)) => BigInt): BigInt = rows.map(f).sum
    val (s1, s2, s3, sy) = (S(r => BigInt(r._1)), S(r => BigInt(r._2)),
      S(r => BigInt(r._3)), S(r => BigInt(r._4)))
    def hu(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) (2 * a + b) / (2 * b) else -((2 * (-a) + b) / (2 * b))
    def m(raw: BigInt, a: BigInt, b: BigInt): BigInt =
      hu(100 * (n * raw - a * b), n * n)
    val m11 = m(S(r => BigInt(r._1) * r._1), s1, s1)
    val m12 = m(S(r => BigInt(r._1) * r._2), s1, s2)
    val m13 = m(S(r => BigInt(r._1) * r._3), s1, s3)
    val m22 = m(S(r => BigInt(r._2) * r._2), s2, s2)
    val m23 = m(S(r => BigInt(r._2) * r._3), s2, s3)
    val m33 = m(S(r => BigInt(r._3) * r._3), s3, s3)
    val m1y = m(S(r => BigInt(r._1) * r._4), s1, sy)
    val m2y = m(S(r => BigInt(r._2) * r._4), s2, sy)
    val m3y = m(S(r => BigInt(r._3) * r._4), s3, sy)
    val det = m11 * (m22 * m33 - m23 * m23) - m12 * (m12 * m33 - m23 * m13) +
      m13 * (m12 * m23 - m22 * m13)
    val det1 = m1y * (m22 * m33 - m23 * m23) - m12 * (m2y * m33 - m23 * m3y) +
      m13 * (m2y * m23 - m22 * m3y)
    val det2 = m11 * (m2y * m33 - m3y * m23) - m1y * (m12 * m33 - m23 * m13) +
      m13 * (m12 * m3y - m2y * m13)
    val det3 = m11 * (m22 * m3y - m23 * m2y) - m12 * (m12 * m3y - m2y * m13) +
      m1y * (m12 * m23 - m22 * m13)
    val out = FeatureOps.qOlsMulti(spark, sf)
      .select("n", "beta_qty", "beta_disc", "beta_tax")
      .as[(Long, Double, Double, Double)].collect().head
    assert(out._1 == rows.length)
    // bit-for-bit: the published β IS det_i/det on the exact moments
    assert(out._2 == det1.toDouble / det.toDouble, "beta_qty diverged")
    assert(out._3 == det2.toDouble / det.toDouble, "beta_disc diverged")
    assert(out._4 == det3.toDouble / det.toDouble, "beta_tax diverged")
    // quantized fit tracks the full-precision normal-equation solve:
    // coefficient-relative within 10% OR absolutely tiny (covariance
    // quantization at 1e-2 units bounds the moment error; tiny true
    // coefficients admit larger relative slack)
    def cov(sab: BigInt, sa: BigInt, sb: BigInt): Double =
      (n * sab - sa * sb).toDouble / (n * n).toDouble
    val a = Array(
      Array(cov(S(r => BigInt(r._1) * r._1), s1, s1),
        cov(S(r => BigInt(r._1) * r._2), s1, s2),
        cov(S(r => BigInt(r._1) * r._3), s1, s3)),
      Array(cov(S(r => BigInt(r._1) * r._2), s1, s2),
        cov(S(r => BigInt(r._2) * r._2), s2, s2),
        cov(S(r => BigInt(r._2) * r._3), s2, s3)),
      Array(cov(S(r => BigInt(r._1) * r._3), s1, s3),
        cov(S(r => BigInt(r._2) * r._3), s2, s3),
        cov(S(r => BigInt(r._3) * r._3), s3, s3)))
    val b = Array(cov(S(r => BigInt(r._1) * r._4), s1, sy),
      cov(S(r => BigInt(r._2) * r._4), s2, sy),
      cov(S(r => BigInt(r._3) * r._4), s3, sy))
    def det3x3(x: Array[Array[Double]]): Double =
      x(0)(0) * (x(1)(1) * x(2)(2) - x(1)(2) * x(2)(1)) -
        x(0)(1) * (x(1)(0) * x(2)(2) - x(1)(2) * x(2)(0)) +
        x(0)(2) * (x(1)(0) * x(2)(1) - x(1)(1) * x(2)(0))
    val d0 = det3x3(a)
    def repl(i: Int): Array[Array[Double]] =
      a.zipWithIndex.map { case (row, r) =>
        row.zipWithIndex.map { case (v, c) => if (c == i) b(r) else v } }
    val exact = (0 to 2).map(i => det3x3(repl(i)) / d0)
    val got = Seq(out._2, out._3, out._4)
    exact.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
      assert(math.abs(g - e) <= math.max(0.1 * math.abs(e), 50.0),
        s"beta($i): quantized $g vs exact $e")
    }
  }

  test("q_gbt_stumps: staged MSE is monotone non-increasing and stages are well-formed") {
    val rows = FeatureOps.qGbtStumps(spark, sf)
      .select("stage", "threshold", "gamma_left_e4", "gamma_right_e4",
        "accuracy_ppm", "mse_e8")
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && rows(0).isNullAt(3),
      "stage 0 must carry no split")
    assert(!rows(1).isNullAt(1) && !rows(2).isNullAt(1),
      "boosted stages must carry their split")
    val mse = rows.map(_.getLong(5))
    assert(mse(1) <= mse(0) && mse(2) <= mse(1),
      s"squared-loss boosting must not increase train MSE: ${mse.toSeq}")
    // leaf steps point in opposite directions across a useful split
    // (left residual mean vs right residual mean): signs must differ
    // unless one side is zero
    val (gl, gr) = (rows(1).getLong(2), rows(1).getLong(3))
    assert(gl == 0 || gr == 0 || (gl > 0) != (gr > 0),
      s"round-1 leaves should bracket the mean: gl=$gl gr=$gr")
    rows.foreach { r =>
      val acc = r.getLong(4)
      assert(acc >= 0 && acc <= 1000000, s"accuracy_ppm out of range: $acc")
    }
  }

  test("q_als_recommend: factors recompose from ratings by hand; top-5 per customer over unseen brands only") {
    import org.apache.spark.sql.functions.col
    val r = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, sf).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("c"), col("p_brand").as("b"))
      .agg(org.apache.spark.sql.functions.sum(col("l_quantity").cast("long")).as("rt"))
      .as[(Long, String, Long)].collect()
    def hu(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    val u1 = r.groupBy(_._1).map { case (c, xs) =>
      c -> hu(BigInt(1000) * xs.map(x => BigInt(x._3)).sum, xs.length) }
    val v1 = r.groupBy(_._2).map { case (b, xs) =>
      val sur = xs.map(x => u1(x._1) * x._3).sum
      val suu = xs.map(x => u1(x._1) * u1(x._1)).sum
      b -> hu(BigInt(1000000) * sur, suu) }
    val u2 = r.groupBy(_._1).map { case (c, xs) =>
      val svr = xs.map(x => v1(x._2) * x._3).sum
      val svv = xs.map(x => v1(x._2) * v1(x._2)).sum
      c -> hu(BigInt(1000000) * svr, svv) }
    val out = Tuning.qAlsRecommend(spark, sf)
      .select("custkey", "brand", "rank", "score_micro")
      .as[(Long, String, Int, Long)].collect()
    assert(out.nonEmpty)
    val rated = r.map(x => (x._1, x._2)).toSet
    out.foreach { case (c, b, rank, score) =>
      assert(c <= 200, "panel cap breached")
      assert(!rated.contains((c, b)), s"recommended an already-rated pair ($c,$b)")
      assert(rank >= 1 && rank <= 5)
      assert(BigInt(score) == u2(c) * v1(b),
        s"score($c,$b)=$score != u2·v1=${u2(c) * v1(b)}")
    }
    // per customer: ranks are 1..k with no gaps
    out.groupBy(_._1).foreach { case (c, xs) =>
      assert(xs.map(_._3).sorted.toSeq == (1 to xs.length).toSeq,
        s"rank gaps for customer $c")
    }
    // staleness contract: a warm call rides the persisted factors
    val fits = Tuning.AlsStore.fitCount.get
    val again = Tuning.qAlsRecommend(spark, sf)
      .select("custkey", "brand", "rank", "score_micro")
      .as[(Long, String, Int, Long)].collect()
    assert(Tuning.AlsStore.fitCount.get == fits,
      "a warm ALS call must not refit")
    assert(again.toSet == out.toSet, "warm factors must score identically")
  }

  test("q_rf_stumps: ensemble accuracy recomposes from the three published stumps; bags partition the corpus") {
    import org.apache.spark.sql.functions.col
    val rows = FeatureOps.qRfStumps(spark, sf).collect()
    val bags = rows.filter(_.getAs[Long]("bag") >= 0)
    val ens = rows.filter(_.getAs[Long]("bag") == -1L)
    assert(bags.length == 3 && ens.length == 1)
    val stumps = bags.map { r =>
      (r.getAs[Long]("threshold"), r.getAs[Boolean]("left_pos"),
        r.getAs[Boolean]("right_pos")) }
    // brute-force the ensemble vote over the raw rows
    val data = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        org.apache.spark.sql.functions.when(col("l_returnflag") === "R", 1L)
          .otherwise(0L))
      .as[(Long, Long)].collect()
    val correct = data.count { case (v, y) =>
      val votes = stumps.count { case (t, lp, rp) => if (v <= t) lp else rp }
      val pred = votes * 2 > 3
      (pred && y == 1L) || (!pred && y == 0L)
    }
    def hu(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    assert(BigInt(ens.head.getAs[Long]("accuracy_ppm")) ==
      hu(BigInt(1000000) * correct, data.length),
      "ensemble accuracy must recompose from the published stumps")
    bags.foreach { r =>
      val a = r.getAs[Long]("accuracy_ppm")
      assert(a >= 0 && a <= 1000000)
      assert(!r.isNullAt(r.fieldIndex("threshold")))
    }
  }

  test("q_conformal_interval: finite-sample coverage guarantee holds; quantile recomposes by hand") {
    val rows = FeatureOps.qConformalInterval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nCal = r.getAs[Long]("n_cal")
      val cov = r.getAs[Long]("coverage_ppm")
      // split-conformal guarantee: P(|resid| <= q) >= ceil((n+1)(1-α))/ (n+1)
      // on the calibration set the EMPIRICAL coverage at the k-th order
      // statistic is >= k/n_cal >= 0.9 exactly
      assert(cov >= 900000L,
        s"coverage $cov ppm below the conformal floor (n_cal=$nCal)")
      assert(r.getAs[Long]("q_dollar") >= 0)
      assert(nCal > 0 && r.getAs[Long]("n_train") > 0)
    }
    // recompose one flag's quantile by hand from the raw rows
    import org.apache.spark.sql.functions.col
    val f = rows.head
    val flag = f.getAs[String]("l_returnflag")
    val (b, a) = (f.getAs[Long]("slope_micro"), f.getAs[Long]("icpt_micro"))
    val resid = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === flag)
      .select(col("l_quantity").cast("long"),
        org.apache.spark.sql.functions.round(col("l_extendedprice") * 100)
          .cast("long"),
        (org.apache.spark.sql.functions.expr(
          "conv(substring(md5(concat_ws('|', cast(l_orderkey as string)," +
            " cast(l_linenumber as string))), 1, 15), 16, 10)")
          .cast("long") % 2))
      .as[(Long, Long, Long)].collect()
      .filter(_._3 == 1L)
      .map { case (x, y, _) =>
        (math.abs(y * 1000000L - a - b * x) + 99999999L) / 100000000L }
      .sorted
    val k = ((9 * (resid.length + 1) + 9) / 10) - 1 // 0-based index
    assert(f.getAs[Long]("q_dollar") == resid(k.toInt),
      "published q_dollar must be the k-th order statistic of the " +
        "dollar-quantized calibration residuals")
  }

  test("PR curve: recall is monotone non-increasing in the threshold and counts are consistent") {
    val rows = FeatureOps.qPrCurve(spark, sf)
      .select("threshold", "tp", "fp", "fn", "tn", "rec")
      .as[(Double, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 21)
    val total = rows.head._2 + rows.head._3 + rows.head._4 + rows.head._5
    assert(rows.forall { case (_, tp, fp, fn, tn, _) => tp + fp + fn + tn == total })
    assert(rows.sliding(2).forall {
      case Array((_, _, _, _, _, r1), (_, _, _, _, _, r2)) => r2 <= r1 + 1e-9
      case _ => true
    })
  }

  test("calibration bins partition the corpus with in-bin mean scores and bounded fractions") {
    val rows = FeatureOps.qCalibration(spark, sf)
      .select("bin", "n", "mean_score", "frac_pos", "gap")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == total, "bins must partition the corpus")
    rows.foreach { case (bin, n, ms, fp, gap) =>
      assert(bin >= 0 && bin <= 19 && n > 0)
      assert(fp >= 0.0 && fp <= 1.0)
      assert(math.abs(gap - math.abs(ms - fp)) < 1e-9)
      if (bin < 19)
        assert(ms >= bin / 100.0 - 1e-9 && ms < (bin + 1) / 100.0 + 1e-9,
          s"mean score $ms outside bin $bin bounds")
    }
  }

  test("learning curve: nested fractions grow the train set and accuracy stays bounded") {
    val rows = Tuning.qLearningCurve(spark, sf)
      .select("train_frac", "n_train", "accuracy")
      .as[(Double, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 5)
    // nested hash buckets: train size strictly non-decreasing
    assert(rows.sliding(2).forall {
      case Array((_, n1, _), (_, n2, _)) => n2 >= n1
      case _ => true
    })
    assert(rows.forall { case (f, n, a) => f > 0 && f <= 1 && n > 0 && a >= 0 && a <= 1 })
    // a second run is bit-identical (deterministic split + seedless-free path)
    val again = Tuning.qLearningCurve(spark, sf)
      .select("train_frac", "n_train", "accuracy")
      .as[(Double, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq == rows.toSeq)
  }

  test("CV tuning returns one row per grid point with sane metrics") {
    val rows = Tuning.qMllibTuning(spark, sf)
      .select("reg_param", "elastic_net", "cv_accuracy")
      .as[(Double, Double, Double)].collect()
    assert(rows.length == 4) // 2 regParam x 2 elasticNet
    assert(rows.forall { case (_, _, acc) => acc >= 0.0 && acc <= 1.0 })
  }

  test("pipeline tuning spans stages and learns language id from text") {
    val rows = Tuning.qPipelineTuning(spark, sf)
      .select("num_features", "reg_param", "cv_accuracy")
      .as[(Long, Double, Double)].collect()
    assert(rows.length == 4) // 2 numFeatures x 2 regParam
    assert(rows.forall { case (_, _, acc) => acc >= 0.0 && acc <= 1.0 })
    // the synthetic corpus draws text from one shared vocabulary for
    // every lang label, so the Bayes ceiling is the majority class —
    // a composed pipeline should land near it, far above uniform 1/5
    val counts = Tables.documents(spark, sf).groupBy("lang").count()
      .as[(String, Long)].collect()
    val majority = counts.map(_._2).max.toDouble / counts.map(_._2).sum
    val best = rows.map(_._3).max
    assert(best >= majority * 0.85,
      f"best CV accuracy $best%.3f far below majority baseline $majority%.3f")
    assert(best >= 0.25, f"best CV accuracy $best%.3f not above chance")
  }

  test("kmeans partitions all vectors into k clusters; SSE verdicts hold; store reuses warm") {
    val rows = Tuning.qKmeans(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.embeddings(spark, sf).count())
    assert(rows.length <= Tuning.KmeansStore.K && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("within_sse") >= 0.0)
      assert(r.getAs[Boolean]("tighter_than_global"),
        s"member centroid must beat the global centroid: $r")
    }
    // warm path: a second run must reuse the persisted assignment
    val fits = Tuning.KmeansStore.fitCount.get
    Tuning.qKmeans(spark, sf).collect()
    assert(Tuning.KmeansStore.fitCount.get == fits,
      "second qKmeans run must not refit (persisted-store contract)")
  }

  test("silhouette: scores bounded in [-1,1], clusters partition the corpus, overall is the weighted mean") {
    val rows = Tuning.qSilhouette(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Tuning.KmeansStore.K)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 && s <= 1.0, s"mean silhouette out of range: $r")
    }
    val overall = rows.head.getAs[Double]("overall_silhouette")
    assert(rows.forall(_.getAs[Double]("overall_silhouette") == overall))
    val weighted = rows.map(r =>
      r.getAs[Double]("mean_silhouette") * r.getAs[Long]("n")).sum /
      rows.map(_.getAs[Long]("n")).sum
    // per-cluster means are published at 6 dp, so the recomposed
    // weighted mean can drift by at most one rounding unit per cluster
    assert(math.abs(weighted - overall) < 1e-4,
      s"overall=$overall vs weighted-of-cluster-means=$weighted")
  }

  test("logistic GD: training loss descends monotonically across all three iterations") {
    val rows = FeatureOps.qLogisticGd(spark, sf).collect()
      .sortBy(_.getAs[Int]("iter"))
    assert(rows.length == 4 && rows.head.getAs[Int]("iter") == 0)
    // iterate 0 is the all-zero weight vector: loss must be exactly
    // ln 2 at 6 dp and every weight 0
    assert(rows.head.getAs[Double]("logloss") == 0.693147)
    Seq("b0", "b1", "b2", "b3").foreach(c =>
      assert(rows.head.getAs[Double](c) == 0.0))
    val losses = rows.map(_.getAs[Double]("logloss"))
    losses.sliding(2).foreach { w =>
      assert(w(1) < w(0),
        s"full-batch GD on a convex loss must descend: ${losses.toSeq}")
    }
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("decision stump: gain is non-negative and the split is consistent with its cells") {
    val r = FeatureOps.qDecisionStump(spark, sf).collect().head
    val (nl, nr) = (r.getAs[Long]("n_left"), r.getAs[Long]("n_right"))
    val (pl, pr) = (r.getAs[Long]("pos_left"), r.getAs[Long]("pos_right"))
    assert(nl > 0 && nr > 0, "both sides of the best split are non-empty")
    assert(pl >= 0 && pl <= nl && pr >= 0 && pr <= nr)
    assert(r.getAs[Double]("gain") >= 0.0, "information gain is never negative")
    val li = Tables.lineitem(spark, sf)
    assert(nl + nr == li.count(), "split partitions the corpus")
    // majority-vote accuracy recomposed from the published cells
    val correct = math.max(pl, nl - pl) + math.max(pr, nr - pr)
    assert(r.getAs[Double]("accuracy") ==
      BigDecimal(correct.toDouble / (nl + nr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("accuracy") >= r.getAs[Double]("baseline") - 1e-9,
      "the best split never loses to the majority baseline on training data")
  }

  test("q_cv_slope: fold slopes recompose in BigInt; folds partition the corpus; stability readout consistent") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.FeatureOps.queries("q_cv_slope")(spark, sf).collect()
      .sortBy(_.getAs[Long]("fold"))
    assert(rows.map(_.getAs[Long]("fold")).toSeq == (0L to 4L))
    val li = Tables.lineitem(spark, sf).select(
      (expr("conv(substring(md5(concat_ws('|', cast(l_orderkey as string)," +
        " cast(l_linenumber as string))), 1, 15), 16, 10)")
        .cast("long") % 5).as("fold"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("n")).sum == li.length.toLong,
      "folds must partition the corpus")
    def hu(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) (2 * a + b) / (2 * b) else -((2 * -a + b) / (2 * b))
    val slopes = (0L to 4L).map { f =>
      val g = li.filter(_._1 == f)
      val n = BigInt(g.length)
      val sx = g.map(t => BigInt(t._2)).sum
      val sy = g.map(t => BigInt(t._3)).sum
      val sxy = g.map(t => BigInt(t._2) * t._3).sum
      val sxx = g.map(t => BigInt(t._2) * t._2).sum
      hu(BigInt(1000000) * (n * sxy - sx * sy), n * sxx - sx * sx)
    }
    rows.zip(slopes).foreach { case (r, s) =>
      assert(BigInt(r.getAs[Long]("slope_micro")) == s,
        s"fold ${r.getAs[Long]("fold")}: ${r.getAs[Long]("slope_micro")} vs $s")
    }
    val r0 = rows.head
    assert(BigInt(r0.getAs[Long]("mean_slope_micro")) ==
      hu(slopes.sum, BigInt(5)))
    assert(r0.getAs[Long]("spread_micro") ==
      (slopes.max - slopes.min).toLong)
    assert(r0.getAs[Boolean]("stable") ==
      (r0.getAs[Long]("rel_spread_ppm") <= 50000L))
    // the stability readout is identical on every row
    assert(rows.forall(_.getAs[Long]("mean_slope_micro") ==
      r0.getAs[Long]("mean_slope_micro")))
  }
}
