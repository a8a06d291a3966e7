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
}
