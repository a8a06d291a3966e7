package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MLlib pipeline tuning (SURVEY.md §2: E7, E8) — the reference's
  * nominal domain: estimator pipelines tuned with seeded
  * cross-validation over a param grid. Rows-only checked (no SQL
  * equivalent); determinism comes from fixed seeds.
  *
  * Scale notes: CrossValidator parallelism evaluates grid points
  * concurrently; folds are hash-splits of the (distributed) dataset —
  * nothing is collected. At 100 TB one would subsample per fold
  * (`sampleBy` on the label) rather than full-fit every grid cell.
  */
object Tuning {

  private def features(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      array_to_vector(col("embedding")).as("features"),
      col("label").cast("double").as("label"))

  /** E7: seeded 3-fold CV over a LogisticRegression grid; returns the
    * per-grid-point mean accuracy (the tuning curve).
    */
  def qMllibTuning(spark: SparkSession, dir: String): DataFrame = {
    // cache: CV folds and every LBFGS iteration re-evaluate the input;
    // uncached, each of 3 folds x 4 grid points x ~25 iterations
    // re-runs the parquet scan + array_to_vector projection
    val data = features(spark, dir).cache(); data.count()
    val lr = new LogisticRegression().setMaxIter(25).setTol(1e-5)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.001, 0.1))
      .addGrid(lr.elasticNetParam, Array(0.0, 0.5))
      .build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setParallelism(4)
      .setSeed(42)
    val model = cv.fit(data)
    val rows = grid.zip(model.avgMetrics).map { case (pm, m) =>
      (pm(lr.regParam), pm(lr.elasticNetParam), math.rint(m * 1e6) / 1e6)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("reg_param", "elastic_net", "cv_accuracy")
  }

  /** E7b: an actual multi-stage `Pipeline` under the seeded
    * cross-validator — StringIndexer(lang label) → Tokenizer →
    * HashingTF → LogisticRegression over the documents corpus,
    * tuned jointly across feature-space size and regularization (the
    * grid spans stages, which is the point of Pipeline tuning: one
    * search over the composed estimator, no leakage between stages).
    * Returns the tuning curve; rows-only checked, seeded.
    */
  def qPipelineTuning(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{HashingTF, StringIndexer, Tokenizer}
    val docs = Tables.documents(spark, dir).select(col("text"), col("lang")).cache()
    docs.count() // eager: folds/grid cells share one materialized corpus
    val indexer = new StringIndexer().setInputCol("lang").setOutputCol("label")
      .setStringOrderType("alphabetAsc") // deterministic label ids
    val tok = new Tokenizer().setInputCol("text").setOutputCol("toks")
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
    val lr = new LogisticRegression().setMaxIter(20).setTol(1e-4)
    val pipe = new Pipeline().setStages(Array(indexer, tok, tf, lr))
    val grid = new ParamGridBuilder()
      .addGrid(tf.numFeatures, Array(256, 1024))
      .addGrid(lr.regParam, Array(0.01, 0.3))
      .build()
    val cv = new CrossValidator()
      .setEstimator(pipe)
      .setEvaluator(new MulticlassClassificationEvaluator().setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3)
      .setParallelism(4)
      .setSeed(42)
    val model = cv.fit(docs)
    val rows = grid.zip(model.avgMetrics).map { case (pm, m) =>
      (pm(tf.numFeatures).toLong, pm(lr.regParam), math.rint(m * 1e6) / 1e6)
    }
    spark.createDataFrame(rows.toSeq)
      .toDF("num_features", "reg_param", "cv_accuracy")
  }

  /** E13: learning curve — CV-style accuracy as a function of training
    * set size (seeded nested fractions, fixed held-out split). Answers
    * the question tuning alone can't: is the model data-bound (curve
    * still rising → collect more data) or capacity-bound (flat →
    * tune/scale the model)? Train/test split and the growing training
    * subsets are hash-bucket filters on vec_id (deterministic, and
    * NESTED: every smaller fraction is a subset of every larger one),
    * so the curve is monotone in expectation and bit-stable across
    * runs. Rows-only checked (an iterative LBFGS fit has no SQL twin);
    * bounds spec'd in TuningSpec.
    */
  def qLearningCurve(spark: SparkSession, dir: String): DataFrame = {
    val data = features(spark, dir)
      .withColumn("bucket", pmod(hash(col("vec_id")), lit(100)))
      .cache()
    data.count()
    val testC = data.filter(col("bucket") >= 80)
    val lr = new LogisticRegression().setMaxIter(25).setTol(1e-5).setRegParam(0.01)
    val eval = new MulticlassClassificationEvaluator().setMetricName("accuracy")
    val rows = Seq(16, 32, 48, 64, 80).map { hi =>
      val subC = data.filter(col("bucket") < hi) // nested by construction
      val n = subC.count()
      val acc = eval.evaluate(lr.fit(subC).transform(testC))
      (hi / 80.0, n, math.rint(acc * 1e6) / 1e6)
    }
    data.unpersist()
    spark.createDataFrame(rows).toDF("train_frac", "n_train", "accuracy")
  }

  /** E8: seeded KMeans clustering of the embeddings; returns cluster
    * sizes (the segmentation profile).
    */
  def qKmeans(spark: SparkSession, dir: String): DataFrame = {
    // cache: Lloyd iterations re-evaluate the input each pass — uncached
    // this re-ran the scan+projection 20x (58.6s in the r2 bench)
    val data = features(spark, dir).cache(); data.count()
    val km = new KMeans().setK(10).setSeed(7).setMaxIter(20)
    km.fit(data).transform(data)
      .groupBy(col("prediction").as("cluster"))
      .agg(count(lit(1)).as("n"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mllib_tuning" -> (qMllibTuning _),
    "q_pipeline_tuning" -> (qPipelineTuning _),
    "q_learning_curve" -> (qLearningCurve _),
    "q_kmeans" -> (qKmeans _))

  /** Not SQL-expressible → rows-only checks. */
  def oracle: Map[String, String] = Map()
}
