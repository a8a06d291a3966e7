package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Tuning

class TuningSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("CV tuning returns one row per grid point with sane metrics") {
    val rows = Tuning.qMllibTuning(spark, sf)
      .select("reg_param", "elastic_net", "cv_accuracy")
      .as[(Double, Double, Double)].collect()
    assert(rows.length == 4) // 2 regParam x 2 elasticNet
    assert(rows.forall { case (_, _, acc) => acc >= 0.0 && acc <= 1.0 })
  }

  test("kmeans partitions all vectors into k clusters") {
    val sizes = Tuning.qKmeans(spark, sf).as[(Int, Long)].collect()
    assert(sizes.map(_._2).sum == Tables.embeddings(spark, sf).count())
    assert(sizes.length <= 10 && sizes.nonEmpty)
  }
}
