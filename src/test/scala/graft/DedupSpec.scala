package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.multimodal.BinaryPipeline

class DedupSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("minhash est_sim is bounded and candidates are ordered pairs") {
    val rows = Dedup.qMinhashLsh(spark, sf)
      .select("d1", "d2", "est_sim").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (d1, d2, s) => d1 < d2 && s >= 0.0 && s <= 1.0 })
  }

  test("simhash emits per-doc near-dup degrees with bounded hamming") {
    val rows = Dedup.qSimhash(spark, sf)
      .select("doc_id", "n_neardups", "min_hamming").as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, n, h) => n >= 1 && h >= 0 && h <= 3 })
  }

  test("jaccard pairs overlap minhash candidates on high-sim docs") {
    val jacc = Dedup.qNgramJaccard(spark, sf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val mh = Dedup.qMinhashLsh(spark, sf)
      .filter("est_sim >= 0.5").select("d1", "d2").as[(Long, Long)].collect().toSet
    // high-estimate minhash pairs should mostly be true near-dups
    assert(mh.intersect(jacc).nonEmpty || mh.isEmpty)
  }

  test("multimodal decode emits plausible stub features") {
    val rows = BinaryPipeline.qMultimodalDecode(spark, sf)
      .select("n_bytes", "width", "height", "mean_byte")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, w, h, m) =>
      n > 0 && w >= 64 && w < 128 && h >= 64 && h < 128 && m > 0 && m < 256
    })
  }
}
