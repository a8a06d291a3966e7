package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches
import graft.ml.FeatureOps

/** Bounds for the rows-only sketch/decomposition operators
  * (SURVEY.md §2: H3, H4, E9) — the guarantees each sketch's theory
  * promises, asserted on real data.
  */
class SketchSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("bloom keep-list: no false negatives, bounded false-positive drops") {
    val r = Sketches.qBloomKeep(spark, sf).head()
    assert(r.getAs[Long]("exact_kept") > 0)
    // Bloom has no false negatives: every denied user IS flagged...
    assert(r.getAs[Long]("false_negatives") == 0L)
    // ...and with 1M bits over this deny cardinality the FP drop rate
    // is far below 1%.
    assert(r.getAs[Boolean]("fp_rate_ok"))
  }

  test("count-min estimates dominate exact counts within eps bound") {
    val rows = Sketches.qCmsTopk(spark, sf).collect()
    assert(rows.length == Sketches.TopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_n") > 0)
      assert(r.getAs[Boolean]("never_under"), s"CMS must never under-count: $r")
      // eps = 1e-4: overshoot bounded by eps * stream length (w.h.p.)
      assert(r.getAs[Boolean]("overshoot_ok"), s"CMS overshoot out of bound: $r")
    }
  }

  test("pca spectrum: k components, monotone non-increasing, ratios in (0,1]") {
    // raw ratio values (the driver-published q_pca row set carries the
    // verdict form; the spectrum itself is pinned here)
    val vars = FeatureOps.pcaSpectrum(spark, sf)
    assert(vars.length == 8)
    assert(vars.forall(v => v > 0 && v <= 1.0))
    assert(vars.sliding(2).forall { case Array(a, b) => a >= b })
    assert(vars.sum <= 1.0 + 1e-6)
    val rows = FeatureOps.qPca(spark, sf).orderBy(col("component")).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ratio_in_range") && r.getAs[Boolean]("monotone_ok")
        && r.getAs[Boolean]("sum_le_one") && r.getAs[Boolean]("topk_ge_uniform"),
        s"pca verdict violated: $r")
      assert(r.getAs[Double]("total_var") > 0)
    }
  }

  test("shingle_hashes equals the scalar shingleHash over substrings") {
    import graft.functions.GraftExpressions.shingle_hashes
    import graft.functions.TextFunctions.{normText, shingleHash}
    val docs = graft.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), normText(col("text")).as("t"))
    val fast = docs
      .select(col("doc_id"), explode(shingle_hashes(col("t"))).as("h"))
      .groupBy(col("doc_id")).agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
    val slow = docs
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("t")) - 4, lit(1)))).as("i"),
        col("t"))
      .select(col("doc_id"), shingleHash(col("t").substr(col("i"), lit(5))).as("h"))
      .groupBy(col("doc_id")).agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("bloom fpr curve: complete grid, probe panel conserved, fpr improves with filter size") {
    val rows = graft.operators.Sketches.queries("q_bloom_fpr_curve")(spark, sf)
      .select("m", "k", "n_deny", "n_probe", "false_pos", "fpr", "fpr_bound")
      .as[(Int, Int, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == graft.operators.Sketches.BloomGrid.length)
    val nProbe = rows.head._4
    rows.foreach { r =>
      assert(r._4 == nProbe, "one shared probe panel across the grid")
      assert(r._5 <= r._4, "false positives bounded by the panel")
      assert(r._6 >= 0.0 && r._6 <= 1.0 && r._7 >= 0.0 && r._7 <= 1.0)
    }
    for (k <- Seq(2, 4)) {
      val small = rows.find(r => r._1 == 1024 && r._2 == k).get._6
      val large = rows.find(r => r._1 == 16384 && r._2 == k).get._6
      assert(large <= small, s"16x more bits cannot worsen the FPR (k=$k)")
    }
  }

  test("shingle_hashes edge cases: short and empty strings") {
    import graft.functions.GraftExpressions.shingle_hashes
    import spark.implicits._
    val got = Seq("", "ab", "abcd", "abcde", "abcdef").toDF("s")
      .select(size(shingle_hashes(col("s"))).as("n")).as[Int].collect()
    // max(len-4, 1) windows, always at least one
    assert(got.toSeq == Seq(1, 1, 1, 1, 2))
  }
}
