package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis, TrainingOps}

/** The end-to-end pipeline composition contract (SURVEY.md §2 K13):
  * the composed plan shares one cached facts scan (re-reads no text),
  * and the output is exactly the intersection of its gates.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("pipeline output = B7 keep ∩ C11 keep ∩ train bucket, packed contiguously") {
    val out = TrainingOps.qPipelineE2e(spark, sf).collect()
    assert(out.nonEmpty)
    val outIds = out.map(_.getAs[Long]("doc_id")).toSet
    assert(outIds.size == out.length, "one row per surviving doc")

    val b7 = TextAnalysis.qKeepList(spark, sf).filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c11 = Dedup.qDecontamKeepList(spark, sf).filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val trainBucket = Tables.documents(spark, sf).select(col("doc_id"),
        expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
          .cast("long") % 100 < 80)
      .collect().filter(_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(outIds == (b7 intersect c11 intersect trainBucket),
      "pipeline must keep exactly the docs every gate keeps")

    // packing: offsets are the per-source running sum in doc_id order
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      var off = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("tok_offset") == off, s"offset gap at $r")
        off += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("composed plan re-reads no document text (single cached facts scan)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val df = TrainingOps.qPipelineE2e(spark, sf)
    // every text-derived fact comes from the cached facts projection /
    // Dedup's cached signature pipeline, both materialized during
    // construction — a LIVE scan with `text` in its pruned schema in
    // the final plan means a gate went back to the payload. (Physical
    // node collection over sparkPlan — pre-AQE wrapper, so the tree is
    // traversable — not plan-string matching: the string printer also
    // renders the scans frozen INSIDE InMemoryRelation trees, which
    // never re-execute.)
    val live = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.output.exists(_.name == "text") => s
    }
    assert(live.isEmpty, s"final plan re-reads text: $live")
    val cached = df.queryExecution.sparkPlan.collect {
      case i: InMemoryTableScanExec => i
    }
    assert(cached.nonEmpty, "facts must come from the cache")
  }
}
