package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ml.{FeatureOps, Tuning}
import graft.multimodal.BinaryPipeline
import graft.operators.{AnalyticExt, Dedup, Relational, Similarity, Sketches, SkewJoin, SqlSurface, TemporalOps, TextAnalysis, TrainingOps, Validation, GraphOps}
import graft.streaming.EventStream

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) / §7 (plan). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TemporalOps.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ FeatureOps.queries ++
      Tuning.queries ++ BinaryPipeline.queries ++ EventStream.queries ++
      SqlSurface.queries ++ SkewJoin.queries ++ AnalyticExt.queries ++
      Sketches.queries ++ TrainingOps.queries ++ Validation.queries ++
      GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TemporalOps.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ FeatureOps.oracle ++
      Tuning.oracle ++ BinaryPipeline.oracle ++ EventStream.oracle ++
      SqlSurface.oracle ++ SkewJoin.oracle ++ AnalyticExt.oracle ++
      Sketches.oracle ++ TrainingOps.oracle ++ Validation.oracle ++
      GraphOps.oracle
}
