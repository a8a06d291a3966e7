package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{CosineSim, RollingHash, ShingleHashes}

/** Session extension exposing the custom Catalyst expressions to SQL
  * (`spark.sql("SELECT graft_rolling_hash(text) ...")`). Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head)))
    // Spark ships Bloom-filter build/probe expressions for its runtime
    // join filters but does not register them for SQL use — surface
    // them (fixed-size mergeable membership sketches are a first-class
    // 100 TB primitive; see operators.Sketches).
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1))))
    // Opt-in approximate-query rewrite (exact COUNT(DISTINCT) → HLL++
    // under spark.graft.approxDistinct=true) — the Rule[LogicalPlan]
    // extension point; default off, so semantics only change when a
    // session explicitly trades accuracy for one-pass aggregation.
    e.injectOptimizerRule(graft.plans.ApproxDistinctRewrite.apply)
  }
}
