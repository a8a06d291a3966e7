package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query rewrite: when
  * `spark.graft.approxDistinct=true`, every exact `COUNT(DISTINCT x)`
  * in the logical plan is rewritten to HyperLogLog++ (default 5%
  * relative error) BEFORE physical planning.
  *
  * Why this is an engine feature and not a query edit: exact distinct
  * aggregation physically plans as an Expand + second shuffle keyed by
  * (group, x) — at 100 TB the widest shuffle in many reports — while
  * the sketch is one pass with a fixed-width mergeable buffer. The
  * rewrite makes the accuracy/cost trade a SESSION KNOB: dashboards
  * and data-exploration sessions flip it on, billing-grade queries
  * leave it off, and no SQL changes hands.
  *
  * Demonstrates the `Rule[LogicalPlan]` extension point (injected via
  * [[graft.GraftExtensions]]); the flag defaults to OFF so every
  * oracle-checked query keeps exact semantics unless a session opts
  * in. Spec: PlanSpec asserts the rewritten plan carries
  * HyperLogLogPlusPlus and loses the exact-distinct Expand, and that
  * the default-off plan is untouched.
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.approxDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.getOption(FlagKey).contains("true")) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(children), Complete, true, None, _)
          if children.size == 1 =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(children.head),
          isDistinct = false)
    }
}
