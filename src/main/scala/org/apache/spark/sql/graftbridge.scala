package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), the supported
  * pattern for libraries shipping custom Catalyst expressions on
  * Spark 4's column-node API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize a DataFrame and rewrap it as a CLEAN leaf — fresh
    * attribute ids, no origin constraints, no lineage — without the
    * Row↔InternalRow round-trip that `createDataFrame(df.rdd, schema)`
    * pays on every downstream rescan. Used by iterative loops (BFS)
    * whose unions of checkpointed frames would otherwise trip
    * Union.rewriteConstraints on shared exprIds.
    */
  def severedLeaf(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    val cl = c.asInstanceOf[classic.Dataset[Row]]
    cl.sparkSession.internalCreateDataFrame(
      cl.queryExecution.toRdd, c.schema)
  }
}
