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
}
