package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2
  * blocks C5/D). Pure higher-order-function expressions on unsafe
  * array data — no UDF, no serialization round-trip. Computation is
  * widened to double; the left-fold accumulation order matches the
  * oracle SQL mirror (`sum(x*y)` over parallel unnest in list order)
  * so results agree bit-for-bit before boundary rounding.
  */
object VectorFunctions {

  /** Element count-agnostic dot product of two numeric arrays
    * (higher-order-function form; fine off the hot path).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — backed by the codegen'd [[CosineSim]]
    * expression (single fused loop inside whole-stage codegen).
    */
  def cosine(a: Column, b: Column): Column =
    GraftExpressions.cosine_sim(a.cast("array<double>"), b.cast("array<double>"))
}
