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

  /** Row-precomputed L2 norm via the codegen'd [[DotProduct]] fused
    * loop: the identical left-to-right accumulation of x*x that
    * [[CosineSim]] runs per PAIR, hoisted to once per ROW — so
    * `cosinePre(a, b, norm2Row(a), norm2Row(b))` is bit-identical to
    * `cosine(a, b)` (same IEEE terms, same order, same final
    * dot / (sqrt(na) * sqrt(nb)) shape) while the quadratic pair
    * stage pays ONE multiply-add per element instead of three.
    *
    * EQUAL-LENGTH PRECONDITION (r17 ADVICE): the parity claim holds
    * only for equal-dimension inputs. [[CosineSim]] truncates all
    * three sums to min(len(a), len(b)), while norm2Row computes each
    * norm over its FULL array — for ragged inputs cosinePre diverges
    * from cosine (arguably more correct, but not bit-identical).
    * Every current call site uses fixed-dim embeddings.
    */
  def norm2Row(a: Column): Column =
    sqrt(GraftExpressions.dot_product(
      a.cast("array<double>"), a.cast("array<double>")))

  /** Cosine from precomputed row norms — see [[norm2Row]] for the
    * bit-parity argument. Use at quadratic (within-block self-join)
    * and panel×corpus sites where the 3x per-pair FLOP cut matters.
    */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    GraftExpressions.dot_product(
      a.cast("array<double>"), b.cast("array<double>")) / (na * nb)
}
