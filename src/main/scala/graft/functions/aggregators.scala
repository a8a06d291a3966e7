package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregations via the `Aggregator` extension point
  * (SURVEY.md §2: A28) — the supported path for aggregation logic the
  * built-in functions can't express, with distributed semantics for
  * free: `reduce` runs map-side per partition, `merge` combines
  * partial buffers (order-independent up to float rounding), nothing
  * touches the driver until `finish`.
  *
  * Note the engine preference order (SURVEY §3): built-in codegen
  * functions > custom codegen `Expression` > typed `Aggregator`
  * (ObjectHashAggregate, no whole-stage codegen) > UDF. Aggregators
  * are for genuinely custom REDUCTIONS; scalar logic stays in
  * expressions.
  */
object aggregators {

  /** Log-space running (sum, count) buffer. */
  case class GeoBuf(s: Double, n: Long)

  /** Geometric mean: exp(mean(ln x)) — multiplicative averaging for
    * strictly-positive, heavy-tailed measures (rates, durations,
    * prices) where the arithmetic mean is dominated by the tail.
    * Accumulated in log space so the product never over/underflows at
    * any count.
    */
  object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    override def zero: GeoBuf = GeoBuf(0.0, 0L)
    // Non-positive factor ⇒ geomean 0 (the limit convention, stated
    // in the oracle too). log(0) = −Inf already collapses exp to 0;
    // the explicit guard extends the same answer to negatives, where
    // log would yield NaN and silently poison the whole group.
    override def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.s + (if (x <= 0) Double.NegativeInfinity else math.log(x)),
        b.n + 1)
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.s + b.s, a.n + b.n)
    override def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.s / b.n)
    override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
