package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane LSH shared by the similarity and
  * dedup operators (SURVEY.md §2 blocks C5/D2).
  *
  * Plane components come from a closed-form LCG over the flat plane
  * index — reproducible with no stored model, and cheap enough for an
  * oracle to regenerate in SQL from the same arithmetic
  * (`(1103515245*idx + 12345) mod 2^31`, scaled to [-0.5, 0.5)). The
  * argument is always >= 0 here, so no sign fix-up is needed on either
  * engine.
  *
  * Bucket width scales with the corpus: [[bitsFor]] returns the number
  * of sign bits per band such that the EXPECTED bucket population stays
  * at `targetBucket` regardless of corpus size — the property that
  * keeps any bucket self-join quadratic-in-a-constant rather than
  * quadratic-in-the-corpus. Integer-exact (highest-set-bit, not float
  * log2) so an oracle computes the identical value.
  */
object Hyperplanes {

  val Dim = 64 // embedding dimensionality of the corpus contract

  /** LCG plane component for flat index `idx = p*Dim + d` (>= 0). */
  def component(idx: Int): Double =
    ((1103515245L * idx + 12345L) % 2147483648L).toDouble / 2147483648.0 - 0.5

  def plane(p: Int): Seq[Double] = (0 until Dim).map(d => component(p * Dim + d))

  /** Sign bits per band so that corpus/2^bits ~= targetBucket:
    * bits = max(floor, ceil(log2(ceil(n / targetBucket)))), computed in
    * integer arithmetic (position of the highest set bit).
    */
  def bitsFor(n: Long, targetBucket: Int, floor: Int = 4): Int = {
    val m = (n + targetBucket - 1) / targetBucket
    math.max(floor, 64 - java.lang.Long.numberOfLeadingZeros(math.max(m - 1, 1L)))
  }

  /** The `bits`-bit bucket value of band `b`: bit j is the sign of
    * `v . plane(b*bits + j)`. Backed by the codegen'd
    * [[HyperplaneBands]] expression (one fused loop, LCG components
    * generated inline — map-only, nothing broadcast or shuffled); for
    * multi-band use prefer [[allBands]] + posexplode so every band
    * comes out of a single evaluation.
    */
  def bandValue(v: Column, b: Int, bits: Int): Column =
    GraftExpressions.hyperplane_bands(v, b + 1, bits, Dim).getItem(b)

  /** All `nBands` band values in one fused codegen evaluation
    * (array index = band id).
    */
  def allBands(v: Column, nBands: Int, bits: Int): Column =
    GraftExpressions.hyperplane_bands(v, nBands, bits, Dim)

  /** SQL mirror of the full banding pipeline: CTEs producing
    * `bands(vec_id, b, bv)` from table `e(vec_id, v DOUBLE[])`, with
    * `bits` derived from `count(*)` by the same integer rule as
    * [[bitsFor]] (DuckDB `bin()` string length = highest set bit + 1).
    */
  def bandsSqlCtes(nBands: Int, targetBucket: Int): String =
    raw"""cfg AS (SELECT greatest(4, length(bin(greatest((count(*) + ${targetBucket - 1}) // $targetBucket - 1, 1)))) AS bits FROM e),
         |bj AS (SELECT b, unnest(generate_series(0, bits - 1)) AS j FROM cfg, generate_series(0, ${nBands - 1}) gb(b)),
         |planes AS (SELECT b, j, d,
         |    CAST((1103515245 * ((b * bits + j) * ${Dim} + d) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5 AS c
         |  FROM bj, cfg, generate_series(0, ${Dim - 1}) gd(d)),
         |dots AS (SELECT vec_id, b, j, sum(v[d + 1] * c) AS dot
         |  FROM e, planes GROUP BY vec_id, b, j),
         |bands AS (SELECT vec_id, b,
         |    CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bv
         |  FROM dots GROUP BY vec_id, b)""".stripMargin
}
