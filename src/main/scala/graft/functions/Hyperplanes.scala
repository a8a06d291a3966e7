package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic random-hyperplane LSH shared by the similarity and
  * dedup operators (SURVEY.md §2 blocks C5/D2).
  *
  * Plane components come from a closed-form integer HASH of the flat
  * plane index — reproducible with no stored model, and cheap enough
  * for an oracle to regenerate in SQL from the same arithmetic. The
  * mixer is the standard 32-bit xor-shift-multiply finalizer
  * (`h = ((h>>16)^h) * 0x45d9f3b mod 2^31`, twice, then `(h>>16)^h`),
  * scaled to [-0.5, 0.5). A bare affine LCG over SEQUENTIAL indices is
  * NOT usable here: consecutive LCG outputs sit on a coarse lattice,
  * the resulting planes are strongly correlated across bands, and
  * multi-table LSH recall stops improving with table count (measured:
  * recall@5 plateaued ~0.3 below the independent-table expectation).
  * Every intermediate stays under 2^58, so DuckDB BIGINT arithmetic
  * mirrors it exactly; the argument is always >= 0 on both engines.
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

  /** Hashed plane component for flat index `idx = p*Dim + d` (>= 0). */
  def component(idx: Int): Double = {
    var h = idx.toLong
    h = (((h >> 16) ^ h) * 0x45d9f3bL) % 2147483648L
    h = (((h >> 16) ^ h) * 0x45d9f3bL) % 2147483648L
    h = (h >> 16) ^ h
    h.toDouble / 2147483648.0 - 0.5
  }

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
         |p0 AS (SELECT b, j, d, CAST((b * bits + j) * ${Dim} + d AS BIGINT) AS h0
         |  FROM bj, cfg, generate_series(0, ${Dim - 1}) gd(d)),
         |p1 AS (SELECT b, j, d, (xor(h0 >> 16, h0) * 73244475) % 2147483648 AS h1 FROM p0),
         |p2 AS (SELECT b, j, d, (xor(h1 >> 16, h1) * 73244475) % 2147483648 AS h2 FROM p1),
         |planes AS (SELECT b, j, d,
         |    CAST(xor(h2 >> 16, h2) AS DOUBLE) / 2147483648.0 - 0.5 AS c
         |  FROM p2),
         |dots AS (SELECT vec_id, b, j, sum(v[d + 1] * c) AS dot
         |  FROM e, planes GROUP BY vec_id, b, j),
         |bands AS (SELECT vec_id, b,
         |    CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bv
         |  FROM dots GROUP BY vec_id, b)""".stripMargin
}
