package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 relational/analytic widening (SURVEY.md §2: A18-A23).
  *
  * 100 TB design notes: every operator here is a single declarative
  * plan — Catalyst chooses partial aggregation, AQE sizes the
  * shuffles. GROUPING SETS reuses one shuffle for all grouping
  * combinations (Expand, not N scans); the window suite rides one
  * (partition, order) sort; the correlated-aggregate pattern is
  * expressed as a window so the per-group aggregate co-travels with
  * the rows (no second join against the fact table); the array HOFs
  * evaluate per-row with zero shuffle.
  */
object AnalyticExt {

  // ---------------------------------------------------------------- A18
  /** GROUPING SETS aggregate: (status, priority), (status), () — one
    * Expand + one shuffle serves all three granularities; `grouping_id`
    * disambiguates (bit per column, set = aggregated-away, matching
    * DuckDB's GROUPING()).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
        col("n"), col("sum_price"))

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin

  // ---------------------------------------------------------------- A19
  /** Distribution-window suite: ntile / percent_rank / cume_dist over
    * each customer's order history — one sort per partition serves all
    * three functions. Deterministic order via (date, key) tiebreak;
    * rank fractions rounded at the boundary (§5 float-parity rule).
    */
  def qWindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
  }

  val qWindowSuiteSql: String =
    """SELECT o_orderkey, o_custkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ---------------------------------------------------------------- A20
  /** Set operators: INTERSECT / EXCEPT / UNION-DISTINCT over the
    * open-order vs finished-order customer populations. Set semantics
    * (dedup built in) on both engines; output is the labeled
    * cardinality of each set — counts stay distributed until the
    * single-row aggregates.
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def custs(status: String): DataFrame =
      o.filter(col("o_orderstatus") === status).select(col("o_custkey"))
    val f = custs("F"); val op = custs("O")
    def counted(kind: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(kind).as("kind"), col("n"))
    counted("intersect", f.intersect(op))
      .unionAll(counted("except_f_o", f.except(op)))
      .unionAll(counted("union_distinct", f.union(op).distinct()))
  }

  val qSetOpsSql: String =
    """SELECT 'intersect' AS kind, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'except_f_o', count(*) FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'union_distinct', count(*) FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus IN ('F', 'O'))""".stripMargin

  // ---------------------------------------------------------------- A45
  /** Ordered string aggregation — `listagg(...) WITHIN GROUP (ORDER
    * BY ...)`, the 4.x aggregate that finally gives Spark a
    * deterministic ordered concat (collect_list + array_join loses
    * ordering guarantees across shuffles; this pins it in the
    * aggregate itself). Per market segment: the top-5 customer keys
    * by account balance as a comma list. Top-5 cut first via a
    * partitioned rank window (WindowGroupLimit pushes it map-side),
    * so the aggregate concatenates exactly 5 bounded strings per
    * group; ordering key = the rank, fully deterministic via the
    * exact-integer-cents/custkey tiebreak. DuckDB mirrors with
    * `string_agg(... ORDER BY ...)` — different spelling, identical
    * ordered-concat semantics.
    */
  def qListagg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(expr("cast(round(c_acctbal * 100) as bigint)").desc,
        col("c_custkey").asc)
    Tables.customer(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(expr("listagg(cast(c_custkey as string), ',') " +
        "within group (order by rk) as top_customers"),
        count(lit(1)).as("n"))
      .select(col("segment"), col("top_customers"), col("n"))
  }

  val qListaggSql: String =
    """WITH r AS (SELECT c_mktsegment, c_custkey, row_number() OVER (
      |    PARTITION BY c_mktsegment
      |    ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC,
      |      c_custkey ASC) AS rk
      |  FROM customer)
      |SELECT c_mktsegment AS segment,
      |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY rk)
      |    AS top_customers,
      |  count(*) AS n
      |FROM r WHERE rk <= 5 GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- A44
  /** Pearson residuals of the status × priority contingency table —
    * the cell-level drill-down behind an omnibus χ² (L15's Cramér's V
    * says THE TABLE is dependent; this says WHICH cells drive it):
    * r = (observed − expected)/√expected with expected =
    * row_total·col_total/n, |r| > 2 flagging the over/under-
    * represented cells. Counts are exact integers; the rt·ct margin
    * product goes through DECIMAL/HUGEINT (rt·ct ≤ n², which leaves
    * exact-double range past ~94 M rows) before its one correctly-
    * rounded cast, so expected and the residual are single IEEE
    * divisions on identical inputs at ANY scale. One grouped
    * aggregate (15 cells), two broadcast margin frames.
    */
  def qCrosstabResiduals(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("status")).agg(sum(col("o")).as("rt"))
    val cols = cells.groupBy(col("priority")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    cells.join(broadcast(rows), "status").join(broadcast(cols), "priority")
      .crossJoin(broadcast(n))
      .withColumn("expected", round(
        (col("rt").cast("decimal(38,0)") * col("ct").cast("decimal(38,0)"))
          .cast("double") / col("n"), 4))
      .withColumn("residual",
        when(col("expected") <= 0, lit(null).cast("double"))
          .otherwise(round((col("o") - col("expected"))
            / sqrt(col("expected")), 4)))
      .select(col("status"), col("priority"), col("o").as("observed"),
        col("expected"), col("residual"),
        coalesce(abs(col("residual")) > 2.0, lit(false)).as("notable"))
  }

  val qCrosstabResidualsSql: String =
    """WITH cells AS (SELECT o_orderstatus AS status,
      |    o_orderpriority AS priority, count(*) AS o
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT status, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |c AS (SELECT priority, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |e AS (SELECT status, priority, o,
      |    round(CAST(CAST(rt AS HUGEINT) * CAST(ct AS HUGEINT) AS DOUBLE)
      |      / n, 4) AS expected
      |  FROM cells JOIN r USING (status) JOIN c USING (priority), n)
      |SELECT status, priority, o AS observed, expected,
      |  CASE WHEN expected <= 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE round((o - expected) / sqrt(expected), 4) END AS residual,
      |  coalesce(abs(CASE WHEN expected <= 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE round((o - expected) / sqrt(expected), 4) END) > 2.0, false)
      |    AS notable
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- A21
  /** Correlated-aggregate pattern ("orders above 1.5x their customer's
    * average") expressed as a window — the per-customer aggregate
    * co-travels with the rows in ONE shuffle instead of a
    * subquery-join back against the fact table. Predicate is exact
    * decimal arithmetic (2*price*n > 3*sum ⟺ price > 1.5*avg):
    * no float division, no rounding, bit-identical on both engines.
    */
  def qAboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("p_dec", col("o_totalprice").cast("decimal(18,2)"))
      .withColumn("s", sum(col("p_dec")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("p_dec") * col("cnt") * 2 > col("s") * 3)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  val qAboveAvgOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS p_dec,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS s,
      |    count(*) OVER (PARTITION BY o_custkey) AS cnt
      |  FROM orders)
      |WHERE p_dec * cnt * 2 > s * 3""".stripMargin

  // ---------------------------------------------------------------- A22
  /** Array higher-order functions over the embedding column:
    * filter (positive-entry count), aggregate (L1 norm, left fold —
    * same fold order as the oracle's list_reduce), transform+max
    * (amplitude). Map-only: zero shuffle, evaluated per row where the
    * data lives.
    */
  def qArrayHof(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        size(filter(col("v"), x => x > 0)).as("n_pos"),
        round(aggregate(col("v"), lit(0.0), (acc, x) => acc + abs(x)), 5).as("l1"),
        round(array_max(transform(col("v"), x => abs(x))), 5).as("max_abs"))

  val qArrayHofSql: String =
    """SELECT vec_id,
      |  len(list_filter(v, x -> x > 0)) AS n_pos,
      |  round(list_reduce(list_transform(v, x -> abs(x)), (a, b) -> a + b), 5) AS l1,
      |  round(list_max(list_transform(v, x -> abs(x))), 5) AS max_abs
      |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin

  // ---------------------------------------------------------------- A23
  /** Per-user exponential moving average (alpha = 0.5) of event values
    * — the recursive smoother s_t = a*v_t + (1-a)*s_{t-1} in closed
    * form: s_n = (1-a)^(n-1)*v_1 + sum_{r>=2} a*(1-a)^(n-r)*v_r. One
    * window (ordered row_number) + one aggregate — no iteration, no
    * UDF; weights are exact powers of two, so each product is exact
    * IEEE and the 6dp boundary rounding absorbs summation-order ulps.
    */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("wt",
        when(col("r") === 1, pow(lit(0.5), col("n") - 1))
          .otherwise(pow(lit(0.5), col("n") - col("r") + 1)))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        round(sum(col("wt") * col("value")), 6).as("ewma"))
  }

  val qEwmaSql: String =
    """SELECT user_id, max(n) AS n_events,
      |  round(sum(wt * value), 6) AS ewma
      |FROM (
      |  SELECT user_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r,
      |    count(*) OVER (PARTITION BY user_id) AS n,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
      |      THEN power(0.5, count(*) OVER (PARTITION BY user_id) - 1)
      |      ELSE power(0.5, count(*) OVER (PARTITION BY user_id)
      |        - row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) + 1)
      |    END AS wt
      |  FROM events)
      |GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- A24
  /** Calendar rollup: monthly revenue via `date_trunc` — the
    * date-dimension aggregate every BI workload starts from. One
    * shuffle on the (low-cardinality) month key; decimal-exact sums.
    */
  def qMonthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))

  val qMonthlyRevenueSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- A25
  /** Frame-boundary window values: first / last / nth order per
    * customer over the FULL partition frame (explicit unbounded frame —
    * last_value defaults to a running frame and silently returns the
    * current row otherwise, in both engines). One sort serves all
    * three.
    */
  def qFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_k"),
        last(col("o_orderkey")).over(w).as("last_k"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_k"))
  }

  val qFirstLastSql: String =
    """SELECT o_orderkey, o_custkey,
      |  first_value(o_orderkey) OVER w AS first_k,
      |  last_value(o_orderkey) OVER w AS last_k,
      |  nth_value(o_orderkey, 2) OVER w AS second_k
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  // ---------------------------------------------------------------- A26
  /** RANGE-frame window: trailing-30-day spend per customer. The frame
    * is bounded by ORDER-COLUMN VALUE (epoch days), not row count —
    * same-day ties all enter the frame together, so the result is
    * deterministic without a tiebreak. Decimal-exact running sums.
    */
  def qRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-30, 0)
    Tables.orders(spark, dir)
      .withColumn("d", datediff(col("o_orderdate"), lit("1970-01-01").cast("date")).cast("long"))
      .select(col("o_orderkey"), col("o_custkey"), col("d"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double").as("spend_30d"))
  }

  val qRangeFrameSql: String =
    """SELECT o_orderkey, o_custkey, d,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY d
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM (SELECT *, CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d
      |  FROM orders)""".stripMargin

  // ---------------------------------------------------------------- A27
  /** Edit-distance similarity of adjacent documents (by id, within
    * source): `lead()` carries the neighbor's prefix through the SAME
    * window shuffle, so the pair stream is linear in corpus size — no
    * self-join, no quadratic pair space; levenshtein runs on bounded
    * 40-char prefixes (O(1600) cells per pair, capped at any scale).
    */
  def qEditDistance(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.normText
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        substring(normText(col("text")), 1, 40).as("s"))
      .withColumn("next_id", lead(col("doc_id"), 1).over(w))
      .withColumn("next_s", lead(col("s"), 1).over(w))
      .filter(col("next_id").isNotNull)
      .select(col("doc_id"), col("next_id"), col("source"),
        levenshtein(col("s"), col("next_s")).as("edit_dist"))
  }

  val qEditDistanceSql: String =
    raw"""WITH d AS (SELECT doc_id, source,
         |    substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40) AS s
         |  FROM documents),
         |p AS (SELECT doc_id, source, s,
         |    lead(doc_id, 1) OVER w AS next_id, lead(s, 1) OVER w AS next_s
         |  FROM d WINDOW w AS (PARTITION BY source ORDER BY doc_id))
         |SELECT doc_id, next_id, source, levenshtein(s, next_s) AS edit_dist
         |FROM p WHERE next_id IS NOT NULL""".stripMargin

  // ---------------------------------------------------------------- A37
  /** Wald–Wolfowitz runs test on daily event volume — the sequence-
    * randomness verdict the anomaly family lacks: F11 flags level
    * outliers and F21† a level SHIFT, but a metric can pass both
    * while its fluctuations cluster (trend, weekly seasonality,
    * autocorrelated load). Above/below-median signs per day (median
    * from the exact percentile on integer counts; equal-to-median
    * days excluded, the standard treatment), runs counted by one
    * sign≠lag(sign) pass over the BOUNDED day table (window-length
    * days, the q_changepoint exemption class), then the closed-form
    * normal approximation — E[R], Var[R], z — from exact integer
    * (n1, n2, R) in identical double arithmetic, 6-dp boundary.
    */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.events(spark, dir)
      .select(expr("(ts DIV 1000000000) DIV 86400").cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
    val med = byDay.agg(expr("percentile(n, 0.5)").as("med"))
    val signed = byDay.crossJoin(broadcast(med))
      .filter(col("n") =!= col("med"))
      .withColumn("s", when(col("n") > col("med"), 1).otherwise(0))
    val w = Window.orderBy(col("day"))
    val runs = signed
      .withColumn("brk",
        when(lag(col("s"), 1).over(w).isNull
          || lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
      .agg(sum(col("brk")).as("runs"),
        sum(col("s")).cast("long").as("n1"),
        sum(lit(1) - col("s")).cast("long").as("n2"))
    runs
      .withColumn("m", col("n1") + col("n2"))
      .withColumn("e_runs",
        lit(1.0) + lit(2.0) * col("n1") * col("n2") / col("m"))
      .withColumn("var_runs",
        lit(2.0) * col("n1") * col("n2")
          * (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2"))
          / (col("m") * col("m") * (col("m") - 1)))
      .select(col("n1"), col("n2"), col("runs"),
        round(col("e_runs"), 6).as("e_runs"),
        when(col("var_runs") <= 0, lit(null).cast("double"))
          .otherwise(round((col("runs") - col("e_runs"))
            / sqrt(col("var_runs")), 6)).as("z"))
      .withColumn("random_ok",
        coalesce(abs(col("z")) <= 1.96, lit(false)))
  }

  val qRunsTestSql: String =
    """WITH byday AS (SELECT (CAST(floor(epoch(ts)) AS BIGINT)) // 86400 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1),
      |med AS (SELECT quantile_cont(n, 0.5) AS med FROM byday),
      |signed AS (SELECT day, CASE WHEN n > med THEN 1 ELSE 0 END AS s
      |  FROM byday, med WHERE n <> med),
      |brk AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
      |      OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS b
      |  FROM signed),
      |agg AS (SELECT CAST(sum(b) AS BIGINT) AS runs,
      |    CAST(sum(s) AS BIGINT) AS n1,
      |    CAST(sum(1 - s) AS BIGINT) AS n2
      |  FROM brk),
      |calc AS (SELECT *, n1 + n2 AS m,
      |    1.0 + 2.0 * n1 * n2 / (n1 + n2) AS e_runs,
      |    2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
      |      / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)) AS var_runs
      |  FROM agg)
      |SELECT n1, n2, runs, round(e_runs, 6) AS e_runs,
      |  CASE WHEN var_runs <= 0 THEN NULL
      |    ELSE round((runs - e_runs) / sqrt(var_runs), 6) END AS z,
      |  coalesce(abs(CASE WHEN var_runs <= 0 THEN NULL
      |    ELSE round((runs - e_runs) / sqrt(var_runs), 6) END) <= 1.96,
      |    false) AS random_ok
      |FROM calc""".stripMargin

  // ---------------------------------------------------------------- A36
  /** Month-over-month revenue bridge — the contribution analysis
    * behind every "why did revenue move" review: each month's total
    * delta decomposed into per-segment contributions that sum exactly
    * to it. The trap this avoids: lag() over a sparse (month,
    * segment) series silently compares non-adjacent months — so the
    * revenue lands on a DENSE month × segment grid first (distinct
    * months ⨯ broadcast segment list, both bounded by construction,
    * absent cells exactly 0). Dense over OBSERVED months: a calendar
    * month with zero orders across ALL segments would still be
    * skipped by lag() — acceptable for this corpus (continuous
    * generated order stream), and both engines share the convention;
    * a gap-proof variant would build the axis with
    * sequence(min_month, max_month) as q_gap_fill (F9) does. Decimal-exact end to end — revenue,
    * deltas, and the per-month total delta stay DECIMAL until the
    * one share division at the 6-dp boundary (sign convention:
    * share of the month's NET move, ±); the lag window partitions
    * by segment over the bounded month grid.
    */
  def qMomBridge(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("c_mktsegment").as("segment"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val months = rev.select(col("month")).distinct()
    val segments = rev.select(col("segment")).distinct()
    val grid = months.crossJoin(broadcast(segments))
      .join(rev, Seq("month", "segment"), "left")
      .withColumn("rev", coalesce(col("rev"), lit(0).cast("decimal(18,2)")))
    val w = Window.partitionBy(col("segment")).orderBy(col("month"))
    val deltas = grid
      .withColumn("prev_rev", lag(col("rev"), 1).over(w))
      .filter(col("prev_rev").isNotNull)
      .withColumn("delta", col("rev") - col("prev_rev"))
    val tot = deltas.groupBy(col("month"))
      .agg(sum(col("delta")).as("total_delta"))
    deltas.join(tot, "month")
      .select(col("month"), col("segment"),
        col("rev").cast("double").as("rev"),
        col("delta").cast("double").as("delta"),
        col("total_delta").cast("double").as("total_delta"),
        when(col("total_delta") === 0, lit(null).cast("double"))
          .otherwise(round(col("delta").cast("double")
            / col("total_delta").cast("double"), 6)).as("share_of_delta"))
  }

  val qMomBridgeSql: String =
    """WITH rev AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    c_mktsegment AS segment,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |grid AS (SELECT m.month, s.segment,
      |    COALESCE(rev.rev, CAST(0 AS DECIMAL(18,2))) AS rev
      |  FROM (SELECT DISTINCT month FROM rev) m
      |  CROSS JOIN (SELECT DISTINCT segment FROM rev) s
      |  LEFT JOIN rev ON rev.month = m.month AND rev.segment = s.segment),
      |d AS (SELECT *, lag(rev, 1) OVER (
      |      PARTITION BY segment ORDER BY month) AS prev_rev
      |  FROM grid),
      |deltas AS (SELECT month, segment, rev, rev - prev_rev AS delta
      |  FROM d WHERE prev_rev IS NOT NULL),
      |tot AS (SELECT month, sum(delta) AS total_delta FROM deltas GROUP BY 1)
      |SELECT deltas.month, segment,
      |  CAST(rev AS DOUBLE) AS rev, CAST(delta AS DOUBLE) AS delta,
      |  CAST(total_delta AS DOUBLE) AS total_delta,
      |  CASE WHEN total_delta = 0 THEN NULL
      |    ELSE round(CAST(delta AS DOUBLE) / CAST(total_delta AS DOUBLE), 6)
      |  END AS share_of_delta
      |FROM deltas JOIN tot ON deltas.month = tot.month""".stripMargin

  // ---------------------------------------------------------------- A35
  /** Skyline (Pareto frontier) of suppliers on (unit price ↓, volume
    * ↑) — multi-criteria dominance (Börzsönyi et al., ICDE 2001): a
    * supplier survives iff no other ships at a price ≤ theirs AND
    * volume ≥ theirs with one strict. Scale shape: one supplier-keyed
    * aggregate (decimal-exact sums; x = 6-dp unit price, y = exact
    * integer volume), then GRID PRUNING — x quantizes into 256
    * buckets (bounded table), per-bucket max-y prefix maxima
    * broadcast back, and any point whose y falls below its strictly-
    * prior-bucket prefix max is dominated WITHOUT entering the sweep.
    * The exact sweep (sort by x asc, y desc; running-max test, plus a
    * y-keyed min-x pass for equal-y dominance) touches only pruned
    * candidates — output-scale, not corpus-scale, on any non-
    * adversarial distribution (a fully-Pareto corpus makes the answer
    * itself O(n); no algorithm beats its own output size). Windows:
    * the bucket prefix and the final sweep are bounded-by-
    * construction / output-scale (PlanSpec-exempt, documented); the
    * equal-y pass partitions by y.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        sum(col("l_quantity").cast("decimal(12,0)")).as("sq"))
      .select(col("s_suppkey"),
        round(col("sp").cast("double") / col("sq").cast("double"), 6)
          .as("unit_price"),
        col("sq").cast("long").as("total_qty"))
    val mm = s.agg(min(col("unit_price")).as("mn"), max(col("unit_price")).as("mx"))
    val bucketed = s.crossJoin(broadcast(mm))
      .withColumn("bucket", least(lit(255), floor(
        (col("unit_price") - col("mn")) /
          ((col("mx") - col("mn")) / 256 + lit(1e-12))).cast("int")))
    val bmax = bucketed.groupBy(col("bucket"))
      .agg(max(col("total_qty")).as("by"))
    // prefix max over strictly-prior buckets: 256x256 broadcast self-
    // join on the bounded bucket table (no window needed)
    val pmax = bmax.as("b1").join(broadcast(bmax.as("b2")),
        col("b2.bucket") < col("b1.bucket"), "left")
      .groupBy(col("b1.bucket").as("bucket"))
      .agg(max(col("b2.by")).as("pmax"))
    val cand = bucketed.join(broadcast(pmax), "bucket")
      .filter(col("pmax").isNull || col("total_qty") >= col("pmax"))
    val byY = Window.partitionBy(col("total_qty"))
    val sweep = Window.orderBy(col("unit_price").asc,
      col("total_qty").desc, col("s_suppkey").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cand
      .withColumn("xmin_y", min(col("unit_price")).over(byY))
      .withColumn("runmax", max(col("total_qty")).over(sweep))
      // dominated iff a prior point has strictly larger y (runmax),
      // or an equal-y point sits at strictly smaller x (xmin_y);
      // equal-x-equal-y duplicates survive together
      .filter((col("runmax").isNull || col("runmax") <= col("total_qty"))
        && col("xmin_y") === col("unit_price"))
      .select(col("s_suppkey"), col("unit_price"), col("total_qty"))
  }

  val qSkylineSql: String =
    """WITH s AS (SELECT l_suppkey AS s_suppkey,
      |    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |      / CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS DOUBLE), 6) AS unit_price,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(12,0))) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY 1)
      |SELECT s_suppkey, unit_price, total_qty FROM s p
      |WHERE NOT EXISTS (SELECT 1 FROM s q
      |  WHERE q.unit_price <= p.unit_price AND q.total_qty >= p.total_qty
      |    AND (q.unit_price < p.unit_price OR q.total_qty > p.total_qty))""".stripMargin

  // ---------------------------------------------------------------- A34
  /** Record linkage (entity resolution) over the part catalog by the
    * sorted-neighborhood method (Hernández & Stolfo, 1995): records
    * block on (name noun, size), sort within the block by (name, key),
    * and each record compares only to its next W=2 neighbors via
    * `lead()` — the A27 device generalized, so the candidate-pair
    * stream is 2n regardless of block size (never the within-block
    * quadratic an equi-join blocking pays as blocks grow with the
    * catalog). Match evidence is exact-integer: levenshtein on the
    * full name, brand equality, price proximity on round(price*10)
    * longs (exact — the values are decimal(,1) shipped as doubles);
    * score = name(2/1/0) + brand(1) + price(1), matched at >= 3.
    * Pair keys canonicalize to (least, greatest) so output identity
    * is order-free. One window shuffle + map-side scoring; zero
    * float surface in any comparison.
    */
  def qRecordLinkage(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
        element_at(split(col("p_name"), " "), 2).as("noun"),
        round(col("p_retailprice") * 10).cast("long").as("price10"))
    val w = Window.partitionBy(col("noun"), col("p_size"))
      .orderBy(col("p_name"), col("p_partkey"))
    val leads = (1 to 2).flatMap(i => Seq(
      lead(col("p_partkey"), i).over(w).as(s"bk$i"),
      lead(col("p_name"), i).over(w).as(s"bn$i"),
      lead(col("p_brand"), i).over(w).as(s"bb$i"),
      lead(col("price10"), i).over(w).as(s"bp$i")))
    val nbrs = p.select(col("*") +: leads: _*)
    val pairs = nbrs.select(col("p_partkey"), col("p_name"),
        col("p_brand"), col("price10"),
        explode(array((1 to 2).map(i => struct(
          col(s"bk$i").as("bk"), col(s"bn$i").as("bn"),
          col(s"bb$i").as("bb"), col(s"bp$i").as("bp"))): _*)).as("nb"))
      .filter(col("nb.bk").isNotNull)
    pairs
      .select(
        least(col("p_partkey"), col("nb.bk")).as("a"),
        greatest(col("p_partkey"), col("nb.bk")).as("b"),
        levenshtein(col("p_name"), col("nb.bn")).as("name_dist"),
        (col("p_brand") === col("nb.bb")).as("brand_match"),
        (abs(col("price10") - col("nb.bp")) <= 10).as("price_close"))
      .withColumn("score",
        when(col("name_dist") === 0, lit(2))
          .when(col("name_dist") <= 2, lit(1)).otherwise(lit(0))
        + when(col("brand_match"), lit(1)).otherwise(lit(0))
        + when(col("price_close"), lit(1)).otherwise(lit(0)))
      .withColumn("matched", col("score") >= 3)
  }

  val qRecordLinkageSql: String =
    """WITH p AS (SELECT p_partkey, p_name, p_brand, p_size,
      |    split_part(p_name, ' ', 2) AS noun,
      |    CAST(round(p_retailprice * 10) AS BIGINT) AS price10
      |  FROM part),
      |l AS (SELECT *,
      |    lead(p_partkey, 1) OVER w AS bk1, lead(p_name, 1) OVER w AS bn1,
      |    lead(p_brand, 1) OVER w AS bb1, lead(price10, 1) OVER w AS bp1,
      |    lead(p_partkey, 2) OVER w AS bk2, lead(p_name, 2) OVER w AS bn2,
      |    lead(p_brand, 2) OVER w AS bb2, lead(price10, 2) OVER w AS bp2
      |  FROM p WINDOW w AS (PARTITION BY noun, p_size ORDER BY p_name, p_partkey)),
      |pairs AS (
      |  SELECT p_partkey AS k, bk1 AS bk, p_name AS an, bn1 AS bn,
      |    p_brand AS ab, bb1 AS bb, price10 AS ap, bp1 AS bp
      |  FROM l WHERE bk1 IS NOT NULL
      |  UNION ALL
      |  SELECT p_partkey, bk2, p_name, bn2, p_brand, bb2, price10, bp2
      |  FROM l WHERE bk2 IS NOT NULL),
      |scored AS (SELECT least(k, bk) AS a, greatest(k, bk) AS b,
      |    levenshtein(an, bn) AS name_dist, (ab = bb) AS brand_match,
      |    (abs(ap - bp) <= 10) AS price_close
      |  FROM pairs)
      |SELECT a, b, name_dist, brand_match, price_close,
      |  (CASE WHEN name_dist = 0 THEN 2 WHEN name_dist <= 2 THEN 1 ELSE 0 END
      |   + CASE WHEN brand_match THEN 1 ELSE 0 END
      |   + CASE WHEN price_close THEN 1 ELSE 0 END) AS score,
      |  (CASE WHEN name_dist = 0 THEN 2 WHEN name_dist <= 2 THEN 1 ELSE 0 END
      |   + CASE WHEN brand_match THEN 1 ELSE 0 END
      |   + CASE WHEN price_close THEN 1 ELSE 0 END) >= 3 AS matched
      |FROM scored""".stripMargin

  // ---------------------------------------------------------------- A28
  /** Per-type geometric mean of event values through the typed
    * `Aggregator` extension point (map-side partial buffers, order-
    * independent merge — see functions.aggregators). The oracle
    * replays the identity exp(avg(ln x)); the 6dp boundary rounding
    * absorbs summation-order ulps exactly as for corr/stddev.
    */
  def qGeomean(spark: SparkSession, dir: String): DataFrame = {
    val gm = udaf(graft.functions.aggregators.GeoMean)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(gm(col("value")), 6).as("geomean"))
  }

  // any non-positive factor ⇒ geomean 0 (limit convention, matching
  // the UDAF); ln() must not see the zero even in dead CASE branches —
  // DuckDB evaluates aggregate arguments per-row before the gate
  val qGeomeanSql: String =
    """SELECT event_type, count(*) AS n,
      |  CASE WHEN sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) > 0 THEN 0.0
      |    ELSE round(exp(avg(ln(CASE WHEN value > 0 THEN value ELSE 1 END))), 6)
      |  END AS geomean
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- A29
  /** Full-outer join: per-user event activity reconciled against the
    * customer dimension — rows survive from BOTH unmatched sides
    * (customers who never emitted an event, events from users outside
    * the dimension). Activity aggregates BEFORE the join, so the
    * full-outer shuffle carries one row per key per side, and the
    * coalesced key keeps the output total-function over both inputs.
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val activity = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    activity.join(cust, activity("user_id") === cust("c_custkey"), "full_outer")
      .select(coalesce(col("user_id"), col("c_custkey")).as("key"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("c_custkey").isNotNull.as("has_customer"),
        coalesce(col("c_mktsegment"), lit("none")).as("segment"))
  }

  val qFullOuterSql: String =
    """WITH a AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
      |SELECT COALESCE(a.user_id, c.c_custkey) AS key,
      |  COALESCE(a.n_events, 0) AS n_events,
      |  c.c_custkey IS NOT NULL AS has_customer,
      |  COALESCE(c.c_mktsegment, 'none') AS segment
      |FROM a FULL OUTER JOIN customer c ON a.user_id = c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- A30
  /** TPC-H Q21-pattern "who held up the order": in every
    * multi-supplier order, blame the supplier(s) whose line shipped
    * LAST; rank suppliers by blame count. The per-order profile
    * (distinct suppliers, latest ship date) aggregates FIRST and joins
    * back — one shuffle on l_orderkey serves both the aggregate and
    * the join-back probe, and the blame rollup is supplier-sized.
    * Top-10 with a deterministic key tiebreak, mirrored in the oracle.
    */
  def qBlameSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val orders = li.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"),
        max(col("l_shipdate")).as("max_ship"))
      .filter(col("n_supps") >= 2)
    li.join(orders, "l_orderkey")
      .filter(col("l_shipdate") === col("max_ship"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_orderkey")).as("n_blamed"))
      .orderBy(col("n_blamed").desc, col("l_suppkey").asc)
      .limit(10)
  }

  val qBlameSupplierSql: String =
    """WITH o AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supps,
      |    max(l_shipdate) AS max_ship
      |  FROM lineitem GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) >= 2)
      |SELECT l.l_suppkey, count(DISTINCT l.l_orderkey) AS n_blamed
      |FROM lineitem l JOIN o ON l.l_orderkey = o.l_orderkey
      |WHERE l.l_shipdate = o.max_ship
      |GROUP BY l.l_suppkey
      |ORDER BY n_blamed DESC, l.l_suppkey ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- A31
  /** RFM customer segmentation — the classic lifecycle-marketing
    * device: recency (days since last order vs the corpus max date),
    * frequency (order count), monetary (decimal-exact spend), each
    * quartile-coded 1–4 WITHOUT a global sort: the three quartile cut
    * arrays come from ONE exact-percentile aggregate and broadcast
    * back, scores are map-side comparison counts (the K7 ntile
    * device — no total order at any scale). Cut interpolation is the
    * A15-proven percentile ↔ quantile_cont pair on bit-identical
    * double inputs, so the strict `>` comparisons agree cross-engine.
    * Segment labels are CASE over the integer scores. One o_custkey
    * shuffle; everything after the broadcast is map-only.
    */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val maxd = o.agg(max(col("o_orderdate").cast("date")).as("maxd"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("monetary"))
      .crossJoin(broadcast(maxd))
      .select(col("o_custkey").as("custkey"),
        datediff(col("maxd"), col("last_order")).as("recency"),
        col("frequency"), col("monetary"))
    val cuts = cust.agg(
      expr("percentile(recency, array(0.25, 0.5, 0.75))").as("rc"),
      expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("fc"),
      // round(monetary,2) is a no-op (DECIMAL(18,2)-exact spend) made
      // explicit for the §5 quantize-before-percentile guard
      expr("percentile(round(monetary, 2), array(0.25, 0.5, 0.75))").as("mc"))
    def above(v: Column, c: Column): Column =
      (v > c(0)).cast("int") + (v > c(1)).cast("int") + (v > c(2)).cast("int")
    cust.crossJoin(broadcast(cuts))
      .withColumn("r_score", lit(4) - above(col("recency"), col("rc")))
      .withColumn("f_score", lit(1) + above(col("frequency"), col("fc")))
      .withColumn("m_score", lit(1) + above(col("monetary"), col("mc")))
      .withColumn("segment",
        when(col("r_score") >= 3 && col("f_score") >= 3 &&
          col("m_score") >= 3, "champion")
        .when(col("r_score") >= 3 && col("f_score") >= 2, "loyal")
        .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
        .when(col("r_score") === 1 && col("f_score") === 1, "hibernating")
        .otherwise("regular"))
      .select(col("custkey"), col("recency"), col("frequency"),
        round(col("monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("rfm"),
        col("segment"))
  }

  val qRfmSegmentsSql: String =
    """WITH maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
      |c AS (SELECT o_custkey AS custkey,
      |    max(CAST(o_orderdate AS DATE)) AS last_order,
      |    count(*) AS frequency,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM orders GROUP BY 1),
      |r AS (SELECT custkey,
      |    CAST(date_diff('day', last_order, maxd) AS INT) AS recency,
      |    frequency, monetary FROM c, maxd),
      |cuts AS (SELECT quantile_cont(recency, [0.25, 0.5, 0.75]) AS rc,
      |    quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fc,
      |    quantile_cont(round(monetary, 2), [0.25, 0.5, 0.75]) AS mc FROM r),
      |s AS (SELECT custkey, recency, frequency, monetary,
      |    4 - (CAST(recency > rc[1] AS INT) + CAST(recency > rc[2] AS INT)
      |       + CAST(recency > rc[3] AS INT)) AS r_score,
      |    1 + (CAST(frequency > fc[1] AS INT) + CAST(frequency > fc[2] AS INT)
      |       + CAST(frequency > fc[3] AS INT)) AS f_score,
      |    1 + (CAST(monetary > mc[1] AS INT) + CAST(monetary > mc[2] AS INT)
      |       + CAST(monetary > mc[3] AS INT)) AS m_score
      |  FROM r, cuts)
      |SELECT custkey, recency, frequency, round(monetary, 2) AS monetary,
      |  r_score, f_score, m_score,
      |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
      |    || CAST(m_score AS VARCHAR) AS rfm,
      |  CASE
      |    WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
      |    WHEN r_score >= 3 AND f_score >= 2 THEN 'loyal'
      |    WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |    WHEN r_score = 1 AND f_score = 1 THEN 'hibernating'
      |    ELSE 'regular' END AS segment
      |FROM s""".stripMargin

  // ---------------------------------------------------------------- A32
  /** Market-basket association rules over co-purchased part brands:
    * support, confidence, and lift per brand pair, top-20 by lift with
    * a deterministic name tiebreak. The scale shape matters: baskets
    * aggregate ONCE per order (sorted distinct brand array, bounded by
    * the ~7-line order size), and the a<b pair stream is generated
    * MAP-SIDE from that array with the codegen PackedPairs index
    * kernel — no basket self-join shuffle at any corpus size. Item counts ride the
    * same cached basket frame; the 25-brand item table broadcasts.
    * All counts exact integers; ratios round at the output boundary,
    * and the top-20 cut orders by the ROUNDED lift so both engines cut
    * identically.
    */
  /** Shared A32/A49 basket frame: one sorted distinct brand array per
    * order (bounded by order size), computed once per session — the
    * identical plan from either consumer hits the CacheManager.
    */
  private def brandBaskets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .cache()

  def qAssocRules(spark: SparkSession, dir: String): DataFrame = {
    val baskets = brandBaskets(spark, dir)
    val tot = baskets.agg(count(lit(1)).as("n_orders"))
    val item = baskets.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("n_item"))
    // i<j index pairs from the codegen PackedPairs kernel over
    // sequence(0, n-1), payloads re-attached by element_at — the
    // nested-HOF flatten(transform(transform(slice))) chain ran
    // interpreted lambdas per pair (r17 VERDICT ask #4); values are
    // identical because bs is sorted distinct, so position order IS
    // brand order
    val pairs = baskets
      .select(col("bs"), explode(graft.functions.GraftExpressions.packed_pairs(
        sequence(lit(0L), (size(col("bs")) - 1).cast("long")))).as("p"))
      .select(
        element_at(col("bs"),
          shiftrightunsigned(col("p"), 32).cast("int") + 1).as("brand_a"),
        element_at(col("bs"),
          col("p").bitwiseAND(lit(0xFFFFFFFFL)).cast("int") + 1).as("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(item.select(col("brand").as("brand_a"),
        col("n_item").as("n_a"))), "brand_a")
      .join(broadcast(item.select(col("brand").as("brand_b"),
        col("n_item").as("n_b"))), "brand_b")
      .crossJoin(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        round(col("n_ab") / col("n_orders"), 6).as("support"),
        round(col("n_ab") / col("n_a"), 6).as("confidence"),
        round((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("brand_a").asc, col("brand_b").asc)
      .limit(20)
  }

  val qAssocRulesSql: String =
    """WITH basket AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
      |    FROM lineitem JOIN part ON l_partkey = p_partkey),
      |tot AS (SELECT count(DISTINCT okey) AS n_orders FROM basket),
      |item AS (SELECT brand, count(*) AS n FROM basket GROUP BY 1),
      |pairs AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
      |    count(*) AS n_ab
      |  FROM basket a JOIN basket b ON a.okey = b.okey AND a.brand < b.brand
      |  GROUP BY 1, 2)
      |SELECT brand_a, brand_b, n_ab, ia.n AS n_a, ib.n AS n_b,
      |  round(n_ab / CAST(n_orders AS DOUBLE), 6) AS support,
      |  round(n_ab / CAST(ia.n AS DOUBLE), 6) AS confidence,
      |  round(CAST(n_ab * n_orders AS DOUBLE) / (ia.n * ib.n), 6) AS lift
      |FROM pairs
      |JOIN item ia ON brand_a = ia.brand
      |JOIN item ib ON brand_b = ib.brand, tot
      |ORDER BY lift DESC, brand_a, brand_b LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- A49
  /** Frequent 3-itemsets — the FP-Growth-shape capstone over A32's
    * basket device (the k ≥ 3 lattice a market-basket user asks for
    * the moment pairs work; MLlib ships FPGrowth as a flagship): all
    * {a,b,c} brand triples co-purchased in one order, scored as the
    * rule {a,b} → c — support = n_abc/n_orders, confidence =
    * n_abc/n_ab, lift = n_abc·n_orders/(n_ab·n_c). No lattice walk
    * and no candidate-generation rounds are needed at ANY corpus
    * size: triples generate MAP-SIDE from each order's sorted
    * distinct brand array (the codegen PackedTriples i<j<k index
    * kernel — order-size-bounded, never a basket self-join), and the
    * distinct-triple
    * space is domain-bounded at C(|brands|, 3) (=2,300 at 25 brands)
    * regardless of row count, so the count aggregate and everything
    * after it are fixed-size. Shares the cached A32 basket frame and
    * its pair/item counts. Exact integer counts; ratios round at the
    * 6-dp publish boundary; top-20 by (rounded lift DESC, names ASC)
    * — the A32 deterministic-cut device.
    */
  def qFreqItemsets(spark: SparkSession, dir: String): DataFrame = {
    val baskets = brandBaskets(spark, dir)
    val tot = baskets.agg(count(lit(1)).as("n_orders"))
    val item = baskets.select(explode(col("bs")).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("n_item"))
    // both lattices ride the codegen packed-index kernels (the A32
    // device): i<j / i<j<k index combinations over sequence(0, n-1),
    // brands re-attached by element_at on the sorted distinct array —
    // identical values to the interpreted nested-HOF chains
    val pairCnt = baskets
      .select(col("bs"), explode(graft.functions.GraftExpressions.packed_pairs(
        sequence(lit(0L), (size(col("bs")) - 1).cast("long")))).as("p"))
      .groupBy(
        element_at(col("bs"),
          shiftrightunsigned(col("p"), 32).cast("int") + 1).as("brand_a"),
        element_at(col("bs"),
          col("p").bitwiseAND(lit(0xFFFFFFFFL)).cast("int") + 1).as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    val triples = baskets
      .select(col("bs"), explode(graft.functions.GraftExpressions.packed_triples(
        sequence(lit(0L), (size(col("bs")) - 1).cast("long")))).as("t"))
      .groupBy(
        element_at(col("bs"),
          shiftrightunsigned(col("t"), 42).cast("int") + 1).as("brand_a"),
        element_at(col("bs"),
          shiftrightunsigned(col("t"), 21).bitwiseAND(lit(0x1FFFFFL))
            .cast("int") + 1).as("brand_b"),
        element_at(col("bs"),
          col("t").bitwiseAND(lit(0x1FFFFFL)).cast("int") + 1).as("brand_c"))
      .agg(count(lit(1)).as("n_abc"))
    triples
      .join(broadcast(pairCnt), Seq("brand_a", "brand_b"))
      .join(broadcast(item.select(col("brand").as("brand_c"),
        col("n_item").as("n_c"))), "brand_c")
      .crossJoin(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("brand_c"),
        col("n_abc"), col("n_ab"), col("n_c"),
        round(col("n_abc") / col("n_orders"), 6).as("support"),
        round(col("n_abc") / col("n_ab"), 6).as("confidence"),
        round((col("n_abc") * col("n_orders")).cast("double") /
          (col("n_ab") * col("n_c")), 6).as("lift"))
      .orderBy(col("lift").desc, col("brand_a").asc, col("brand_b").asc,
        col("brand_c").asc)
      .limit(20)
  }

  val qFreqItemsetsSql: String =
    """WITH basket AS (SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
      |    FROM lineitem JOIN part ON l_partkey = p_partkey),
      |tot AS (SELECT count(DISTINCT okey) AS n_orders FROM basket),
      |item AS (SELECT brand, count(*) AS n FROM basket GROUP BY 1),
      |pairs AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
      |    count(*) AS n_ab
      |  FROM basket a JOIN basket b ON a.okey = b.okey AND a.brand < b.brand
      |  GROUP BY 1, 2),
      |triples AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
      |    c.brand AS brand_c, count(*) AS n_abc
      |  FROM basket a JOIN basket b ON a.okey = b.okey AND a.brand < b.brand
      |  JOIN basket c ON a.okey = c.okey AND b.brand < c.brand
      |  GROUP BY 1, 2, 3)
      |SELECT brand_a, brand_b, brand_c, n_abc, p.n_ab, ic.n AS n_c,
      |  round(n_abc / CAST(n_orders AS DOUBLE), 6) AS support,
      |  round(n_abc / CAST(p.n_ab AS DOUBLE), 6) AS confidence,
      |  round(CAST(n_abc * n_orders AS DOUBLE) / (p.n_ab * ic.n), 6) AS lift
      |FROM triples
      |JOIN pairs p USING (brand_a, brand_b)
      |JOIN item ic ON brand_c = ic.brand, tot
      |ORDER BY lift DESC, brand_a, brand_b, brand_c LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- A50
  /** Turning-point test for series randomness (Kendall's classic) on
    * daily revenue — the third leg of the randomness battery: A37's
    * runs test reads sign clustering around the median, A42/A47 read
    * monotone trend; turning points read local OSCILLATION (too few
    * turns ⇒ momentum/trend, too many ⇒ alternation/overcorrection).
    * A day is a turning point iff its two neighboring deltas have
    * strictly opposite signs (triples containing any tie are excluded,
    * the standard continuous-series convention, counted and published
    * so the exclusion is auditable); E[T] = 2(n−2)/3 and Var(T) =
    * (16n−29)/90 are exact rationals of the day count, z is ONE
    * fixed-order double expression with one sqrt. Entirely on the
    * bounded day table (the q_changepoint class) — exact integer
    * cents comparisons, no float in any count.
    */
  def qTurningPoints(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("decimal(38,0)"))
        .as("rc"))
    val w = Window.orderBy(col("day"))
    val trip = byDay
      .withColumn("prev", lag(col("rc"), 1).over(w))
      .withColumn("nxt", lead(col("rc"), 1).over(w))
      .filter(col("prev").isNotNull && col("nxt").isNotNull)
    val agg = trip.agg(count(lit(1)).as("n_triples"),
      sum(when((col("rc") > col("prev") && col("rc") > col("nxt")) ||
        (col("rc") < col("prev") && col("rc") < col("nxt")), 1L)
        .otherwise(0L)).as("n_turning"),
      sum(when(col("rc") === col("prev") || col("rc") === col("nxt"), 1L)
        .otherwise(0L)).as("n_tied_triples"))
    val nd = byDay.agg(count(lit(1)).as("n_days"))
    agg.crossJoin(broadcast(nd))
      .select(col("n_days"), col("n_triples"), col("n_tied_triples"),
        col("n_turning"),
        round(lit(2.0) * (col("n_days") - 2) / 3.0, 6).as("expected"),
        round((col("n_turning").cast("double")
          - lit(2.0) * (col("n_days") - 2) / 3.0) /
          sqrt((lit(16.0) * col("n_days") - 29.0) / 90.0), 6).as("z"))
      .withColumn("random_ok", abs(col("z")) <= 1.96)
  }

  val qTurningPointsSql: String =
    """WITH byday AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day,
      |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rc
      |  FROM orders GROUP BY 1),
      |trip AS (SELECT rc,
      |    lag(rc, 1) OVER (ORDER BY day) AS prev,
      |    lead(rc, 1) OVER (ORDER BY day) AS nxt
      |  FROM byday),
      |agg AS (SELECT count(*) AS n_triples,
      |    CAST(sum(CASE WHEN (rc > prev AND rc > nxt)
      |      OR (rc < prev AND rc < nxt) THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_turning,
      |    CAST(sum(CASE WHEN rc = prev OR rc = nxt THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_tied_triples
      |  FROM trip WHERE prev IS NOT NULL AND nxt IS NOT NULL),
      |nd AS (SELECT count(*) AS n_days FROM byday)
      |SELECT n_days, n_triples, n_tied_triples, n_turning,
      |  round(2.0 * (n_days - 2) / 3.0, 6) AS expected,
      |  round((CAST(n_turning AS DOUBLE) - 2.0 * (n_days - 2) / 3.0)
      |    / sqrt((16.0 * n_days - 29.0) / 90.0), 6) AS z,
      |  (abs(round((CAST(n_turning AS DOUBLE) - 2.0 * (n_days - 2) / 3.0)
      |    / sqrt((16.0 * n_days - 29.0) / 90.0), 6)) <= 1.96) AS random_ok
      |FROM agg, nd""".stripMargin

  // ---------------------------------------------------------------- A38
  /** Kendall tau-b rank correlation between daily order COUNT and
    * daily REVENUE — the monotone-association readout A16's Pearson
    * cannot be trusted for on heavy-tailed money series (one whale
    * day manufactures linear correlation; tau only asks whether
    * busier days are richer days, pair by pair). Bounded at the
    * q_changepoint class: the day table is |date domain| rows
    * (~2,400 for seven years — set by the calendar, not the corpus),
    * so the all-pairs comparison is days²/2 ≤ ~3M cells via ONE
    * broadcast non-equi self-join — never order-stream-squared.
    * Concordance is decided on EXACT arithmetic (integer count
    * deltas, decimal revenue deltas — no float enters a comparison),
    * tie counts feed the tau-b denominator √((n0−tx)(n0−ty)), and
    * the single double division rounds at the 6-dp publish boundary.
    * Degenerate all-tied margins yield null, not a divide error.
    */
  def qKendallTau(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val pairs = byDay.select(col("day").as("d1"), col("n").as("n1"),
        col("rev").as("r1"))
      .join(broadcast(byDay.select(col("day").as("d2"), col("n").as("n2"),
        col("rev").as("r2"))), col("d1") < col("d2"))
    val agg = pairs.agg(
      count(lit(1)).as("n0"),
      sum(when(col("n1") === col("n2"), 1L).otherwise(0L)).as("tx"),
      sum(when(col("r1") === col("r2"), 1L).otherwise(0L)).as("ty"),
      sum(when((col("n2") > col("n1") && col("r2") > col("r1")) ||
        (col("n2") < col("n1") && col("r2") < col("r1")), 1L)
        .otherwise(0L)).as("nc"),
      sum(when((col("n2") > col("n1") && col("r2") < col("r1")) ||
        (col("n2") < col("n1") && col("r2") > col("r1")), 1L)
        .otherwise(0L)).as("nd"))
    val nDays = byDay.agg(count(lit(1)).as("n_days"))
    agg.crossJoin(broadcast(nDays))
      .select(col("n_days"), col("n0").as("n_pairs"), col("nc"), col("nd"),
        when((col("n0") - col("tx")) * (col("n0") - col("ty")) <= 0,
          lit(null).cast("double"))
          .otherwise(round((col("nc") - col("nd")).cast("double") /
            sqrt((col("n0") - col("tx")).cast("double") *
              (col("n0") - col("ty")).cast("double")), 6)).as("tau_b"))
  }

  val qKendallTauSql: String =
    """WITH byday AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day,
      |    count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |pairs AS (SELECT a.n AS n1, a.rev AS r1, b.n AS n2, b.rev AS r2
      |  FROM byday a JOIN byday b ON a.day < b.day),
      |agg AS (SELECT count(*) AS n0,
      |    CAST(sum(CASE WHEN n1 = n2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |    CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
      |    CAST(sum(CASE WHEN (n2 > n1 AND r2 > r1) OR (n2 < n1 AND r2 < r1)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS conc,
      |    CAST(sum(CASE WHEN (n2 > n1 AND r2 < r1) OR (n2 < n1 AND r2 > r1)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS disc
      |  FROM pairs),
      |days AS (SELECT count(*) AS n_days FROM byday)
      |SELECT n_days, n0 AS n_pairs, conc AS nc, disc AS nd,
      |  CASE WHEN (n0 - tx) * (n0 - ty) <= 0 THEN NULL
      |    ELSE round(CAST(conc - disc AS DOUBLE) /
      |      sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)), 6)
      |  END AS tau_b
      |FROM agg, days""".stripMargin

  // ---------------------------------------------------------------- A42
  /** Mann–Kendall trend test on daily order volume — the
    * trend-vs-TIME question A38's tau (association between two
    * series) does not answer, and the parametric trap it avoids: an
    * OLS slope on heavy-tailed daily counts is driven by outlier
    * days, while S = Σ_{i<j} sgn(n_j − n_i) only asks "do later days
    * beat earlier days, pair by pair". Exact machinery end to end:
    * the day table is calendar-bounded (A38's class), the pair sweep
    * is ONE broadcast non-equi self-join, S and the tie groups are
    * integer aggregates, and Var(S) = (N(N−1)(2N+5) − Σt(t−1)(2t+5))
    * / 18 keeps an exact integer numerator; the z verdict applies the
    * textbook continuity correction (S∓1) and rounds at the 6-dp
    * publish boundary. 1 output row with the directional verdict.
    */
  // ---------------------------------------------------------------- A48
  /** Partial correlation — the confounder-controlled version of A16's
    * raw correlations: r(x,y | z) = (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)) answers "does quantity correlate with
    * revenue BEYOND what discount explains?" — the one-line causal
    * sanity check run before any regression. ENGINE-EXACT inputs:
    * all three variables lift to exact integers (quantity, price
    * cents, discount percent), the full 3-variable moment matrix is
    * ONE exact DECIMAL(38,0) aggregate, and every correlation /
    * the partial form is a FIXED-ORDER double expression over those
    * decimals (sqrt is IEEE-correctly-rounded, so identical inputs
    * give identical outputs — the F68 rule). Degenerate variance
    * publishes null, never a divide error. One corpus scan, 1 row.
    */
  def qPartialCorr(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = Tables.lineitem(spark, dir).select(
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"),
      round(col("l_discount") * 100).cast("long").as("z"))
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(d38))
    val mom = rows.agg(count(lit(1)).as("n"),
      dsum(col("x")).as("sx"), dsum(col("y")).as("sy"), dsum(col("z")).as("sz"),
      dsum(col("x") * col("x")).as("sxx"), dsum(col("y") * col("y")).as("syy"),
      dsum(col("z") * col("z")).as("szz"), dsum(col("x") * col("y")).as("sxy"),
      dsum(col("x") * col("z")).as("sxz"), dsum(col("y") * col("z")).as("syz"))
    def cv(sab: String, sa: String, sb: String) =
      (col("n") * col(sab) - col(sa) * col(sb)).cast("double")
    val (cxx, cyy, czz) =
      (cv("sxx", "sx", "sx"), cv("syy", "sy", "sy"), cv("szz", "sz", "sz"))
    val rxy = cv("sxy", "sx", "sy") / sqrt(cxx * cyy)
    val rxz = cv("sxz", "sx", "sz") / sqrt(cxx * czz)
    val ryz = cv("syz", "sy", "sz") / sqrt(cyy * czz)
    val part = (rxy - rxz * ryz) /
      sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    mom.select(col("n").as("n_rows"),
      when(cxx <= 0 || cyy <= 0, lit(null).cast("double"))
        .otherwise(round(rxy, 6)).as("r_qty_price"),
      when(cxx <= 0 || czz <= 0, lit(null).cast("double"))
        .otherwise(round(rxz, 6)).as("r_qty_disc"),
      when(cyy <= 0 || czz <= 0, lit(null).cast("double"))
        .otherwise(round(ryz, 6)).as("r_price_disc"),
      when(cxx <= 0 || cyy <= 0 || czz <= 0, lit(null).cast("double"))
        .otherwise(round(part, 6)).as("r_partial"))
      .withColumn("discount_explains",
        coalesce(abs(col("r_partial")) < abs(col("r_qty_price")) / 2,
          lit(false)))
  }

  val qPartialCorrSql: String = {
    def cv(sab: String, sa: String, sb: String) =
      s"CAST(n * $sab - $sa * $sb AS DOUBLE)"
    val rxy = s"(${cv("sxy", "sx", "sy")} / sqrt(${cv("sxx", "sx", "sx")} * ${cv("syy", "sy", "sy")}))"
    val rxz = s"(${cv("sxz", "sx", "sz")} / sqrt(${cv("sxx", "sx", "sx")} * ${cv("szz", "sz", "sz")}))"
    val ryz = s"(${cv("syz", "sy", "sz")} / sqrt(${cv("syy", "sy", "sy")} * ${cv("szz", "sz", "sz")}))"
    s"""WITH r0 AS (SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
      |    CAST(round(l_discount * 100) AS BIGINT) AS z
      |  FROM lineitem),
      |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(z AS HUGEINT)) AS sz,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(z AS HUGEINT) * z) AS szz, sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * z) AS sxz, sum(CAST(y AS HUGEINT) * z) AS syz
      |  FROM r0),
      |res AS (SELECT CAST(n AS BIGINT) AS n_rows,
      |    CASE WHEN ${cv("sxx", "sx", "sx")} <= 0 OR ${cv("syy", "sy", "sy")} <= 0
      |      THEN CAST(NULL AS DOUBLE) ELSE round($rxy, 6) END AS r_qty_price,
      |    CASE WHEN ${cv("sxx", "sx", "sx")} <= 0 OR ${cv("szz", "sz", "sz")} <= 0
      |      THEN CAST(NULL AS DOUBLE) ELSE round($rxz, 6) END AS r_qty_disc,
      |    CASE WHEN ${cv("syy", "sy", "sy")} <= 0 OR ${cv("szz", "sz", "sz")} <= 0
      |      THEN CAST(NULL AS DOUBLE) ELSE round($ryz, 6) END AS r_price_disc,
      |    CASE WHEN ${cv("sxx", "sx", "sx")} <= 0 OR ${cv("syy", "sy", "sy")} <= 0
      |        OR ${cv("szz", "sz", "sz")} <= 0 THEN CAST(NULL AS DOUBLE)
      |      ELSE round(($rxy - $rxz * $ryz)
      |        / sqrt((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz)), 6) END
      |      AS r_partial
      |  FROM mom)
      |SELECT *, coalesce(abs(r_partial) < abs(r_qty_price) / 2, false)
      |    AS discount_explains
      |FROM res""".stripMargin
  }

  // ---------------------------------------------------------------- A47
  /** Seasonal Mann–Kendall (Hirsch & Slack 1984) — the trend test a
    * seasonal series actually needs: A42's plain MK on daily counts
    * confounds trend with seasonality (a strong annual cycle reads as
    * "trend" or masks one); the seasonal form runs MK WITHIN each
    * calendar month across years and sums the per-season S and Var(S)
    * — seasonal comparisons never cross seasons, so the cycle cancels
    * exactly. All-integer device (the A42 machinery per season):
    * per-season S_g from sign comparisons of yearly order counts,
    * Var_g from the tie-corrected closed form, Σ over 12 bounded
    * seasons, ONE division for z (continuity-corrected). Emits the
    * 12 per-season rows PLUS a `__total__` row from the SAME
    * aggregates (the K31 union device — breakdown and headline can
    * never drift). Series-table-bounded after one corpus aggregate.
    */
  def qSeasonalMk(spark: SparkSession, dir: String): DataFrame = {
    // ≤ (years × 12) rows, three consumers (both pair sides + ties):
    // cached so the corpus aggregates once
    val byYm = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n"))
      .cache()
    val pairs = byYm.select(col("mo"), col("yr").as("y1"), col("n").as("n1"))
      .join(broadcast(byYm.select(col("mo"), col("yr").as("y2"),
        col("n").as("n2"))), Seq("mo"))
      .filter(col("y1") < col("y2"))
    val sG = pairs.groupBy(col("mo")).agg(
      (sum(when(col("n2") > col("n1"), 1L).otherwise(0L)) -
        sum(when(col("n2") < col("n1"), 1L).otherwise(0L))).as("s_g"))
    val tiesG = byYm.groupBy(col("mo"), col("n"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("mo"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .cast("long").as("tsum"),
        sum(col("t")).cast("long").as("n_years"))
    val perSeason = sG.join(tiesG, Seq("mo"))
      .withColumn("var18",
        col("n_years") * (col("n_years") - 1) * (lit(2) * col("n_years") + 5)
          - col("tsum"))
    val tot = perSeason.agg(sum(col("s_g")).as("s_g"),
      sum(col("var18")).as("var18"), sum(col("n_years")).as("n_years"))
      .withColumn("mo", lit(-1L))
    val all = perSeason.select(col("mo"), col("s_g"), col("var18"),
        col("n_years"))
      .unionAll(tot.select(col("mo"), col("s_g"), col("var18"),
        col("n_years")))
    val varS = col("var18").cast("double") / 18
    val z0 = col("s_g").cast("double") - signum(col("s_g"))
    all.select(
        when(col("mo") === -1, "__total__")
          .otherwise(lpad(col("mo").cast("string"), 2, "0")).as("season"),
        col("n_years"), col("s_g").as("s_stat"),
        round(varS, 6).as("var_s"),
        when(varS <= 0, lit(null).cast("double"))
          .otherwise(round(z0 / sqrt(varS), 6)).as("z"))
      .withColumn("trend",
        when(col("z").isNull || abs(col("z")) <= 1.96, "none")
          .when(col("z") > 0, "increasing").otherwise("decreasing"))
  }

  val qSeasonalMkSql: String =
    """WITH byym AS (SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mo,
      |    count(*) AS n
      |  FROM orders GROUP BY 1, 2),
      |sg AS (SELECT a.mo,
      |    CAST(sum(CASE WHEN b.n > a.n THEN 1 ELSE 0 END)
      |      - sum(CASE WHEN b.n < a.n THEN 1 ELSE 0 END) AS BIGINT) AS s_g
      |  FROM byym a JOIN byym b ON a.mo = b.mo AND a.yr < b.yr
      |  GROUP BY 1),
      |tg AS (SELECT mo,
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum,
      |    CAST(sum(t) AS BIGINT) AS n_years
      |  FROM (SELECT mo, count(*) AS t FROM byym GROUP BY mo, n)
      |  GROUP BY 1),
      |per AS (SELECT sg.mo, sg.s_g, tg.n_years,
      |    tg.n_years * (tg.n_years - 1) * (2 * tg.n_years + 5) - tg.tsum
      |      AS var18
      |  FROM sg JOIN tg USING (mo)),
      |allr AS (SELECT mo, s_g, var18, n_years FROM per
      |  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(sum(s_g) AS BIGINT),
      |    CAST(sum(var18) AS BIGINT), CAST(sum(n_years) AS BIGINT) FROM per),
      |zz AS (SELECT mo, n_years, s_g,
      |    round(CAST(var18 AS DOUBLE) / 18, 6) AS var_s,
      |    CASE WHEN CAST(var18 AS DOUBLE) / 18 <= 0 THEN CAST(NULL AS DOUBLE)
      |      ELSE round((CAST(s_g AS DOUBLE) - sign(s_g))
      |        / sqrt(CAST(var18 AS DOUBLE) / 18), 6) END AS z
      |  FROM allr)
      |SELECT CASE WHEN mo = -1 THEN '__total__'
      |    ELSE lpad(CAST(mo AS VARCHAR), 2, '0') END AS season,
      |  n_years, s_g AS s_stat, var_s, z,
      |  CASE WHEN z IS NULL OR abs(z) <= 1.96 THEN 'none'
      |    WHEN z > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
      |FROM zz""".stripMargin

  def qMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val pairs = byDay.select(col("day").as("d1"), col("n").as("n1"))
      .join(broadcast(byDay.select(col("day").as("d2"), col("n").as("n2"))),
        col("d1") < col("d2"))
    val s = pairs.agg(
      (sum(when(col("n2") > col("n1"), 1L).otherwise(0L)) -
        sum(when(col("n2") < col("n1"), 1L).otherwise(0L))).as("s_stat"))
    val ties = byDay.groupBy(col("n")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .cast("long").as("tsum"),
        sum(col("t")).cast("long").as("n_days"))
    val z0 = col("s_stat").cast("double") - signum(col("s_stat"))
    val varS = (col("n_days") * (col("n_days") - 1) *
      (lit(2) * col("n_days") + 5) - col("tsum")).cast("double") / 18
    s.crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"),
        round(varS, 6).as("var_s"),
        when(varS <= 0, lit(null).cast("double"))
          .otherwise(round(z0 / sqrt(varS), 6)).as("z"))
      .withColumn("trend",
        when(col("z").isNull || abs(col("z")) <= 1.96, "none")
          .when(col("z") > 0, "increasing").otherwise("decreasing"))
  }

  val qMannKendallSql: String =
    """WITH byday AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |s AS (SELECT
      |    CAST(sum(CASE WHEN b.n > a.n THEN 1 ELSE 0 END)
      |      - sum(CASE WHEN b.n < a.n THEN 1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM byday a JOIN byday b ON a.day < b.day),
      |ties AS (SELECT
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum,
      |    CAST(sum(t) AS BIGINT) AS n_days
      |  FROM (SELECT count(*) AS t FROM byday GROUP BY n)),
      |v AS (SELECT n_days, s_stat,
      |    CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tsum AS DOUBLE) / 18
      |      AS vs
      |  FROM s, ties)
      |SELECT n_days, s_stat, round(vs, 6) AS var_s,
      |  CASE WHEN vs <= 0 THEN NULL
      |    ELSE round((CAST(s_stat AS DOUBLE) - sign(s_stat)) / sqrt(vs), 6)
      |  END AS z,
      |  CASE WHEN vs <= 0 OR abs(round((CAST(s_stat AS DOUBLE) - sign(s_stat))
      |      / sqrt(vs), 6)) <= 1.96 THEN 'none'
      |    WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
      |FROM v""".stripMargin

  // ---------------------------------------------------------------- A39
  /** Spearman rank correlation between customer account balance and
    * order size — the monotone-association companion to A16's
    * Pearson on the entity level A38's day grid can't see ("do
    * richer customers place bigger orders" is a rank question; one
    * whale order answers the Pearson version by itself). The
    * corpus-scale trap: ranking needs a GLOBAL sort — an ungrouped
    * rank window over the order stream is the single-partition plan
    * the PlanSpec guard rejects. Solution is the q_auc quantize
    * device extended to ranks: both variables bucket to
    * domain-bounded $100 bins (balance ≤ 110 bins, totalprice
    * ≤ ~6,000), the MIDRANK of every member of a bin is a closed
    * form over the marginal histogram (2·r = 2·cum_before + cnt + 1,
    * an exact INTEGER on the doubled scale — ties get their textbook
    * average rank with no fractional arithmetic), and Spearman's ρ
    * is Pearson over the joint (xbin, ybin) cell table weighted by
    * cell count — ≤ 660k bounded cells, never orders². All five
    * moment sums accumulate exactly in DECIMAL(38,0) (the ×2 rank
    * scale cancels in ρ); the doubles meet only in the one final
    * identical expression, rounded at 6 dp. Resolution: ties within
    * a $100 bin are true ties by construction — the documented
    * quantization trade, same as L14/L16.
    */
  def qSpearman(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(floor(col("c_acctbal") / 100).cast("long").as("xb"),
        floor(col("o_totalprice") / 100).cast("long").as("yb"))
    val cells = joined.groupBy(col("xb"), col("yb"))
      .agg(count(lit(1)).as("w"))
    val mx = cells.groupBy(col("xb")).agg(sum(col("w")).cast("long").as("cx"))
    val my = cells.groupBy(col("yb")).agg(sum(col("w")).cast("long").as("cy"))
    val wx = Window.orderBy(col("xb")).rowsBetween(Window.unboundedPreceding, -1)
    val wy = Window.orderBy(col("yb")).rowsBetween(Window.unboundedPreceding, -1)
    val rx = mx.withColumn("rx2",
      lit(2) * coalesce(sum(col("cx")).over(wx), lit(0L)) + col("cx") + 1)
    val ry = my.withColumn("ry2",
      lit(2) * coalesce(sum(col("cy")).over(wy), lit(0L)) + col("cy") + 1)
    val moments = cells
      .join(broadcast(rx.select(col("xb"), col("rx2"))), "xb")
      .join(broadcast(ry.select(col("yb"), col("ry2"))), "yb")
      .agg(sum(col("w")).cast("decimal(38,0)").as("n"),
        sum(col("w").cast("decimal(38,0)") * col("rx2")).as("sx"),
        sum(col("w").cast("decimal(38,0)") * col("ry2")).as("sy"),
        sum(col("w").cast("decimal(38,0)") * col("rx2") * col("rx2")).as("sxx"),
        sum(col("w").cast("decimal(38,0)") * col("ry2") * col("ry2")).as("syy"),
        sum(col("w").cast("decimal(38,0)") * col("rx2") * col("ry2")).as("sxy"))
    val nD = col("n").cast("double")
    val den = (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")) *
      (nD * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double"))
    moments.select(col("n").cast("long").as("n_orders"),
      when(den <= 0, lit(null).cast("double"))
        .otherwise(round((nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          sqrt(den), 6)).as("rho_spearman"))
  }

  val qSpearmanSql: String =
    """WITH joined AS (SELECT
      |    CAST(floor(c_acctbal / 100) AS BIGINT) AS xb,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS yb
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT xb, yb, count(*) AS w FROM joined GROUP BY 1, 2),
      |mx AS (SELECT xb, CAST(sum(w) AS BIGINT) AS cx FROM cells GROUP BY 1),
      |my AS (SELECT yb, CAST(sum(w) AS BIGINT) AS cy FROM cells GROUP BY 1),
      |rx AS (SELECT xb, 2 * coalesce(sum(cx) OVER (ORDER BY xb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cx + 1 AS rx2
      |  FROM mx),
      |ry AS (SELECT yb, 2 * coalesce(sum(cy) OVER (ORDER BY yb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cy + 1 AS ry2
      |  FROM my),
      |mom AS (SELECT CAST(sum(w) AS HUGEINT) AS n,
      |    sum(CAST(w AS HUGEINT) * rx2) AS sx,
      |    sum(CAST(w AS HUGEINT) * ry2) AS sy,
      |    sum(CAST(w AS HUGEINT) * rx2 * rx2) AS sxx,
      |    sum(CAST(w AS HUGEINT) * ry2 * ry2) AS syy,
      |    sum(CAST(w AS HUGEINT) * rx2 * ry2) AS sxy
      |  FROM cells JOIN rx USING (xb) JOIN ry USING (yb)),
      |calc AS (SELECT CAST(n AS BIGINT) AS n_orders,
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den,
      |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
      |  FROM mom)
      |SELECT n_orders, CASE WHEN den <= 0 THEN NULL
      |  ELSE round(num / sqrt(den), 6) END AS rho_spearman
      |FROM calc""".stripMargin

  // ---------------------------------------------------------------- A41
  /** Theil T inequality index of customer revenue, decomposed
    * between/within nations — the inequality readout L8's Gini can't
    * decompose (Gini's group terms overlap; Theil is ADDITIVE:
    * T = T_between + Σ_g share_g·T_g exactly, so "how much of revenue
    * concentration is geography vs within-market whales" is one
    * subtraction). Per-customer revenue sums are exact DECIMAL; each
    * ln term is the identical double expression 10-dp-rounded before
    * its weighted sum, and the per-nation aggregates live on a
    * |nations|-bounded frame. Output: one row per nation with its
    * customer count, revenue share, within-nation Theil, and its two
    * contributions, plus the corpus totals replicated (the M7
    * fit-columns-broadcast-back device) so the additivity
    * T = between + within is visible in every row. Zero-revenue
    * customers cannot occur (only purchasers enter via the join).
    */
  def qTheilIndex(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      .join(Tables.customer(spark, dir)
        .join(Tables.nation(spark, dir),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")),
        col("o_custkey") === col("c_custkey"))
    val tot = cust.agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val withTot = cust.crossJoin(broadcast(tot))
      .withColumn("r", col("x").cast("double") * col("n") /
        col("s").cast("double"))
    val perNation = withTot.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("x")).as("sg"),
        round(sum(round(col("r") * log(col("r")), 10)), 6).as("tsum"),
        max(col("n")).as("n"), max(col("s")).as("s"))
      .withColumn("share",
        round(col("sg").cast("double") / col("s").cast("double"), 10))
      .withColumn("mean_ratio",
        round((col("sg").cast("double") / col("n_cust")) /
          (col("s").cast("double") / col("n")), 10))
      .withColumn("t_within_g", round(col("share") *
        (col("tsum") / col("n") / col("share") -
          round(log(col("mean_ratio")), 10)), 6))
      .withColumn("t_between_g",
        round(col("share") * round(log(col("mean_ratio")), 10), 6))
    val totals = perNation.agg(
      round(sum(col("t_within_g")), 6).as("theil_within"),
      round(sum(col("t_between_g")), 6).as("theil_between"))
    perNation.crossJoin(broadcast(totals))
      .select(col("n_name").as("nation"), col("n_cust"),
        round(col("share"), 6).as("rev_share"),
        col("t_between_g"), col("t_within_g"),
        col("theil_between"), col("theil_within"),
        round(col("theil_between") + col("theil_within"), 6)
          .as("theil_total"))
  }

  val qTheilIndexSql: String =
    """WITH cust AS (SELECT o_custkey,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      |  FROM orders GROUP BY 1),
      |cn AS (SELECT cust.o_custkey, cust.x, n.n_name
      |  FROM cust JOIN customer c ON cust.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
      |tot AS (SELECT sum(x) AS s, count(*) AS n FROM cn),
      |wt AS (SELECT n_name, CAST(x AS DOUBLE) * n / CAST(s AS DOUBLE) AS r,
      |    x, n, s FROM cn, tot),
      |pn AS (SELECT n_name, count(*) AS n_cust, sum(x) AS sg,
      |    round(sum(round(r * ln(r), 10)), 6) AS tsum,
      |    max(n) AS n, max(s) AS s
      |  FROM wt GROUP BY 1),
      |calc AS (SELECT n_name, n_cust, tsum, n,
      |    round(CAST(sg AS DOUBLE) / CAST(s AS DOUBLE), 10) AS share,
      |    round((CAST(sg AS DOUBLE) / n_cust)
      |      / (CAST(s AS DOUBLE) / n), 10) AS mean_ratio
      |  FROM pn),
      |contrib AS (SELECT n_name, n_cust, share,
      |    round(share * (tsum / n / share - round(ln(mean_ratio), 10)), 6)
      |      AS t_within_g,
      |    round(share * round(ln(mean_ratio), 10), 6) AS t_between_g
      |  FROM calc),
      |totals AS (SELECT round(sum(t_within_g), 6) AS theil_within,
      |    round(sum(t_between_g), 6) AS theil_between
      |  FROM contrib)
      |SELECT n_name AS nation, n_cust, round(share, 6) AS rev_share,
      |  t_between_g, t_within_g, theil_between, theil_within,
      |  round(theil_between + theil_within, 6) AS theil_total
      |FROM contrib, totals""".stripMargin

  // ---------------------------------------------------------------- A40
  /** 10%-trimmed mean of order totals per market segment — the robust
    * location estimate that sits between the mean (0% breakdown — one
    * whale order moves it) and the median (discards all magnitude
    * information); the standard readout for spend-per-segment
    * dashboards on heavy-tailed money data. Bounded construction via
    * the L14/L19 quantized-histogram device: totals bin to hundred-
    * dollar cells, the trim boundaries are EXACT integer ranks
    * (lo = n DIV 10, hi = n − lo), and each bin contributes
    * take/c_b of its EXACT decimal-cents sum where take =
    * max(0, min(cum, hi) − max(cum_before, lo)) — boundary bins enter
    * fractionally at bin resolution (the documented L17 trade).
    * Engine parity without float-sum ordering: per-bin contributions
    * round to WHOLE CENTS (integers < 2^53 — exact in any summation
    * order), so the trimmed sum is a LONG sum; the only doubles are
    * the two published 6-dp means. Cumulative window partitions BY
    * SEGMENT over the bounded bin histogram.
    */
  def qTrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val hist = base.groupBy(col("seg"), col("bin"))
      .agg(count(lit(1)).as("c_b"),
        sum(col("cents").cast("decimal(38,0)")).as("s_b"))
    val w = Window.partitionBy(col("seg")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cumb",
      coalesce(sum(col("c_b")).over(w), lit(0L)))
    val tot = hist.groupBy(col("seg"))
      .agg(sum(col("c_b")).cast("long").as("n_g"), sum(col("s_b")).as("s_g"))
    val j = cum.join(tot, "seg")
      .withColumn("lo", expr("n_g DIV 10"))
      .withColumn("hi", col("n_g") - col("lo"))
      .withColumn("take", greatest(lit(0L),
        least(col("cumb") + col("c_b"), col("hi")) -
          greatest(col("cumb"), col("lo"))))
      .withColumn("contrib",
        round(col("s_b").cast("double") * col("take") / col("c_b"), 0)
          .cast("long"))
    j.groupBy(col("seg"))
      .agg(max(col("n_g")).as("n_g"),
        sum(col("contrib")).cast("long").as("tc"),
        max(col("s_g").cast("double")).as("sg"),
        max(col("lo")).as("lo"))
      .select(col("seg"), col("n_g"),
        round(col("sg") / (col("n_g") * 100), 6).as("mean_spend"),
        round(col("tc").cast("double") /
          ((col("n_g") - col("lo") * 2) * 100), 6).as("trimmed_mean"),
        (col("n_g") - col("lo") * 2).as("n_kept"))
  }

  val qTrimmedMeanSql: String =
    """WITH base AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |hist AS (SELECT seg, bin, count(*) AS c_b,
      |    sum(CAST(cents AS HUGEINT)) AS s_b
      |  FROM base GROUP BY 1, 2),
      |cum AS (SELECT seg, bin, c_b, s_b,
      |    coalesce(sum(c_b) OVER (PARTITION BY seg ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM hist),
      |tot AS (SELECT seg, CAST(sum(c_b) AS BIGINT) AS n_g,
      |    sum(s_b) AS s_g
      |  FROM hist GROUP BY 1),
      |j AS (SELECT cum.seg, c_b, s_b, cumb, n_g, s_g,
      |    n_g // 10 AS lo, n_g - n_g // 10 AS hi
      |  FROM cum JOIN tot ON cum.seg = tot.seg),
      |t AS (SELECT seg, n_g, s_g, lo,
      |    CAST(round(CAST(s_b AS DOUBLE)
      |      * greatest(0, least(cumb + c_b, hi) - greatest(cumb, lo))
      |      / c_b, 0) AS BIGINT) AS contrib
      |  FROM j)
      |SELECT seg, max(n_g) AS n_g,
      |  round(max(CAST(s_g AS DOUBLE)) / (max(n_g) * 100), 6) AS mean_spend,
      |  round(CAST(sum(contrib) AS DOUBLE)
      |    / ((max(n_g) - max(lo) * 2) * 100), 6) AS trimmed_mean,
      |  CAST(max(n_g) - max(lo) * 2 AS BIGINT) AS n_kept
      |FROM t GROUP BY seg""".stripMargin

  // ---------------------------------------------------------------- A43
  /** Lead–lag cross-correlation of the two daily business series —
    * does order VOLUME lead revenue (pipeline fill), lag it
    * (replenishment), or move with it? Pearson corr(revenue_t,
    * n_orders_{t+ℓ}) for every lag ℓ ∈ −7..+7, computed entirely on
    * the bounded DAY table (one corpus-scale keyed aggregate builds
    * it; the lag sweep is a broadcast 15-row grid joined against the
    * day table's self-shift — never a re-scan). Revenue folds to
    * exact integer cents and counts are exact, so every moment sum
    * (Σx, Σy, Σxy, Σx², Σy²) is engine-exact DECIMAL; the one
    * correlation expression runs on identical doubles and rounds at
    * 6 dp. Pairs exist only where BOTH days are observed (the
    * correlation is over the overlapping grid — absent calendar days
    * shorten n_days rather than fabricating zeros). The peak flag
    * marks the lag(s) achieving the maximum rounded correlation.
    */
  def qCrossCorr(spark: SparkSession, dir: String): DataFrame = {
    val day = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")
          .cast("decimal(38,0)")).as("rev"),
        count(lit(1)).as("cnt"))
    val grid = spark.range(-7L, 8L).select(col("id").as("lag"))
    val pairs = day.select(col("day"), col("rev"))
      .crossJoin(broadcast(grid))
      .join(day.select(col("day").as("dj"), col("cnt")),
        col("day") + col("lag") === col("dj"))
    val mom = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_days"),
      sum(col("rev")).as("sx"),
      sum(col("cnt").cast("decimal(38,0)")).as("sy"),
      sum(col("rev") * col("cnt")).as("sxy"),
      sum(col("rev") * col("rev")).as("sxx"),
      sum((col("cnt") * col("cnt")).cast("decimal(38,0)")).as("syy"))
    val corr = mom.select(col("lag"), col("n_days"),
      round(
        (col("sxy").cast("double") / col("n_days")
          - col("sx").cast("double") * col("sy").cast("double")
            / col("n_days") / col("n_days"))
        / sqrt(
          (col("sxx").cast("double") / col("n_days")
            - col("sx").cast("double") * col("sx").cast("double")
              / col("n_days") / col("n_days"))
          * (col("syy").cast("double") / col("n_days")
            - col("sy").cast("double") * col("sy").cast("double")
              / col("n_days") / col("n_days"))), 6).as("xcorr"))
    val mx = corr.agg(max(col("xcorr")).as("mx"))
    corr.crossJoin(broadcast(mx))
      .select(col("lag"), col("n_days"), col("xcorr"),
        (col("xcorr") === col("mx")).as("peak"))
  }

  val qCrossCorrSql: String =
    """WITH day AS (SELECT date_diff('day', DATE '1970-01-01', o_orderdate) AS day,
      |    sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)) AS rev,
      |    count(*) AS cnt
      |  FROM orders GROUP BY 1),
      |grid AS (SELECT unnest(generate_series(-7, 7)) AS lag),
      |pairs AS (SELECT g.lag, a.rev, b.cnt
      |  FROM day a, grid g JOIN day b ON a.day + g.lag = b.day),
      |mom AS (SELECT lag, count(*) AS n_days,
      |    sum(rev) AS sx, sum(CAST(cnt AS HUGEINT)) AS sy,
      |    sum(rev * cnt) AS sxy, sum(rev * rev) AS sxx,
      |    sum(CAST(cnt AS HUGEINT) * cnt) AS syy
      |  FROM pairs GROUP BY 1),
      |corr AS (SELECT lag, n_days,
      |    round((CAST(sxy AS DOUBLE) / n_days
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_days / n_days)
      |      / sqrt((CAST(sxx AS DOUBLE) / n_days
      |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_days / n_days)
      |        * (CAST(syy AS DOUBLE) / n_days
      |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_days / n_days)),
      |      6) AS xcorr
      |  FROM mom),
      |mx AS (SELECT max(xcorr) AS mx FROM corr)
      |SELECT lag, n_days, xcorr, (xcorr = mx) AS peak
      |FROM corr, mx""".stripMargin

  // ---------------------------------------------------------------- A46
  /** Tukey median polish (EDA, 1977) of the (market-segment × order-
    * year) mean-price grid — the robust two-way decomposition a
    * pricing analyst runs before trusting ANOVA: sweep row medians
    * then column medians, twice, leaving additive row/column effects
    * and a residual grid whose outliers mark genuinely unusual
    * (segment, year) cells rather than heavy-tail artifacts.
    * ENGINE-EXACT throughout because BOTH grid dimensions are odd
    * (7 years × 5 segments): every median is the literal middle
    * element — selected by row_number over the total order (value,
    * key), no interpolation, no halfUp — so cells, effects,
    * residuals, and the MAD outlier fence are all exact cents.
    * Invariant (spec-pinned): cell = row_effect + col_effect +
    * residual, exactly, on every cell; the grand effect lives in the
    * row effects (rows swept first — documented convention). All
    * polish work happens on the ≤ 35-row grid after one corpus
    * aggregate; windows over the bounded grid are the documented
    * PlanSpec exemption class.
    */
  def qMedianPolish(spark: SparkSession, dir: String): DataFrame = {
    def hu(aE: String, bE: String): String =
      s"""CASE WHEN ($aE) >= 0
         | THEN (2 * ($aE) + ($bE)) DIV (2 * ($bE))
         | ELSE -((2 * (-($aE)) + ($bE)) DIV (2 * ($bE))) END"""
        .stripMargin.replace("\n", " ")
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        year(col("o_orderdate").cast("date")).as("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("yr").between(1995, 2001))
      .groupBy(col("seg"), col("yr"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("s"))
      .select(col("seg"), col("yr"),
        expr(hu("cast(s as decimal(38,0))", "cast(n as decimal(38,0))"))
          .cast("long").as("cell"))
    // exact odd-count median: the middle element by (value, tiebreak)
    def med(part: String, tie: String, v: String, n: Int, out: String) = {
      val w = Window.partitionBy(col(part))
        .orderBy(col(v).asc, col(tie).asc)
      (df: DataFrame) => df
        .withColumn("rn", row_number().over(w))
        .withColumn(out,
          max(when(col("rn") === (n + 1) / 2, col(v))).over(
            Window.partitionBy(col(part))))
        .drop("rn")
    }
    val afterR1 = med("seg", "yr", "cell", 7, "rm")(cells)
      .withColumn("row_eff", col("rm"))
      .withColumn("r1", col("cell") - col("rm")).drop("rm")
    val afterC1 = med("yr", "seg", "r1", 5, "cm")(afterR1)
      .withColumn("col_eff", col("cm"))
      .withColumn("r2", col("r1") - col("cm")).drop("cm", "r1")
    val afterR2 = med("seg", "yr", "r2", 7, "rm2")(afterC1)
      .withColumn("row_eff", col("row_eff") + col("rm2"))
      .withColumn("r3", col("r2") - col("rm2")).drop("rm2", "r2")
    val afterC2 = med("yr", "seg", "r3", 5, "cm2")(afterR2)
      .withColumn("col_eff", col("col_eff") + col("cm2"))
      .withColumn("residual", col("r3") - col("cm2")).drop("cm2", "r3")
    // MAD fence over the 35 residuals: |res| median is element 18 of
    // the |res| order (odd count), outlier = |res| > 2·MAD
    val wAll = Window.partitionBy(lit(1))
      .orderBy(abs(col("residual")).asc, col("seg").asc, col("yr").asc)
    val fenced = afterC2
      .withColumn("rn", row_number().over(wAll))
      .withColumn("mad",
        max(when(col("rn") === 18, abs(col("residual"))))
          .over(Window.partitionBy(lit(1))))
      .drop("rn")
    fenced.select(col("seg"), col("yr"), col("cell").as("cell_cents"),
      col("row_eff").as("row_effect_cents"),
      col("col_eff").as("col_effect_cents"),
      col("residual").as("residual_cents"),
      (abs(col("residual")) > lit(2) * col("mad")).as("outlier"))
  }

  val qMedianPolishSql: String = {
    def hu(aE: String, bE: String): String =
      s"""CASE WHEN ($aE) >= 0
         | THEN (2 * ($aE) + ($bE)) // (2 * ($bE))
         | ELSE -((2 * (-($aE)) + ($bE)) // (2 * ($bE))) END"""
        .stripMargin.replace("\n", " ")
    s"""WITH cells AS (SELECT seg, yr,
      |    CAST(${hu("s", "n")} AS BIGINT) AS cell
      |  FROM (SELECT c_mktsegment AS seg,
      |      year(CAST(o_orderdate AS DATE)) AS yr,
      |      count(*) AS n,
      |      sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
      |        AS s
      |    FROM orders JOIN customer ON o_custkey = c_custkey
      |    WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1995 AND 2001
      |    GROUP BY 1, 2)),
      |r1m AS (SELECT *, max(CASE WHEN rn = 4 THEN cell END)
      |    OVER (PARTITION BY seg) AS rm
      |  FROM (SELECT *, row_number() OVER (PARTITION BY seg
      |    ORDER BY cell ASC, yr ASC) AS rn FROM cells)),
      |r1 AS (SELECT seg, yr, cell, rm AS row_eff, cell - rm AS r1
      |  FROM r1m),
      |c1m AS (SELECT *, max(CASE WHEN rn = 3 THEN r1 END)
      |    OVER (PARTITION BY yr) AS cm
      |  FROM (SELECT *, row_number() OVER (PARTITION BY yr
      |    ORDER BY r1 ASC, seg ASC) AS rn FROM r1)),
      |c1 AS (SELECT seg, yr, cell, row_eff, cm AS col_eff, r1 - cm AS r2
      |  FROM c1m),
      |r2m AS (SELECT *, max(CASE WHEN rn = 4 THEN r2 END)
      |    OVER (PARTITION BY seg) AS rm2
      |  FROM (SELECT *, row_number() OVER (PARTITION BY seg
      |    ORDER BY r2 ASC, yr ASC) AS rn FROM c1)),
      |r2 AS (SELECT seg, yr, cell, row_eff + rm2 AS row_eff, col_eff,
      |    r2 - rm2 AS r3
      |  FROM r2m),
      |c2m AS (SELECT *, max(CASE WHEN rn = 3 THEN r3 END)
      |    OVER (PARTITION BY yr) AS cm2
      |  FROM (SELECT *, row_number() OVER (PARTITION BY yr
      |    ORDER BY r3 ASC, seg ASC) AS rn FROM r2)),
      |c2 AS (SELECT seg, yr, cell, row_eff, col_eff + cm2 AS col_eff,
      |    r3 - cm2 AS residual
      |  FROM c2m),
      |fen AS (SELECT *, max(CASE WHEN rn = 18 THEN abs(residual) END)
      |    OVER () AS mad
      |  FROM (SELECT *, row_number() OVER (
      |    ORDER BY abs(residual) ASC, seg ASC, yr ASC) AS rn FROM c2))
      |SELECT seg, yr, cell AS cell_cents, row_eff AS row_effect_cents,
      |  col_eff AS col_effect_cents, residual AS residual_cents,
      |  abs(residual) > 2 * mad AS outlier
      |FROM fen""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_median_polish" -> (qMedianPolish _),
    "q_cross_corr" -> (qCrossCorr _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_theil_index" -> (qTheilIndex _),
    "q_spearman" -> (qSpearman _),
    "q_kendall_tau" -> (qKendallTau _),
    "q_mann_kendall" -> (qMannKendall _),
    "q_seasonal_mk" -> (qSeasonalMk _),
    "q_partial_corr" -> (qPartialCorr _),
    "q_assoc_rules" -> (qAssocRules _),
    "q_freq_itemsets" -> (qFreqItemsets _),
    "q_turning_points" -> (qTurningPoints _),
    "q_rfm_segments" -> (qRfmSegments _),
    "q_blame_supplier" -> (qBlameSupplier _),
    "q_full_outer" -> (qFullOuter _),
    "q_geomean" -> (qGeomean _),
    "q_monthly_revenue" -> (qMonthlyRevenue _),
    "q_first_last" -> (qFirstLast _),
    "q_range_frame" -> (qRangeFrame _),
    "q_edit_distance" -> (qEditDistance _),
    "q_record_linkage" -> (qRecordLinkage _),
    "q_skyline" -> (qSkyline _),
    "q_mom_bridge" -> (qMomBridge _),
    "q_runs_test" -> (qRunsTest _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_window_suite" -> (qWindowSuite _),
    "q_set_ops" -> (qSetOps _),
    "q_crosstab_residuals" -> (qCrosstabResiduals _),
    "q_listagg" -> (qListagg _),
    "q_above_avg_orders" -> (qAboveAvgOrders _),
    "q_array_hof" -> (qArrayHof _),
    "q_ewma" -> (qEwma _))

  def oracle: Map[String, String] = Map(
    "q_median_polish" -> qMedianPolishSql,
    "q_trimmed_mean" -> qTrimmedMeanSql,
    "q_theil_index" -> qTheilIndexSql,
    "q_spearman" -> qSpearmanSql,
    "q_kendall_tau" -> qKendallTauSql,
    "q_mann_kendall" -> qMannKendallSql,
    "q_seasonal_mk" -> qSeasonalMkSql,
    "q_partial_corr" -> qPartialCorrSql,
    "q_cross_corr" -> qCrossCorrSql,
    "q_assoc_rules" -> qAssocRulesSql,
    "q_freq_itemsets" -> qFreqItemsetsSql,
    "q_turning_points" -> qTurningPointsSql,
    "q_rfm_segments" -> qRfmSegmentsSql,
    "q_blame_supplier" -> qBlameSupplierSql,
    "q_full_outer" -> qFullOuterSql,
    "q_geomean" -> qGeomeanSql,
    "q_monthly_revenue" -> qMonthlyRevenueSql,
    "q_first_last" -> qFirstLastSql,
    "q_range_frame" -> qRangeFrameSql,
    "q_edit_distance" -> qEditDistanceSql,
    "q_record_linkage" -> qRecordLinkageSql,
    "q_skyline" -> qSkylineSql,
    "q_mom_bridge" -> qMomBridgeSql,
    "q_runs_test" -> qRunsTestSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_window_suite" -> qWindowSuiteSql,
    "q_set_ops" -> qSetOpsSql,
    "q_crosstab_residuals" -> qCrosstabResidualsSql,
    "q_listagg" -> qListaggSql,
    "q_above_avg_orders" -> qAboveAvgOrdersSql,
    "q_array_hof" -> qArrayHofSql,
    "q_ewma" -> qEwmaSql)
}
