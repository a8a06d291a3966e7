package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality expectation checks (SURVEY.md §2 block L) — the
  * declarative validation suite (deequ/dbt-test style) a pipeline runs
  * against every ingested snapshot before queries are allowed to trust
  * it: range constraints, key uniqueness, referential integrity,
  * null/emptiness, and derived-column consistency, emitted as a
  * one-row-per-check report with violation counts and pass verdicts.
  *
  * Scale shape: each base table is scanned EXACTLY ONCE — all checks
  * against a table fuse into a single aggregate (violation counters
  * are conditional sums, so they ride one pass with map-side partial
  * aggregation); the one join-backed check (orders→customer
  * referential integrity) is a left-anti join that shuffles only the
  * two key columns. The per-table one-row aggregates are then
  * broadcast-crossed into a single row and unpivoted with `stack` —
  * the whole report is ONE plan, not a union of per-check scans.
  */
object Validation {

  private def viol(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  def qDataValidation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_li"),
      viol(col("l_quantity") < 1 || col("l_quantity") > 50).as("v_qty"),
      viol(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"))
    val ord = Tables.orders(spark, dir).agg(
      count(lit(1)).as("n_ord"),
      viol(!(col("o_totalprice") > 0)).as("v_price"))
    val fk = Tables.orders(spark, dir).select(col("o_custkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_fk"))
    val cust = Tables.customer(spark, dir).agg(
      count(lit(1)).as("n_cust"),
      (count(lit(1)) - countDistinct(col("c_custkey"))).as("v_uniq"))
    val doc = Tables.documents(spark, dir).agg(
      count(lit(1)).as("n_doc"),
      viol(col("text").isNull || length(trim(col("text"))) === 0).as("v_empty"),
      viol(col("n_chars") =!= length(col("text"))).as("v_nchars"))
    li.crossJoin(broadcast(ord)).crossJoin(broadcast(fk))
      .crossJoin(broadcast(cust)).crossJoin(broadcast(doc))
      .select(expr(
        """stack(7,
          |  'lineitem_quantity_range', 'lineitem', n_li, v_qty,
          |  'lineitem_discount_range', 'lineitem', n_li, v_disc,
          |  'orders_totalprice_positive', 'orders', n_ord, v_price,
          |  'orders_custkey_fk', 'orders', n_ord, v_fk,
          |  'customer_key_unique', 'customer', n_cust, v_uniq,
          |  'documents_text_nonempty', 'documents', n_doc, v_empty,
          |  'documents_nchars_consistent', 'documents', n_doc, v_nchars
          |) as (check_name, tbl, n_checked, n_violations)""".stripMargin))
      .withColumn("pass", col("n_violations") === 0)
  }

  val qDataValidationSql: String =
    """WITH li AS (SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
      |  FROM lineitem),
      |ord AS (SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) AS v_price
      |  FROM orders),
      |fk AS (SELECT count(*) AS v FROM orders
      |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
      |cust AS (SELECT count(*) AS n,
      |    count(*) - count(DISTINCT c_custkey) AS v_uniq FROM customer),
      |doc AS (SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
      |    CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_nchars
      |  FROM documents),
      |r AS (
      |  SELECT 'lineitem_quantity_range' AS check_name, 'lineitem' AS tbl, n AS n_checked, v_qty AS n_violations FROM li
      |  UNION ALL SELECT 'lineitem_discount_range', 'lineitem', n, v_disc FROM li
      |  UNION ALL SELECT 'orders_totalprice_positive', 'orders', n, v_price FROM ord
      |  UNION ALL SELECT 'orders_custkey_fk', 'orders', ord.n, fk.v FROM ord, fk
      |  UNION ALL SELECT 'customer_key_unique', 'customer', n, v_uniq FROM cust
      |  UNION ALL SELECT 'documents_text_nonempty', 'documents', n, v_empty FROM doc
      |  UNION ALL SELECT 'documents_nchars_consistent', 'documents', n, v_nchars FROM doc)
      |SELECT check_name, tbl, n_checked, n_violations, (n_violations = 0) AS pass FROM r""".stripMargin

  // ---------------------------------------------------------------- L3
  /** Two-proportion z-test over a deterministic A/B split: users are
    * assigned arms by md5(user_id) parity (the same engine-portable
    * hash-bucket device as the K2 train/test split), conversion = the
    * user emitted ≥ 1 purchase event. Reports per-arm populations,
    * conversions, rates, the pooled z statistic, and the |z| > 1.96
    * verdict — the experiment-readout primitive a product pipeline
    * runs daily. All counts are exact integers from one user-level
    * aggregate (map-side combined); only the rates/z round. One
    * shuffle on user_id, then a 2-row reduction.
    */
  def qAbTest(spark: SparkSession, dir: String): DataFrame = {
    val np = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
    val tot = np.agg(count(lit(1)).as("users"), sum(col("np")).as("total_np"))
    val perUser = np.crossJoin(broadcast(tot))
      // above-mean conversion, exact in integers: np > total/users
      .withColumn("converted",
        when(col("np") * col("users") > col("total_np"), 1L).otherwise(0L))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(broadcast(b))
      .withColumn("rate_a", round(col("conv_a") / col("n_a"), 6))
      .withColumn("rate_b", round(col("conv_b") / col("n_b"), 6))
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")))
      .withColumn("z",
        when(col("p_pool") === 0.0 || col("p_pool") === 1.0,
          lit(null).cast("double"))
        .otherwise(round(
          (col("conv_a") / col("n_a") - col("conv_b") / col("n_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)))
      .select(col("n_a"), col("conv_a"), col("rate_a"),
        col("n_b"), col("conv_b"), col("rate_b"), col("z"),
        coalesce(abs(col("z")) > 1.96, lit(false)).as("significant"))
  }

  // ---------------------------------------------------------------- L25
  /** CUPED variance reduction — the covariate-adjustment that halves
    * an experiment's runtime when a pre-period covariate is strong:
    * per-user PRE-period purchase spend x (first 15 observed days)
    * against POST-period spend y, θ = cov(x,y)/var(x) pooled over
    * both md5 arms, adjusted outcome y − θ(x − x̄). The key identity
    * that keeps it oracle-exact: arm means and variances of the
    * ADJUSTED outcome are pure algebra over the arms' EXACT DECIMAL
    * moment sums — mean_adj = ȳ_a − θ(x̄_a − x̄), var_adj = var(y) −
    * 2θ·cov(x,y) + θ²·var(x) — so no per-user double is ever summed
    * (the naive Σ(y−θx) would diverge on summation order). Publishes
    * the raw and CUPED z-statistics side by side with the achieved
    * variance-reduction ratio; deterministic arms make the null true
    * by construction, so the verdict audits the machinery (θ, the
    * reduction, unchanged significance), not a fabricated effect.
    * var(x) = 0 degenerates to θ = 0 (CUPED = raw), never a divide
    * error. One corpus-scale pass + bounded arm algebra; 1 row.
    */
  def qCuped(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("(ts DIV 1000000000) DIV 86400").cast("long").as("day"),
      when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
    val mind = ev.agg(min(col("day")).as("d0"))
    val pu = ev.crossJoin(broadcast(mind))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("d0") + 15, col("cents"))
          .otherwise(0L)).as("x"),
        sum(when(col("day") >= col("d0") + 15, col("cents"))
          .otherwise(0L)).as("y"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "treat").otherwise("ctrl"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val pooled = pu.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x") * col("y"))).as("sxy"),
      sum(dec(col("x") * col("x"))).as("sxx"))
    val arms = pu.groupBy(col("arm")).agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x") * col("y"))).as("sxy"),
      sum(dec(col("x") * col("x"))).as("sxx"),
      sum(dec(col("y") * col("y"))).as("syy"))
    def armCol(a: String, c: String) = max(when(col("arm") === a, col(c)))
    val wide = arms.agg(
      armCol("treat", "n").as("n_t"), armCol("ctrl", "n").as("n_c"),
      armCol("treat", "sx").as("sx_t"), armCol("ctrl", "sx").as("sx_c"),
      armCol("treat", "sy").as("sy_t"), armCol("ctrl", "sy").as("sy_c"),
      armCol("treat", "sxy").as("sxy_t"), armCol("ctrl", "sxy").as("sxy_c"),
      armCol("treat", "sxx").as("sxx_t"), armCol("ctrl", "sxx").as("sxx_c"),
      armCol("treat", "syy").as("syy_t"), armCol("ctrl", "syy").as("syy_c"))
    val j = wide.crossJoin(broadcast(pooled))
      .withColumn("xbar", col("sx").cast("double") / col("n"))
      .withColumn("vx", col("sxx").cast("double") / col("n")
        - (col("sx").cast("double") / col("n"))
          * (col("sx").cast("double") / col("n")))
      .withColumn("theta", when(col("vx") <= 0, lit(0.0))
        .otherwise(round(
          (col("sxy").cast("double") / col("n")
            - col("sx").cast("double") * col("sy").cast("double")
              / col("n") / col("n")) / col("vx"), 10)))
    def mAdj(a: String) =
      (col(s"sy_$a").cast("double") / col(s"n_$a")
        - col("theta") * (col(s"sx_$a").cast("double") / col(s"n_$a")
          - col("xbar")))
    def vRaw(a: String) =
      ((col(s"syy_$a").cast("double")
        - col(s"sy_$a").cast("double") * col(s"sy_$a").cast("double")
          / col(s"n_$a")) / (col(s"n_$a") - 1))
    def covA(a: String) =
      ((col(s"sxy_$a").cast("double")
        - col(s"sx_$a").cast("double") * col(s"sy_$a").cast("double")
          / col(s"n_$a")) / (col(s"n_$a") - 1))
    def vxA(a: String) =
      ((col(s"sxx_$a").cast("double")
        - col(s"sx_$a").cast("double") * col(s"sx_$a").cast("double")
          / col(s"n_$a")) / (col(s"n_$a") - 1))
    def vAdj(a: String) =
      (vRaw(a) - lit(2.0) * col("theta") * covA(a)
        + col("theta") * col("theta") * vxA(a))
    val out = j
      .withColumn("diff_raw",
        round((col("sy_t").cast("double") / col("n_t")
          - col("sy_c").cast("double") / col("n_c")) / 100.0, 6))
      .withColumn("se2_raw", vRaw("t") / col("n_t") + vRaw("c") / col("n_c"))
      .withColumn("se2_adj", vAdj("t") / col("n_t") + vAdj("c") / col("n_c"))
      .withColumn("diff_cuped", round((mAdj("t") - mAdj("c")) / 100.0, 6))
      .withColumn("z_raw", when(col("se2_raw") <= 0, lit(null).cast("double"))
        .otherwise(round((col("sy_t").cast("double") / col("n_t")
          - col("sy_c").cast("double") / col("n_c"))
          / sqrt(col("se2_raw")), 6)))
      .withColumn("z_cuped", when(col("se2_adj") <= 0, lit(null).cast("double"))
        .otherwise(round((mAdj("t") - mAdj("c")) / sqrt(col("se2_adj")), 6)))
      .withColumn("var_reduction",
        when(col("se2_raw") <= 0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("se2_adj") / col("se2_raw"), 6)))
    out.select(col("n_t"), col("n_c"), round(col("theta"), 6).as("theta"),
      col("diff_raw"), col("z_raw"), col("diff_cuped"), col("z_cuped"),
      col("var_reduction"),
      coalesce(abs(col("z_cuped")) > 1.96, lit(false)).as("significant"))
  }

  val qCupedSql: String =
    """WITH ev AS (SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END AS cents
      |  FROM events),
      |mind AS (SELECT min(day) AS d0 FROM ev),
      |pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN day < d0 + 15 THEN cents ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN day >= d0 + 15 THEN cents ELSE 0 END) AS BIGINT) AS y,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'treat' ELSE 'ctrl' END AS arm
      |  FROM ev, mind GROUP BY user_id, arm),
      |pooled AS (SELECT count(*) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx
      |  FROM pu),
      |arms AS (SELECT arm, count(*) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pu GROUP BY 1),
      |wide AS (SELECT
      |    max(CASE WHEN arm = 'treat' THEN n END) AS n_t,
      |    max(CASE WHEN arm = 'ctrl' THEN n END) AS n_c,
      |    max(CASE WHEN arm = 'treat' THEN sx END) AS sx_t,
      |    max(CASE WHEN arm = 'ctrl' THEN sx END) AS sx_c,
      |    max(CASE WHEN arm = 'treat' THEN sy END) AS sy_t,
      |    max(CASE WHEN arm = 'ctrl' THEN sy END) AS sy_c,
      |    max(CASE WHEN arm = 'treat' THEN sxy END) AS sxy_t,
      |    max(CASE WHEN arm = 'ctrl' THEN sxy END) AS sxy_c,
      |    max(CASE WHEN arm = 'treat' THEN sxx END) AS sxx_t,
      |    max(CASE WHEN arm = 'ctrl' THEN sxx END) AS sxx_c,
      |    max(CASE WHEN arm = 'treat' THEN syy END) AS syy_t,
      |    max(CASE WHEN arm = 'ctrl' THEN syy END) AS syy_c
      |  FROM arms),
      |j AS (SELECT *,
      |    CAST(sx AS DOUBLE) / n AS xbar,
      |    CAST(sxx AS DOUBLE) / n
      |      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS vx
      |  FROM wide, pooled),
      |t AS (SELECT *,
      |    CASE WHEN vx <= 0 THEN 0.0
      |      ELSE round((CAST(sxy AS DOUBLE) / n
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n / n) / vx, 10)
      |    END AS theta
      |  FROM j),
      |c AS (SELECT *,
      |    CAST(sy_t AS DOUBLE) / n_t
      |      - theta * (CAST(sx_t AS DOUBLE) / n_t - xbar) AS m_t,
      |    CAST(sy_c AS DOUBLE) / n_c
      |      - theta * (CAST(sx_c AS DOUBLE) / n_c - xbar) AS m_c,
      |    (CAST(syy_t AS DOUBLE)
      |      - CAST(sy_t AS DOUBLE) * CAST(sy_t AS DOUBLE) / n_t) / (n_t - 1)
      |      - 2.0 * theta * ((CAST(sxy_t AS DOUBLE)
      |        - CAST(sx_t AS DOUBLE) * CAST(sy_t AS DOUBLE) / n_t) / (n_t - 1))
      |      + theta * theta * ((CAST(sxx_t AS DOUBLE)
      |        - CAST(sx_t AS DOUBLE) * CAST(sx_t AS DOUBLE) / n_t) / (n_t - 1))
      |      AS va_t,
      |    (CAST(syy_c AS DOUBLE)
      |      - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE) / n_c) / (n_c - 1)
      |      - 2.0 * theta * ((CAST(sxy_c AS DOUBLE)
      |        - CAST(sx_c AS DOUBLE) * CAST(sy_c AS DOUBLE) / n_c) / (n_c - 1))
      |      + theta * theta * ((CAST(sxx_c AS DOUBLE)
      |        - CAST(sx_c AS DOUBLE) * CAST(sx_c AS DOUBLE) / n_c) / (n_c - 1))
      |      AS va_c,
      |    (CAST(syy_t AS DOUBLE)
      |      - CAST(sy_t AS DOUBLE) * CAST(sy_t AS DOUBLE) / n_t) / (n_t - 1)
      |      AS vr_t,
      |    (CAST(syy_c AS DOUBLE)
      |      - CAST(sy_c AS DOUBLE) * CAST(sy_c AS DOUBLE) / n_c) / (n_c - 1)
      |      AS vr_c
      |  FROM t),
      |f AS (SELECT n_t, n_c, round(theta, 6) AS theta,
      |    round((CAST(sy_t AS DOUBLE) / n_t
      |      - CAST(sy_c AS DOUBLE) / n_c) / 100.0, 6) AS diff_raw,
      |    vr_t / n_t + vr_c / n_c AS se2_raw,
      |    va_t / n_t + va_c / n_c AS se2_adj,
      |    CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c AS draw,
      |    m_t - m_c AS dadj
      |  FROM c)
      |SELECT n_t, n_c, theta, diff_raw,
      |  CASE WHEN se2_raw <= 0 THEN NULL
      |    ELSE round(draw / sqrt(se2_raw), 6) END AS z_raw,
      |  round(dadj / 100.0, 6) AS diff_cuped,
      |  CASE WHEN se2_adj <= 0 THEN NULL
      |    ELSE round(dadj / sqrt(se2_adj), 6) END AS z_cuped,
      |  CASE WHEN se2_raw <= 0 THEN NULL
      |    ELSE round(1.0 - se2_adj / se2_raw, 6) END AS var_reduction,
      |  coalesce(abs(CASE WHEN se2_adj <= 0 THEN NULL
      |    ELSE round(dadj / sqrt(se2_adj), 6) END) > 1.96, false) AS significant
      |FROM f""".stripMargin

  // ---------------------------------------------------------------- L24
  /** McNemar's test on PAIRED classifier disagreement — the right
    * test when two classifiers score the SAME documents (two
    * independent-sample proportions would throw away the pairing and
    * lose nearly all the power): does the stopword-argmax language
    * identifier (B2) beat a bare token-presence rule ("contains
    * `the` ⇒ English") at deciding is-this-English? Only the
    * discordant cells matter: b = argmax right where the rule is
    * wrong, c = the reverse; the continuity-corrected statistic
    * (|b−c|−1)²/(b+c) is χ²(1) under the null of equal error rates.
    * Every cell is an exact integer count off ONE pass over the B2
    * per-doc frame joined to a map-only token-presence flag; doubles
    * appear only in the final statistic and the two accuracy
    * readouts; b + c = 0 (identical classifiers) publishes a null
    * statistic, not a divide error. 1 output row.
    */
  def qMcnemar(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val base = TextAnalysis.qLangId(spark, dir)
      .select(col("doc_id"), (col("lang") === "en").as("truth"),
        (col("pred_lang") === "en").as("pa"))
    val rule = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_contains(tokens(col("text")), "the").as("pb"))
    val cells = base.join(rule, "doc_id")
      .select((col("pa") === col("truth")).as("ra"),
        (col("pb") === col("truth")).as("rb"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("both_right"),
        sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("both_wrong"))
    cells.select(col("n"), col("both_right"),
        col("b").as("argmax_only"), col("c").as("rule_only"),
        col("both_wrong"),
        round((col("both_right") + col("b")).cast("double") / col("n"), 6)
          .as("acc_argmax"),
        round((col("both_right") + col("c")).cast("double") / col("n"), 6)
          .as("acc_rule"),
        when(col("b") + col("c") === 0, lit(null).cast("double"))
          .otherwise(round(
            (abs(col("b") - col("c")) - 1) * (abs(col("b") - col("c")) - 1)
              / (col("b") + col("c")).cast("double"), 6)).as("mcnemar_chi2"))
      .withColumn("significant",
        coalesce(col("mcnemar_chi2") > 3.841, lit(false)))
  }

  val qMcnemarSql: String = {
    val duckToks = graft.functions.TextFunctions.duckToksSql("text")
    s"""WITH base AS (SELECT doc_id, (lang = 'en') AS truth,
      |    (pred_lang = 'en') AS pa
      |  FROM (${TextAnalysis.qLangIdSql.replace("\n", "\n  ")}) li),
      |rule AS (SELECT doc_id,
      |    list_contains($duckToks, 'the') AS pb FROM documents),
      |rr AS (SELECT (pa = truth) AS ra, (pb = truth) AS rb
      |  FROM base JOIN rule USING (doc_id)),
      |cells AS (SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
      |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
      |  FROM rr),
      |v AS (SELECT n, both_right, b AS argmax_only, c AS rule_only, both_wrong,
      |    round(CAST(both_right + b AS DOUBLE) / n, 6) AS acc_argmax,
      |    round(CAST(both_right + c AS DOUBLE) / n, 6) AS acc_rule,
      |    CASE WHEN b + c = 0 THEN NULL
      |      ELSE round((abs(b - c) - 1) * (abs(b - c) - 1)
      |        / CAST(b + c AS DOUBLE), 6) END AS mcnemar_chi2
      |  FROM cells)
      |SELECT *, coalesce(mcnemar_chi2 > 3.841, false) AS significant
      |FROM v""".stripMargin
  }

  // ---------------------------------------------------------------- L23
  /** Welch's unequal-variance t-test on per-user spend between the
    * two md5 experiment arms — the continuous-metric counterpart of
    * L3's proportions z-test, and the test L22 motivates: when
    * Brown–Forsythe says variances differ, the pooled-variance t is
    * anticonservative and Welch with Satterthwaite df is the
    * published fix. Same deterministic md5 arm assignment as L3 (so
    * the null is true by construction and the verdict audits the
    * false-positive behavior of the machinery itself). Per-user spend
    * folds to exact integer cents, per-arm moments are DECIMAL sums
    * (Σx, Σx² overflow-free), and doubles appear only in the
    * mean/variance/t/df verdict arithmetic — identical expression
    * shapes both engines, 6-dp publish. One keyed aggregate + a
    * 2-row arm frame; 1 output row.
    */
  def qWelchTtest(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = spend.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast("decimal(38,0)")).as("s"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    val va = (col("q_a").cast("double") -
      col("s_a").cast("double") * col("s_a").cast("double") / col("n_a")) /
      (col("n_a") - 1)
    val vb = (col("q_b").cast("double") -
      col("s_b").cast("double") * col("s_b").cast("double") / col("n_b")) /
      (col("n_b") - 1)
    val sea = va / col("n_a")
    val seb = vb / col("n_b")
    a.crossJoin(broadcast(b))
      .withColumn("mean_a", round(col("s_a").cast("double") / col("n_a") / 100, 6))
      .withColumn("mean_b", round(col("s_b").cast("double") / col("n_b") / 100, 6))
      .withColumn("t_stat", round(
        (col("s_a").cast("double") / col("n_a") -
          col("s_b").cast("double") / col("n_b")) / lit(100.0) /
        sqrt((sea + seb) / 10000), 6))
      .withColumn("df_welch", round(
        (sea + seb) * (sea + seb) /
          (sea * sea / (col("n_a") - 1) + seb * seb / (col("n_b") - 1)), 6))
      .select(col("n_a"), col("mean_a"), col("n_b"), col("mean_b"),
        col("t_stat"), col("df_welch"),
        (abs(col("t_stat")) > 1.96).as("significant"))
  }

  val qWelchTtestSql: String =
    """WITH spend AS (SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id),
      |armed AS (SELECT cents,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm
      |  FROM spend),
      |arms AS (SELECT arm, count(*) AS n,
      |    sum(CAST(cents AS HUGEINT)) AS s,
      |    sum(CAST(cents AS HUGEINT) * cents) AS q
      |  FROM armed GROUP BY 1),
      |a AS (SELECT n AS n_a, s AS s_a, q AS q_a FROM arms WHERE arm = 'A'),
      |b AS (SELECT n AS n_b, s AS s_b, q AS q_b FROM arms WHERE arm = 'B'),
      |m AS (SELECT n_a, n_b, s_a, s_b,
      |    (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)
      |      / (n_a - 1) / n_a AS sea,
      |    (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)
      |      / (n_b - 1) / n_b AS seb
      |  FROM a, b)
      |SELECT n_a, round(CAST(s_a AS DOUBLE) / n_a / 100, 6) AS mean_a,
      |  n_b, round(CAST(s_b AS DOUBLE) / n_b / 100, 6) AS mean_b,
      |  round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / 100.0
      |    / sqrt((sea + seb) / 10000), 6) AS t_stat,
      |  round((sea + seb) * (sea + seb)
      |    / (sea * sea / (n_a - 1) + seb * seb / (n_b - 1)), 6) AS df_welch,
      |  abs((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / 100.0
      |    / sqrt((sea + seb) / 10000)) > 1.96 AS significant
      |FROM m""".stripMargin

  val qAbTestSql: String =
    """WITH np AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
      |  FROM events GROUP BY user_id),
      |tot AS (SELECT count(*) AS users, CAST(sum(np) AS BIGINT) AS total_np FROM np),
      |u AS (SELECT user_id,
      |    CASE WHEN np * users > total_np THEN 1 ELSE 0 END AS converted,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm
      |  FROM np, tot),
      |arms AS (SELECT arm, count(*) AS n,
      |    CAST(sum(converted) AS BIGINT) AS conv FROM u GROUP BY arm),
      |ab AS (SELECT
      |    (SELECT n FROM arms WHERE arm = 'A') AS n_a,
      |    (SELECT conv FROM arms WHERE arm = 'A') AS conv_a,
      |    (SELECT n FROM arms WHERE arm = 'B') AS n_b,
      |    (SELECT conv FROM arms WHERE arm = 'B') AS conv_b),
      |pz AS (SELECT *,
      |    (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS p_pool FROM ab),
      |z AS (SELECT n_a, conv_a, n_b, conv_b,
      |    CASE WHEN p_pool = 0.0 OR p_pool = 1.0 THEN NULL
      |    ELSE round((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
      |      / sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_a + 1.0 / n_b)), 6) END AS z
      |  FROM pz)
      |SELECT n_a, conv_a, round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
      |  n_b, conv_b, round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
      |  z, coalesce(abs(z) > 1.96, false) AS significant
      |FROM z""".stripMargin

  // ---------------------------------------------------------------- L4
  /** Benford first-significant-digit audit over order totals — the
    * fabricated/truncated-data detector an ingest pipeline runs on any
    * organically-generated amount column: observed digit shares vs the
    * Benford expectation log10(1+1/d), chi-squared against the 95%
    * critical value for 8 df. Expected shares are 6-dp-rounded BEFORE
    * the chi-squared arithmetic so both engines feed identical inputs
    * into identical IEEE double math (the PSI/K19 device). One
    * digit-keyed aggregate with map-side combine (9 groups at any
    * scale), a left join against the literal digit grid so zero-count
    * digits still contribute their full expected mass, then two
    * broadcast one-row reductions — nothing driver-side.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(spark, dir)
      .filter(col("o_totalprice") >= 1)
      .select(substring(floor(col("o_totalprice")).cast("bigint")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val grid = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .withColumn("exp_share",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
    val g = grid.join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
    val tot = g.agg(sum(col("n_obs")).as("n"))
    val withN = g.crossJoin(broadcast(tot))
    val chi = withN.agg(round(sum(
      pow(col("n_obs") - col("n") * col("exp_share"), 2) /
        (col("n") * col("exp_share"))), 4).as("chi2"))
    withN.crossJoin(broadcast(chi))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs") / col("n"), 6).as("obs_share"),
        col("exp_share"), col("chi2"),
        (col("chi2") < 15.507).as("benford_ok"))
  }

  val qBenfordSql: String =
    """WITH obs AS (SELECT
      |    CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS n_obs
      |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
      |grid AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit),
      |g AS (SELECT grid.digit,
      |    round(log10(1.0 + 1.0 / grid.digit), 6) AS exp_share,
      |    COALESCE(n_obs, 0) AS n_obs
      |  FROM grid LEFT JOIN obs USING (digit)),
      |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g),
      |chi AS (SELECT round(sum(pow(n_obs - n * exp_share, 2)
      |    / (n * exp_share)), 4) AS chi2 FROM g, tot)
      |SELECT g.digit, g.n_obs, round(g.n_obs / CAST(n AS DOUBLE), 6) AS obs_share,
      |  g.exp_share, chi2, chi2 < 15.507 AS benford_ok
      |FROM g, tot, chi""".stripMargin

  // ---------------------------------------------------------------- L5
  /** Poisson-bootstrap 95% confidence interval for the mean order
    * total per order priority — the one-pass bootstrap that actually
    * works at 100 TB: instead of resampling n rows with replacement B
    * times (B full shuffles), every row draws a DETERMINISTIC
    * Poisson(1) weight per replicate from md5(key, replicate) — one
    * map-side 32× explode, then a bounded (priority × replicate)
    * aggregate. The Poisson inverse-CDF thresholds are 10-dp literals
    * identical in both engines, so weights are engine-exact; replicate
    * sums are decimal-exact (integer weight × 2-dp price), the single
    * division per replicate rounds to 6 dp BEFORE the percentile cut,
    * and the CI endpoints ride the proven percentile↔quantile_cont
    * pair. Nothing driver-side; the explode factor is the only cost
    * dial.
    *
    * r15 (VERDICT ask #4): the md5 bill drops 4× — each digest is 128
    * bits, so ONE md5 per (row, digest-group) yields FOUR 32-bit
    * uniforms (8-hex-char slices, u = word/2³²), covering 4 replicates:
    * 8 hashes/row instead of 32 for the same 32 replicates. u is an
    * exact dyadic rational (k/2³², exact IEEE in both engines), so the
    * 10-dp Poisson(1) inverse-CDF thresholds cut identically; 32-bit
    * granularity (~2.3e-10) sits far inside the threshold spacing.
    */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        col("o_orderkey"), col("o_totalprice"))
    val point = base.groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1)), 6).as("mean_total"))
    val reps = base
      .select(col("priority"), col("o_orderkey"), col("o_totalprice"),
        explode(sequence(lit(1), lit(8))).as("g"))
      .select(col("priority"), col("o_totalprice"), col("g"),
        posexplode(graft.functions.GraftExpressions.md5_words(
          concat(col("o_orderkey").cast("string"), lit("_"),
            col("g").cast("string")))).as(Seq("j", "word")))
      .withColumn("b", (col("g") - 1) * 4 + col("j") + 1)
      .withColumn("u", col("word") / lit(4294967296.0))
      .withColumn("w", expr(
        """CASE WHEN u < 0.3678794412 THEN 0 WHEN u < 0.7357588823 THEN 1
          |     WHEN u < 0.9196986029 THEN 2 WHEN u < 0.9810118431 THEN 3
          |     WHEN u < 0.9963401532 THEN 4 WHEN u < 0.9994058152 THEN 5
          |     WHEN u < 0.9999167589 THEN 6 ELSE 7 END""".stripMargin))
      // exact LONG cents (w ≤ 7, cents < 2^63/7 far past 100 TB per
      // (priority, replicate) group) — ~1.4 s cheaper at sf0.1 than
      // the r14 decimal multiply-sum, same exact integer value
      .groupBy(col("priority"), col("b"))
      .agg(sum(col("w") * round(col("o_totalprice") * 100).cast("long"))
          .as("sc"),
        sum(col("w")).as("sw"))
      .withColumn("rep_mean",
        round(col("sc").cast("double") / 100.0 /
          nullif(col("sw"), lit(0)), 6))
      .groupBy(col("priority"))
      .agg(expr("percentile(rep_mean, array(0.025, 0.975))").as("ci"))
    point.join(reps, "priority")
      .select(col("priority"), col("n_orders"), col("mean_total"),
        round(col("ci")(0), 6).as("ci_lo"),
        round(col("ci")(1), 6).as("ci_hi"))
  }

  val qBootstrapCiSql: String =
    """WITH base AS (SELECT o_orderpriority AS priority, o_orderkey,
      |    o_totalprice FROM orders),
      |point AS (SELECT priority, count(*) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      / count(*), 6) AS mean_total
      |  FROM base GROUP BY 1),
      |reps AS (SELECT priority, o_orderkey, o_totalprice,
      |    unnest(generate_series(1, 8)) AS g FROM base),
      |dig AS (SELECT priority, o_totalprice, g,
      |    md5(CAST(o_orderkey AS VARCHAR) || '_' || CAST(g AS VARCHAR))
      |      AS digest
      |  FROM reps),
      |quad AS (SELECT priority, o_totalprice, g, digest,
      |    unnest(generate_series(0, 3)) AS j FROM dig),
      |u AS (SELECT priority, (g - 1) * 4 + j + 1 AS b, o_totalprice,
      |    ('0x' || substr(digest, 1 + 8 * j, 8))::BIGINT
      |      / 4294967296.0 AS u
      |  FROM quad),
      |w AS (SELECT priority, b, o_totalprice,
      |    CASE WHEN u < 0.3678794412 THEN 0 WHEN u < 0.7357588823 THEN 1
      |         WHEN u < 0.9196986029 THEN 2 WHEN u < 0.9810118431 THEN 3
      |         WHEN u < 0.9963401532 THEN 4 WHEN u < 0.9994058152 THEN 5
      |         WHEN u < 0.9999167589 THEN 6 ELSE 7 END AS w
      |  FROM u),
      |rm AS (SELECT priority, b,
      |    round(CAST(CAST(sum(w * CAST(round(o_totalprice * 100) AS BIGINT))
      |        AS BIGINT) AS DOUBLE) / 100.0
      |      / nullif(CAST(sum(w) AS BIGINT), 0), 6) AS rep_mean
      |  FROM w GROUP BY 1, 2),
      |ci AS (SELECT priority,
      |    quantile_cont(rep_mean, [0.025, 0.975]) AS ci
      |  FROM rm GROUP BY 1)
      |SELECT priority, n_orders, mean_total,
      |  round(ci[1], 6) AS ci_lo, round(ci[2], 6) AS ci_hi
      |FROM point JOIN ci USING (priority)""".stripMargin

  // ---------------------------------------------------------------- L6
  /** Laplace-mechanism differentially-private release of per-
    * (source, lang) document counts (ε = 1, sensitivity 1 for a
    * unit-contribution count): noise = −(1/ε)·sign(u)·ln(1−2|u|)
    * with u ∈ (−½, ½) — the standard inverse-CDF draw. The draw here
    * is DETERMINISTIC (md5 of the group key → uniform), which is what
    * makes the mechanism oracle-checkable and reproducible in tests;
    * a production release must substitute fresh randomness per
    * publication (a fixed seed re-released is not private), which
    * swaps one line. Counts are exact; the ln rides identical doubles
    * in both engines and rounds at the boundary; a greatest(1e-12)
    * floor guards the measure-zero ln(0) edge. One bounded group
    * aggregate, map-side noise — nothing driver-side.
    */
  def qDpCounts(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("u",
        expr("conv(substring(md5(concat(source, '|', lang)), 1, 15), 16, 10)")
          .cast("long") / lit(1152921504606846976.0))
      .withColumn("noise", round(lit(-1.0) * signum(col("u") - 0.5) *
        log(greatest(lit(1e-12),
          lit(1.0) - lit(2.0) * abs(col("u") - 0.5))), 6))
      .select(col("source"), col("lang"), col("n_true"), col("noise"),
        round(col("n_true") + col("noise"), 6).as("n_noisy"),
        lit(1.0).as("eps"))
  }

  val qDpCountsSql: String =
    """WITH g AS (SELECT source, lang, count(*) AS n_true,
      |    ('0x' || substr(md5(source || '|' || lang), 1, 15))::BIGINT
      |      / 1152921504606846976.0 AS u
      |  FROM documents GROUP BY 1, 2),
      |n AS (SELECT source, lang, n_true,
      |    round(-1.0 * sign(u - 0.5)
      |      * ln(greatest(1e-12, 1.0 - 2.0 * abs(u - 0.5))), 6) AS noise
      |  FROM g)
      |SELECT source, lang, n_true, noise,
      |  round(n_true + noise, 6) AS n_noisy, CAST(1.0 AS DOUBLE) AS eps
      |FROM n""".stripMargin

  // ---------------------------------------------------------------- L7
  /** k-anonymity audit over the (nation, market-segment) quasi-
    * identifier pair: every equivalence class with its size, the
    * k ≥ 5 verdict per class, and the corpus-wide k (the smallest
    * class — what an attacker actually faces) on every row — the
    * re-identification pre-flight a release pipeline runs before
    * publishing "anonymized" rows. One bounded aggregate (|nations| ×
    * |segments| classes) + a broadcast one-row min; exact integers
    * end to end.
    */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cls = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
    val k = cls.agg(min(col("class_size")).as("k_corpus"))
    cls.crossJoin(broadcast(k))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        (col("class_size") >= 5).as("k5_ok"), col("k_corpus"))
  }

  val qKAnonymitySql: String =
    """WITH cls AS (SELECT c_nationkey, c_mktsegment, count(*) AS class_size
      |  FROM customer GROUP BY 1, 2),
      |k AS (SELECT min(class_size) AS k_corpus FROM cls)
      |SELECT c_nationkey, c_mktsegment, class_size,
      |  class_size >= 5 AS k5_ok, k_corpus
      |FROM cls, k""".stripMargin

  // ---------------------------------------------------------------- L13
  /** Permutation test of the A/B mean-value difference — the
    * nonparametric companion to L3's z-test (no normality assumption;
    * exact under the randomization null). The classic blocker at
    * scale is resampling; the device (shared with L5's deterministic
    * bootstrap) is that each of the 32 permutations is a FIXED BIT of
    * the user's md5 hash: permutation p reassigns arms by bit p, bit
    * 0 IS the observed L3 assignment, so the whole test is one ×33
    * map-side explode + one 33×2-group aggregate with map-side
    * combine — no resampling shuffle, no RNG state, reproducible
    * across engines and cluster layouts. Means from decimal-exact
    * sums, diffs 10-dp-rounded before the |diff_p| ≥ |diff_obs|
    * compare; p = (1 + #{p : ≥}) / (1 + P).
    */
  def qPermutationTest(spark: SparkSession, dir: String): DataFrame = {
    val P = 32
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("value").cast("decimal(12,2)").as("v"))
      .withColumn("h",
        expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long"))
    val per = ev
      .select(col("h"), col("v"),
        // P is a compile-time constant ≥ 0: the range cannot invert
        explode(sequence(lit(0), lit(P))).as("p"))
      .withColumn("arm", expr("shiftright(h, p) % 2"))
      .groupBy(col("p"))
      .agg(
        sum(when(col("arm") === 0, col("v"))).as("s0"),
        count(when(col("arm") === 0, 1)).as("n0"),
        sum(when(col("arm") === 1, col("v"))).as("s1"),
        count(when(col("arm") === 1, 1)).as("n1"))
      .withColumn("diff", round(col("s0").cast("double") / col("n0")
        - col("s1").cast("double") / col("n1"), 10))
    val obs = per.filter(col("p") === 0).select(col("diff").as("dobs"))
    per.filter(col("p") > 0).crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(abs(col("diff")) >= abs(col("dobs")), 1L).otherwise(0L))
          .as("n_ge"),
        max(col("dobs")).as("d"))
      .select(round(col("d"), 6).as("diff_obs"), col("n_perms"), col("n_ge"),
        round((col("n_ge") + 1).cast("double") / (col("n_perms") + 1), 6)
          .as("p_value"))
      .withColumn("significant", col("p_value") < 0.05)
  }

  val qPermutationTestSql: String =
    """WITH ev AS (SELECT CAST(value AS DECIMAL(12,2)) AS v,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |per AS (SELECT p,
      |    round(CAST(sum(CASE WHEN (h >> p) % 2 = 0 THEN v END) AS DOUBLE)
      |        / count(CASE WHEN (h >> p) % 2 = 0 THEN 1 END)
      |      - CAST(sum(CASE WHEN (h >> p) % 2 = 1 THEN v END) AS DOUBLE)
      |        / count(CASE WHEN (h >> p) % 2 = 1 THEN 1 END), 10) AS diff
      |  FROM ev, generate_series(0, 32) g(p) GROUP BY p),
      |obs AS (SELECT diff AS dobs FROM per WHERE p = 0)
      |SELECT round(max(dobs), 6) AS diff_obs,
      |  count(*) AS n_perms,
      |  CAST(sum(CASE WHEN abs(diff) >= abs(dobs) THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
      |  round((sum(CASE WHEN abs(diff) >= abs(dobs) THEN 1 ELSE 0 END) + 1) * 1.0
      |    / (count(*) + 1), 6) AS p_value,
      |  round((sum(CASE WHEN abs(diff) >= abs(dobs) THEN 1 ELSE 0 END) + 1) * 1.0
      |    / (count(*) + 1), 6) < 0.05 AS significant
      |FROM per, obs WHERE p > 0""".stripMargin

  // ---------------------------------------------------------------- L12
  /** l-diversity audit — L7's necessary complement (Machanavajjhala
    * et al., 2006): k-anonymity bounds re-identification but not
    * attribute disclosure — a class of 50 customers ALL in the same
    * balance band leaks the band even though k=50. Per quasi-
    * identifier class (nation × segment): class size, count of
    * DISTINCT sensitive values (account-balance band: debt / low /
    * high), the l ≥ 3 verdict, and the corpus-wide minimum l. Exact
    * integer arithmetic end-to-end; one class-keyed aggregate
    * (count + count distinct over a 3-value domain) + one broadcast
    * one-row reduction — the L7 plan shape.
    */
  def qLDiversity(spark: SparkSession, dir: String): DataFrame = {
    val band = when(col("c_acctbal") < 0, "debt")
      .when(col("c_acctbal") < 5000, "low").otherwise("high")
    val cls = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"), band.as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("band")).as("l_distinct"))
    val lmin = cls.agg(min(col("l_distinct")).as("l_corpus"))
    cls.crossJoin(broadcast(lmin))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("l_distinct"), (col("l_distinct") >= 3).as("l3_ok"),
        col("l_corpus"))
  }

  val qLDiversitySql: String =
    """WITH b AS (SELECT c_nationkey, c_mktsegment,
      |    CASE WHEN c_acctbal < 0 THEN 'debt'
      |      WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band
      |  FROM customer),
      |cls AS (SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
      |    count(DISTINCT band) AS l_distinct
      |  FROM b GROUP BY 1, 2),
      |lm AS (SELECT min(l_distinct) AS l_corpus FROM cls)
      |SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
      |  l_distinct >= 3 AS l3_ok, l_corpus
      |FROM cls, lm""".stripMargin

  // ---------------------------------------------------------------- L8
  /** Gini concentration of customer spend per market segment — the
    * inequality audit a data curator runs before trusting per-segment
    * aggregates (a segment whose revenue is one whale behaves nothing
    * like its mean). Sibling of K-block q_gini_concentration (doc
    * lengths, pure integers): this one exercises the money path — a
    * fact⋈dim join feeding DECIMAL spend. Spend folds decimal-exact
    * per customer first
    * (one shuffle, bounded |customers| rows), then the classic sorted
    * formula G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) rides one
    * rank-window per segment: Σ i·xᵢ is permutation-invariant across
    * equal spends, so the rank tiebreak (custkey) cannot move the
    * statistic, and every sum is DECIMAL until the single final
    * division, rounded at the 6-dp boundary (§5). No driver state, no
    * second scan; the window partitions by segment so no global sort.
    */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("segment"))
      .orderBy(col("spend").asc, col("c_custkey").asc)
    spend
      .select(col("segment"), col("spend"),
        row_number().over(w).cast("long").as("i"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("tot"),
        sum((col("i").cast("decimal(18,0)") * col("spend"))
          .cast("decimal(28,2)")).as("iws"))
      .select(col("segment"), col("n_customers"),
        round(col("tot").cast("double"), 2).as("total_spend"),
        round((lit(2.0) * col("iws").cast("double") -
            (col("n_customers") + 1).cast("double") * col("tot").cast("double")) /
          (col("n_customers").cast("double") * col("tot").cast("double")),
          6).as("gini"))
  }

  val qGiniSql: String =
    """WITH spend AS (SELECT c.c_mktsegment AS segment, c.c_custkey,
      |    sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (SELECT segment, spend,
      |    CAST(row_number() OVER (PARTITION BY segment
      |      ORDER BY spend ASC, c_custkey ASC) AS BIGINT) AS i
      |  FROM spend),
      |agg AS (SELECT segment, count(*) AS n_customers,
      |    sum(spend) AS tot,
      |    sum(CAST(CAST(i AS DECIMAL(18,0)) * spend AS DECIMAL(28,2))) AS iws
      |  FROM ranked GROUP BY 1)
      |SELECT segment, n_customers,
      |  round(CAST(tot AS DOUBLE), 2) AS total_spend,
      |  round((2.0 * CAST(iws AS DOUBLE)
      |      - (n_customers + 1) * CAST(tot AS DOUBLE))
      |    / (n_customers * CAST(tot AS DOUBLE)), 6) AS gini
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L9
  /** Pareto concentration: what share of all events do the top-decile
    * users generate — the "whale ratio" in the units an operator
    * quotes (L8's Gini is the same phenomenon as an index). Per-user
    * counts fold once (user_id shuffle), the p90 cut broadcasts from
    * ONE exact percentile aggregate (the A15 pair), and the share is
    * a conditional sum against the cut — no global sort, no second
    * pass over events. Strict `>` against the interpolated cut on
    * exact integer counts is engine-identical.
    */
  /** Lazy plan + its cache handle — split out so PlanSpec can assert
    * the broadcast/cache shape that [[qParetoShare]] then executes. */
  private[graft] def paretoSharePlan(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    // cached: the cut subquery and the share branch both consume the
    // per-user fold — uncached, the broadcast side re-scanned events
    // (the 100 TB table) for its own copy of the aggregate
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n")).cache()
    val cut = perUser.agg(expr("percentile(n, 0.9)").as("p90"))
    val out = perUser.crossJoin(broadcast(cut))
      .agg(count(lit(1)).as("n_users"),
        round(max(col("p90")), 4).as("p90_events"),
        sum(when(col("n") > col("p90"), 1L).otherwise(0L)).as("n_top_users"),
        round(sum(when(col("n") > col("p90"), col("n")).otherwise(0L))
          .cast("double") / sum(col("n")), 6).as("top_share"))
    (out, perUser)
  }

  def qParetoShare(spark: SparkSession, dir: String): DataFrame = {
    val (out, perUser) = paretoSharePlan(spark, dir)
    // one-row verdict: materialize locally, then drop the per-user
    // fold cache immediately — at 100 TB that cache is the big frame,
    // and leaving it pinned for the session makes later queries pay
    val rows = out.collect()
    perUser.unpersist()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  val qParetoShareSql: String =
    """WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      |cut AS (SELECT quantile_cont(n, 0.9) AS p90 FROM pu)
      |SELECT count(*) AS n_users,
      |  round(max(p90), 4) AS p90_events,
      |  CAST(sum(CASE WHEN n > p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_top_users,
      |  round(sum(CASE WHEN n > p90 THEN n ELSE 0 END) * 1.0 / sum(n), 6)
      |    AS top_share
      |FROM pu, cut""".stripMargin

  // ---------------------------------------------------------------- L10
  /** Robust outlier audit per event type: median/MAD take the place of
    * mean/stddev (F11's z-score), so a contaminated tail cannot drag
    * its own detection threshold — the estimator a data curator
    * trusts on dirty feeds. Two bounded percentile aggregates (median,
    * then MAD of |v − median| after a broadcast join back) and one
    * conditional count against the 3σ-equivalent cut
    * (3 × 1.4826 × MAD, 10-dp-rounded before the compare so both
    * engines threshold on the identical double). Never buffers raw
    * values beyond the proven exact-percentile path.
    */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = ev.join(broadcast(med), "event_type")
    val mad = withMed.groupBy(col("event_type"))
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .withColumn("cut", round(lit(3.0) * lit(1.4826) * col("mad"), 10))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("median"),
        round(max(col("mad")), 6).as("mad"),
        sum(when(abs(col("value") - col("med")) > col("cut"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_rate",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }

  val qMadOutliersSql: String =
    """WITH med AS (SELECT event_type,
      |    quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |mad AS (SELECT e.event_type,
      |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  round(max(m.med), 6) AS median,
      |  round(max(d.mad), 6) AS mad,
      |  CAST(sum(CASE WHEN abs(e.value - m.med)
      |        > round(3.0 * 1.4826 * d.mad, 10) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  round(sum(CASE WHEN abs(e.value - m.med)
      |        > round(3.0 * 1.4826 * d.mad, 10) THEN 1 ELSE 0 END) * 1.0
      |    / count(*), 6) AS outlier_rate
      |FROM events e JOIN med m USING (event_type)
      |  JOIN mad d ON e.event_type = d.event_type
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- L11
  /** Multiple-testing control for segment-wise experiment readouts —
    * the guardrail L3 needs the moment it fans out: testing 20 segment
    * cells at α=0.05 each expects a false positive per run, so the
    * shipped verdict must control the FALSE DISCOVERY RATE (Benjamini
    * & Hochberg, 1995), not per-test error. Per (event_type × user
    * cohort) cell: Welch z-test of mean event value between the L3
    * md5-parity arms — counts exact, sums decimal-exact, mean/E[x²]
    * 10-dp-rounded so the variance/z arithmetic rides identical IEEE
    * doubles in both engines. p-values via the Abramowitz–Stegun
    * 7.1.26 erf polynomial (pure arithmetic + one exp, rendered
    * identically in both engines, 8-dp-rounded). BH step-up: rank
    * p ascending, reject ranks ≤ max{i : p_(i) ≤ α·i/m} at α=0.10.
    * One (event_type, cohort)-keyed aggregate with conditional
    * per-arm sums (no arm join); the ranking windows run over the
    * m ≤ |event types|·4 tested cells — bounded by construction
    * (PlanSpec-exempt like q_auc's bin table).
    */
  /** The (event_type × cohort) Welch-z p-value battery — factored so
    * the BH (L11) and Holm (L41) procedures consume the
    * BIT-IDENTICAL p_value column (the qualityCtes device).
    */
  private def pBattery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        (col("user_id") % 4).as("cohort"),
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B").as("arm"),
        col("value").cast("decimal(12,2)").as("v"))
    def armAgg(a: String, f: Column) =
      sum(when(col("arm") === a, f).otherwise(lit(null)))
    val cells = ev.groupBy(col("event_type"), col("cohort"))
      .agg(
        count(when(col("arm") === "A", 1)).as("n_a"),
        count(when(col("arm") === "B", 1)).as("n_b"),
        armAgg("A", col("v")).as("s_a"), armAgg("B", col("v")).as("s_b"),
        armAgg("A", col("v") * col("v")).as("q_a"),
        armAgg("B", col("v") * col("v")).as("q_b"))
      .filter(col("n_a") > 1 && col("n_b") > 1)
      .withColumn("mean_a", round(col("s_a").cast("double") / col("n_a"), 10))
      .withColumn("mean_b", round(col("s_b").cast("double") / col("n_b"), 10))
      .withColumn("ex2_a", round(col("q_a").cast("double") / col("n_a"), 10))
      .withColumn("ex2_b", round(col("q_b").cast("double") / col("n_b"), 10))
      .withColumn("var_a", greatest(
        (col("ex2_a") - col("mean_a") * col("mean_a"))
          * col("n_a") / (col("n_a") - 1), lit(0.0)))
      .withColumn("var_b", greatest(
        (col("ex2_b") - col("mean_b") * col("mean_b"))
          * col("n_b") / (col("n_b") - 1), lit(0.0)))
      .withColumn("se2", col("var_a") / col("n_a") + col("var_b") / col("n_b"))
      .filter(col("se2") > 0.0)
      .withColumn("z",
        round((col("mean_a") - col("mean_b")) / sqrt(col("se2")), 6))
    // p = 2(1 − Φ(|z|)) = 1 − erf(|z|/√2), A&S 7.1.26 (|err| < 1.5e-7)
    val p = cells
      .withColumn("y", abs(col("z")) / sqrt(lit(2.0)))
      .withColumn("t", lit(1.0) / (lit(1.0) + lit(0.3275911) * col("y")))
      .withColumn("poly", col("t") * (lit(0.254829592) + col("t")
        * (lit(-0.284496736) + col("t") * (lit(1.421413741) + col("t")
        * (lit(-1.453152027) + col("t") * lit(1.061405429))))))
      .withColumn("p_value",
        round(col("poly") * exp(-col("y") * col("y")), 8))
    p
  }

  def qFdrBh(spark: SparkSession, dir: String): DataFrame = {
    val alpha = 0.10
    val p = pBattery(spark, dir)
    val byP = Window.orderBy(col("p_value").asc,
      col("event_type").asc, col("cohort").asc)
    val all = Window.partitionBy()
    val ranked = p
      .withColumn("p_rank", row_number().over(byP))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("bh_crit",
        round(lit(alpha) * col("p_rank") / col("m"), 8))
      .withColumn("cand",
        when(col("p_value") <= col("bh_crit"), col("p_rank")))
    ranked
      .withColumn("k", max(col("cand")).over(all))
      .select(col("event_type"), col("cohort"), col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        col("z"), col("p_value"), col("p_rank"), col("m"), col("bh_crit"),
        (col("p_rank") <= coalesce(col("k"), lit(0))).as("reject"))
  }

  /** The L11 p-value battery as reusable DuckDB CTEs (ending in
    * `pv`), shared by the BH and Holm oracles.
    */
  private val pBatteryCtes: String =
    """ev AS (SELECT event_type, user_id % 4 AS cohort,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |cells0 AS (SELECT event_type, cohort,
      |    count(CASE WHEN arm = 'A' THEN 1 END) AS n_a,
      |    count(CASE WHEN arm = 'B' THEN 1 END) AS n_b,
      |    sum(CASE WHEN arm = 'A' THEN v END) AS s_a,
      |    sum(CASE WHEN arm = 'B' THEN v END) AS s_b,
      |    sum(CASE WHEN arm = 'A' THEN v * v END) AS q_a,
      |    sum(CASE WHEN arm = 'B' THEN v * v END) AS q_b
      |  FROM ev GROUP BY 1, 2),
      |cells1 AS (SELECT *,
      |    round(CAST(s_a AS DOUBLE) / n_a, 10) AS mean_a,
      |    round(CAST(s_b AS DOUBLE) / n_b, 10) AS mean_b,
      |    round(CAST(q_a AS DOUBLE) / n_a, 10) AS ex2_a,
      |    round(CAST(q_b AS DOUBLE) / n_b, 10) AS ex2_b
      |  FROM cells0 WHERE n_a > 1 AND n_b > 1),
      |cells2 AS (SELECT *,
      |    greatest((ex2_a - mean_a * mean_a) * n_a / (n_a - 1), 0.0) AS var_a,
      |    greatest((ex2_b - mean_b * mean_b) * n_b / (n_b - 1), 0.0) AS var_b
      |  FROM cells1),
      |cells3 AS (SELECT *, var_a / n_a + var_b / n_b AS se2 FROM cells2),
      |zc AS (SELECT *,
      |    round((mean_a - mean_b) / sqrt(se2), 6) AS z
      |  FROM cells3 WHERE se2 > 0),
      |pc AS (SELECT *,
      |    1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS t,
      |    abs(z) / sqrt(2.0) AS y
      |  FROM zc),
      |pv AS (SELECT *,
      |    round(t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
      |      + t * (-1.453152027 + t * 1.061405429)))) * exp(-y * y), 8)
      |      AS p_value
      |  FROM pc)""".stripMargin

  val qFdrBhSql: String =
    s"""WITH $pBatteryCtes,
      |rk AS (SELECT *,
      |    row_number() OVER (ORDER BY p_value ASC, event_type ASC, cohort ASC) AS p_rank,
      |    count(*) OVER () AS m
      |  FROM pv),
      |bh AS (SELECT *, round(0.10 * p_rank / m, 8) AS bh_crit,
      |    CASE WHEN p_value <= round(0.10 * p_rank / m, 8) THEN p_rank END AS cand
      |  FROM rk)
      |SELECT event_type, cohort, n_a, n_b,
      |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
      |  z, p_value, p_rank, m, bh_crit,
      |  (p_rank <= coalesce(max(cand) OVER (), 0)) AS reject
      |FROM bh""".stripMargin

  // ---------------------------------------------------------------- L45
  /** Benjamini–Yekutieli (2001) over the SAME p-value battery as
    * L11/L41 — completing the multiple-testing family: BH controls
    * FDR under independence, Holm controls FWER unconditionally, BY
    * controls FDR under ARBITRARY dependence by paying the harmonic
    * factor c(m) = Σ_{i≤m} 1/i. The battery's cells share users
    * across event types, so dependence is real here and BY is the
    * honest FDR gate. c(m) is computed as an ORDERED left fold over
    * the ascending index list (`aggregate` HOF in Spark,
    * `list_reduce` in DuckDB — identical IEEE association both
    * engines; never an unordered double sum, the q_stl rule).
    * Publishes the BY criterion and verdict next to BH's on the
    * same rows; BY rejections ⊆ BH rejections by construction.
    */
  def qFdrBy(spark: SparkSession, dir: String): DataFrame = {
    val alpha = 0.10
    val p = pBattery(spark, dir)
    val byP = Window.orderBy(col("p_value").asc,
      col("event_type").asc, col("cohort").asc)
    val all = Window.partitionBy()
    val ranked = p
      .withColumn("p_rank", row_number().over(byP))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("cm", expr(
        "aggregate(sequence(1, m), cast(0.0 as double), (acc, i) -> acc + 1.0 / i)"))
      .withColumn("bh_crit",
        round(lit(alpha) * col("p_rank") / col("m"), 8))
      .withColumn("by_crit",
        round(lit(alpha) * col("p_rank") / (col("m") * col("cm")), 8))
      .withColumn("cand_bh",
        when(col("p_value") <= col("bh_crit"), col("p_rank")))
      .withColumn("cand_by",
        when(col("p_value") <= col("by_crit"), col("p_rank")))
    ranked
      .withColumn("k_bh", max(col("cand_bh")).over(all))
      .withColumn("k_by", max(col("cand_by")).over(all))
      .select(col("event_type"), col("cohort"),
        col("p_value"), col("p_rank"), col("m"),
        round(col("cm"), 8).as("c_m"),
        col("bh_crit"), col("by_crit"),
        (col("p_rank") <= coalesce(col("k_bh"), lit(0))).as("reject_bh"),
        (col("p_rank") <= coalesce(col("k_by"), lit(0))).as("reject_by"))
  }

  val qFdrBySql: String =
    s"""WITH $pBatteryCtes,
      |rk AS (SELECT *,
      |    row_number() OVER (ORDER BY p_value ASC, event_type ASC, cohort ASC) AS p_rank,
      |    count(*) OVER () AS m
      |  FROM pv),
      |rk2 AS (SELECT *, list_reduce(
      |      list_transform(generate_series(1, CAST(m AS INTEGER)), i -> 1.0 / i),
      |      (acc, x) -> acc + x) AS cm
      |  FROM rk),
      |cr AS (SELECT *, round(0.10 * p_rank / m, 8) AS bh_crit,
      |    round(0.10 * p_rank / (m * cm), 8) AS by_crit
      |  FROM rk2),
      |cand AS (SELECT *,
      |    CASE WHEN p_value <= bh_crit THEN p_rank END AS cand_bh,
      |    CASE WHEN p_value <= by_crit THEN p_rank END AS cand_by
      |  FROM cr)
      |SELECT event_type, cohort, p_value, p_rank, m,
      |  round(cm, 8) AS c_m, bh_crit, by_crit,
      |  (p_rank <= coalesce(max(cand_bh) OVER (), 0)) AS reject_bh,
      |  (p_rank <= coalesce(max(cand_by) OVER (), 0)) AS reject_by
      |FROM cand""".stripMargin

  // ---------------------------------------------------------------- L41
  /** Holm step-down (1979) over the SAME p-value battery as L11 —
    * the familywise-error companion to BH's false-discovery-rate
    * control (Holm guarantees P(any false rejection) ≤ α with NO
    * independence assumption; BH tolerates a controlled fraction).
    * Step-down: order p ascending, reject while p_(i) ≤ α/(m−i+1),
    * STOP at the first failure — rejections are the ranks BELOW the
    * first failing rank (min-window over the bounded battery).
    * Battery identical by construction (shared pBattery frame /
    * `pv` CTE chain), so BH-vs-Holm disagreement rows are exactly
    * the procedures' theoretical gap, never a recomputation drift.
    * Publishes both verdicts side by side.
    */
  def qHolm(spark: SparkSession, dir: String): DataFrame = {
    val alpha = 0.10
    val p = pBattery(spark, dir)
    val byP = Window.orderBy(col("p_value").asc,
      col("event_type").asc, col("cohort").asc)
    val all = Window.partitionBy()
    val ranked = p
      .withColumn("p_rank", row_number().over(byP))
      .withColumn("m", count(lit(1)).over(all))
      .withColumn("holm_crit",
        round(lit(alpha) / (col("m") - col("p_rank") + 1), 8))
      .withColumn("bh_crit",
        round(lit(alpha) * col("p_rank") / col("m"), 8))
      .withColumn("fail_rank",
        when(col("p_value") > col("holm_crit"), col("p_rank")))
      .withColumn("bh_cand",
        when(col("p_value") <= col("bh_crit"), col("p_rank")))
    ranked
      .withColumn("first_fail", min(col("fail_rank")).over(all))
      .withColumn("bh_k", max(col("bh_cand")).over(all))
      .select(col("event_type"), col("cohort"),
        col("z"), col("p_value"), col("p_rank"), col("m"),
        col("holm_crit"),
        (col("p_rank") < coalesce(col("first_fail"), col("m") + 1))
          .as("reject_holm"),
        (col("p_rank") <= coalesce(col("bh_k"), lit(0)))
          .as("reject_bh"))
  }

  val qHolmSql: String =
    s"""WITH $pBatteryCtes,
      |rk AS (SELECT *,
      |    row_number() OVER (ORDER BY p_value ASC, event_type ASC, cohort ASC) AS p_rank,
      |    count(*) OVER () AS m
      |  FROM pv),
      |crit AS (SELECT *,
      |    round(0.10 / (m - p_rank + 1), 8) AS holm_crit,
      |    round(0.10 * p_rank / m, 8) AS bh_crit
      |  FROM rk),
      |flags AS (SELECT *,
      |    CASE WHEN p_value > holm_crit THEN p_rank END AS fail_rank,
      |    CASE WHEN p_value <= bh_crit THEN p_rank END AS bh_cand
      |  FROM crit)
      |SELECT event_type, cohort, z, p_value, p_rank, m, holm_crit,
      |  (p_rank < coalesce(min(fail_rank) OVER (), m + 1)) AS reject_holm,
      |  (p_rank <= coalesce(max(bh_cand) OVER (), 0)) AS reject_bh
      |FROM flags""".stripMargin

  // ---------------------------------------------------------------- L14
  /** Mann–Whitney U test (Wilcoxon rank-sum) on order totals between
    * the BUILDING and MACHINERY segments — the nonparametric
    * two-sample location test L3's Welch-z cannot be on skewed money
    * distributions (rank-based, no normality assumption; this is the
    * hypothesis-test complement of E12's AUC, which IS U/(n₁·n₂) as a
    * ranking metric). EXACT-INTEGER construction via the q_auc
    * quantized-histogram device: totals bucket to hundred-dollar bins
    * (domain-bounded ≤ ~5,500 bins at ANY corpus size — the window
    * below runs over that bounded histogram, never the order stream),
    * then 2·U = Σ_bins nA·(2·cumB(<bin) + nB) and the tie term
    * T = Σ t³−t accumulate in DECIMAL(38,0) — exact far past the
    * long-overflow line (u2 published as BIGINT is exact while
    * n₁·n₂ < 2⁶², i.e. ~2·10⁹ rows per cohort; past that, publish the
    * decimal). z uses the tie-corrected variance
    * n₁n₂/12·((n+1) − T/(n(n−1))); both engines compute the identical
    * double expression at the 6-dp boundary; degenerate all-tied data
    * yields null z, not a divide error.
    */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val hist = seg.groupBy(col("bin"))
      .agg(count(when(col("seg") === "BUILDING", 1)).as("na"),
        count(when(col("seg") === "MACHINERY", 1)).as("nb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cumb",
      coalesce(sum(col("nb")).over(w), lit(0L)))
    val t = col("na") + col("nb")
    val agg = cum.agg(
      sum(col("na")).as("n1"), sum(col("nb")).as("n2"),
      sum(col("na").cast("decimal(38,0)") *
        (lit(2) * col("cumb") + col("nb"))).as("u2"),
      sum(t.cast("decimal(38,0)") * t * t - t).as("tsum"))
    val nn = (col("n1") + col("n2")).cast("double")
    val varU = col("n1").cast("double") * col("n2").cast("double") / 12.0 *
      ((nn + 1) - col("tsum").cast("double") / (nn * (nn - 1)))
    val z = when(varU <= 0, lit(null).cast("double"))
      .otherwise(round((col("u2").cast("double") -
        col("n1").cast("double") * col("n2").cast("double")) /
        (lit(2.0) * sqrt(varU)), 6))
    agg.select(col("n1").cast("long").as("n1"), col("n2").cast("long").as("n2"),
      col("u2").cast("long").as("u2"), z.as("z"),
      coalesce(abs(z) > 1.96, lit(false)).as("significant"))
  }

  val qMannWhitneySql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (SELECT bin,
      |    count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS na,
      |    count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS nb
      |  FROM seg GROUP BY 1),
      |cum AS (SELECT bin, na, nb, coalesce(sum(nb) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM hist),
      |agg AS (SELECT CAST(sum(na) AS BIGINT) AS n1, CAST(sum(nb) AS BIGINT) AS n2,
      |    sum(CAST(na AS HUGEINT) * (2 * cumb + nb)) AS u2,
      |    sum(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb) - (na + nb)) AS tsum
      |  FROM cum),
      |calc AS (SELECT n1, n2, u2,
      |    CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0 *
      |      ((CAST(n1 + n2 AS DOUBLE) + 1) - CAST(tsum AS DOUBLE)
      |        / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1))) AS varu
      |  FROM agg)
      |SELECT n1, n2, CAST(u2 AS BIGINT) AS u2,
      |  CASE WHEN varu <= 0 THEN NULL
      |    ELSE round((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
      |      / (2.0 * sqrt(varu)), 6) END AS z,
      |  coalesce(abs(CASE WHEN varu <= 0 THEN NULL
      |    ELSE round((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
      |      / (2.0 * sqrt(varu)), 6) END) > 1.96, false) AS significant
      |FROM calc""".stripMargin

  // ---------------------------------------------------------------- L15
  /** Cramér's V association between document language and source —
    * the effect-size readout K12's independence test lacks: chi² says
    * WHETHER lang mix varies by source, V = √(χ²/(n·(min(r,c)−1)))
    * says HOW MUCH on a scale-free [0,1] axis comparable across
    * corpora (the number a mixture rebalance targets). Exact integer
    * contingency over the FULL r×c grid (absent cells at expectation
    * — the E15 discipline); per-cell (o−e)²/e 10-dp-rounded before
    * the 6-dp sum; every frame bounded by |langs|×|sources|.
    */
  def qCramersV(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rowsT = cells.groupBy(col("lang")).agg(sum(col("o")).as("nl"))
    val colsT = cells.groupBy(col("source")).agg(sum(col("o")).as("ns"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val dims = cells.agg(countDistinct(col("lang")).as("r"),
      countDistinct(col("source")).as("c"))
    val grid = rowsT.crossJoin(broadcast(colsT)).crossJoin(broadcast(tot))
      .join(cells, Seq("lang", "source"), "left")
      .withColumn("e", col("nl").cast("double") * col("ns") / col("n"))
      .withColumn("t", round((coalesce(col("o"), lit(0L)) - col("e")) *
        (coalesce(col("o"), lit(0L)) - col("e")) / col("e"), 10))
    grid.agg(max(col("n")).cast("long").as("n"),
        round(sum(col("t")), 6).as("chi2"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("r"), col("c"), col("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(sqrt(col("chi2") /
          (col("n") * least(col("r") - 1, col("c") - 1))), 6).as("cramers_v"))
  }

  val qCramersVSql: String =
    """WITH cells AS (SELECT lang, source, count(*) AS o
      |  FROM documents GROUP BY 1, 2),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS nl FROM cells GROUP BY 1),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ns FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      |dims AS (SELECT count(DISTINCT lang) AS r, count(DISTINCT source) AS c
      |  FROM cells),
      |grid AS (SELECT rt.lang, ct.source, rt.nl, ct.ns, tot.n,
      |    coalesce(cells.o, 0) AS o,
      |    CAST(nl AS DOUBLE) * ns / n AS e
      |  FROM rt CROSS JOIN ct CROSS JOIN tot
      |  LEFT JOIN cells ON cells.lang = rt.lang AND cells.source = ct.source),
      |agg AS (SELECT CAST(max(n) AS BIGINT) AS n,
      |    round(sum(round((o - e) * (o - e) / e, 10)), 6) AS chi2
      |  FROM grid)
      |SELECT n, r, c, chi2, (r - 1) * (c - 1) AS dof,
      |  round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
      |FROM agg, dims""".stripMargin

  // ---------------------------------------------------------------- L16
  /** Two-sample Kolmogorov–Smirnov test on order totals between the
    * BUILDING and MACHINERY segments — the DISTRIBUTION-shape
    * complement of L14: Mann–Whitney detects a location shift, KS
    * detects ANY ECDF divergence (spread, skew, a second mode) the
    * rank-sum statistic integrates away. Same bounded construction:
    * totals quantize to hundred-dollar bins (domain-bounded ≤ ~5,500
    * bins at ANY corpus size — the cumulative window below runs over
    * that histogram, never the order stream), the two ECDFs are
    * inclusive cumulative counts over exact integers, the per-bin gap
    * |cA/n1 − cB/n2| rounds at 10 dp before the max (both engines max
    * identical IEEE values), and D publishes at 6 dp. Significance:
    * z = D·√(n1·n2/(n1+n2)) and the one-term asymptotic tail
    * p ≈ min(1, 2·exp(−2z²)) — the same closed-form-only discipline
    * as L4's MAD and L11's erf polynomial (no special functions a
    * SQL engine lacks). Degenerate one-bin data yields D = 0, p = 1.
    */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val hist = seg.groupBy(col("bin"))
      .agg(count(when(col("seg") === "BUILDING", 1)).as("na"),
        count(when(col("seg") === "MACHINERY", 1)).as("nb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
    val tot = hist.agg(sum(col("na")).cast("long").as("n1"),
      sum(col("nb")).cast("long").as("n2"))
    val d = cum.crossJoin(broadcast(tot))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(round(abs(col("ca").cast("double") / col("n1") -
          col("cb").cast("double") / col("n2")), 10)).as("d0"))
    d.select(col("n1"), col("n2"), round(col("d0"), 6).as("d_stat"),
        round(col("d0") * sqrt(col("n1").cast("double") * col("n2") /
          (col("n1") + col("n2"))), 6).as("ks_z"))
      .withColumn("p_value", round(least(lit(1.0),
        lit(2.0) * exp(lit(-2.0) * col("ks_z") * col("ks_z"))), 6))
      .withColumn("significant", col("p_value") < 0.05)
  }

  val qKsTestSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (SELECT bin,
      |    count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS na,
      |    count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS nb
      |  FROM seg GROUP BY 1),
      |cum AS (SELECT bin, na, nb,
      |    sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS ca,
      |    sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cb
      |  FROM hist),
      |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
      |    CAST(sum(nb) AS BIGINT) AS n2 FROM hist),
      |d AS (SELECT max(n1) AS n1, max(n2) AS n2,
      |    max(round(abs(CAST(ca AS DOUBLE) / n1 - CAST(cb AS DOUBLE) / n2),
      |      10)) AS d0
      |  FROM cum, tot),
      |z AS (SELECT n1, n2, round(d0, 6) AS d_stat,
      |    round(d0 * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 6) AS ks_z
      |  FROM d),
      |p AS (SELECT *, round(least(1.0, 2.0 * exp(-2.0 * ks_z * ks_z)), 6)
      |    AS p_value FROM z)
      |SELECT n1, n2, d_stat, ks_z, p_value, p_value < 0.05 AS significant
      |FROM p""".stripMargin

  // ---------------------------------------------------------------- L17
  /** Hodges–Lehmann estimator of the BUILDING→MACHINERY spend shift —
    * the EFFECT SIZE that belongs with L14's rank-sum test (the test
    * says whether the segments differ, HL says BY HOW MANY DOLLARS,
    * robustly: the median of all pairwise differences has a 29%
    * breakdown point, where a difference of means follows every
    * whale order). Computed on THOUSAND-dollar bin centers: the
    * exact estimator needs all n1·n2 pairwise differences — corpus²
    * — but on quantized totals the pair set collapses to
    * |binsA|×|binsB| ≤ ~550² weighted bin-difference cells (one
    * broadcast cross of two bounded histograms), and the weighted
    * median over the ≤ 1,101-row difference table replaces the
    * pairwise sort. Resolution is the bin width ($1,000 on a ~$550k
    * domain) — the documented cost of making a quadratic estimator
    * corpus-independent, same trade as L5's binned bootstrap. All
    * weights exact DECIMAL(38,0) (n1·n2 overflows long past ~3·10⁹
    * rows per arm); the lower weighted median picks the smallest
    * difference with 2·cum ≥ W on integer arithmetic — no float
    * enters until the published dollar value. Published cells are
    * BIGINT (exact through ~3·10⁹ rows per arm — n1·n2 ≤ 9·10¹⁸;
    * internal accumulation stays DECIMAL(38,0)/HUGEINT so the
    * verdict math never overflows first), sidestepping any
    * DECIMAL-vs-HUGEINT rendering asymmetry between engines;
    * median_margin = 2·cw − W at the selected cell makes a future
    * tie knife-edge visible in the published row itself.
    */
  def qHodgesLehmann(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 1000).cast("long").as("bin"))
    val ha = seg.filter(col("seg") === "BUILDING")
      .groupBy(col("bin").as("ba")).agg(count(lit(1)).as("na"))
    val hb = seg.filter(col("seg") === "MACHINERY")
      .groupBy(col("bin").as("bb")).agg(count(lit(1)).as("nb"))
    val diffs = ha.crossJoin(broadcast(hb))
      .groupBy((col("bb") - col("ba")).as("diff"))
      .agg(sum(col("na").cast("decimal(38,0)") * col("nb")).as("w"))
    val w = Window.orderBy(col("diff"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = diffs.withColumn("cw", sum(col("w")).over(w))
    val tot = diffs.agg(sum(col("w")).as("wtot"),
      count(lit(1)).as("n_cells"))
    cum.crossJoin(broadcast(tot))
      .filter(col("cw") * 2 >= col("wtot"))
      .agg(min(col("diff")).as("d"), max(col("wtot")).as("wtot"),
        max(col("n_cells")).as("n_cells"),
        min_by(col("cw"), col("diff")).as("cw_sel"))
      .select((col("d") * 1000).cast("long").as("hl_shift_dollars"),
        col("wtot").cast("long").as("n_pairs"), col("n_cells"),
        (col("cw_sel") * 2 - col("wtot")).cast("long").as("median_margin"))
  }

  val qHodgesLehmannSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |ha AS (SELECT bin AS ba, count(*) AS na FROM seg
      |  WHERE seg = 'BUILDING' GROUP BY 1),
      |hb AS (SELECT bin AS bb, count(*) AS nb FROM seg
      |  WHERE seg = 'MACHINERY' GROUP BY 1),
      |diffs AS (SELECT bb - ba AS diff,
      |    sum(CAST(na AS HUGEINT) * nb) AS w
      |  FROM ha CROSS JOIN hb GROUP BY 1),
      |cum AS (SELECT diff, w, sum(w) OVER (ORDER BY diff
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      |  FROM diffs),
      |tot AS (SELECT sum(w) AS wtot, count(*) AS n_cells FROM diffs)
      |SELECT CAST(min(diff) * 1000 AS BIGINT) AS hl_shift_dollars,
      |  CAST(max(wtot) AS BIGINT) AS n_pairs, max(n_cells) AS n_cells,
      |  CAST(min_by(cw, diff) * 2 - max(wtot) AS BIGINT) AS median_margin
      |FROM cum, tot WHERE cw * 2 >= wtot""".stripMargin

  // ---------------------------------------------------------------- L18
  /** One-way ANOVA of order totals across ALL market segments — the
    * k-group generalization the two-sample tests (L3 Welch, L14
    * rank-sum, L16 KS) can't give: one F verdict on "does segment
    * explain spend at all", plus the η² effect size that says how
    * much. Sums are EXACT: totals lift to integer cents (the values
    * are 2-dp doubles, so round(x·100) is exact), Σx and Σx² per
    * group accumulate in DECIMAL(38,0) (cents² ≈ 3.6e15/row — a
    * long sum overflows within thousands of rows; decimal is exact
    * to 10³⁸). The between/within decomposition then runs in ONE
    * identical double expression over the ≤ |segments| group rows
    * (the Σ_g of five s²/n terms is a 5-element double sum — ulp
    * noise ~1e-16 relative, invisible at the 6-dp boundary), and the
    * verdict cuts on the ROUNDED F against the fixed F(4,∞) 5%
    * critical value. Plan: one join-keyed aggregate to 5 group rows,
    * one broadcast cross — the grand totals are decimal sums OVER
    * the group rows, so the order stream is scanned exactly once.
    */
  def qAnova(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val grp = cents.groupBy(col("seg")).agg(
      count(lit(1)).as("n_g"),
      sum(col("c").cast("decimal(38,0)")).as("s_g"),
      sum((col("c") * col("c")).cast("decimal(38,0)")).as("q_g"))
    val tot = grp.agg(
      count(lit(1)).as("k"),
      sum(col("n_g")).cast("long").as("n"),
      sum(col("s_g")).as("s"),
      sum(col("q_g")).as("q"),
      sum(col("s_g").cast("double") * col("s_g").cast("double") /
        col("n_g")).as("sgrp"))
    val sst = col("q").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n")
    val ssb = col("sgrp") - col("s").cast("double") *
      col("s").cast("double") / col("n")
    val ssw = col("q").cast("double") - col("sgrp")
    val f = round((ssb / (col("k") - 1)) / (ssw / (col("n") - col("k"))), 6)
    val verdict = tot.select(col("k"), col("n"), f.as("f_stat"),
      round(ssb / sst, 6).as("eta_sq"))
      .withColumn("significant", col("f_stat") > 2.372)
    grp.select(col("seg"), col("n_g"),
        round(col("s_g").cast("double") / (col("n_g") * 100), 6)
          .as("mean_spend"))
      .crossJoin(broadcast(verdict))
  }

  val qAnovaSql: String =
    """WITH cents AS (SELECT c_mktsegment AS seg,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |grp AS (SELECT seg, count(*) AS n_g,
      |    CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS s_g,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q_g
      |  FROM cents GROUP BY 1),
      |tot AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    sum(s_g) AS s, sum(q_g) AS q,
      |    sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g) AS sgrp
      |  FROM grp),
      |v AS (SELECT k, n,
      |    round(((sgrp - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1))
      |      / ((CAST(q AS DOUBLE) - sgrp) / (n - k)), 6) AS f_stat,
      |    round((sgrp - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      |      / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n),
      |      6) AS eta_sq
      |  FROM tot)
      |SELECT seg, n_g,
      |  round(CAST(s_g AS DOUBLE) / (n_g * 100), 6) AS mean_spend,
      |  k, n, f_stat, eta_sq, (f_stat > 2.372) AS significant
      |FROM grp, v""".stripMargin

  // ---------------------------------------------------------------- L19
  /** Kruskal–Wallis H test across ALL market segments — L14's
    * rank-sum device generalized from 2 to k groups (the
    * nonparametric counterpart of L18's F: no normality or
    * equal-variance assumption, rank arithmetic immune to the spend
    * distribution's heavy tail). Same bounded construction: totals
    * quantize to hundred-dollar bins (≤ ~5,500 bins at ANY corpus
    * size), so ranks are a closed form over the histogram — the
    * DOUBLED rank sum 2R_g = Σ_bins n_gb·(2·cum_before + t_bin + 1)
    * and the tie term Σ t³−t accumulate EXACTLY in DECIMAL(38,0);
    * the cumulative window runs over the bin histogram, never the
    * order stream (PlanSpec-exempt, the q_auc class). H and the tie
    * correction C = 1 − Σ(t³−t)/(N³−N) are one identical double
    * expression over the ≤ |segments| group rows; verdict cuts the
    * ROUNDED tie-corrected H against the fixed χ²(4) 5% critical
    * value; degenerate all-one-bin data → C = 0 → null H, not a
    * divide error.
    */
  def qKruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val histSeg = seg.groupBy(col("bin"), col("seg"))
      .agg(count(lit(1)).as("n_sb"))
    val histBin = histSeg.groupBy(col("bin"))
      .agg(sum(col("n_sb")).cast("long").as("t"))
    val w = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = histBin.withColumn("cumt",
      coalesce(sum(col("t")).over(w), lit(0L)))
    val grp = histSeg.join(cum, "bin")
      .groupBy(col("seg"))
      .agg(sum(col("n_sb")).cast("long").as("n_g"),
        sum(col("n_sb").cast("decimal(38,0)") *
          (lit(2) * col("cumt") + col("t") + 1)).as("r2_g"))
    val ties = cum.agg(
      sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
        .as("tsum"))
    val tot = grp.crossJoin(broadcast(ties)).agg(
      count(lit(1)).as("k"),
      sum(col("n_g")).cast("long").as("n"),
      max(col("tsum")).as("tsum"),
      sum(col("r2_g").cast("double") * col("r2_g").cast("double") /
        (lit(4.0) * col("n_g"))).as("rterm"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + 1)) * col("rterm") - (nD + 1) * 3
    val c = lit(1.0) - col("tsum").cast("double") / (nD * nD * nD - nD)
    val verdict = tot.select(col("k"), col("n"),
      round(h, 6).as("h_stat"),
      when(c <= 0, lit(null).cast("double"))
        .otherwise(round(h / c, 6)).as("h_corrected"))
      .withColumn("significant",
        coalesce(col("h_corrected") > 9.488, lit(false)))
    grp.select(col("seg"), col("n_g"),
        round(col("r2_g").cast("double") / (col("n_g") * 2), 6)
          .as("mean_rank"))
      .crossJoin(broadcast(verdict))
  }

  val qKruskalWallisSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |hs AS (SELECT bin, seg, count(*) AS n_sb FROM seg GROUP BY 1, 2),
      |hb AS (SELECT bin, CAST(sum(n_sb) AS BIGINT) AS t FROM hs GROUP BY 1),
      |cum AS (SELECT bin, t, coalesce(sum(t) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumt
      |  FROM hb),
      |grp AS (SELECT seg, CAST(sum(n_sb) AS BIGINT) AS n_g,
      |    sum(CAST(n_sb AS HUGEINT) * (2 * cumt + t + 1)) AS r2_g
      |  FROM hs JOIN cum USING (bin) GROUP BY 1),
      |ties AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tsum FROM cum),
      |tot AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    max(tsum) AS tsum,
      |    sum(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE) / (4.0 * n_g))
      |      AS rterm
      |  FROM grp, ties),
      |v AS (SELECT k, n,
      |    round(12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rterm - 3 * (n + 1.0),
      |      6) AS h_stat,
      |    CASE WHEN 1.0 - CAST(tsum AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * n * n - n) <= 0 THEN NULL
      |      ELSE round((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * rterm
      |          - 3 * (n + 1.0))
      |        / (1.0 - CAST(tsum AS DOUBLE)
      |          / (CAST(n AS DOUBLE) * n * n - n)), 6) END AS h_corrected
      |  FROM tot)
      |SELECT seg, n_g, round(CAST(r2_g AS DOUBLE) / (2 * n_g), 6) AS mean_rank,
      |  k, n, h_stat, h_corrected,
      |  coalesce(h_corrected > 9.488, false) AS significant
      |FROM grp, v""".stripMargin

  // ---------------------------------------------------------------- L22
  /** Brown–Forsythe test (Levene's test with the median center) for
    * variance homogeneity across market segments — the gate the
    * L18/L19 location tests assume away: ANOVA's F compares MEANS
    * under equal variances; this tests the equal-variance premise
    * itself, robustly (deviations from the MEDIAN, not the mean, so
    * heavy tails don't masquerade as variance differences). Same
    * quantized-domain discipline as L19: prices fold to the $100-bin
    * histogram (≤ ~5,500 bins at any corpus size), the per-segment
    * median is the exact integer 2×-scaled weighted median of the
    * binned distribution (lo+hi convention — no float interpolation),
    * and every |2·bin − m2| deviation moment is an exact integer sum;
    * doubles appear only in the final W arithmetic. The scale factor
    * ($50 per z-unit) cancels in W, so the statistic is invariant to
    * the binning unit. Windows run over the bounded histogram, never
    * the order stream; k+… bounded output rows.
    */
  def qLevene(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val hist = seg.groupBy(col("seg"), col("bin"))
      .agg(count(lit(1)).as("n_sb"))
    val ng = hist.groupBy(col("seg")).agg(sum(col("n_sb")).cast("long").as("n_g"))
    val w = Window.partitionBy(col("seg")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("c", sum(col("n_sb")).over(w))
      .join(broadcast(ng), "seg")
    val med = cum.groupBy(col("seg")).agg(
      min(when(lit(2) * col("c") >= col("n_g"), col("bin"))).as("med_lo"),
      min(when(lit(2) * col("c") >= col("n_g") + 1, col("bin"))).as("med_hi"))
      .select(col("seg"), (col("med_lo") + col("med_hi")).as("m2"))
    val dev = hist.join(broadcast(med), "seg")
      .withColumn("z", abs(lit(2) * col("bin") - col("m2")))
    val grp = dev.groupBy(col("seg")).agg(
      sum(col("n_sb")).cast("long").as("n_g"),
      max(col("m2")).as("m2"),
      sum((col("n_sb") * col("z")).cast("decimal(38,0)")).as("sz_g"),
      sum((col("n_sb") * col("z") * col("z")).cast("decimal(38,0)")).as("qz_g"))
    val tot = grp.agg(
      count(lit(1)).as("k"),
      sum(col("n_g")).cast("long").as("n"),
      sum(col("sz_g")).as("s"),
      sum(col("qz_g")).as("q"),
      sum(col("sz_g").cast("double") * col("sz_g").cast("double") /
        col("n_g")).as("sgrp"))
    val ssb = col("sgrp") - col("s").cast("double") *
      col("s").cast("double") / col("n")
    val ssw = col("q").cast("double") - col("sgrp")
    val wStat = round((ssb / (col("k") - 1)) / (ssw / (col("n") - col("k"))), 6)
    val verdict = tot.select(col("k"), col("n"), wStat.as("w_stat"))
      .withColumn("significant", col("w_stat") > 2.372)
    grp.select(col("seg"), col("n_g"),
        round(col("m2") * 50.0, 6).as("median_price"),
        round(col("sz_g").cast("double") * 50.0 / col("n_g"), 6)
          .as("mean_absdev"))
      .crossJoin(broadcast(verdict))
  }

  val qLeveneSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |hist AS (SELECT seg, bin, count(*) AS n_sb FROM seg GROUP BY 1, 2),
      |ng AS (SELECT seg, CAST(sum(n_sb) AS BIGINT) AS n_g
      |  FROM hist GROUP BY 1),
      |cum AS (SELECT h.seg, h.bin, h.n_sb, ng.n_g,
      |    sum(h.n_sb) OVER (PARTITION BY h.seg ORDER BY h.bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM hist h JOIN ng USING (seg)),
      |med AS (SELECT seg,
      |    min(CASE WHEN 2 * c >= n_g THEN bin END)
      |      + min(CASE WHEN 2 * c >= n_g + 1 THEN bin END) AS m2
      |  FROM cum GROUP BY 1),
      |dev AS (SELECT h.seg, h.n_sb, abs(2 * h.bin - m.m2) AS z, m.m2
      |  FROM hist h JOIN med m USING (seg)),
      |grp AS (SELECT seg, CAST(sum(n_sb) AS BIGINT) AS n_g,
      |    max(m2) AS m2,
      |    sum(CAST(n_sb AS HUGEINT) * z) AS sz_g,
      |    sum(CAST(n_sb AS HUGEINT) * z * z) AS qz_g
      |  FROM dev GROUP BY 1),
      |tot AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    sum(sz_g) AS s, sum(qz_g) AS q,
      |    sum(CAST(sz_g AS DOUBLE) * CAST(sz_g AS DOUBLE) / n_g) AS sgrp
      |  FROM grp),
      |v AS (SELECT k, n,
      |    round(((sgrp - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (k - 1))
      |      / ((CAST(q AS DOUBLE) - sgrp) / (n - k)), 6) AS w_stat
      |  FROM tot)
      |SELECT g.seg, g.n_g, round(CAST(g.m2 AS DOUBLE) * 50.0, 6) AS median_price,
      |  round(CAST(g.sz_g AS DOUBLE) * 50.0 / g.n_g, 6) AS mean_absdev,
      |  v.k, v.n, v.w_stat, v.w_stat > 2.372 AS significant
      |FROM grp g, v""".stripMargin

  // ---------------------------------------------------------------- L20
  /** Capture–recapture (Chapman's Lincoln–Petersen) estimate of the
    * corpus size from two independent deterministic "captures" — the
    * coverage-estimation primitive for populations no single crawl
    * sees completely (how many documents EXIST, estimated from how
    * much two independent crawls overlap). Here both captures are
    * salted-md5 half-samples of the documents table, so the true N is
    * known and the emitted verdict AUDITS the estimator itself: n̂ =
    * (n_a+1)(n_b+1)/(n_ab+1) − 1 with the standard variance, relative
    * error against truth, and a CI-covers-truth boolean. The same
    * plan pointed at two real crawl snapshots (drop the truth
    * columns) is the production coverage readout. One map-side pass
    * (two hash parities per doc) + one global aggregate; exact
    * integers until the estimator divisions at the 6-dp boundary.
    * The md5-parity device is K2's: deterministic across runs,
    * machines, and engines — which is what makes n_a/n_b/n_ab
    * oracle-checkable at all.
    */
  def qCaptureRecapture(spark: SparkSession, dir: String): DataFrame = {
    def inSample(salt: String): Column =
      expr(s"conv(substring(md5(concat('$salt', cast(doc_id as string))), 1, 15), 16, 10)")
        .cast("long") % 2 === 0
    val marked = Tables.documents(spark, dir).select(
      inSample("a:").as("in_a"), inSample("b:").as("in_b"))
    val agg = marked.agg(
      count(lit(1)).as("n_true"),
      sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(col("in_b"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("n_ab"))
    val nhat = (col("n_a") + 1).cast("double") * (col("n_b") + 1) /
      (col("n_ab") + 1) - 1
    val varhat = (col("n_a") + 1).cast("double") * (col("n_b") + 1) *
      (col("n_a") - col("n_ab")) * (col("n_b") - col("n_ab")) /
      ((col("n_ab") + 1).cast("double") * (col("n_ab") + 1) * (col("n_ab") + 2))
    agg.select(col("n_true"), col("n_a"), col("n_b"), col("n_ab"),
        round(nhat, 2).as("n_hat"), round(sqrt(varhat), 2).as("se"),
        round(abs(nhat - col("n_true")) / col("n_true"), 6).as("rel_err"))
      .withColumn("ci_covers_truth",
        abs(col("n_hat") - col("n_true")) <= col("se") * 1.96)
  }

  val qCaptureRecaptureSql: String =
    """WITH m AS (SELECT
      |    (('0x' || substr(md5('a:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |      % 2 = 0) AS in_a,
      |    (('0x' || substr(md5('b:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |      % 2 = 0) AS in_b
      |  FROM documents),
      |agg AS (SELECT count(*) AS n_true,
      |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_ab
      |  FROM m),
      |c AS (SELECT *,
      |    CAST(n_a + 1 AS DOUBLE) * (n_b + 1) / (n_ab + 1) - 1 AS nhat,
      |    CAST(n_a + 1 AS DOUBLE) * (n_b + 1) * (n_a - n_ab) * (n_b - n_ab)
      |      / (CAST(n_ab + 1 AS DOUBLE) * (n_ab + 1) * (n_ab + 2)) AS varhat
      |  FROM agg)
      |SELECT n_true, n_a, n_b, n_ab,
      |  round(nhat, 2) AS n_hat, round(sqrt(varhat), 2) AS se,
      |  round(abs(nhat - n_true) / n_true, 6) AS rel_err,
      |  (abs(round(nhat, 2) - n_true) <= round(sqrt(varhat), 2) * 1.96)
      |    AS ci_covers_truth
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- L21
  /** Post-stratified average-treatment-effect estimate — the
    * covariate-adjustment step between L3's raw two-sample z and a
    * full outcome model: users stratify by a PRE-treatment covariate
    * (activity terciles via two exact integer-domain percentile
    * cuts), the per-stratum treated-vs-control outcome gaps combine
    * with population weights w_s = n_s/n, and the stratified SE
    * comes from within-stratum variances — the estimator that removes
    * covariate imbalance a lucky/unlucky randomization leaves behind,
    * and the variance reduction stratification buys. Output: one row
    * per stratum (its own gap) plus the naive and post-stratified
    * ATEs with SE on every row. Exactness: outcomes are per-user
    * DECIMAL sums; per-(stratum, arm) moments stay decimal to the
    * 10-dp mean/variance boundary; the Σ_s over ≤ 3 strata runs in
    * identical double expressions. A stratum missing an arm nulls
    * the estimate (sum-skips-nulls would silently drop the stratum
    * — the guard makes the degenerate case explicit). Plan: one
    * user-keyed fold, one broadcast percentile pair, one ≤ 3×2-group
    * aggregate.
    */
  def qPoststratAte(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(12,2)")).otherwise(lit(0).cast("decimal(12,2)")))
          .as("y"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "treat").otherwise("ctrl"))
    val cuts = perUser.agg(
      expr("percentile(n_ev, 0.3333)").as("p33"),
      expr("percentile(n_ev, 0.6667)").as("p67"))
    val strat = perUser.crossJoin(broadcast(cuts))
      .withColumn("stratum",
        when(col("n_ev") <= col("p33"), "low")
          .when(col("n_ev") <= col("p67"), "mid").otherwise("high"))
    val cells = strat.groupBy(col("stratum"), col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("s"),
        sum(col("y").cast("decimal(18,2)") * col("y").cast("decimal(18,2)"))
          .as("q"))
    val mean = round(col("s").cast("double") / col("n"), 10)
    val vvar = round((col("q").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n")) /
      (col("n") - 1), 10)
    val wide = cells.groupBy(col("stratum")).agg(
      sum(col("n")).cast("long").as("n_s"),
      max(when(col("arm") === "treat", col("n"))).as("n_t"),
      max(when(col("arm") === "ctrl", col("n"))).as("n_c"),
      max(when(col("arm") === "treat", mean)).as("m_t"),
      max(when(col("arm") === "ctrl", mean)).as("m_c"),
      max(when(col("arm") === "treat", vvar)).as("v_t"),
      max(when(col("arm") === "ctrl", vvar)).as("v_c"))
    val tot = wide.agg(
      sum(col("n_s")).cast("long").as("n"),
      // a single-arm stratum has a NULL arm count: null > 0 is null,
      // and min() SKIPS nulls — coalesce to 0 so the degenerate
      // stratum vetoes the estimate instead of vanishing from the min
      min(coalesce((col("n_t") > 0 && col("n_c") > 0).cast("int"), lit(0)))
        .as("okmin"),
      sum(col("n_s").cast("double") * (col("m_t") - col("m_c"))).as("wdiff"),
      sum(col("n_s").cast("double") * col("n_s") *
        (col("v_t") / col("n_t") + col("v_c") / col("n_c"))).as("wvar"),
      sum(when(col("n_t") > 0, col("n_t") * col("m_t"))).as("st"),
      sum(col("n_t")).as("nt"),
      sum(when(col("n_c") > 0, col("n_c") * col("m_c"))).as("sc"),
      sum(col("n_c")).as("nc"))
    val ok = col("okmin") === 1
    val verdict = tot.select(col("n"),
      round(col("st") / col("nt") - col("sc") / col("nc"), 6).as("ate_naive"),
      when(ok, round(col("wdiff") / col("n"), 6))
        .otherwise(lit(null).cast("double")).as("ate_poststrat"),
      when(ok, round(sqrt(col("wvar")) / col("n"), 6))
        .otherwise(lit(null).cast("double")).as("se_poststrat"))
      .withColumn("significant", coalesce(
        abs(col("ate_poststrat")) > col("se_poststrat") * 1.96, lit(false)))
    wide.select(col("stratum"), col("n_s"), col("n_t"), col("n_c"),
        when(col("n_t") > 0 && col("n_c") > 0,
          round(col("m_t") - col("m_c"), 6))
          .otherwise(lit(null).cast("double")).as("stratum_gap"))
      .crossJoin(broadcast(verdict))
  }

  val qPoststratAteSql: String =
    """WITH pu AS (SELECT user_id, count(*) AS n_ev,
      |    sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(value AS DECIMAL(12,2))
      |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS y,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      % 2 = 0 THEN 'treat' ELSE 'ctrl' END AS arm
      |  FROM events GROUP BY user_id),
      |ct AS (SELECT quantile_cont(n_ev, 0.3333) AS p33,
      |    quantile_cont(n_ev, 0.6667) AS p67 FROM pu),
      |st AS (SELECT pu.*, CASE WHEN n_ev <= p33 THEN 'low'
      |    WHEN n_ev <= p67 THEN 'mid' ELSE 'high' END AS stratum
      |  FROM pu, ct),
      |cells AS (SELECT stratum, arm, count(*) AS n,
      |    sum(y) AS s,
      |    sum(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS q
      |  FROM st GROUP BY 1, 2),
      |m AS (SELECT stratum, arm, n,
      |    round(CAST(s AS DOUBLE) / n, 10) AS mean,
      |    round((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      |      / (n - 1), 10) AS v
      |  FROM cells),
      |wide AS (SELECT stratum, CAST(sum(n) AS BIGINT) AS n_s,
      |    max(CASE WHEN arm = 'treat' THEN n END) AS n_t,
      |    max(CASE WHEN arm = 'ctrl' THEN n END) AS n_c,
      |    max(CASE WHEN arm = 'treat' THEN mean END) AS m_t,
      |    max(CASE WHEN arm = 'ctrl' THEN mean END) AS m_c,
      |    max(CASE WHEN arm = 'treat' THEN v END) AS v_t,
      |    max(CASE WHEN arm = 'ctrl' THEN v END) AS v_c
      |  FROM m GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
      |    min(CASE WHEN n_t > 0 AND n_c > 0 THEN 1 ELSE 0 END) AS okmin,
      |    sum(CAST(n_s AS DOUBLE) * (m_t - m_c)) AS wdiff,
      |    sum(CAST(n_s AS DOUBLE) * n_s * (v_t / n_t + v_c / n_c)) AS wvar,
      |    sum(CASE WHEN n_t > 0 THEN n_t * m_t END) AS stt,
      |    CAST(sum(n_t) AS BIGINT) AS nt,
      |    sum(CASE WHEN n_c > 0 THEN n_c * m_c END) AS sc,
      |    CAST(sum(n_c) AS BIGINT) AS nc
      |  FROM wide),
      |v AS (SELECT n,
      |    round(stt / nt - sc / nc, 6) AS ate_naive,
      |    CASE WHEN okmin = 1 THEN round(wdiff / n, 6) END AS ate_poststrat,
      |    CASE WHEN okmin = 1 THEN round(sqrt(wvar) / n, 6) END AS se_poststrat
      |  FROM tot)
      |SELECT stratum, n_s, n_t, n_c,
      |  CASE WHEN n_t > 0 AND n_c > 0 THEN round(m_t - m_c, 6) END AS stratum_gap,
      |  n, ate_naive, ate_poststrat, se_poststrat,
      |  coalesce(abs(ate_poststrat) > se_poststrat * 1.96, false) AS significant
      |FROM wide, v""".stripMargin

  // ---------------------------------------------------------------- L26
  /** Jarque–Bera normality test of order totals per priority class —
    * the distributional-shape audit a pipeline runs before feeding an
    * amount column to anything that assumes Gaussian errors. One
    * grouped pass accumulates exact DECIMAL power sums of integer
    * cents (Σc, Σc², Σc³, Σc⁴ — the qCuped device, so no
    * summation-order-dependent double ever forms); skewness g1 =
    * m3/m2^1.5 and excess kurtosis g2 = m4/m2²−3 come from the
    * central-moment algebra over those exact sums, each 6-dp-rounded
    * BEFORE composing JB = n/6·(g1² + g2²/4) so both engines feed
    * identical IEEE inputs into identical arithmetic. m2 = 0
    * degenerates to NULL stats, never a divide error. Verdict against
    * the χ²(2) 95% critical value 5.991. Map-side-combined aggregate,
    * 5 groups at any scale.
    */
  def qJarqueBera(spark: SparkSession, dir: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val c0 = round(col("o_totalprice") * 100).cast("long")
    val agg = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), c0.as("c"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("c"))).as("s1"),
        sum(dec(col("c")) * dec(col("c"))).as("s2"),
        sum(dec(col("c")) * dec(col("c")) * dec(col("c"))).as("s3"),
        sum(dec(col("c")) * dec(col("c")) * dec(col("c")) * dec(col("c")))
          .as("s4"))
    val m = agg
      .withColumn("mu", col("s1").cast("double") / col("n"))
      .withColumn("m2", col("s2").cast("double") / col("n")
        - col("mu") * col("mu"))
      .withColumn("m3", col("s3").cast("double") / col("n")
        - lit(3.0) * col("mu") * (col("s2").cast("double") / col("n"))
        + lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", col("s4").cast("double") / col("n")
        - lit(4.0) * col("mu") * (col("s3").cast("double") / col("n"))
        + lit(6.0) * col("mu") * col("mu")
          * (col("s2").cast("double") / col("n"))
        - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      .withColumn("skewness", when(col("m2") <= 0, lit(null).cast("double"))
        .otherwise(round(col("m3") / sqrt(col("m2") * col("m2") * col("m2")), 6)))
      .withColumn("kurtosis_excess",
        when(col("m2") <= 0, lit(null).cast("double"))
          .otherwise(round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6)))
      .withColumn("jb", round(col("n") / lit(6.0)
        * (col("skewness") * col("skewness")
          + col("kurtosis_excess") * col("kurtosis_excess") / lit(4.0)), 4))
    m.select(col("priority"), col("n"),
      round(col("mu") / 100.0, 4).as("mean_price"),
      col("skewness"), col("kurtosis_excess"), col("jb"),
      coalesce(col("jb") > 5.991, lit(false)).as("normal_rejected"))
  }

  val qJarqueBeraSql: String =
    """WITH agg AS (SELECT o_orderpriority AS priority, count(*) AS n,
      |    sum(CAST(c AS HUGEINT)) AS s1,
      |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2,
      |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s3,
      |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
      |      * CAST(c AS HUGEINT)) AS s4
      |  FROM (SELECT o_orderpriority,
      |      CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders)
      |  GROUP BY 1),
      |m AS (SELECT priority, n, CAST(s1 AS DOUBLE) / n AS mu,
      |    CAST(s2 AS DOUBLE) / n, CAST(s3 AS DOUBLE) / n,
      |    CAST(s4 AS DOUBLE) / n FROM agg),
      |cm AS (SELECT priority, n, mu,
      |    (CAST(s2 AS DOUBLE) / n) - mu * mu AS m2,
      |    (CAST(s3 AS DOUBLE) / n) - 3.0 * mu * (CAST(s2 AS DOUBLE) / n)
      |      + 2.0 * mu * mu * mu AS m3,
      |    (CAST(s4 AS DOUBLE) / n) - 4.0 * mu * (CAST(s3 AS DOUBLE) / n)
      |      + 6.0 * mu * mu * (CAST(s2 AS DOUBLE) / n)
      |      - 3.0 * mu * mu * mu * mu AS m4
      |  FROM agg JOIN (SELECT priority AS p2, mu FROM m) ON priority = p2),
      |g AS (SELECT priority, n, mu,
      |    CASE WHEN m2 <= 0 THEN NULL
      |      ELSE round(m3 / sqrt(m2 * m2 * m2), 6) END AS skewness,
      |    CASE WHEN m2 <= 0 THEN NULL
      |      ELSE round(m4 / (m2 * m2) - 3.0, 6) END AS kurtosis_excess
      |  FROM cm),
      |j AS (SELECT *, round(n / 6.0 * (skewness * skewness
      |    + kurtosis_excess * kurtosis_excess / 4.0), 4) AS jb FROM g)
      |SELECT priority, n, round(mu / 100.0, 4) AS mean_price,
      |  skewness, kurtosis_excess, jb,
      |  coalesce(jb > 5.991, false) AS normal_rejected
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- L27
  /** Sample-ratio-mismatch monitor — the assignment-health check every
    * experimentation platform runs before reading any metric: users
    * hash into 10 md5 buckets that SHOULD be uniform; a chi-squared
    * goodness-of-fit against the uniform expectation flags a broken
    * randomizer (bot filtering, logging loss, allocation bugs). The
    * statistic stays EXACT integer arithmetic until one final
    * division: Σ(10·obs − n)² accumulates in longs, χ² =
    * that / (10n) — no per-bucket double ever sums. One user-level
    * distinct aggregate (the same md5 device as L3's arms), 10 groups
    * at any scale; verdict vs χ²(9) 95% critical value 16.919.
    */
  def qSrm(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("bucket",
        expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 10)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_users"))
    val n = buckets.agg(sum(col("n_users")).as("n"))
    val withN = buckets.crossJoin(broadcast(n))
    val chi = withN
      .withColumn("d", col("n_users") * 10 - col("n"))
      .agg(max(col("n")).as("n"), sum(col("d") * col("d")).as("ss"))
      .withColumn("chi2", round(col("ss") / (lit(10.0) * col("n")), 6))
    withN.crossJoin(broadcast(chi.select(col("chi2"))))
      .select(col("bucket"), col("n_users"),
        round(col("n_users") / col("n").cast("double"), 6).as("share"),
        col("chi2"),
        coalesce(col("chi2") > 16.919, lit(false)).as("srm_detected"))
  }

  val qSrmSql: String =
    """WITH b AS (SELECT
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 10
      |      AS bucket, count(*) AS n_users
      |  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
      |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM b),
      |c AS (SELECT round(CAST(sum((n_users * 10 - n) * (n_users * 10 - n))
      |    AS BIGINT) / (10.0 * max(n)), 6) AS chi2 FROM b, t)
      |SELECT bucket, n_users, round(n_users / CAST(n AS DOUBLE), 6) AS share,
      |  chi2, coalesce(chi2 > 16.919, false) AS srm_detected
      |FROM b, t, c""".stripMargin

  // ---------------------------------------------------------------- L28
  /** Friedman rank test — the nonparametric repeated-measures ANOVA:
    * does order priority shift spend consistently ACROSS nations
    * (blocks), without assuming normality? Each complete block (a
    * nation with orders in all 5 priorities — incomplete blocks are
    * excluded, the standard complete-block design) ranks its 5
    * priority cells by mean order value; rank sums R_j feed Q =
    * 12·ΣR²/(nk(k+1)) − 3n(k+1). Ranks come from row_number over
    * (mean DESC, priority ASC) — cell means are CAST(exact-decimal-
    * sum AS DOUBLE)/n, identical IEEE in both engines, and the
    * priority tiebreak pins equal doubles deterministically (ties
    * take consecutive ranks rather than midranks; same convention
    * both engines, stated simplification). Everything else is exact
    * integer arithmetic until the single final division. Two keyed
    * aggregates (125 cells max), bounded everything; verdict vs
    * χ²(4) 9.488.
    */
  def qFriedman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("block"),
        col("o_orderpriority").as("priority"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")
        .cast("decimal(38,0)")).as("sc"), count(lit(1)).as("nc"))
      .withColumn("mean_v", col("sc").cast("double") / col("nc"))
    val complete = cells
      .withColumn("k", count(lit(1)).over(Window.partitionBy(col("block"))))
      .filter(col("k") === 5)
    val ranked = complete.withColumn("rk",
      row_number().over(Window.partitionBy(col("block"))
        .orderBy(col("mean_v").desc, col("priority").asc)))
    val rsum = ranked.groupBy(col("priority"))
      .agg(sum(col("rk")).as("rank_sum"), count(lit(1)).as("n_blocks"))
    val q = rsum.agg(max(col("n_blocks")).as("n"),
      sum(col("rank_sum") * col("rank_sum")).as("ssr"))
      .withColumn("q_stat", round(lit(12.0) * col("ssr")
        / (col("n") * 5 * 6) - lit(3.0) * col("n") * 6, 6))
    rsum.crossJoin(broadcast(q.select(col("n"), col("q_stat"))))
      .select(col("priority"), col("rank_sum"),
        round(col("rank_sum") / col("n").cast("double"), 6).as("mean_rank"),
        col("n").as("n_blocks"), col("q_stat"),
        coalesce(col("q_stat") > 9.488, lit(false)).as("significant"))
  }

  val qFriedmanSql: String =
    """WITH cells AS (SELECT c_nationkey AS block, o_orderpriority AS priority,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |      / count(*) AS mean_v
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |complete AS (SELECT *, count(*) OVER (PARTITION BY block) AS k
      |  FROM cells),
      |ranked AS (SELECT block, priority, row_number() OVER (
      |    PARTITION BY block ORDER BY mean_v DESC, priority ASC) AS rk
      |  FROM complete WHERE k = 5),
      |rsum AS (SELECT priority, CAST(sum(rk) AS BIGINT) AS rank_sum,
      |    count(*) AS n_blocks FROM ranked GROUP BY 1),
      |q AS (SELECT max(n_blocks) AS n,
      |    round(12.0 * sum(rank_sum * rank_sum) / (max(n_blocks) * 5 * 6)
      |      - 3.0 * max(n_blocks) * 6, 6) AS q_stat
      |  FROM rsum)
      |SELECT priority, rank_sum,
      |  round(rank_sum / CAST(n AS DOUBLE), 6) AS mean_rank,
      |  n AS n_blocks, q_stat,
      |  coalesce(q_stat > 9.488, false) AS significant
      |FROM rsum, q""".stripMargin

  // ---------------------------------------------------------------- L29
  /** Fisher's exact test on the 2×2 (lang = 'en') × (doc length above
    * the corpus mean) contingency table — the small-cell-safe
    * independence test (L15's Cramér's V and E15's χ² both lean on
    * asymptotics that die when a cell is sparse). Two-sided p sums
    * every hypergeometric table probability ≤ p_observed·(1+1e-7).
    *
    * The float discipline that makes this oracle-exact: ln and exp
    * are bit-identical across engines (verified:
    * `ln(7919)`/`exp(-17.38…)` produce the same IEEE bits, as does a
    * 5000-term ascending ln-factorial fold), so p_obs and p_kmin come
    * from ln-factorial sums evaluated as ASCENDING folds, and the
    * rest of the k-range follows the hypergeometric RECURRENCE
    * p_{k+1} = p_k·(r1−k)(c1−k)/((k+1)(r2−c1+k+1)) — identical
    * operation order on both sides (Spark: one `aggregate()` HOF
    * fold; DuckDB: a recursive CTE, the same pairing as F48). The
    * recurrence makes the sweep O(range), not O(range·n) — no
    * quadratic factorial re-evaluation. Everything runs on ONE
    * broadcast row after a single corpus aggregate; lnfact folds are
    * O(n) scalar work on that row.
    */
  def qFisherExact(spark: SparkSession, dir: String): DataFrame = {
    // lnfact(m) as an ascending fold; m = 0 (empty cell) is exact 0
    def lf(e: String) =
      s"""(case when ($e) < 1 then cast(0.0 as double)
         |  else aggregate(sequence(1L, cast($e as long)),
         |    cast(0.0 as double), (acc, i) -> acc + ln(cast(i as double)))
         |  end)""".stripMargin
    def lnp(ka: String) =
      s"""(${lf("r1")} + ${lf("r2")} + ${lf("c1")} + ${lf("n - c1")}
         | - ${lf("n")} - ${lf(ka)} - ${lf(s"r1 - ($ka)")}
         | - ${lf(s"c1 - ($ka)")} - ${lf(s"r2 - c1 + ($ka)")})""".stripMargin
    val docs = Tables.documents(spark, dir)
    val tot = docs.agg(count(lit(1)).as("nd"),
      sum(col("n_chars")).as("tc"))
    val cells = docs.crossJoin(broadcast(tot))
      .select((col("lang") === "en").as("en"),
        (col("n_chars") * col("nd") > col("tc")).as("long_doc"))
      .agg(
        sum(when(col("en") && col("long_doc"), 1L).otherwise(0L)).as("a"),
        sum(when(col("en") && !col("long_doc"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("en") && col("long_doc"), 1L).otherwise(0L)).as("cc"),
        sum(when(!col("en") && !col("long_doc"), 1L).otherwise(0L)).as("d"))
      .withColumn("r1", col("a") + col("b"))
      .withColumn("r2", col("cc") + col("d"))
      .withColumn("c1", col("a") + col("cc"))
      .withColumn("n", col("r1") + col("r2"))
      .withColumn("kmin", greatest(lit(0L), col("c1") - col("r2")))
      .withColumn("kmax", least(col("r1"), col("c1")))
    val p = cells
      .withColumn("pobs", expr(s"exp(${lnp("a")})"))
      .withColumn("p0", expr(s"exp(${lnp("kmin")})"))
      .withColumn("ptot", expr(
        """case when kmax <= kmin
          |  then (case when p0 <= pobs * 1.0000001 then p0
          |        else cast(0.0 as double) end)
          |  else aggregate(sequence(kmin + 1L, kmax),
          |    named_struct('pk', p0,
          |      'tot', case when p0 <= pobs * 1.0000001 then p0
          |             else cast(0.0 as double) end),
          |    (acc, k) -> named_struct(
          |      'pk', acc.pk * (r1 - k + 1) / k * (c1 - k + 1)
          |            / (r2 - c1 + k),
          |      'tot', acc.tot
          |        + (case when acc.pk * (r1 - k + 1) / k * (c1 - k + 1)
          |                  / (r2 - c1 + k) <= pobs * 1.0000001
          |           then acc.pk * (r1 - k + 1) / k * (c1 - k + 1)
          |                / (r2 - c1 + k)
          |           else cast(0.0 as double) end)),
          |    acc -> acc.tot) end""".stripMargin))
    p.select(col("a"), col("b"), col("cc").as("c"), col("d"),
      when(col("b") * col("cc") > 0,
        round(col("a") * col("d") / (col("b") * col("cc")).cast("double"), 6))
        .as("odds_ratio"),
      round(least(col("ptot"), lit(1.0)), 8).as("p_value"),
      (least(col("ptot"), lit(1.0)) < 0.05).as("significant"))
  }

  val qFisherExactSql: String = {
    def lf(e: String) =
      s"""(CASE WHEN ($e) < 1 THEN CAST(0.0 AS DOUBLE)
         |  ELSE list_reduce(list_transform(generate_series(1, CAST($e AS BIGINT)),
         |    i -> ln(CAST(i AS DOUBLE))), (acc, x) -> acc + x)
         |  END)""".stripMargin
    def lnp(ka: String) =
      s"""(${lf("r1")} + ${lf("r2")} + ${lf("c1")} + ${lf("n - c1")}
         | - ${lf("n")} - ${lf(ka)} - ${lf(s"r1 - ($ka)")}
         | - ${lf(s"c1 - ($ka)")} - ${lf(s"r2 - c1 + ($ka)")})""".stripMargin
    s"""WITH RECURSIVE
      |tot AS (SELECT count(*) AS nd, CAST(sum(n_chars) AS BIGINT) AS tc
      |  FROM documents),
      |cells AS (SELECT
      |    CAST(sum(CASE WHEN lang = 'en' AND n_chars * nd > tc
      |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN lang = 'en' AND NOT n_chars * nd > tc
      |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars * nd > tc
      |      THEN 1 ELSE 0 END) AS BIGINT) AS cc,
      |    CAST(sum(CASE WHEN lang <> 'en' AND NOT n_chars * nd > tc
      |      THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM documents, tot),
      |marg AS (SELECT *, a + b AS r1, cc + d AS r2, a + cc AS c1,
      |    a + b + cc + d AS n FROM cells),
      |km AS (SELECT *, greatest(0, c1 - r2) AS kmin, least(r1, c1) AS kmax,
      |    exp(${lnp("a")}) AS pobs,
      |    exp(${lnp("kmin")}) AS p0
      |  FROM marg),
      |sweep(k, pk, ptot) AS (
      |  SELECT kmin, p0,
      |    CASE WHEN p0 <= pobs * 1.0000001 THEN p0 ELSE CAST(0.0 AS DOUBLE) END
      |  FROM km
      |  UNION ALL
      |  SELECT s.k + 1,
      |    s.pk * (m.r1 - (s.k + 1) + 1) / (s.k + 1) * (m.c1 - (s.k + 1) + 1)
      |      / (m.r2 - m.c1 + (s.k + 1)),
      |    s.ptot + (CASE WHEN s.pk * (m.r1 - (s.k + 1) + 1) / (s.k + 1)
      |        * (m.c1 - (s.k + 1) + 1) / (m.r2 - m.c1 + (s.k + 1))
      |        <= m.pobs * 1.0000001
      |      THEN s.pk * (m.r1 - (s.k + 1) + 1) / (s.k + 1)
      |        * (m.c1 - (s.k + 1) + 1) / (m.r2 - m.c1 + (s.k + 1))
      |      ELSE CAST(0.0 AS DOUBLE) END)
      |  FROM sweep s, km m WHERE s.k < m.kmax)
      |SELECT a, b, cc AS c, d,
      |  CASE WHEN b * cc > 0
      |    THEN round(a * d / CAST(b * cc AS DOUBLE), 6) END AS odds_ratio,
      |  round(least(ptot, 1.0), 8) AS p_value,
      |  least(ptot, 1.0) < 0.05 AS significant
      |FROM km, sweep WHERE sweep.k = km.kmax""".stripMargin
  }

  // ---------------------------------------------------------------- L31
  /** Cochran–Armitage trend test — does the fulfilled-order proportion
    * move MONOTONICALLY with order priority? The omnibus tests (L15,
    * A44's residuals) answer "is status independent of priority"; the
    * trend test spends its single degree of freedom on the ordered
    * alternative, which is what a dose-response / severity-graded
    * readout actually asks. Scores w_i = the priority's leading digit
    * (1..5). T = Σw_i·r_i − R·(Σw_i·n_i)/N, Var(T) =
    * R(N−R)/(N(N−1))·(Σn_i·w_i² − (Σn_i·w_i)²/N), z = T/√Var — every
    * sum an exact small-integer aggregate (w ≤ 5, so Σn·w² ≤ 25N
    * stays exact far past any corpus size; the one margin product
    * R·(N−R) stays in-range to N ≈ 6·10⁹ rows — past that, lift it
    * through DECIMAL exactly as A44 does), the divisions written in
    * the identical order on both engines, 6-dp publish. One grouped
    * aggregate (5 cells) + scalar algebra on a broadcast row; verdict
    * |z| > 1.96.
    */
  def qCochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .groupBy(substring(col("o_orderpriority"), 1, 1).cast("long").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("r"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("r")).as("rr"),
      sum(col("w") * col("n")).as("swn"),
      sum(col("w") * col("w") * col("n")).as("swwn"),
      sum(col("w") * col("r")).as("swr"))
      .withColumn("t_stat", col("swr") - col("rr") * (col("swn")
        / col("nn").cast("double")))
      .withColumn("var_t", (col("rr") * (col("nn") - col("rr"))
        / (col("nn").cast("double") * (col("nn") - 1)))
        * (col("swwn") - col("swn") * (col("swn") / col("nn").cast("double"))))
      .withColumn("z", when(col("var_t") <= 0, lit(null).cast("double"))
        .otherwise(round(col("t_stat") / sqrt(col("var_t")), 6)))
    g.crossJoin(broadcast(tot.select(col("z"))))
      .select(col("w").as("priority_rank"), col("n"), col("r").as("fulfilled"),
        round(col("r") / col("n").cast("double"), 6).as("rate"),
        col("z"), coalesce(abs(col("z")) > 1.96, lit(false)).as("trend"))
  }

  val qCochranArmitageSql: String =
    """WITH g AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
      |    count(*) AS n,
      |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr,
      |    CAST(sum(w * n) AS BIGINT) AS swn,
      |    CAST(sum(w * w * n) AS BIGINT) AS swwn,
      |    CAST(sum(w * r) AS BIGINT) AS swr
      |  FROM g),
      |s AS (SELECT swr - rr * (swn / CAST(nn AS DOUBLE)) AS t_stat,
      |    (rr * (nn - rr) / (CAST(nn AS DOUBLE) * (nn - 1)))
      |      * (swwn - swn * (swn / CAST(nn AS DOUBLE))) AS var_t
      |  FROM t),
      |z AS (SELECT CASE WHEN var_t <= 0 THEN CAST(NULL AS DOUBLE)
      |    ELSE round(t_stat / sqrt(var_t), 6) END AS z FROM s)
      |SELECT w AS priority_rank, n, r AS fulfilled,
      |  round(r / CAST(n AS DOUBLE), 6) AS rate,
      |  z, coalesce(abs(z) > 1.96, false) AS trend
      |FROM g, z""".stripMargin

  // ---------------------------------------------------------------- L32
  /** Tukey HSD post-hoc — the pairwise step L18's ANOVA verdict
    * demands next: F > crit says "SOME segment differs"; HSD says
    * WHICH pairs, with the studentized-range correction that keeps
    * the familywise error at 5% across all k(k−1)/2 comparisons
    * (10 naive t-tests at α=.05 ≈ 40% familywise false-positive
    * rate). Tukey–Kramer form for unequal n: q_ij = |m_i − m_j| /
    * √(MSW/2·(1/n_i + 1/n_j)), cut at q(k=5, df=∞, .05) = 3.858.
    * Same exact-cents machinery as L18: per-group (n, Σc, Σc²) in
    * DECIMAL(38,0), MSW and the 10 pair statistics one identical
    * double expression over the ≤ k group rows (q is scale-free, so
    * cents cancel; only the published mean_diff converts to
    * dollars), verdict cuts the ROUNDED q. One corpus scan → k group
    * rows → broadcast self-cross — pair work is k², never corpus².
    */
  def qTukeyHsd(spark: SparkSession, dir: String): DataFrame = {
    val cents = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
    val grp = cents.groupBy(col("seg")).agg(
      count(lit(1)).as("n_g"),
      sum(col("c").cast("decimal(38,0)")).as("s_g"),
      sum((col("c") * col("c")).cast("decimal(38,0)")).as("q_g"))
    val tot = grp.agg(
      count(lit(1)).as("k"),
      sum(col("n_g")).cast("long").as("n"),
      sum(col("q_g")).as("q"),
      sum(col("s_g").cast("double") * col("s_g").cast("double") /
        col("n_g")).as("sgrp"))
      .select(col("k"), col("n"),
        ((col("q").cast("double") - col("sgrp")) / (col("n") - col("k")))
          .as("msw"))
    val a = grp.select(col("seg").as("seg_a"), col("n_g").as("n_a"),
      (col("s_g").cast("double") / col("n_g")).as("m_a"))
    val b = grp.select(col("seg").as("seg_b"), col("n_g").as("n_b"),
      (col("s_g").cast("double") / col("n_g")).as("m_b"))
    a.crossJoin(broadcast(b)).filter(col("seg_a") < col("seg_b"))
      .crossJoin(broadcast(tot))
      .withColumn("q_stat", round(abs(col("m_a") - col("m_b")) /
        sqrt(col("msw") / 2.0 *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        round((col("m_a") - col("m_b")) / 100.0, 6).as("mean_diff_dollars"),
        col("q_stat"), (col("q_stat") > 3.858).as("significant"))
  }

  val qTukeyHsdSql: String =
    """WITH cents AS (SELECT c_mktsegment AS seg,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |grp AS (SELECT seg, count(*) AS n_g,
      |    CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS s_g,
      |    CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q_g
      |  FROM cents GROUP BY 1),
      |tot AS (SELECT count(*) AS k, CAST(sum(n_g) AS BIGINT) AS n,
      |    sum(q_g) AS q,
      |    sum(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / n_g) AS sgrp
      |  FROM grp),
      |m AS (SELECT k, n,
      |    (CAST(q AS DOUBLE) - sgrp) / (n - k) AS msw FROM tot),
      |p AS (SELECT a.seg AS seg_a, b.seg AS seg_b, a.n_g AS n_a,
      |    b.n_g AS n_b,
      |    CAST(a.s_g AS DOUBLE) / a.n_g AS m_a,
      |    CAST(b.s_g AS DOUBLE) / b.n_g AS m_b
      |  FROM grp a CROSS JOIN grp b WHERE a.seg < b.seg)
      |SELECT seg_a, seg_b, n_a, n_b,
      |  round((m_a - m_b) / 100.0, 6) AS mean_diff_dollars,
      |  round(abs(m_a - m_b) / sqrt(msw / 2.0 * (1.0 / n_a + 1.0 / n_b)), 6)
      |    AS q_stat,
      |  (round(abs(m_a - m_b) / sqrt(msw / 2.0 * (1.0 / n_a + 1.0 / n_b)), 6)
      |    > 3.858) AS significant
      |FROM p, m""".stripMargin

  // ---------------------------------------------------------------- L33
  /** Difference-in-differences — the quasi-experimental estimator for
    * when there IS no randomized assignment (L3/L25 assume one): did
    * the BUILDING segment's spend move differently from MACHINERY's
    * across the 1996-01-01 boundary? DiD = (m_T,post − m_T,pre) −
    * (m_C,post − m_C,pre) nets out both the stable segment gap and
    * the common time shock — the parallel-trends identification.
    * Exact-cents device throughout: the four cell means come from
    * DECIMAL(38,0) cent sums; the DiD point estimate and its
    * four-cell Welch-style SE (√Σ s²_cell/n_cell, s² from exact
    * moments) are one identical double expression over the 4 cell
    * rows; verdict cuts the ROUNDED |z| at 1.96. One corpus scan →
    * 4 cells → scalar algebra; output one row with all four cell
    * means (the parallel-trends readout a reviewer checks first).
    */
  def qDid(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(
        (col("c_mktsegment") === "BUILDING").as("treated"),
        (col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date"))
          .as("post"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy(col("treated"), col("post"))
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast("decimal(38,0)")).as("s"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("q"))
      .withColumn("m", col("s").cast("double") / col("n"))
      .withColumn("v", (col("q").cast("double") -
        col("s").cast("double") * col("s").cast("double") / col("n")) /
        (col("n") - 1))
    val row = cells.agg(
      max(when(col("treated") && col("post"), col("m"))).as("m_tp"),
      max(when(col("treated") && !col("post"), col("m"))).as("m_t0"),
      max(when(!col("treated") && col("post"), col("m"))).as("m_cp"),
      max(when(!col("treated") && !col("post"), col("m"))).as("m_c0"),
      sum(col("v") / col("n")).as("var_did"),
      sum(col("n")).cast("long").as("n_total"))
    row.select(
      round(col("m_tp") / 100.0, 6).as("mean_treated_post"),
      round(col("m_t0") / 100.0, 6).as("mean_treated_pre"),
      round(col("m_cp") / 100.0, 6).as("mean_control_post"),
      round(col("m_c0") / 100.0, 6).as("mean_control_pre"),
      round((col("m_tp") - col("m_t0") - (col("m_cp") - col("m_c0")))
        / 100.0, 6).as("did_dollars"),
      round((col("m_tp") - col("m_t0") - (col("m_cp") - col("m_c0"))) /
        sqrt(col("var_did")), 6).as("z"),
      col("n_total"))
      .withColumn("significant", abs(col("z")) > 1.96)
  }

  val qDidSql: String =
    """WITH cells AS (SELECT
      |    (c_mktsegment = 'BUILDING') AS treated,
      |    (CAST(o_orderdate AS DATE) >= DATE '1996-01-01') AS post,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS HUGEINT)
      |      AS s,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS HUGEINT)) AS HUGEINT) AS q
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |  GROUP BY 1, 2),
      |mv AS (SELECT treated, post, n, CAST(s AS DOUBLE) / n AS m,
      |    (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      |      / (n - 1) AS v
      |  FROM cells),
      |agg AS (SELECT
      |    max(CASE WHEN treated AND post THEN m END) AS m_tp,
      |    max(CASE WHEN treated AND NOT post THEN m END) AS m_t0,
      |    max(CASE WHEN NOT treated AND post THEN m END) AS m_cp,
      |    max(CASE WHEN NOT treated AND NOT post THEN m END) AS m_c0,
      |    sum(v / n) AS var_did,
      |    CAST(sum(n) AS BIGINT) AS n_total
      |  FROM mv)
      |SELECT round(m_tp / 100.0, 6) AS mean_treated_post,
      |  round(m_t0 / 100.0, 6) AS mean_treated_pre,
      |  round(m_cp / 100.0, 6) AS mean_control_post,
      |  round(m_c0 / 100.0, 6) AS mean_control_pre,
      |  round((m_tp - m_t0 - (m_cp - m_c0)) / 100.0, 6) AS did_dollars,
      |  round((m_tp - m_t0 - (m_cp - m_c0)) / sqrt(var_did), 6) AS z,
      |  n_total,
      |  (abs(round((m_tp - m_t0 - (m_cp - m_c0)) / sqrt(var_did), 6)) > 1.96)
      |    AS significant
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L34
  /** Cohen's d / Hedges' g effect size — the magnitude readout
    * L23's Welch t-test verdict is missing: at corpus scale
    * EVERYTHING is "significant" (t grows with √n), so the decision
    * input is the standardized effect size, which does not. Same
    * md5-bit A/B arms and exact-cents machinery as L23: per-arm
    * (n, Σc, Σc²) in DECIMAL(38,0), pooled SD from the two exact
    * variance numerators, d = (mean_a − mean_b)/s_pooled and the
    * small-sample Hedges correction g = d·(1 − 3/(4(n_a+n_b)−9)) as
    * single double expressions over exact integers, 6-dp published.
    * The magnitude label cuts the ROUNDED |d| at the conventional
    * .2/.5/.8 — verdict and statistic can never disagree. One corpus
    * scan → 2 group rows → broadcast cross; O(1) after the scan.
    */
  def qCohensD(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = spend.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast("decimal(38,0)")).as("s"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    // exact variance NUMERATORS (n·Σc² − (Σc)²), doubles only at the
    // final combined expression
    val ssA = col("q_a").cast("double") -
      col("s_a").cast("double") * col("s_a").cast("double") / col("n_a")
    val ssB = col("q_b").cast("double") -
      col("s_b").cast("double") * col("s_b").cast("double") / col("n_b")
    val sPooled = sqrt((ssA + ssB) / (col("n_a") + col("n_b") - 2))
    val d = (col("s_a").cast("double") / col("n_a") -
      col("s_b").cast("double") / col("n_b")) / sPooled
    a.crossJoin(broadcast(b))
      .withColumn("cohens_d", round(d, 6))
      .withColumn("hedges_g", round(
        d * (lit(1.0) - lit(3.0) / (lit(4.0) * (col("n_a") + col("n_b")) - 9)),
        6))
      .select(col("n_a"), col("n_b"),
        round((col("s_a").cast("double") / col("n_a") -
          col("s_b").cast("double") / col("n_b")) / 100, 6).as("mean_diff"),
        col("cohens_d"), col("hedges_g"),
        when(abs(col("cohens_d")) < 0.2, "negligible")
          .when(abs(col("cohens_d")) < 0.5, "small")
          .when(abs(col("cohens_d")) < 0.8, "medium")
          .otherwise("large").as("magnitude"))
  }

  val qCohensDSql: String =
    """WITH spend AS (SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |armed AS (SELECT cents,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm
      |  FROM spend),
      |arms AS (SELECT arm, count(*) AS n,
      |    sum(CAST(cents AS HUGEINT)) AS s,
      |    sum(CAST(cents AS HUGEINT) * cents) AS q
      |  FROM armed GROUP BY 1),
      |a AS (SELECT n AS n_a, s AS s_a, q AS q_a FROM arms WHERE arm = 'A'),
      |b AS (SELECT n AS n_b, s AS s_b, q AS q_b FROM arms WHERE arm = 'B'),
      |x AS (SELECT n_a, n_b,
      |    CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a
      |      AS ss_a,
      |    CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b
      |      AS ss_b,
      |    CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS md
      |  FROM a, b),
      |e AS (SELECT n_a, n_b, md,
      |    round(md / sqrt((ss_a + ss_b) / (n_a + n_b - 2)), 6) AS cohens_d,
      |    round(md / sqrt((ss_a + ss_b) / (n_a + n_b - 2))
      |      * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9)), 6) AS hedges_g
      |  FROM x)
      |SELECT n_a, n_b, round(md / 100, 6) AS mean_diff, cohens_d, hedges_g,
      |  CASE WHEN abs(cohens_d) < 0.2 THEN 'negligible'
      |    WHEN abs(cohens_d) < 0.5 THEN 'small'
      |    WHEN abs(cohens_d) < 0.8 THEN 'medium'
      |    ELSE 'large' END AS magnitude
      |FROM e""".stripMargin

  // ---------------------------------------------------------------- L35
  /** t-closeness — the third rung of the privacy-audit ladder after
    * L7's k-anonymity (class size) and L12's l-diversity (distinct
    * sensitive values): a class can be large AND diverse yet still
    * leak if its sensitive-value DISTRIBUTION differs sharply from
    * the corpus's (an attacker's posterior moves by the gap). For
    * the ORDERED sensitive attribute (account-balance band, 11 fixed
    * $1000 bins) the distance is the ordinal Earth-Mover's Distance:
    * t_g = Σᵢ |Σ_{j≤i}(p_gj − p_j)| / (m−1). ENGINE-EXACT device:
    * the per-bin gap scales to the integer n_gb·N − N_b·n_g, the
    * cumulative sum runs over the FIXED bin order (integer cumsum —
    * order-free), and t is ONE double division of the exact |·| sum
    * by N·n_g·(m−1), 6-dp published. Class×bin grid is bounded
    * (≤ nations×segments×11) and built by sequence-explode — no
    * corpus-side work after the two grouped counts (one scan each,
    * AQE-broadcast back). Verdict cuts the ROUNDED t at 0.25.
    */
  def qTCloseness(spark: SparkSession, dir: String): DataFrame = {
    val bins = 11
    val banded = Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        least(greatest(
          floor((round(col("c_acctbal") * 100).cast("long") + 100000L)
            / 100000L), lit(0L)), lit(bins - 1L)).cast("int").as("band"))
    // ONE corpus aggregate — the (class × band) cube is bounded
    // (≤ nations·segments·11 rows); total, global, and class counts
    // all derive from it, so the customer table is scanned once
    // (uncubed, the four consumers each replayed the scan)
    val cube = banded.groupBy(col("c_nationkey"), col("c_mktsegment"),
      col("band")).agg(count(lit(1)).as("n_gb")).cache()
    val total = cube.agg(sum(col("n_gb")).as("n_total"))
    val global = cube.groupBy(col("band")).agg(sum(col("n_gb")).as("nb"))
    val cls = cube.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("n_gb")).as("n_g"))
    val perBand = cube
    val grid = cls
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
        explode(sequence(lit(0), lit(bins - 1))).as("band"))
      .join(perBand, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .join(broadcast(global), Seq("band"), "left")
      .crossJoin(broadcast(total))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
        col("band"), col("n_total"),
        (coalesce(col("n_gb"), lit(0L)) * col("n_total") -
          coalesce(col("nb"), lit(0L)) * col("n_g")).as("gap"))
    val wCum = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum", sum(col("gap")).over(wCum))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
        col("n_total"))
      .agg(sum(abs(col("cum"))).as("emd_scaled"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n_g"),
        round(col("emd_scaled") /
          (col("n_total").cast("double") * col("n_g") * (bins - 1)), 6)
          .as("t_close"))
      .withColumn("t_ok", col("t_close") <= 0.25)
  }

  val qTClosenessSql: String =
    """WITH banded AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(least(greatest(
      |      (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000,
      |      0), 10) AS INTEGER) AS band
      |  FROM customer),
      |tot AS (SELECT count(*) AS n FROM banded),
      |gdist AS (SELECT band, count(*) AS nb FROM banded GROUP BY 1),
      |cls AS (SELECT c_nationkey, c_mktsegment, count(*) AS n_g
      |  FROM banded GROUP BY 1, 2),
      |per_band AS (SELECT c_nationkey, c_mktsegment, band, count(*) AS n_gb
      |  FROM banded GROUP BY 1, 2, 3),
      |grid AS (SELECT c.c_nationkey, c.c_mktsegment, c.n_g, s.band,
      |    coalesce(p.n_gb, 0) * t.n - coalesce(g.nb, 0) * c.n_g AS gap
      |  FROM cls c
      |  CROSS JOIN (SELECT unnest(generate_series(0, 10)) AS band) s
      |  CROSS JOIN tot t
      |  LEFT JOIN per_band p ON p.c_nationkey = c.c_nationkey
      |    AND p.c_mktsegment = c.c_mktsegment AND p.band = s.band
      |  LEFT JOIN gdist g ON g.band = s.band),
      |cum AS (SELECT c_nationkey, c_mktsegment, n_g,
      |    sum(gap) OVER (PARTITION BY c_nationkey, c_mktsegment
      |      ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cum_gap
      |  FROM grid),
      |emd AS (SELECT c_nationkey, c_mktsegment, n_g,
      |    sum(abs(cum_gap)) AS emd_scaled
      |  FROM cum GROUP BY 1, 2, 3)
      |SELECT c_nationkey, c_mktsegment, n_g,
      |  round(emd_scaled / (CAST((SELECT n FROM tot) AS DOUBLE) * n_g * 10), 6)
      |    AS t_close,
      |  round(emd_scaled / (CAST((SELECT n FROM tot) AS DOUBLE) * n_g * 10), 6)
      |    <= 0.25 AS t_ok
      |FROM emd""".stripMargin

  // ---------------------------------------------------------------- L36
  /** Wald's SPRT (1945) — the SEQUENTIAL verdict the L3/L23 batch
    * tests can't give: an experiment monitor wants to STOP as soon as
    * the evidence is decisive, not at a fixed horizon. H0: purchase
    * share p = .25 vs H1: p = .35, α = β = .05. Per event the
    * log-likelihood-ratio increment is a CONSTANT (ln(p1/p0) on
    * success, ln(q1/q0) on failure), so the day-t LLR is S_t·L1 +
    * F_t·L0 — two exact-integer cumulative counts times two double
    * LITERALS (17-significant-digit decimal constants parse to the
    * identical IEEE double in both engines; no engine libm ln() ever
    * runs), one fixed-order two-term expression. Decision bands at
    * ±ln((1−β)/α) = ±2.9444389791664403. The day table is
    * observation-window-bounded; cumsums are integer window sums over
    * the fixed day order. Publishes the full monitoring trace (day,
    * S, F, llr, decision) plus `decided_by` — the first decisive day
    * — on every row.
    */
  def qSprt(spark: SparkSession, dir: String): DataFrame = {
    // ln(0.35/0.25), ln(0.65/0.75), ln(19) as exact decimal literals
    val l1 = 0.33647223662121289
    val l0 = -0.14310084364067338
    val band = 2.9444389791664403
    val daily = Tables.events(spark, dir)
      .select(expr("(ts DIV 1000000000) DIV 86400").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("hit"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("trials"), sum(col("hit")).as("hits"))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trace = daily
      .withColumn("s_cum", sum(col("hits")).over(w))
      .withColumn("f_cum", sum(col("trials") - col("hits")).over(w))
      .withColumn("llr",
        round(col("s_cum") * lit(l1) + col("f_cum") * lit(l0), 6))
      .withColumn("decision",
        when(col("llr") >= band, "accept_h1")
          .when(col("llr") <= -band, "accept_h0")
          .otherwise("continue"))
    val firstDecided = trace.filter(col("decision") =!= "continue")
      .agg(min(col("day")).as("decided_by"))
    trace.crossJoin(broadcast(firstDecided))
      .select(col("day"), col("s_cum"), col("f_cum"), col("llr"),
        col("decision"), col("decided_by"))
  }

  val qSprtSql: String =
    s"""WITH daily AS (SELECT
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    count(*) AS trials,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS hits
      |  FROM events GROUP BY 1),
      |trace AS (SELECT day,
      |    CAST(sum(hits) OVER w AS BIGINT) AS s_cum,
      |    CAST(sum(trials - hits) OVER w AS BIGINT) AS f_cum
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |scored AS (SELECT day, s_cum, f_cum,
      |    round(s_cum * CAST(0.33647223662121289 AS DOUBLE)
      |      + f_cum * CAST(-0.14310084364067338 AS DOUBLE), 6) AS llr
      |  FROM trace),
      |dec AS (SELECT *, CASE
      |    WHEN llr >= 2.9444389791664403 THEN 'accept_h1'
      |    WHEN llr <= -2.9444389791664403 THEN 'accept_h0'
      |    ELSE 'continue' END AS decision
      |  FROM scored),
      |fd AS (SELECT min(day) AS decided_by FROM dec
      |  WHERE decision <> 'continue')
      |SELECT day, s_cum, f_cum, llr, decision, decided_by
      |FROM dec, fd""".stripMargin

  // ---------------------------------------------------------------- L37
  /** Cochran's Q (1950) — the k-treatment CORRELATED-binary test
    * completing the family around L24 (McNemar is its k=2 case) and
    * L28 (Friedman is its ordinal sibling): were customers equally
    * likely to be active in 1996, 1997, and 1998, given that the
    * SAME customer appears in every column? Q = (k−1)·[k·ΣC_j² − T²]
    * / (k·T − ΣR_i²) with R_i the per-customer row sum and C_j the
    * per-year actives, χ²₂(.05) = 5.991. ENGINE-EXACT: every moment
    * is an integer count (row sums bounded by k, so ΣR² is exact),
    * Q is ONE double division of exact integers rounded at 6 dp, and
    * the verdict cuts the ROUNDED Q. All-zero subjects provably
    * cancel (they move neither C, T, nor the denominators), so the
    * population choice — distinct ordering customers — is invariant.
    * Two bounded aggregates over one (customer, year) distinct; at
    * 100 TB the distinct is the only shuffle and keys on customer.
    */
  def qCochranQ(spark: SparkSession, dir: String): DataFrame = {
    // cached: the distinct (customer, year) frame feeds BOTH the
    // row-sum and the column-total aggregates — one orders scan
    val cy = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("date")).as("yr"))
      .filter(col("yr").between(1996, 1998))
      .distinct()
      .cache()
    val r = cy.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("ri"))
      .agg(sum(col("ri")).as("t"),
        sum(col("ri") * col("ri")).as("r2"),
        count(lit(1)).as("n_subjects"))
    val cj = cy.groupBy(col("yr")).agg(count(lit(1)).as("active"))
    val c2 = cj.agg(sum(col("active") * col("active")).as("sc2"))
    val q = r.crossJoin(broadcast(c2))
      .withColumn("q_stat", round(
        (lit(2.0) * (lit(3L) * col("sc2") - col("t") * col("t"))
          .cast("double")) /
          (lit(3L) * col("t") - col("r2")).cast("double"), 6))
      .select(col("n_subjects"), col("q_stat"),
        (col("q_stat") > 5.991).as("uneven_years"))
    cj.crossJoin(broadcast(q))
      .select(col("yr"), col("active"), col("n_subjects"),
        col("q_stat"), col("uneven_years"))
  }

  val qCochranQSql: String =
    """WITH cy AS (SELECT DISTINCT o_custkey,
      |    year(CAST(o_orderdate AS DATE)) AS yr
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1996 AND 1998),
      |r AS (SELECT CAST(sum(ri) AS BIGINT) AS t,
      |    CAST(sum(ri * ri) AS BIGINT) AS r2,
      |    count(*) AS n_subjects
      |  FROM (SELECT o_custkey, count(*) AS ri FROM cy GROUP BY 1)),
      |cj AS (SELECT yr, count(*) AS active FROM cy GROUP BY 1),
      |c2 AS (SELECT CAST(sum(active * active) AS BIGINT) AS sc2 FROM cj),
      |q AS (SELECT n_subjects,
      |    round(CAST(2.0 AS DOUBLE) * CAST(3 * sc2 - t * t AS DOUBLE)
      |      / CAST(3 * t - r2 AS DOUBLE), 6) AS q_stat
      |  FROM r, c2)
      |SELECT yr, active, n_subjects, q_stat,
      |  q_stat > 5.991 AS uneven_years
      |FROM cj, q""".stripMargin

  // ---------------------------------------------------------------- L38
  /** Power / minimum-detectable-effect analysis — the experiment-
    * DESIGN readout the L3/L23/L34 verdict family presumes: before
    * (or after) running the A/B test, what effect size could this
    * sample even see, and how many users per arm would the OBSERVED
    * effect need? Two-sided α=.05, power 80%: n/arm =
    * (z_α+z_β)²·2σ̂²/δ̂² and MDE = (z_α+z_β)·√(2σ̂²/n̄). The z
    * constants are 17-digit DECIMAL LITERALS (1.9599639845400545,
    * 0.8416212335729143) — no engine Φ⁻¹ ever runs; σ̂² is the
    * pooled exact-cents variance from the L23/L34 moment machinery
    * and δ̂ the exact-mean difference, so every published number is
    * one fixed-order double expression over exact integers (√ is
    * IEEE-correctly-rounded): MDE in dollars at 6 dp, required n
    * as the CEILING integer, `powered` comparing it to the actual
    * min arm size. One corpus scan → 2 group rows.
    */
  def qPowerMde(spark: SparkSession, dir: String): DataFrame = {
    // z_.025 + z_.20, pre-summed to ONE literal so the Scala constant
    // and the SQL literal parse to the identical IEEE double
    val zSum = 2.8015852181129688
    val spend = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = spend.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast("decimal(38,0)")).as("s"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    val ssA = col("q_a").cast("double") -
      col("s_a").cast("double") * col("s_a").cast("double") / col("n_a")
    val ssB = col("q_b").cast("double") -
      col("s_b").cast("double") * col("s_b").cast("double") / col("n_b")
    val varPooled = (ssA + ssB) / (col("n_a") + col("n_b") - 2)
    val delta = col("s_a").cast("double") / col("n_a") -
      col("s_b").cast("double") / col("n_b")
    val nBar = (col("n_a") + col("n_b")).cast("double") / 2
    a.crossJoin(broadcast(b))
      .withColumn("mde_dollars",
        round(lit(zSum) * sqrt(lit(2.0) * varPooled / nBar) / 100, 6))
      .withColumn("observed_delta_dollars", round(delta / 100, 6))
      .withColumn("n_required_per_arm",
        ceil(lit(zSum) * lit(zSum) * lit(2.0) * varPooled /
          (delta * delta)).cast("long"))
      .select(col("n_a"), col("n_b"), col("observed_delta_dollars"),
        col("mde_dollars"), col("n_required_per_arm"),
        (least(col("n_a"), col("n_b")) >= col("n_required_per_arm"))
          .as("powered"))
  }

  val qPowerMdeSql: String =
    """WITH spend AS (SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id),
      |armed AS (SELECT cents,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm
      |  FROM spend),
      |arms AS (SELECT arm, count(*) AS n,
      |    sum(CAST(cents AS HUGEINT)) AS s,
      |    sum(CAST(cents AS HUGEINT) * cents) AS q
      |  FROM armed GROUP BY 1),
      |a AS (SELECT n AS n_a, s AS s_a, q AS q_a FROM arms WHERE arm = 'A'),
      |b AS (SELECT n AS n_b, s AS s_b, q AS q_b FROM arms WHERE arm = 'B'),
      |x AS (SELECT n_a, n_b,
      |    (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a
      |     + CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)
      |      / (n_a + n_b - 2) AS var_pooled,
      |    CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS delta,
      |    CAST(n_a + n_b AS DOUBLE) / 2 AS n_bar
      |  FROM a, b)
      |SELECT n_a, n_b,
      |  round(delta / 100, 6) AS observed_delta_dollars,
      |  round(CAST(2.8015852181129688 AS DOUBLE)
      |    * sqrt(CAST(2.0 AS DOUBLE) * var_pooled / n_bar) / 100, 6)
      |    AS mde_dollars,
      |  CAST(ceil(CAST(2.8015852181129688 AS DOUBLE)
      |    * CAST(2.8015852181129688 AS DOUBLE)
      |    * CAST(2.0 AS DOUBLE) * var_pooled / (delta * delta)) AS BIGINT)
      |    AS n_required_per_arm,
      |  least(n_a, n_b) >= CAST(ceil(CAST(2.8015852181129688 AS DOUBLE)
      |    * CAST(2.8015852181129688 AS DOUBLE)
      |    * CAST(2.0 AS DOUBLE) * var_pooled / (delta * delta)) AS BIGINT)
      |    AS powered
      |FROM x""".stripMargin

  // ---------------------------------------------------------------- L39
  /** Paired sign test — the assumption-free end of the paired-
    * comparison ladder (L23 Welch assumes normal-ish, L14 ranks;
    * the sign test needs ONLY sign symmetry under H0): did customer
    * spend move between 1996 and 1997, pairing each customer with
    * ITSELF? Pairs = customers ordering in both years; zeros (exact
    * ties) drop per the standard treatment; z = (n⁺ − n⁻)/√(n⁺ + n⁻)
    * under the binomial(½) null. Everything is exact integer counts
    * to ONE sqrt expression, 6-dp published, verdict on the ROUNDED
    * |z| at 1.96. One orders scan → per-(customer, year) cents →
    * one customer-keyed pivot; at 100 TB the single shuffle keys on
    * customer.
    */
  def qSignTest(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("date")).as("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("yr") === 1996, col("cents"))).as("s96"),
        sum(when(col("yr") === 1997, col("cents"))).as("s97"))
      .filter(col("s96").isNotNull && col("s97").isNotNull)
    per.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("s97") > col("s96"), 1L).otherwise(0L)).as("n_plus"),
      sum(when(col("s97") < col("s96"), 1L).otherwise(0L)).as("n_minus"))
      .withColumn("z", round(
        (col("n_plus") - col("n_minus")).cast("double") /
          sqrt((col("n_plus") + col("n_minus")).cast("double")), 6))
      .select(col("n_pairs"), col("n_plus"), col("n_minus"), col("z"),
        (abs(col("z")) > 1.96).as("significant"))
  }

  val qSignTestSql: String =
    """WITH per AS (SELECT o_custkey,
      |    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
      |      AS BIGINT) AS s96,
      |    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
      |      AS BIGINT) AS s97
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
      |  GROUP BY 1
      |  HAVING s96 IS NOT NULL AND s97 IS NOT NULL),
      |agg AS (SELECT count(*) AS n_pairs,
      |    CAST(sum(CASE WHEN s97 > s96 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_plus,
      |    CAST(sum(CASE WHEN s97 < s96 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_minus
      |  FROM per)
      |SELECT n_pairs, n_plus, n_minus,
      |  round(CAST(n_plus - n_minus AS DOUBLE)
      |    / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6) AS z,
      |  abs(round(CAST(n_plus - n_minus AS DOUBLE)
      |    / sqrt(CAST(n_plus + n_minus AS DOUBLE)), 6)) > 1.96
      |    AS significant
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L40
  /** TOST equivalence test (Schuirmann 1987) — the claim L3/L23
    * CANNOT make: "the arms are the SAME (within a margin)". Failing
    * to reject H0 is not evidence of equivalence; TOST flips the
    * burden — H0 is |δ| ≥ margin, and BOTH one-sided tests must
    * reject: z_low = (δ̂ + m)/se > z_α AND z_up = (m − δ̂)/se > z_α
    * (α = .05 one-sided, z = 1.6448536269514722 as a decimal
    * LITERAL). The margin is 5% of the pooled per-user mean —
    * data-derived but from the same exact moments, one expression.
    * The A/B arms ARE the L23/L34/L38 arms (md5-bit), se is the
    * Welch form, all ingredients exact DECIMAL(38,0) moments with
    * doubles only in the final expressions, z's 6-dp published,
    * verdict on the ROUNDED pair. One corpus scan → 2 group rows.
    */
  def qEquivalenceTost(spark: SparkSession, dir: String): DataFrame = {
    val zAlpha = 1.6448536269514722
    val spend = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
    val arms = spend.groupBy(col("arm")).agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast("decimal(38,0)")).as("s"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)")).as("q"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    val va = (col("q_a").cast("double") -
      col("s_a").cast("double") * col("s_a").cast("double") / col("n_a")) /
      (col("n_a") - 1)
    val vb = (col("q_b").cast("double") -
      col("s_b").cast("double") * col("s_b").cast("double") / col("n_b")) /
      (col("n_b") - 1)
    val se = sqrt(va / col("n_a") + vb / col("n_b"))
    val delta = col("s_a").cast("double") / col("n_a") -
      col("s_b").cast("double") / col("n_b")
    val margin = ((col("s_a") + col("s_b")).cast("double") /
      (col("n_a") + col("n_b"))) * 0.05
    a.crossJoin(broadcast(b))
      .withColumn("delta_dollars", round(delta / 100, 6))
      .withColumn("margin_dollars", round(margin / 100, 6))
      .withColumn("z_low", round((delta + margin) / se, 6))
      .withColumn("z_up", round((margin - delta) / se, 6))
      .select(col("n_a"), col("n_b"), col("delta_dollars"),
        col("margin_dollars"), col("z_low"), col("z_up"),
        (col("z_low") > zAlpha && col("z_up") > zAlpha).as("equivalent"))
  }

  val qEquivalenceTostSql: String =
    """WITH spend AS (SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id),
      |armed AS (SELECT cents,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm
      |  FROM spend),
      |arms AS (SELECT arm, count(*) AS n,
      |    sum(CAST(cents AS HUGEINT)) AS s,
      |    sum(CAST(cents AS HUGEINT) * cents) AS q
      |  FROM armed GROUP BY 1),
      |a AS (SELECT n AS n_a, s AS s_a, q AS q_a FROM arms WHERE arm = 'A'),
      |b AS (SELECT n AS n_b, s AS s_b, q AS q_b FROM arms WHERE arm = 'B'),
      |x AS (SELECT n_a, n_b,
      |    sqrt((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a)
      |        / (n_a - 1) / n_a
      |      + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b)
      |        / (n_b - 1) / n_b) AS se,
      |    CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b AS delta,
      |    (CAST(s_a + s_b AS DOUBLE) / (n_a + n_b)) * 0.05 AS margin
      |  FROM a, b)
      |SELECT n_a, n_b,
      |  round(delta / 100, 6) AS delta_dollars,
      |  round(margin / 100, 6) AS margin_dollars,
      |  round((delta + margin) / se, 6) AS z_low,
      |  round((margin - delta) / se, 6) AS z_up,
      |  (round((delta + margin) / se, 6) > 1.6448536269514722
      |    AND round((margin - delta) / se, 6) > 1.6448536269514722)
      |    AS equivalent
      |FROM x""".stripMargin

  // ---------------------------------------------------------------- L42
  /** Cronbach's alpha (1951) — internal-consistency reliability of
    * the document quality battery: do the four per-document size/
    * quality items (chars, tokens, stopword hits, sentence marks)
    * measure ONE underlying construct, or is the composite quality
    * score (B3's shape) averaging unrelated signals? α = k/(k−1) ·
    * (1 − Σσ²_item/σ²_total). ENGINE-EXACT throughout: every item is
    * an integer per document (sentence marks via plain non-regex
    * replace-length arithmetic), every variance NUMERATOR
    * V = n·Σx² − (Σx)² is an exact DECIMAL(38,0) over the SAME n, so
    * the denominators cancel and α = k·(V_tot − ΣV_i) / ((k−1)·V_tot)
    * is ONE double division of two exact integers (sign-split cast —
    * α can be negative when items anti-correlate). One corpus scan,
    * map-side-combined moment aggregate, one output row. Verdict at
    * the conventional α ≥ 0.7 reliability bar.
    */
  def qCronbachAlpha(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokens, vocabHits}
    val stops = TextAnalysis.stopwords("en")
    val items = Tables.documents(spark, dir).select(
      length(col("text")).cast("long").as("x1"),
      size(tokens(col("text"))).cast("long").as("x2"),
      vocabHits(tokens(col("text")), stops).cast("long").as("x3"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.!?]", ""))).cast("long")
        .as("x4"))
      .withColumn("xt", col("x1") + col("x2") + col("x3") + col("x4"))
    val d38 = "decimal(38,0)"
    def mom(c: String) = Seq(
      sum(col(c).cast(d38)).as(s"s_$c"),
      sum((col(c).cast(d38) * col(c))).as(s"q_$c"))
    val agg = items.agg(count(lit(1)).cast(d38).as("n"),
      (Seq("x1", "x2", "x3", "x4", "xt").flatMap(mom)): _*)
    def v(c: String) =
      (col("n") * col(s"q_$c") - col(s"s_$c") * col(s"s_$c")).cast(d38)
    val withV = agg
      .withColumn("v_items",
        (v("x1") + v("x2") + v("x3") + v("x4")).cast(d38))
      .withColumn("v_tot", v("xt"))
      .withColumn("num", (col("v_tot") - col("v_items")).cast(d38))
    val numD = expr("""CASE WHEN num >= 0 THEN CAST(num AS DOUBLE)
      | ELSE -CAST(-num AS DOUBLE) END""".stripMargin.replace("\n", " "))
    withV.select(col("n").cast("long").as("n_docs"), lit(4).as("k_items"),
        when(col("v_tot") === 0, lit(null).cast("double"))
          .otherwise(round(lit(4.0) * numD /
            (lit(3.0) * col("v_tot").cast("double")), 6)).as("alpha"))
      .withColumn("reliable", coalesce(col("alpha") >= 0.7, lit(false)))
  }

  val qCronbachAlphaSql: String = {
    val toks = graft.functions.TextFunctions.duckToksSql("text")
    val stop = TextAnalysis.stopSqlEn
    s"""WITH items AS (SELECT
      |    CAST(length(text) AS BIGINT) AS x1,
      |    CAST(len($toks) AS BIGINT) AS x2,
      |    CAST(len(list_filter($toks, t -> list_contains($stop, t)))
      |      AS BIGINT) AS x3,
      |    CAST(length(text) - length(replace(replace(replace(text,
      |      '.', ''), '!', ''), '?', '')) AS BIGINT) AS x4
      |  FROM documents),
      |wt AS (SELECT x1, x2, x3, x4, x1 + x2 + x3 + x4 AS xt FROM items),
      |agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x1 AS HUGEINT)) AS s_x1, sum(CAST(x1 AS HUGEINT) * x1)
      |      AS q_x1,
      |    sum(CAST(x2 AS HUGEINT)) AS s_x2, sum(CAST(x2 AS HUGEINT) * x2)
      |      AS q_x2,
      |    sum(CAST(x3 AS HUGEINT)) AS s_x3, sum(CAST(x3 AS HUGEINT) * x3)
      |      AS q_x3,
      |    sum(CAST(x4 AS HUGEINT)) AS s_x4, sum(CAST(x4 AS HUGEINT) * x4)
      |      AS q_x4,
      |    sum(CAST(xt AS HUGEINT)) AS s_xt, sum(CAST(xt AS HUGEINT) * xt)
      |      AS q_xt
      |  FROM wt),
      |vv AS (SELECT n,
      |    (n * q_x1 - s_x1 * s_x1) + (n * q_x2 - s_x2 * s_x2)
      |      + (n * q_x3 - s_x3 * s_x3) + (n * q_x4 - s_x4 * s_x4) AS v_items,
      |    n * q_xt - s_xt * s_xt AS v_tot
      |  FROM agg),
      |f AS (SELECT n, v_tot, v_tot - v_items AS num FROM vv)
      |SELECT CAST(n AS BIGINT) AS n_docs, 4 AS k_items,
      |  CASE WHEN v_tot = 0 THEN NULL
      |    ELSE round(4.0 * (CASE WHEN num >= 0 THEN CAST(num AS DOUBLE)
      |      ELSE -CAST(-num AS DOUBLE) END)
      |      / (3.0 * CAST(v_tot AS DOUBLE)), 6) END AS alpha,
      |  coalesce((CASE WHEN v_tot = 0 THEN NULL
      |    ELSE round(4.0 * (CASE WHEN num >= 0 THEN CAST(num AS DOUBLE)
      |      ELSE -CAST(-num AS DOUBLE) END)
      |      / (3.0 * CAST(v_tot AS DOUBLE)), 6) END) >= 0.7, false)
      |    AS reliable
      |FROM f""".stripMargin
  }

  // ---------------------------------------------------------------- L45
  /** Normal Q–Q audit of daily revenue — the WHERE to L31's
    * Jarque–Bera WHETHER: JB says "not normal, p < …"; the Q–Q table
    * says which deciles bend (heavy right tail? truncated left?),
    * the shape readout an anomaly-threshold designer actually uses.
    * Sample deciles are EXACT ORDER STATISTICS (rank = ⌈p·n⌉ over the
    * bounded day table — no interpolation), standardized in ONE
    * double expression of exact integers ((n·q_p − Σy)/√(n·Σy²−(Σy)²)
    * — the q_logrank composition rule), and compared against normal
    * quantiles shipped as DRIVER-SIDE DECIMAL LITERALS (the F62
    * trig-table device — no engine ever evaluates an inverse CDF).
    * Publishes one row per decile with the deviation and a max-|dev|
    * normality verdict at 0.5σ. Windows over the day table
    * (q_changepoint PlanSpec class); 9 output rows.
    */
  def qQqNormal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val zTable = qqNormalZ.toDF("p_tenths", "z")
    val byDay = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val mo = byDay.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("y").cast(d38)).as("s"),
      sum(col("y").cast(d38) * col("y")).as("q"))
    val ranked = byDay
      .withColumn("rk", row_number().over(Window.orderBy(col("y"), col("day"))))
    val quantiles = ranked.crossJoin(broadcast(mo))
      .join(broadcast(zTable),
        col("rk") === ceil(col("p_tenths") * col("n") / 10))
      .select(col("p_tenths"), col("z"), col("y"), col("n"), col("s"),
        col("q"))
    // z = (q_p − ȳ)/σ = (n·q_p − Σy)/√(n·Σy² − (Σy)²): one division
    // of exact integers (σ = √C/n and the deviation's /n cancel)
    quantiles
      .withColumn("std_sample",
        round((col("n") * col("y") - col("s")).cast(d38).cast("double") /
          sqrt((col("n") * col("q") - col("s") * col("s")).cast(d38)
            .cast("double")), 6))
      .select((col("p_tenths").cast("double") / 10).as("p"),
        col("y").as("sample_cents"), col("z").as("z_normal"),
        col("std_sample"),
        round(col("std_sample") - col("z"), 6).as("deviation"))
      .withColumn("decile_normal", abs(col("deviation")) < 0.5)
  }

  /** Standard-normal decile quantiles as driver-side literals shared
    * verbatim with the oracle (the F62 device): Φ⁻¹(p), 6 dp. */
  private lazy val qqNormalZ: Seq[(Int, Double)] = Seq(
    1 -> -1.281552, 2 -> -0.841621, 3 -> -0.524401, 4 -> -0.253347,
    5 -> 0.0, 6 -> 0.253347, 7 -> 0.524401, 8 -> 0.841621, 9 -> 1.281552)

  val qQqNormalSql: String = {
    val vals = qqNormalZ.map { case (p, z) => s"($p, $z)" }.mkString(", ")
    s"""WITH zt0(p_tenths, z0) AS (VALUES $vals),
      |zt AS (SELECT p_tenths, CAST(z0 AS DOUBLE) AS z FROM zt0),
      |byday AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |mo AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(y AS HUGEINT)) AS s, sum(CAST(y AS HUGEINT) * y) AS q
      |  FROM byday),
      |ranked AS (SELECT y, row_number() OVER (ORDER BY y, day) AS rk
      |  FROM byday),
      |qs AS (SELECT zt.p_tenths, zt.z, r.y, mo.n, mo.s, mo.q
      |  FROM ranked r CROSS JOIN mo
      |  JOIN zt ON r.rk = CAST(ceil(zt.p_tenths * mo.n / 10) AS BIGINT)),
      |std AS (SELECT p_tenths, z, y,
      |    round(CAST(n * y - s AS DOUBLE)
      |      / sqrt(CAST(n * q - s * s AS DOUBLE)), 6) AS std_sample
      |  FROM qs)
      |SELECT CAST(p_tenths AS DOUBLE) / 10 AS p, y AS sample_cents,
      |  z AS z_normal, std_sample,
      |  round(std_sample - z, 6) AS deviation,
      |  (abs(round(std_sample - z, 6)) < 0.5) AS decile_normal
      |FROM std""".stripMargin
  }

  // ---------------------------------------------------------------- L44
  /** Intraclass correlation ICC(1) of order spend within customers —
    * the "is the grouping real?" readout behind every per-customer
    * aggregate (RFM, LTV, target encoding): what share of order-value
    * variance lives BETWEEN customers rather than within one
    * customer's orders? One-way random-effects ANOVA with the
    * unbalanced-design group size n₀ = (N − Σn_g²/N)/(k−1). Parity
    * device: each group's SSB contribution S_g²/n_g half-up-quantizes
    * to an exact integer BEFORE the order-free cross-group sum — and
    * stays long-safe because it is bounded by ONE customer's spend,
    * never the corpus (Spark's DIV returns BIGINT: corpus-scale
    * quantities must never ride it — measured wraparound before this
    * shape). The corpus-scale terms (S²/N, SS_tot, n₀) compose in ONE
    * fixed double expression over the exact integer aggregates (the
    * F53 r_k device class — identical IEEE trees in both engines).
    * One custkey shuffle with map-side partial aggregation;
    * everything after is k-group-bounded.
    */
  def qIcc(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val byCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("ng"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast(d38).as("sg"),
        sum(round(col("o_totalprice") * 100).cast("long").cast(d38) *
          round(col("o_totalprice") * 100).cast("long")).as("qg"))
    // per-group SSB term S_g²/n_g half-up in raw cents² — bounded by
    // one customer's lifetime spend at any SF (long-safe DIV result)
    val agg = byCust
      .withColumn("ssbg",
        expr("(2 * sg * sg + ng) DIV (2 * ng)").cast(d38))
      .agg(count(lit(1)).as("k"), sum(col("ng")).as("nn"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q"),
        sum(col("ssbg")).as("ssb_sum"),
        sum((col("ng").cast(d38) * col("ng"))).as("ng2"))
    val kD = col("k").cast("double")
    val nD = col("nn").cast("double")
    val corr = col("s").cast("double") * col("s").cast("double") / nD
    val ssb = col("ssb_sum").cast("double") - corr
    val sst = col("q").cast("double") - corr
    val ssw = sst - ssb
    val n0 = (nD * nD - col("ng2").cast("double")) / (nD * (kD - 1))
    val msb = ssb / (kD - 1)
    val msw = ssw / (nD - kD)
    agg.select(col("k").cast("long").as("n_customers"),
        col("nn").cast("long").as("n_orders"),
        round(n0, 2).as("n0"),
        round((msb - msw) / (msb + (n0 - 1) * msw), 6).as("icc"))
      .withColumn("customer_effect", col("icc") > 0.05)
  }

  val qIccSql: String =
    """WITH bycust AS (SELECT o_custkey,
      |    CAST(count(*) AS HUGEINT) AS ng,
      |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS sg,
      |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS HUGEINT)) AS qg
      |  FROM orders GROUP BY 1),
      |terms AS (SELECT ng, sg, qg,
      |    CAST((2 * sg * sg + ng) // (2 * ng) AS HUGEINT) AS ssbg
      |  FROM bycust),
      |agg AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(ng) AS nn,
      |    sum(sg) AS s, sum(qg) AS q, sum(ssbg) AS ssb_sum,
      |    sum(ng * ng) AS ng2
      |  FROM terms),
      |d AS (SELECT CAST(k AS BIGINT) AS n_customers,
      |    CAST(nn AS BIGINT) AS n_orders,
      |    (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) - CAST(ng2 AS DOUBLE))
      |      / (CAST(nn AS DOUBLE) * (CAST(k AS DOUBLE) - 1)) AS n0,
      |    (CAST(ssb_sum AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |      / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1) AS msb,
      |    ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |      / CAST(nn AS DOUBLE))
      |     - (CAST(ssb_sum AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |      / CAST(nn AS DOUBLE)))
      |      / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)) AS msw
      |  FROM agg)
      |SELECT n_customers, n_orders, round(n0, 2) AS n0,
      |  round((msb - msw) / (msb + (n0 - 1) * msw), 6) AS icc,
      |  (round((msb - msw) / (msb + (n0 - 1) * msw), 6) > 0.05)
      |    AS customer_effect
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- L43
  /** Mahalanobis-distance outliers in the (quantity, price) plane —
    * the BIVARIATE fence the univariate L2/MAD fences cannot draw: a
    * row can be unremarkable in each margin yet far from the joint
    * distribution (high quantity at a low-quantity price point).
    * d² = uᵀ Σ⁻¹ u via the closed 2×2 inverse. ENGINE-EXACT ranking:
    * centered scaled moments quantize to covariance units by the E38
    * sign-split half-up device (bounded by data ranges at any SF),
    * per-row deviations quantize to centi-units the same way, and the
    * quadratic form Q = myy·ux² − 2·mxy·ux·uy + mxx·uy² is an exact
    * DECIMAL(38,0) INTEGER — the top-20 ranking orders by Q (det > 0
    * constant per corpus, so Q-order IS d²-order), never by a rounded
    * double; d² publishes as the single Q/(100·det) division (the
    * two ×100 quantization lifts compose to exactly 100). No window —
    * the top-k is a distributed TakeOrdered with (Q, orderkey,
    * linenumber) tiebreaks. Verdict at the χ²₂(.999) = 13.816 fence.
    */
  def qMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    val mo = rows.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
      sum(col("x").cast(d38) * col("x")).as("sxx"),
      sum(col("x").cast(d38) * col("y")).as("sxy"),
      sum(col("y").cast(d38) * col("y")).as("syy"))
    // E38 device: covariance units, exact, sign-split half-up
    def hu(a: String, b: String): String =
      s"""CASE WHEN ($a) >= 0
         | THEN (2 * ($a) + ($b)) DIV (2 * ($b))
         | ELSE -((2 * (-($a)) + ($b)) DIV (2 * ($b))) END"""
        .stripMargin.replace("\n", " ")
    val q = mo
      .withColumn("mxx", expr(hu("100 * (n * sxx - sx * sx)", "n * n"))
        .cast(d38))
      .withColumn("mxy", expr(hu("100 * (n * sxy - sx * sy)", "n * n"))
        .cast(d38))
      .withColumn("myy", expr(hu("100 * (n * syy - sy * sy)", "n * n"))
        .cast(d38))
      .withColumn("det",
        (col("mxx") * col("myy") - col("mxy") * col("mxy")).cast(d38))
    val scored = rows.crossJoin(broadcast(q))
      .withColumn("ux", expr(hu("100 * (n * x - sx)", "n")).cast(d38))
      .withColumn("uy", expr(hu("100 * (n * y - sy)", "n")).cast(d38))
      .withColumn("qf", (col("myy") * col("ux") * col("ux")
        - lit(2) * col("mxy") * col("ux") * col("uy")
        + col("mxx") * col("uy") * col("uy")).cast(d38))
    // units: m* ≈ 100·cov, u* ≈ 100·dev → Q/det = 100·d²; the extra
    // ×100 folds into the divisor as an exact integer so d² is still
    // ONE double division of exact integers.
    // limit() sits DIRECTLY on orderBy(): more than one projection
    // between them defeats Spark's TakeOrderedAndProject rewrite and
    // degrades the top-k to a corpus-wide range-partition sort
    // (measured: 600k shuffled records at sf0.1 before this shape)
    val withMd2 = scored
      .withColumn("md2",
        round(col("qf").cast("double") /
          (col("det") * 100).cast("decimal(38,0)").cast("double"), 6))
      .withColumn("outlier_999", col("md2") > 13.816)
    withMd2
      .orderBy(col("qf").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("x").as("quantity"), col("y").as("price_cents"),
        col("md2"), col("outlier_999"))
  }

  val qMahalanobisSql: String = {
    def hu(a: String, b: String): String =
      s"""CASE WHEN ($a) >= 0
         | THEN (2 * ($a) + ($b)) // (2 * ($b))
         | ELSE -((2 * (-($a)) + ($b)) // (2 * ($b))) END"""
        .stripMargin.replace("\n", " ")
    s"""WITH rows0 AS (SELECT l_orderkey, l_linenumber,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |mo AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM rows0),
      |q AS (SELECT n, sx, sy,
      |    ${hu("100 * (n * sxx - sx * sx)", "n * n")} AS mxx,
      |    ${hu("100 * (n * sxy - sx * sy)", "n * n")} AS mxy,
      |    ${hu("100 * (n * syy - sy * sy)", "n * n")} AS myy
      |  FROM mo),
      |qd AS (SELECT *, mxx * myy - mxy * mxy AS det FROM q),
      |scored AS (SELECT r.l_orderkey, r.l_linenumber, r.x, r.y,
      |    q.det,
      |    q.myy * u.ux * u.ux - 2 * q.mxy * u.ux * u.uy
      |      + q.mxx * u.uy * u.uy AS qf
      |  FROM rows0 r, qd q,
      |  LATERAL (SELECT
      |    ${hu("100 * (q.n * r.x - q.sx)", "q.n")} AS ux,
      |    ${hu("100 * (q.n * r.y - q.sy)", "q.n")} AS uy) u)
      |SELECT l_orderkey, l_linenumber, x AS quantity,
      |  y AS price_cents,
      |  round(CAST(qf AS DOUBLE) / CAST(det * 100 AS DOUBLE), 6) AS md2,
      |  (round(CAST(qf AS DOUBLE) / CAST(det * 100 AS DOUBLE), 6) > 13.816)
      |    AS outlier_999
      |FROM scored
      |ORDER BY qf DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- L42
  /** Multi-armed-bandit arm audit (UCB1, Auer et al. 2002 + the Beta
    * posterior a Thompson sampler draws from) — the experimentation
    * readout when there are MORE than two variants and the question
    * shifts from "is B better than A" (L3) to "which arm should get
    * the next user": per md5-bucket arm the exact trial/conversion
    * counts, the Beta(1+s, 1+f) posterior mean, the UCB1 index
    * mean + √(2·ln N / n), and the greedy-next-arm verdict. The RANK
    * is decided in exact integer arithmetic — posterior means compare
    * as cross-multiplied rationals (s_i+1)(n_j+2) vs (s_j+1)(n_i+2),
    * never as doubles — so arm ordering can never knife-edge across
    * engines; the doubles (posterior mean, UCB) publish at 6 dp as
    * diagnostics. Conversion = the L3 above-mean device (exact
    * integers). One user-level aggregate (map-side combined) → 4-row
    * arm table → bounded 4×4 rank join; scale cost is the one
    * user_id shuffle.
    */
  def qBanditUcb(spark: SparkSession, dir: String): DataFrame = {
    val np = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
    val tot = np.agg(count(lit(1)).as("users"), sum(col("np")).as("total_np"))
    val perUser = np.crossJoin(broadcast(tot))
      .withColumn("converted",
        when(col("np") * col("users") > col("total_np"), 1L).otherwise(0L))
      .withColumn("arm",
        concat(lit("arm_"),
          expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
            .cast("long") % 4))
    // 4 rows, three consumers (rank join both sides + totals): cache
    // collapses the user→arm chain to one instantiation
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("s"))
      .cache()
    val bigN = arms.agg(sum(col("n")).as("n_total"))
    // exact-integer rank: posterior means compare cross-multiplied;
    // ties (identical rationals) break on arm name
    val r = arms.as("a").join(broadcast(arms.as("b")),
        (col("b.s") + 1) * (col("a.n") + 2) > (col("a.s") + 1) * (col("b.n") + 2)
          || ((col("b.s") + 1) * (col("a.n") + 2) ===
              (col("a.s") + 1) * (col("b.n") + 2)
            && col("b.arm") < col("a.arm")), "left")
      .groupBy(col("a.arm").as("arm"), col("a.n").as("n"), col("a.s").as("s"))
      .agg((count(col("b.arm")) + 1).as("rank"))
    r.crossJoin(broadcast(bigN))
      .select(col("arm"), col("n").as("n_users"), col("s").as("n_conversions"),
        round((col("s") + 1).cast("double") / (col("n") + 2), 6)
          .as("posterior_mean"),
        round(col("s").cast("double") / col("n") +
          sqrt(lit(2.0) * log(col("n_total").cast("double")) / col("n")), 6)
          .as("ucb1"),
        col("rank"), (col("rank") === 1).as("play_next"))
  }

  val qBanditUcbSql: String =
    """WITH np AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
      |  FROM events GROUP BY 1),
      |tot AS (SELECT count(*) AS users, sum(np) AS total_np FROM np),
      |pu AS (SELECT
      |    CASE WHEN np * users > total_np THEN 1 ELSE 0 END AS converted,
      |    'arm_' || (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 4) AS arm
      |  FROM np, tot),
      |arms AS (SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS s
      |  FROM pu GROUP BY 1),
      |nt AS (SELECT sum(n) AS n_total FROM arms),
      |r AS (SELECT a.arm, a.n, a.s,
      |    1 + count(b.arm) AS rank
      |  FROM arms a LEFT JOIN arms b
      |    ON (b.s + 1) * (a.n + 2) > (a.s + 1) * (b.n + 2)
      |    OR ((b.s + 1) * (a.n + 2) = (a.s + 1) * (b.n + 2) AND b.arm < a.arm)
      |  GROUP BY 1, 2, 3)
      |SELECT arm, n AS n_users, s AS n_conversions,
      |  round(CAST(s + 1 AS DOUBLE) / (n + 2), 6) AS posterior_mean,
      |  round(CAST(s AS DOUBLE) / n + sqrt(2.0 * ln(CAST(n_total AS DOUBLE)) / n), 6) AS ucb1,
      |  rank, (rank = 1) AS play_next
      |FROM r, nt""".stripMargin

  // ---------------------------------------------------------------- L43
  /** Propensity-score matching ATE (Rosenbaum & Rubin 1983) — the
    * observational-causal workhorse the A/B family (L3/L21/L25/L33)
    * cannot replace when assignment was NOT randomized: does signup
    * exposure lift purchase spend, controlling for how active the
    * user already was? Propensity = a linear probability model
    * t ~ a + b·x (x = click+view volume) fitted CLOSED-FORM from
    * exact DECIMAL(38,0) moments — b is ONE double division of exact
    * integers, a and every score p = a + b·x fixed-order expressions
    * (identical IEEE both engines, so matching order can never
    * knife-edge). Matching: nearest control by |Δp| within a 0.05
    * caliper, WITH replacement, ties to the smallest control id —
    * candidate generation is an EQUI-join on coarsened score buckets
    * (each treated explodes to its 3 adjacent width-0.05 buckets;
    * never a treated × control nested loop — the blocking every
    * production matcher uses), then one row_number per treated. ATE
    * over matched pairs in exact cents to one final division.
    */
  val PsmCaliper = 0.05

  def qPropensityMatch(spark: SparkSession, dir: String): DataFrame = {
    val pu0 = Tables.events(spark, dir).groupBy(col("user_id")).agg(
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
      sum(when(col("event_type").isin("click", "error", "signup"), 1L)
        .otherwise(0L)).as("x"),
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
    // treatment = above-mean view exposure, exact in integers (the L3
    // device); covariate x deliberately EXCLUDES views so the
    // propensity adjusts for general activity, not the treatment
    val vt = pu0.agg(count(lit(1)).as("users"), sum(col("v")).as("tv"))
    val pu = pu0.crossJoin(broadcast(vt))
      .select(col("user_id"),
        when(col("v") * col("users") > col("tv"), 1L).otherwise(0L).as("t"),
        col("x"), col("y"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val mom = pu.agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("x") * col("x"))).as("sxx"),
      sum(dec(col("t"))).as("st"), sum(dec(col("x") * col("t"))).as("sxt"))
    val b = (col("n") * col("sxt") - col("sx") * col("st")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val a = (col("st").cast("double") - b * col("sx").cast("double")) / col("n")
    val scored = pu.crossJoin(broadcast(mom))
      .withColumn("p", a + b * col("x").cast("double"))
      .withColumn("bucket", floor(col("p") / PsmCaliper).cast("long"))
      .select(col("user_id"), col("t"), col("y"), col("p"), col("bucket"))
      .cache()
    val treated = scored.filter(col("t") === 1)
      .select(col("user_id").as("tu"), col("y").as("ty"), col("p").as("tp"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))
          .as("jb"))
    val control = scored.filter(col("t") === 0)
      .select(col("user_id").as("cu"), col("y").as("cy"), col("p").as("cp"),
        col("bucket").as("jb"))
    val cand = treated.join(control, Seq("jb"))
      .filter(abs(col("tp") - col("cp")) <= PsmCaliper)
    val w = Window.partitionBy(col("tu"))
      .orderBy(abs(col("tp") - col("cp")).asc, col("cu").asc)
    val matched = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val counts = scored.agg(sum(col("t")).as("n_treated"),
      sum(lit(1L) - col("t")).as("n_control"))
    val m = matched.agg(count(lit(1)).as("n_matched"),
      sum(dec(col("ty") - col("cy"))).as("sdiff"),
      max(abs(col("tp") - col("cp"))).as("mg"))
    val out = counts.crossJoin(broadcast(m)).select(
      col("n_treated"), col("n_control"), col("n_matched"),
      round(col("n_matched").cast("double") / col("n_treated"), 6)
        .as("match_rate"),
      round(col("sdiff").cast("double") / col("n_matched") / 100.0, 6)
        .as("ate_dollars"),
      round(col("mg"), 6).as("max_propensity_gap"))
      .cache() // qGmmEm cleanup pattern (ADVICE r15): 1-row output
    out.count()
    scored.unpersist()
    out
  }

  val qPropensityMatchSql: String =
    s"""WITH pu0 AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_type IN ('click', 'error', 'signup') THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |vt AS (SELECT count(*) AS users, sum(v) AS tv FROM pu0),
      |pu AS (SELECT user_id,
      |    CAST(CASE WHEN v * users > tv THEN 1 ELSE 0 END AS BIGINT) AS t,
      |    x, y FROM pu0, vt),
      |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(t AS HUGEINT)) AS st, sum(CAST(x AS HUGEINT) * t) AS sxt
      |  FROM pu),
      |co AS (SELECT
      |    CAST(n * sxt - sx * st AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
      |    n, sx, st FROM mom),
      |co2 AS (SELECT b, (CAST(st AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n AS a FROM co),
      |scored AS (SELECT user_id, t, y, a + b * CAST(x AS DOUBLE) AS p,
      |    CAST(floor((a + b * CAST(x AS DOUBLE)) / $PsmCaliper) AS BIGINT) AS bucket
      |  FROM pu, co2),
      |treated AS (SELECT user_id AS tu, y AS ty, p AS tp,
      |    unnest([bucket - 1, bucket, bucket + 1]) AS jb
      |  FROM scored WHERE t = 1),
      |control AS (SELECT user_id AS cu, y AS cy, p AS cp, bucket AS jb
      |  FROM scored WHERE t = 0),
      |cand AS (SELECT tu, ty, cu, cy, abs(tp - cp) AS gap
      |  FROM treated JOIN control USING (jb)
      |  WHERE abs(tp - cp) <= $PsmCaliper),
      |matched AS (SELECT * FROM (SELECT tu, ty, cy, gap,
      |    row_number() OVER (PARTITION BY tu ORDER BY gap ASC, cu ASC) AS rn
      |  FROM cand) WHERE rn = 1),
      |counts AS (SELECT CAST(sum(t) AS BIGINT) AS n_treated,
      |    CAST(sum(1 - t) AS BIGINT) AS n_control FROM scored),
      |m AS (SELECT count(*) AS n_matched,
      |    sum(CAST(ty - cy AS HUGEINT)) AS sdiff, max(gap) AS mg FROM matched)
      |SELECT n_treated, n_control, n_matched,
      |  round(CAST(n_matched AS DOUBLE) / n_treated, 6) AS match_rate,
      |  round((CASE WHEN sdiff >= 0 THEN CAST(sdiff AS DOUBLE)
      |      ELSE -CAST(-sdiff AS DOUBLE) END) / n_matched / 100.0, 6)
      |    AS ate_dollars,
      |  round(mg, 6) AS max_propensity_gap
      |FROM counts, m""".stripMargin

  // ---------------------------------------------------------------- L44
  /** HBOS — histogram-based outlier score (Goldstein & Dengel 2012),
    * the linear-time multivariate outlier detector that needs no
    * distance matrix and no model fit: per feature a bounded
    * histogram, per row score = Σ_f −ln(p_f(bin(x))) under feature
    * independence. Features: quantity (integer-discrete), discount
    * (percent-discrete), extended price ($100 buckets) — all bins
    * EXACT integers. The top-20 cut NEVER touches a double: a row's
    * score ordering is exactly the ascending ordering of the bin-count
    * PRODUCT c_q·c_d·c_p (ln is monotone; n³ is constant), so ranking
    * happens on an exact integer with (orderkey, linenumber)
    * tiebreaks and the 6-dp ln score publishes as a diagnostic only.
    * Complements L2's single-feature z-score anomaly and the
    * Mahalanobis top-k (which models covariance but inverts a moment
    * matrix; HBOS is the O(n) screen you run first at 100 TB).
    * Scale shape: three bounded histograms (≤ 50/11/~10³ rows)
    * BROADCAST back onto one corpus scan — map-side scoring, and the
    * top-k rides TakeOrderedAndProject (limit directly on orderBy,
    * the q_mahalanobis contract).
    */
  def qHbos(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("long").as("q"),
      round(col("l_discount") * 100).cast("long").as("d"),
      (round(col("l_extendedprice") * 100).cast("long") / 10000L)
        .cast("long").as("pb"))
    val n = rows.agg(count(lit(1)).as("n"))
    val hq = rows.groupBy(col("q")).agg(count(lit(1)).as("cq"))
    val hd = rows.groupBy(col("d")).agg(count(lit(1)).as("cd"))
    val hp = rows.groupBy(col("pb")).agg(count(lit(1)).as("cp"))
    val scored = rows
      .join(broadcast(hq), Seq("q"))
      .join(broadcast(hd), Seq("d"))
      .join(broadcast(hp), Seq("pb"))
      .crossJoin(broadcast(n))
      .withColumn("prod",
        (col("cq").cast("decimal(38,0)") * col("cd") * col("cp")))
    scored
      .orderBy(col("prod").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(20)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("q").as("quantity"), col("d").as("discount_pct"),
        col("pb").as("price_bucket"),
        col("cq").as("bin_q"), col("cd").as("bin_d"), col("cp").as("bin_p"),
        round(-log(col("cq").cast("double") / col("n"))
          - log(col("cd").cast("double") / col("n"))
          - log(col("cp").cast("double") / col("n")), 6).as("hbos_score"))
  }

  val qHbosSql: String =
    """WITH rows0 AS (SELECT l_orderkey, l_linenumber,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_discount * 100) AS BIGINT) AS d,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS pb
      |  FROM lineitem),
      |nt AS (SELECT count(*) AS n FROM rows0),
      |hq AS (SELECT q, count(*) AS cq FROM rows0 GROUP BY 1),
      |hd AS (SELECT d, count(*) AS cd FROM rows0 GROUP BY 1),
      |hp AS (SELECT pb, count(*) AS cp FROM rows0 GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, q AS quantity, d AS discount_pct,
      |  pb AS price_bucket, cq AS bin_q, cd AS bin_d, cp AS bin_p,
      |  round(-ln(CAST(cq AS DOUBLE) / n) - ln(CAST(cd AS DOUBLE) / n)
      |    - ln(CAST(cp AS DOUBLE) / n), 6) AS hbos_score
      |FROM rows0 JOIN hq USING (q) JOIN hd USING (d) JOIN hp USING (pb), nt
      |ORDER BY CAST(cq AS HUGEINT) * cd * cp ASC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- L46
  /** Blinder–Oaxaca decomposition (1973) — the gap-accounting answer
    * the raw group difference (L23's Welch test) cannot give: HOW MUCH
    * of the AUTOMOBILE-vs-rest spend gap is explained by customers
    * simply ordering more (the endowment x), and how much is a
    * segment-specific return difference? Two-fold form with the
    * pooled-β reference: explained = β_pool·(x̄_A − x̄_B),
    * unexplained = gap − explained. ENGINE-EXACT machinery: per-group
    * and pooled single-regressor fits are closed-form ratios of ONE
    * exact DECIMAL(38,0) moment aggregate (x = order count, y = spend
    * cents — both exact integers); every β, mean, and component is a
    * FIXED-ORDER double expression over those decimals, published at
    * 6 dp in dollars. One orders scan + one customer join, 1 row.
    */
  def qOaxaca(spark: SparkSession, dir: String): DataFrame = {
    val pc = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"),
          when(col("c_mktsegment") === "AUTOMOBILE", "a").otherwise("b")
            .as("g")), Seq("o_custkey"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val mom = pc.groupBy(col("g")).agg(count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x") * col("x"))).as("sxx"),
      sum(dec(col("x") * col("y"))).as("sxy"))
    def gcol(g: String, c: String) = max(when(col("g") === g, col(c)))
    val wide = mom.agg(
      gcol("a", "n").as("na"), gcol("b", "n").as("nb"),
      gcol("a", "sx").as("sxa"), gcol("b", "sx").as("sxb"),
      gcol("a", "sy").as("sya"), gcol("b", "sy").as("syb"),
      gcol("a", "sxx").as("sxxa"), gcol("b", "sxx").as("sxxb"),
      gcol("a", "sxy").as("sxya"), gcol("b", "sxy").as("sxyb"))
    val bPool = ((col("na") + col("nb")) * (col("sxya") + col("sxyb"))
        - (col("sxa") + col("sxb")) * (col("sya") + col("syb")))
      .cast("double") /
      ((col("na") + col("nb")) * (col("sxxa") + col("sxxb"))
        - (col("sxa") + col("sxb")) * (col("sxa") + col("sxb")))
      .cast("double")
    def beta(sfx: String) =
      (col(s"n$sfx") * col(s"sxy$sfx") - col(s"sx$sfx") * col(s"sy$sfx"))
        .cast("double") /
        (col(s"n$sfx") * col(s"sxx$sfx") - col(s"sx$sfx") * col(s"sx$sfx"))
          .cast("double")
    // operators at LINE END: a leading "- col(...)" on its own line
    // parses as a discarded unary statement and silently drops the
    // subtrahend
    val gap = col("sya").cast("double") / col("na") -
      col("syb").cast("double") / col("nb")
    val dx = col("sxa").cast("double") / col("na") -
      col("sxb").cast("double") / col("nb")
    wide.select(
      col("na").cast("long").as("n_auto"), col("nb").cast("long").as("n_rest"),
      round(gap / 100.0, 6).as("spend_gap_dollars"),
      round(bPool * dx / 100.0, 6).as("explained_dollars"),
      round((gap - bPool * dx) / 100.0, 6).as("unexplained_dollars"),
      round(beta("a") / 100.0, 6).as("beta_auto_dollars_per_order"),
      round(beta("b") / 100.0, 6).as("beta_rest_dollars_per_order"))
      .withColumn("mostly_endowment",
        abs(col("explained_dollars")) > abs(col("unexplained_dollars")))
  }

  val qOaxacaSql: String = {
    val bPool =
      """(CAST((na + nb) * (sxya + sxyb) - (sxa + sxb) * (sya + syb) AS DOUBLE)
        | / CAST((na + nb) * (sxxa + sxxb) - (sxa + sxb) * (sxa + sxb) AS DOUBLE))"""
        .stripMargin.replace("\n", "")
    def beta(s: String) =
      s"(CAST(n$s * sxy$s - sx$s * sy$s AS DOUBLE) / CAST(n$s * sxx$s - sx$s * sx$s AS DOUBLE))"
    val gap = "(CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb)"
    val dx = "(CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb)"
    s"""WITH pc AS (SELECT o.o_custkey, count(*) AS x,
      |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
      |    CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 'a' ELSE 'b' END AS g
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 4),
      |mom AS (SELECT g, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM pc GROUP BY 1),
      |wide AS (SELECT
      |    max(CASE WHEN g = 'a' THEN n END) AS na,
      |    max(CASE WHEN g = 'b' THEN n END) AS nb,
      |    max(CASE WHEN g = 'a' THEN sx END) AS sxa,
      |    max(CASE WHEN g = 'b' THEN sx END) AS sxb,
      |    max(CASE WHEN g = 'a' THEN sy END) AS sya,
      |    max(CASE WHEN g = 'b' THEN sy END) AS syb,
      |    max(CASE WHEN g = 'a' THEN sxx END) AS sxxa,
      |    max(CASE WHEN g = 'b' THEN sxx END) AS sxxb,
      |    max(CASE WHEN g = 'a' THEN sxy END) AS sxya,
      |    max(CASE WHEN g = 'b' THEN sxy END) AS sxyb
      |  FROM mom),
      |res AS (SELECT CAST(na AS BIGINT) AS n_auto, CAST(nb AS BIGINT) AS n_rest,
      |    round($gap / 100.0, 6) AS spend_gap_dollars,
      |    round($bPool * $dx / 100.0, 6) AS explained_dollars,
      |    round(($gap - $bPool * $dx) / 100.0, 6) AS unexplained_dollars,
      |    round(${beta("a")} / 100.0, 6) AS beta_auto_dollars_per_order,
      |    round(${beta("b")} / 100.0, 6) AS beta_rest_dollars_per_order
      |  FROM wide)
      |SELECT *, (abs(explained_dollars) > abs(unexplained_dollars))
      |    AS mostly_endowment
      |FROM res""".stripMargin
  }

  // ---------------------------------------------------------------- L51
  /** Referential-integrity audit of the whole star schema — the
    * orphan-FK report a warehouse runs before trusting ANY join: for
    * each of the seven foreign keys, row count, null-key count,
    * orphan count (key present, parent row absent) and orphan ppm.
    * L1 checks ONE representative FK inside its fused per-table
    * aggregate; this is the dedicated all-edges audit. Each check is
    * a left-anti join against the DISTINCT parent keys — exact by
    * construction (the approximate 100 TB fast path is H3's bloom
    * keep-list; this is the exact gate you run when the bloom flags
    * drift). Child tables shuffle once per FK on the key being
    * audited; parent key sets are distinct-projected first so the
    * anti-join build side carries keys only. 7 one-row aggregates
    * union (K31 device — breakdown rows can't drift from their own
    * inputs).
    */
  def qRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def hu(a: String, b: String): String =
      s"(2 * ($a) + ($b)) DIV (2 * ($b))"
    def audit(fk: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val base = child.agg(count(lit(1)).as("n_rows"),
        sum(when(col(key).isNull, 1L).otherwise(0L)).as("n_null_keys"))
      val orph = child.filter(col(key).isNotNull)
        .join(parent.select(col(pkey).as(key)).distinct(),
          Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      base.crossJoin(broadcast(orph))
        .select(lit(fk).as("fk"), col("n_rows"), col("n_null_keys"),
          col("n_orphans"),
          // nullif guard (the qBootstrapCi pattern): an empty child
          // table publishes NULL ppm identically in both engines
          // instead of Spark-NULL-vs-DuckDB-error on the zero divide
          expr(hu("1000000 * n_orphans", "nullif(n_rows, 0)"))
            .as("orphan_ppm"),
          (col("n_orphans") === 0 && col("n_null_keys") === 0).as("ok"))
    }
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val su = Tables.supplier(spark, dir)
    val p = Tables.part(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
      .unionAll(audit("lineitem.l_partkey->part", li, "l_partkey",
        p, "p_partkey"))
      .unionAll(audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
        su, "s_suppkey"))
      .unionAll(audit("orders.o_custkey->customer", o, "o_custkey",
        c, "c_custkey"))
      .unionAll(audit("customer.c_nationkey->nation", c, "c_nationkey",
        n, "n_nationkey"))
      .unionAll(audit("supplier.s_nationkey->nation", su, "s_nationkey",
        n, "n_nationkey"))
      .unionAll(audit("nation.n_regionkey->region", n, "n_regionkey",
        r, "r_regionkey"))
  }

  val qRefIntegritySql: String = {
    def one(fk: String, child: String, key: String, parent: String,
        pkey: String): String =
      s"""SELECT '$fk' AS fk, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null_keys,
         |  CAST(sum(CASE WHEN $key IS NOT NULL AND NOT EXISTS
         |      (SELECT 1 FROM $parent WHERE $pkey = $key)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
         |  CAST((2 * 1000000 * sum(CASE WHEN $key IS NOT NULL AND NOT
         |      EXISTS (SELECT 1 FROM $parent WHERE $pkey = $key)
         |    THEN 1 ELSE 0 END) + count(*))
         |    // (2 * nullif(count(*), 0)) AS BIGINT) AS orphan_ppm,
         |  (sum(CASE WHEN $key IS NOT NULL AND NOT EXISTS
         |      (SELECT 1 FROM $parent WHERE $pkey = $key)
         |    THEN 1 ELSE 0 END) = 0
         |   AND sum(CASE WHEN $key IS NULL THEN 1 ELSE 0 END) = 0) AS ok
         |FROM $child""".stripMargin
    Seq(
      one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      one("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      one("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      one("supplier.s_nationkey->nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      one("nation.n_regionkey->region", "nation", "n_regionkey",
        "region", "r_regionkey")).mkString("\nUNION ALL\n")
  }

  // ---------------------------------------------------------------- L52
  /** Negative-binomial method-of-moments fit of per-user purchase
    * counts — the overdispersion diagnostic behind every count model:
    * a Poisson user would have variance ≈ mean; real engagement data
    * is overdispersed, and the NB2 moment estimates r̂ = m²/(v−m),
    * p̂ = m/v quantify by how much. The OVERDISPERSION VERDICT is
    * pure integer arithmetic: v > m ⟺ n·Σc² − (Σc)² > (n−1)·Σc on
    * exact DECIMAL(38,0) moments — no float can flip it; mean and
    * variance are each ONE double division of exact integers,
    * dispersion/r̂/p̂ fixed-order expressions over those (the q_stl
    * rule), degenerate v ≤ m publishes null r̂/p̂. One user-keyed
    * aggregate → one 1-row moment reduce.
    */
  def qNegbinFit(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("c"))
    val mom = perUser.agg(count(lit(1)).as("n"),
      sum(col("c").cast(d38)).as("s"),
      sum((col("c").cast(d38) * col("c")).cast(d38)).as("q"))
    val num = (col("n") * col("q") - col("s") * col("s")).cast(d38)
    val mean = col("s").cast("double") / col("n")
    val vr = col("num").cast("double") /
      (col("n").cast("double") * (col("n") - 1))
    mom.withColumn("num", num)
      .withColumn("over",
        col("num") > ((col("n") - 1) * col("s")).cast(d38))
      .select(col("n").as("n_users"), col("s").cast("long").as("sum_c"),
        round(mean, 6).as("mean_c"),
        round(vr, 6).as("var_c"),
        round(vr / mean, 6).as("dispersion"),
        col("over").as("overdispersed"),
        when(col("over"), round(mean * mean / (vr - mean), 6))
          .otherwise(lit(null).cast("double")).as("r_hat"),
        when(col("over"), round(mean / vr, 6))
          .otherwise(lit(null).cast("double")).as("p_hat"))
  }

  val qNegbinFitSql: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(c AS HUGEINT)) AS s,
      |    sum(CAST(c AS HUGEINT) * c) AS q
      |  FROM pu),
      |d AS (SELECT n, s, n * q - s * s AS num,
      |    (n * q - s * s) > (n - 1) * s AS over,
      |    CAST(s AS DOUBLE) / CAST(n AS BIGINT) AS mean,
      |    CAST(n * q - s * s AS DOUBLE)
      |      / (CAST(CAST(n AS BIGINT) AS DOUBLE) * (CAST(n AS BIGINT) - 1))
      |      AS vr
      |  FROM mom)
      |SELECT CAST(n AS BIGINT) AS n_users, CAST(s AS BIGINT) AS sum_c,
      |  round(mean, 6) AS mean_c, round(vr, 6) AS var_c,
      |  round(vr / mean, 6) AS dispersion, over AS overdispersed,
      |  CASE WHEN over THEN round(mean * mean / (vr - mean), 6) END AS r_hat,
      |  CASE WHEN over THEN round(mean / vr, 6) END AS p_hat
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- L53
  /** Cox–Stuart trend test on daily revenue — the sign-test trend
    * detector that needs NO rank sums and no variance estimate (A42's
    * Mann–Kendall weighs every pair; Cox–Stuart pairs each day with
    * its shifted twin c = ⌈n/2⌉ positions later and just counts
    * signs): S⁺ = #(later > earlier), S⁻ = #(<), ties drop,
    * z = (2·max(S⁺,S⁻) − N − 1)/√N with continuity correction. Runs
    * entirely on the bounded day table (the q_changepoint class) —
    * exact integer cents revenue, exact integer counts, ONE sqrt in
    * the verdict (IEEE-correctly-rounded, identical both engines).
    */
  def qCoxStuart(spark: SparkSession, dir: String): DataFrame = {
    val byDay = Tables.orders(spark, dir)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("decimal(38,0)"))
        .as("rc"))
    val w = Window.orderBy(col("day"))
    val idx = byDay.withColumn("i", row_number().over(w))
    val nDays = idx.agg(count(lit(1)).as("n"),
      expr("CAST((count(1) + 1) DIV 2 AS BIGINT)").as("cshift"))
    val pairs = idx.crossJoin(broadcast(nDays))
      .alias("a")
      .join(idx.select(col("i").as("j"), col("rc").as("rc2")).alias("b"),
        col("j") === col("i") + col("cshift"))
    val agg = pairs.agg(max(col("n")).as("n_days"),
      sum(when(col("rc2") > col("rc"), 1L).otherwise(0L)).as("s_up"),
      sum(when(col("rc2") < col("rc"), 1L).otherwise(0L)).as("s_down"))
    agg.withColumn("n_pairs", col("s_up") + col("s_down"))
      .select(col("n_days"), col("n_pairs"), col("s_up"), col("s_down"),
        round((lit(2) * greatest(col("s_up"), col("s_down"))
          - col("n_pairs") - 1).cast("double") /
          sqrt(col("n_pairs").cast("double")), 6).as("z"))
      .withColumn("trend",
        when(col("z") <= 1.96, lit("none"))
          .when(col("s_up") > col("s_down"), lit("increasing"))
          .otherwise(lit("decreasing")))
  }

  val qCoxStuartSql: String =
    """WITH byday AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS day,
      |    sum(CAST(round(o_totalprice * 100) AS HUGEINT)) AS rc
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT day, rc,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      |  FROM byday),
      |nn AS (SELECT count(*) AS n,
      |    CAST((count(*) + 1) // 2 AS BIGINT) AS cshift FROM idx),
      |agg AS (SELECT max(nn.n) AS n_days,
      |    CAST(sum(CASE WHEN b.rc > a.rc THEN 1 ELSE 0 END) AS BIGINT)
      |      AS s_up,
      |    CAST(sum(CASE WHEN b.rc < a.rc THEN 1 ELSE 0 END) AS BIGINT)
      |      AS s_down
      |  FROM idx a, nn
      |  JOIN idx b ON b.i = a.i + nn.cshift)
      |SELECT n_days, s_up + s_down AS n_pairs, s_up, s_down,
      |  round((2 * greatest(s_up, s_down) - (s_up + s_down) - 1)
      |    / sqrt(CAST(s_up + s_down AS DOUBLE)), 6) AS z,
      |  CASE WHEN round((2 * greatest(s_up, s_down) - (s_up + s_down) - 1)
      |      / sqrt(CAST(s_up + s_down AS DOUBLE)), 6) <= 1.96 THEN 'none'
      |    WHEN s_up > s_down THEN 'increasing'
      |    ELSE 'decreasing' END AS trend
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L54
  /** Bartlett's test for homogeneity of variances across market
    * segments — L22's parametric twin (Levene tests deviations from
    * the median and is robust; Bartlett is the likelihood-ratio form
    * that is MORE powerful when the data is near-normal, and the one
    * classical ANOVA texts gate on). Same $100-bin quantized-histogram
    * device as L22 (documented resolution trade). Engine parity: each
    * group's variance numerator n_i·q_i − s_i² is an exact
    * DECIMAL(38,0); per-group variance, its ln, and the reciprocal
    * 1/(n_i−1) each µ-quantize to exact longs BEFORE the cross-group
    * sums (k-term unordered double sums are the q_stl failure shape —
    * so no double ever sums unordered), and the final statistic and
    * Bartlett correction C assemble in fixed-order doubles from those
    * exact integers. Verdict vs the shared χ²(k−1, .05) literal table
    * (the B28 device — never a hardcoded-df cut).
    */
  def qBartlett(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    def shu(a: String, b: String): String =
      s"""CASE WHEN ($a) >= 0
         | THEN (2 * ($a) + ($b)) DIV (2 * ($b))
         | ELSE -((2 * (-($a)) + ($b)) DIV (2 * ($b))) END"""
        .stripMargin.replace("\n", " ")
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val grp = seg.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("bin").cast(d38)).as("s_g"),
        sum((col("bin").cast(d38) * col("bin")).cast(d38)).as("q_g"))
      .withColumn("num", (col("n_g") * col("q_g") - col("s_g") * col("s_g"))
        .cast(d38))
      // per-group variance in µ-bin² units: exact long via half-up DIV
      .withColumn("v_mu", expr(shu("num * 1000000",
        "CAST(n_g AS DECIMAL(38,0)) * (n_g - 1)")).cast("long"))
      // ln(variance) µ-quantized (the E33 device); zero variance → null
      .withColumn("lnv_mu",
        when(col("v_mu") > 0,
          round(log(col("v_mu").cast("double") / 1e6) * 1e6).cast("long")))
      // 1/(n_i−1) in 1e-12 units, exact long
      .withColumn("inv_p", expr(shu("CAST(1000000000000 AS DECIMAL(38,0))",
        "n_g - 1")).cast("long"))
    val tot = grp.agg(count(lit(1)).as("k"),
      sum(col("n_g")).cast("long").as("n"),
      sum(col("num")).as("pool_num"),
      sum(((col("n_g") - 1) * col("lnv_mu")).cast(d38)).as("sum_lnv"),
      sum(col("inv_p")).as("sum_inv"))
      // pooled variance Σ(n_i−1)v_i / (N−k); Σ(n_i−1)v_i = Σ num_i/n_i
      // µ-quantized per group would lose the exact pool — use the
      // exact per-group µ-variance instead: Σ(n_i−1)·v_mu_i
      .crossJoin(broadcast(grp.agg(
        sum(((col("n_g") - 1) * col("v_mu")).cast(d38)).as("pool_mu"))))
    val lnSp = log(col("pool_mu").cast("double") /
      (col("n") - col("k")).cast("double") / 1e6)
    val statRaw = ((col("n") - col("k")).cast("double") * lnSp
      - col("sum_lnv").cast("double") / 1e6)
    val cCorr = lit(1.0) +
      (col("sum_inv").cast("double") / 1e12 -
        lit(1.0) / (col("n") - col("k"))) /
      (lit(3.0) * (col("k") - 1))
    val verdict = tot.select(col("k"), col("n"),
      round(statRaw / cCorr, 6).as("bartlett_stat"))
      .withColumn("chi2_crit", expr(
        TextAnalysis.chi2Crit05Case("k - 1")).cast("double"))
      .withColumn("heteroscedastic", col("bartlett_stat") > col("chi2_crit"))
    grp.select(col("seg"), col("n_g"),
        round(col("v_mu").cast("double") / 1e6, 6).as("var_bins"))
      .crossJoin(broadcast(verdict))
  }

  val qBartlettSql: String = {
    def shu(a: String, b: String): String =
      s"""CASE WHEN ($a) >= 0
         | THEN CAST((2 * ($a) + ($b)) // (2 * ($b)) AS BIGINT)
         | ELSE -CAST((2 * (-($a)) + ($b)) // (2 * ($b)) AS BIGINT) END"""
        .stripMargin.replace("\n", " ")
    s"""WITH seg AS (SELECT c_mktsegment AS seg,
       |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |grp0 AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_g,
       |    sum(CAST(bin AS HUGEINT)) AS s_g,
       |    sum(CAST(bin AS HUGEINT) * bin) AS q_g
       |  FROM seg GROUP BY 1),
       |grp AS (SELECT seg, n_g, n_g * q_g - s_g * s_g AS num,
       |    ${shu("(n_g * q_g - s_g * s_g) * 1000000",
        "CAST(n_g AS HUGEINT) * (n_g - 1)")} AS v_mu,
       |    ${shu("CAST(1000000000000 AS HUGEINT)", "n_g - 1")} AS inv_p
       |  FROM grp0),
       |grp2 AS (SELECT *, CASE WHEN v_mu > 0 THEN
       |      CAST(round(ln(CAST(v_mu AS DOUBLE) / 1e6) * 1e6) AS BIGINT)
       |    END AS lnv_mu
       |  FROM grp),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(n_g) AS BIGINT) AS n,
       |    sum(CAST((n_g - 1) * lnv_mu AS HUGEINT)) AS sum_lnv,
       |    CAST(sum(inv_p) AS BIGINT) AS sum_inv,
       |    sum(CAST((n_g - 1) * v_mu AS HUGEINT)) AS pool_mu
       |  FROM grp2),
       |v AS (SELECT k, n,
       |    round(((n - k) * ln(CAST(pool_mu AS DOUBLE)
       |        / CAST(n - k AS DOUBLE) / 1e6)
       |      - CAST(sum_lnv AS DOUBLE) / 1e6)
       |      / (1.0 + (CAST(sum_inv AS DOUBLE) / 1e12 - 1.0 / (n - k))
       |        / (3.0 * (k - 1))), 6) AS bartlett_stat
       |  FROM tot),
       |v2 AS (SELECT k, n, bartlett_stat,
       |    CAST(${TextAnalysis.chi2Crit05Case("k - 1")} AS DOUBLE)
       |      AS chi2_crit
       |  FROM v)
       |SELECT g.seg, g.n_g,
       |  round(CAST(g.v_mu AS DOUBLE) / 1e6, 6) AS var_bins,
       |  v2.k, v2.n, v2.bartlett_stat, v2.chi2_crit,
       |  v2.bartlett_stat > v2.chi2_crit AS heteroscedastic
       |FROM grp2 g, v2""".stripMargin
  }

  // ---------------------------------------------------------------- L55
  /** Gaussian kernel density estimate of order totals on a fixed
    * dollar grid — the smooth distribution readout behind every
    * "what does spend look like" panel (A17's histogram is the raw
    * binned view; KDE is the comparable-across-corpora smooth one).
    * Binned construction: prices quantize to $100 cells (the L14/L22
    * histogram device), each of the 21 fixed grid points accumulates
    * Σ_b n_b · w(g, center_b) over the ≤ ~5,500-cell histogram —
    * (grid × bins) is domain-bounded at ANY corpus size. Parity: the
    * Gaussian kernel µ-quantizes per (grid, bin) (w = round(exp·10⁶),
    * the E33 device), so the accumulation is an EXACT integer sum in
    * any order; density = mass/(N·h·√2π·10⁶) is one fixed-order
    * double expression per published cell (√2π as a shared literal).
    */
  val KdeGridStep = 26250L
  val KdeBandwidth = 25000.0

  def qKde(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_b"))
    val tot = hist.agg(sum(col("n_b")).cast("long").as("n"))
    val grid = spark.range(0, 21)
      .select((col("id") * KdeGridStep).as("g"))
    val sq2pi = 2.5066282746310002
    val mass = grid.crossJoin(hist)
      .withColumn("d", col("g").cast("double")
        - (col("bin") * 100 + 50).cast("double"))
      .withColumn("w", round(
        exp(col("d") * col("d") /
          lit(-2.0 * KdeBandwidth * KdeBandwidth)) * 1e6).cast("long"))
      .groupBy(col("g"))
      .agg(sum((col("n_b") * col("w")).cast("decimal(38,0)")).as("m"))
    mass.crossJoin(broadcast(tot))
      .select(col("g").as("dollars"),
        round(col("m").cast("double") /
          (col("n").cast("double") * KdeBandwidth * sq2pi * 1e6) * 1e9, 6)
          .as("density_e9"))
  }

  val qKdeSql: String =
    s"""WITH hist AS (SELECT CAST(floor(o_totalprice / 100) AS BIGINT)
       |      AS bin, count(*) AS n_b
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n FROM hist),
       |grid AS (SELECT CAST(unnest(generate_series(0, 20)) * $KdeGridStep
       |    AS BIGINT) AS g),
       |mass AS (SELECT g,
       |    sum(CAST(n_b AS HUGEINT) * CAST(round(exp(
       |      (CAST(g AS DOUBLE) - (bin * 100 + 50))
       |        * (CAST(g AS DOUBLE) - (bin * 100 + 50))
       |        / (-2.0 * $KdeBandwidth * $KdeBandwidth)) * 1e6) AS BIGINT))
       |      AS m
       |  FROM grid CROSS JOIN hist GROUP BY 1)
       |SELECT g AS dollars,
       |  round(CAST(m AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * $KdeBandwidth * 2.5066282746310002 * 1e6)
       |    * 1e9, 6) AS density_e9
       |FROM mass, tot""".stripMargin

  // ---------------------------------------------------------------- L56
  /** Lorenz curve of order-total concentration at the deciles — the
    * CURVE behind L8's single Gini number (an auditor wants to see
    * WHERE the concentration lives: "the bottom half of orders carries
    * 19% of revenue" is actionable, 0.42 alone is not). Same bounded
    * $100-bin histogram device as A40/L22: per-bin count + EXACT
    * decimal-cents revenue, one cumulative window over ≤ ~5,500 bins;
    * each decile's rank cut is the exact integer n·d DIV 10 and a cut
    * landing inside a bin contributes fractionally with the
    * contribution ROUNDED TO WHOLE CENTS (the A40 device — integer in
    * any summation order); the two published shares are one double
    * division each. Monotone convex by construction; spec pins both.
    */
  def qLorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bin"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c_b"),
        sum(col("cents").cast("decimal(38,0)")).as("s_b"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cumb",
      coalesce(sum(col("c_b")).over(w), lit(0L)))
    val tot = hist.agg(sum(col("c_b")).cast("long").as("n"),
      sum(col("s_b")).as("s"))
    val dec = spark.range(1, 11).select(col("id").as("decile"))
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(dec))
      .withColumn("cut", expr("n * decile DIV 10"))
      .withColumn("take", greatest(lit(0L),
        least(col("cumb") + col("c_b"), col("cut")) - col("cumb")))
      .withColumn("contrib",
        round(col("s_b").cast("double") * col("take") / col("c_b"), 0)
          .cast("long"))
      .groupBy(col("decile"))
      .agg(max(col("cut")).as("n_orders_below"),
        sum(col("contrib")).cast("long").as("rev_below_c"),
        max(col("n")).as("n"), max(col("s").cast("double")).as("s"))
      .select(col("decile"), col("n_orders_below"),
        round(col("n_orders_below").cast("double") / col("n"), 6)
          .as("pop_share"),
        round(col("rev_below_c").cast("double") / col("s"), 6)
          .as("rev_share"))
  }

  val qLorenzCurveSql: String =
    """WITH hist AS (SELECT CAST(floor(o_totalprice / 100) AS BIGINT) AS bin,
      |    count(*) AS c_b,
      |    sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
      |      AS s_b
      |  FROM orders GROUP BY 1),
      |cum AS (SELECT bin, c_b, s_b,
      |    coalesce(sum(c_b) OVER (ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM hist),
      |tot AS (SELECT CAST(sum(c_b) AS BIGINT) AS n, sum(s_b) AS s FROM hist),
      |dec AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT)
      |    AS decile),
      |cc AS (SELECT decile, n * decile // 10 AS cut, cumb, c_b, s_b, n, s
      |  FROM cum, tot, dec),
      |ct AS (SELECT decile,
      |    greatest(0, least(cumb + c_b, cut) - cumb) AS take,
      |    cut, c_b, s_b, n, s
      |  FROM cc),
      |agg AS (SELECT decile, max(cut) AS n_orders_below,
      |    CAST(sum(CAST(round(CAST(s_b AS DOUBLE) * take / c_b, 0)
      |      AS BIGINT)) AS BIGINT) AS rev_below_c,
      |    max(n) AS n, max(CAST(s AS DOUBLE)) AS s
      |  FROM ct GROUP BY 1)
      |SELECT decile, CAST(n_orders_below AS BIGINT) AS n_orders_below,
      |  round(CAST(n_orders_below AS DOUBLE) / n, 6) AS pop_share,
      |  round(CAST(rev_below_c AS DOUBLE) / s, 6) AS rev_share
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L57
  /** Cramér–von Mises two-sample test on the same BUILDING-vs-
    * MACHINERY spend distributions as L16 — the GoF family's
    * integral-statistic member (KS reads only the single worst ECDF
    * gap; CvM integrates the squared gap over the WHOLE distribution,
    * so it catches broad mild shifts KS misses and is the standard
    * second opinion). Binned device as L16 ($100 cells, documented
    * resolution trade). Engine parity without an unordered double
    * sum (the q_stl rule): each bin's ECDF gap µ-quantizes EXACTLY —
    * d_µ = halfUp((ca·n2 − cb·n1)·10⁶ / (n1·n2)), sign-split — so
    * Σ (na+nb)·d_µ² is a pure DECIMAL(38,0) integer sum in any order
    * (≤ ~1.5·10²³ at 100 TB, inside the type by design), and
    * T = n1·n2/(n1+n2)² · Σ/10¹² assembles as ONE fixed-order double
    * expression. Verdict vs the asymptotic .05 critical value 0.461.
    */
  def qCvmTest(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val hist = seg.groupBy(col("bin"))
      .agg(count(when(col("seg") === "BUILDING", 1)).as("na"),
        count(when(col("seg") === "MACHINERY", 1)).as("nb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
    val tot = hist.agg(sum(col("na")).cast("long").as("n1"),
      sum(col("nb")).cast("long").as("n2"))
    val dmu = expr(
      """CASE WHEN CAST(ca AS DECIMAL(38,0)) * n2
        |     - CAST(cb AS DECIMAL(38,0)) * n1 >= 0
        | THEN (2 * (CAST(ca AS DECIMAL(38,0)) * n2
        |     - CAST(cb AS DECIMAL(38,0)) * n1) * 1000000
        |   + CAST(n1 AS DECIMAL(38,0)) * n2)
        |   DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n2)
        | ELSE -((2 * (CAST(cb AS DECIMAL(38,0)) * n1
        |     - CAST(ca AS DECIMAL(38,0)) * n2) * 1000000
        |   + CAST(n1 AS DECIMAL(38,0)) * n2)
        |   DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n2)) END"""
        .stripMargin.replace("\n", " "))
    val agg = cum.crossJoin(broadcast(tot))
      .withColumn("dmu", dmu.cast("long"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(((col("na") + col("nb")) * col("dmu") * col("dmu")).cast(d38))
          .as("s2"))
    agg.select(col("n1"), col("n2"),
        round(col("n1").cast("double") * col("n2") /
          ((col("n1") + col("n2")).cast("double") *
            (col("n1") + col("n2"))) *
          (col("s2").cast("double") / 1e12), 6).as("cvm_t"))
      .withColumn("significant", col("cvm_t") > 0.461)
  }

  val qCvmTestSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (SELECT bin,
      |    count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS na,
      |    count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS nb
      |  FROM seg GROUP BY 1),
      |cum AS (SELECT bin, na, nb,
      |    sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS ca,
      |    sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cb
      |  FROM hist),
      |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
      |    CAST(sum(nb) AS BIGINT) AS n2 FROM hist),
      |dd AS (SELECT na, nb,
      |    CASE WHEN CAST(ca AS HUGEINT) * n2 - CAST(cb AS HUGEINT) * n1 >= 0
      |      THEN CAST((2 * (CAST(ca AS HUGEINT) * n2
      |          - CAST(cb AS HUGEINT) * n1) * 1000000
      |        + CAST(n1 AS HUGEINT) * n2)
      |        // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT)
      |      ELSE -CAST((2 * (CAST(cb AS HUGEINT) * n1
      |          - CAST(ca AS HUGEINT) * n2) * 1000000
      |        + CAST(n1 AS HUGEINT) * n2)
      |        // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) END AS dmu,
      |    n1, n2
      |  FROM cum, tot),
      |agg AS (SELECT max(n1) AS n1, max(n2) AS n2,
      |    sum(CAST((na + nb) AS HUGEINT) * dmu * dmu) AS s2
      |  FROM dd)
      |SELECT n1, n2,
      |  round(CAST(n1 AS DOUBLE) * n2
      |    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
      |    * (CAST(s2 AS DOUBLE) / 1e12), 6) AS cvm_t,
      |  (round(CAST(n1 AS DOUBLE) * n2
      |    / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2))
      |    * (CAST(s2 AS DOUBLE) / 1e12), 6) > 0.461) AS significant
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L58
  /** Mood's median test across the five market segments — the
    * quick-and-robust location screen between L14 (Mann–Whitney, two
    * samples) and L27 (Kruskal–Wallis, rank-powered): counts above/at-
    * or-below the GRAND median per segment and a 2×k χ². Survives
    * arbitrary outliers (only the side of the median matters) — the
    * test a dashboard runs when heavy tails make even rank sums
    * expensive to trust. Devices: the L14/L16 $100-bin domain; the
    * grand median from HISTOGRAM ALGEBRA over the bounded bin grid
    * (the two middle order statistics located by one cumulative
    * window + min-over-threshold — quantile_cont semantics with no
    * corpus-buffering percentile aggregate); the 2×k χ² via the L15
    * bounded-cell device (10-dp per-cell round before the 6-dp sum —
    * cells ≤ 2·|segments|); verdict on a data-driven dof cut (the
    * B28 CASE device, dof 1–6). Output one row per segment (K31
    * breakdown discipline) with the global verdict broadcast on each.
    */
  def qMoodMedian(spark: SparkSession, dir: String): DataFrame = {
    // $100-bin domain (the L14/L16/L56/L57 family convention): the
    // grand median comes from HISTOGRAM ALGEBRA over the bounded bin
    // grid — min bin whose cumulative count reaches the two middle
    // order statistics, interpolated — never from an exact-percentile
    // aggregate that buffers the corpus (the scale-killer this
    // replaces; caught by the r16 scaling probe before ship)
    val v = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    // ONE corpus pass: everything (median, cells) folds off the
    // (seg, bin) histogram — the corpus never re-derives (a v reused
    // twice re-ran the join+scan; measured 9 → 5 exchanges)
    val h2 = v.groupBy(col("seg"), col("bin")).agg(count(lit(1)).as("cnt"))
      .cache()
    val hist = h2.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    val wb = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wb))
    val nvTot = hist.agg(sum(col("cnt")).cast("long").as("nv"))
    val med = cum.crossJoin(broadcast(nvTot))
      .agg(min(when(col("cum") >= expr("(nv + 1) DIV 2"), col("bin")))
          .as("v1"),
        min(when(col("cum") >= expr("(nv + 2) DIV 2"), col("bin")))
          .as("v2"))
      .select(((col("v1") + col("v2")) / 2.0).as("med"))
    val cells = h2.crossJoin(broadcast(med))
      .groupBy(col("seg"))
      .agg(sum(when(col("bin") > col("med"), col("cnt")).otherwise(0L))
          .cast("long").as("n_above"),
        sum(when(col("bin") <= col("med"), col("cnt")).otherwise(0L))
          .cast("long").as("n_le"))
    val tot = cells.agg(sum(col("n_above")).cast("long").as("ra"),
      sum(col("n_le")).cast("long").as("rl"),
      count(lit(1)).cast("long").as("k"))
    val grid = cells.crossJoin(broadcast(tot))
      .withColumn("nj", col("n_above") + col("n_le"))
      .withColumn("nn", (col("ra") + col("rl")).cast("double"))
      .withColumn("ea", col("ra").cast("double") * col("nj") / col("nn"))
      .withColumn("el", col("rl").cast("double") * col("nj") / col("nn"))
      .withColumn("t",
        round((col("n_above") - col("ea")) * (col("n_above") - col("ea")) /
          col("ea"), 10) +
          round((col("n_le") - col("el")) * (col("n_le") - col("el")) /
            col("el"), 10))
    val verdict = grid.agg(max(col("k")).as("k"),
        (max(col("ra")) + max(col("rl"))).as("n"),
        round(sum(col("t")), 6).as("chi2"))
      .withColumn("dof", col("k") - 1)
      .withColumn("critical", expr(
        """CASE dof WHEN 1 THEN 3.841 WHEN 2 THEN 5.991 WHEN 3 THEN 7.815
          | WHEN 4 THEN 9.488 WHEN 5 THEN 11.07 WHEN 6 THEN 12.592
          | END""".stripMargin.replace("\n", " ")))
      .withColumn("significant", col("chi2") > col("critical"))
      .select(col("n"), col("chi2"), col("dof"), col("significant"))
    cells.crossJoin(broadcast(verdict))
  }

  val qMoodMedianSql: String =
    """WITH v AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |h2 AS (SELECT seg, bin, count(*) AS cnt FROM v GROUP BY 1, 2),
      |hist AS (SELECT bin, sum(cnt) AS cnt FROM h2 GROUP BY 1),
      |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |nvtot AS (SELECT CAST(sum(cnt) AS BIGINT) AS nv FROM hist),
      |med AS (SELECT
      |    (min(CASE WHEN cum >= (nv + 1) // 2 THEN bin END)
      |     + min(CASE WHEN cum >= (nv + 2) // 2 THEN bin END)) / 2.0
      |      AS med
      |  FROM cum, nvtot),
      |cells AS (SELECT seg,
      |    CAST(sum(CASE WHEN bin > med THEN cnt ELSE 0 END) AS BIGINT)
      |      AS n_above,
      |    CAST(sum(CASE WHEN bin <= med THEN cnt ELSE 0 END) AS BIGINT)
      |      AS n_le
      |  FROM h2, med GROUP BY seg),
      |tot AS (SELECT CAST(sum(n_above) AS BIGINT) AS ra,
      |    CAST(sum(n_le) AS BIGINT) AS rl,
      |    CAST(count(*) AS BIGINT) AS k FROM cells),
      |grid AS (SELECT cells.*, ra, rl, k, n_above + n_le AS nj,
      |    CAST(ra + rl AS DOUBLE) AS nn FROM cells, tot),
      |terms AS (SELECT *,
      |    round((n_above - CAST(ra AS DOUBLE) * nj / nn)
      |      * (n_above - CAST(ra AS DOUBLE) * nj / nn)
      |      / (CAST(ra AS DOUBLE) * nj / nn), 10)
      |    + round((n_le - CAST(rl AS DOUBLE) * nj / nn)
      |      * (n_le - CAST(rl AS DOUBLE) * nj / nn)
      |      / (CAST(rl AS DOUBLE) * nj / nn), 10) AS t
      |  FROM grid),
      |verdict AS (SELECT max(ra) + max(rl) AS n, round(sum(t), 6) AS chi2,
      |    max(k) - 1 AS dof
      |  FROM terms),
      |vx AS (SELECT n, chi2, dof,
      |    chi2 > (CASE dof WHEN 1 THEN 3.841 WHEN 2 THEN 5.991
      |      WHEN 3 THEN 7.815 WHEN 4 THEN 9.488 WHEN 5 THEN 11.07
      |      WHEN 6 THEN 12.592 END) AS significant
      |  FROM verdict)
      |SELECT cells.seg, cells.n_above, cells.n_le,
      |  vx.n, vx.chi2, vx.dof, vx.significant
      |FROM cells, vx""".stripMargin

  // ---------------------------------------------------------------- L59
  /** Wilcoxon signed-rank test on paired per-customer revenue,
    * first half-year (months 1–6) vs second (7–12) pooled across
    * years — the rank-powered upgrade of L43's sign test (the sign
    * test throws away magnitudes; Wilcoxon ranks |d| and so detects
    * shifts the sign test needs far more data to see). Absent halves
    * count as zero revenue (the paired-period convention — a customer
    * ordering only in H1 IS a difference signal); zero differences
    * drop (the standard Wilcoxon convention). ENGINE-EXACT ranks with
    * NO per-row rank window (the L14 histogram-algebra device): |d|
    * bins to $1 granularity (the L14 binning convention — bounds the
    * rank grid), and a tie group of size t after cumulative mass cb
    * contributes doubled average rank 2·cb + t + 1 per member — so
    * W⁺/W⁻ fold directly off the bounded gap histogram as exact
    * DECIMAL(38,0) integers (published as digit strings, the
    * q_bollinger device: n(n+1) wraps int64 past ~3·10⁹ pairs); the
    * tie-corrected normal approximation assembles as ONE fixed-order
    * double expression over exact integers:
    * z = ((2W⁺₂ − n(n+1))/4) / √((2n(n+1)(2n+1) − Σ(t³−t))/48)
    * (W⁺₂ = doubled W⁺; no continuity correction, documented).
    * Verdict |z| > 1.96 on the 6-dp-rounded z.
    */
  def qWilcoxonSigned(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        (month(col("o_orderdate")) <= 6).as("h1"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("cust"))
      .agg(sum(when(col("h1"), col("cents")).otherwise(0L)).as("a"),
        sum(when(!col("h1"), col("cents")).otherwise(0L)).as("b"))
      .select(col("cust"), (col("a") - col("b")).as("d"))
      .filter(col("d") =!= 0)
    // tie-group HISTOGRAM ALGEBRA (the L14 device — never a
    // row_number over individual pairs): a tie group of size t
    // starting after cumulative mass cb holds doubled ranks summing
    // to t·(2·cb + t + 1) per member — so both rank sums, n and the
    // tie term all fold off the |distinct gap| grid, and the one
    // single-partition window runs over that bounded grid ($1
    // granularity on |d|, the L14 binning convention)
    val hist = rev.withColumn("adb", expr("abs(d) DIV 100"))
      .groupBy(col("adb"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("tpos"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("tneg"))
    val wb = Window.orderBy(col("adb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cb", coalesce(sum(col("t")).over(wb), lit(0L)))
      .withColumn("dr2", col("cb") * 2 + col("t") + 1)
    val agg = cum.agg(sum(col("t")).cast("long").as("n"),
      sum((col("tpos").cast(d38) * col("dr2")).cast(d38)).as("w2p"),
      sum((col("tneg").cast(d38) * col("dr2")).cast(d38)).as("w2m"),
      sum(col("t").cast(d38) * col("t") * col("t") - col("t")).as("tc"))
    agg
      .withColumn("z", round(
        ((col("w2p") * 2 - col("n").cast(d38) * (col("n") + 1))
          .cast("double") / 4.0) /
          sqrt((lit(2).cast(d38) * col("n") * (col("n") + 1) *
            (col("n") * 2 + 1) - col("tc")).cast("double") / 48.0), 6))
      // doubled rank sums and the tie term overflow int64 at extreme
      // pair counts (n(n+1) wraps past ~3e9 pairs) — digit strings,
      // the q_bollinger var7_num device
      .select(col("n").as("n_pairs"),
        col("w2p").cast("string").as("w2_plus"),
        col("w2m").cast("string").as("w2_minus"),
        col("tc").cast("string").as("tie_term"), col("z"),
        (abs(col("z")) > 1.96).as("significant"))
  }

  val qWilcoxonSignedSql: String =
    """WITH rev AS (SELECT o_custkey AS cust,
      |    CAST(sum(CASE WHEN month(o_orderdate) <= 6
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
      |      ELSE 0 END) AS BIGINT)
      |    - CAST(sum(CASE WHEN month(o_orderdate) > 6
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS d
      |  FROM orders GROUP BY 1),
      |nz AS (SELECT cust, d, abs(d) // 100 AS adb FROM rev WHERE d <> 0),
      |hist AS (SELECT adb, count(*) AS t,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tpos,
      |    CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tneg
      |  FROM nz GROUP BY adb),
      |cum AS (SELECT adb, t, tpos, tneg,
      |    coalesce(sum(t) OVER (ORDER BY adb
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM hist),
      |agg AS (SELECT CAST(sum(t) AS BIGINT) AS n,
      |    sum(CAST(tpos AS HUGEINT) * (cb * 2 + t + 1)) AS w2p,
      |    sum(CAST(tneg AS HUGEINT) * (cb * 2 + t + 1)) AS w2m,
      |    sum(CAST(t AS HUGEINT) * t * t - t) AS tc
      |  FROM cum),
      |zed AS (SELECT n, w2p, w2m, tc,
      |    round((CAST(w2p * 2 - CAST(n AS HUGEINT) * (n + 1) AS DOUBLE)
      |      / 4.0)
      |      / sqrt(CAST(2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - tc
      |        AS DOUBLE) / 48.0), 6) AS z
      |  FROM agg)
      |SELECT n AS n_pairs, CAST(w2p AS VARCHAR) AS w2_plus,
      |  CAST(w2m AS VARCHAR) AS w2_minus, CAST(tc AS VARCHAR) AS tie_term,
      |  z, abs(z) > 1.96 AS significant
      |FROM zed""".stripMargin

  // ---------------------------------------------------------------- L60
  /** Two-sample Anderson–Darling test (Pettitt 1976) on the BUILDING
    * vs MACHINERY order-total distributions — the tail-sensitive
    * completion of the L16 KS / L56 Cramér–von Mises trio: KS sees
    * the single largest ECDF gap, CvM the average squared gap, AD
    * re-weights the squared gaps by 1/(H(1−H)) so the TAILS — where
    * ECDFs are pinned near 0/1 and small gaps are most surprising —
    * dominate; the test of record when the worry is tail behavior
    * (pricing outliers, heavy-tailed engagement). Same $100 binning
    * as L56. Exact-integer device (the CvM pattern, two quantization
    * stages, both engine-identical): per bin the gap numerator
    * e = n2·Ma − n1·Mb is exact (cast-before-multiply DECIMAL, the
    * r16 CvM fix applied from birth), g_µ = halfUp(10⁶·e/(n1·n2)) is
    * a sign-split exact long (|g_µ| ≤ 10⁶ since |e| ≤ n1·n2), the
    * per-bin weighted term h = halfUp(10¹²·b·g_µ²/(B·(N−B))) is an
    * exact DECIMAL (≤ 10³⁵ at 100 TB — inside the type), and
    * A² = n1·n2·Σh/10²⁴ assembles as ONE fixed-order double
    * expression. Last cumulative bin (B = N) excluded by the formula.
    * Verdict vs the asymptotic .05 critical 2.492.
    */
  def qAndersonDarling(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val hist = seg.groupBy(col("bin"))
      .agg(count(when(col("seg") === "BUILDING", 1)).as("na"),
        count(when(col("seg") === "MACHINERY", 1)).as("nb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("ma", sum(col("na")).over(w))
      .withColumn("mb", sum(col("nb")).over(w))
    val tot = hist.agg(sum(col("na")).cast("long").as("n1"),
      sum(col("nb")).cast("long").as("n2"))
    val gmu = expr(
      """CASE WHEN CAST(ma AS DECIMAL(38,0)) * n2
        |     - CAST(mb AS DECIMAL(38,0)) * n1 >= 0
        | THEN (2 * (CAST(ma AS DECIMAL(38,0)) * n2
        |     - CAST(mb AS DECIMAL(38,0)) * n1) * 1000000
        |   + CAST(n1 AS DECIMAL(38,0)) * n2)
        |   DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n2)
        | ELSE -((2 * (CAST(mb AS DECIMAL(38,0)) * n1
        |     - CAST(ma AS DECIMAL(38,0)) * n2) * 1000000
        |   + CAST(n1 AS DECIMAL(38,0)) * n2)
        |   DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n2)) END"""
        .stripMargin.replace("\n", " "))
    val agg = cum.crossJoin(broadcast(tot))
      .withColumn("bb", (col("ma") + col("mb")).cast("long"))
      .withColumn("nn", col("n1") + col("n2"))
      .filter(col("bb") < col("nn"))
      .withColumn("gmu", gmu.cast("long"))
      .withColumn("h", expr(
        """(2 * ((CAST(na AS DECIMAL(38,0)) + nb)
          |   * CAST(gmu AS DECIMAL(38,0)) * gmu) * 1000000000000
          | + CAST(bb AS DECIMAL(38,0)) * (nn - bb))
          | DIV (2 * CAST(bb AS DECIMAL(38,0)) * (nn - bb))"""
          .stripMargin.replace("\n", " ")))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("h").cast(d38)).as("s"))
    agg.select(col("n1"), col("n2"),
        round(col("n1").cast("double") * col("n2") / 1e12 *
          (col("s").cast("double") / 1e12), 6).as("ad_a2"))
      .withColumn("significant", col("ad_a2") > 2.492)
  }

  val qAndersonDarlingSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (SELECT bin,
      |    count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS na,
      |    count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS nb
      |  FROM seg GROUP BY 1),
      |cum AS (SELECT bin, na, nb,
      |    sum(na) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS ma,
      |    sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS mb
      |  FROM hist),
      |tot AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
      |    CAST(sum(nb) AS BIGINT) AS n2 FROM hist),
      |gg AS (SELECT na, nb, n1, n2,
      |    CAST(ma + mb AS BIGINT) AS bb, n1 + n2 AS nn,
      |    CASE WHEN CAST(ma AS HUGEINT) * n2 - CAST(mb AS HUGEINT) * n1 >= 0
      |      THEN CAST((2 * (CAST(ma AS HUGEINT) * n2
      |          - CAST(mb AS HUGEINT) * n1) * 1000000
      |        + CAST(n1 AS HUGEINT) * n2)
      |        // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT)
      |      ELSE -CAST((2 * (CAST(mb AS HUGEINT) * n1
      |          - CAST(ma AS HUGEINT) * n2) * 1000000
      |        + CAST(n1 AS HUGEINT) * n2)
      |        // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) END AS gmu
      |  FROM cum, tot WHERE ma + mb < n1 + n2),
      |hh AS (SELECT n1, n2,
      |    (2 * ((CAST(na AS HUGEINT) + nb)
      |        * CAST(gmu AS HUGEINT) * gmu) * 1000000000000
      |      + CAST(bb AS HUGEINT) * (nn - bb))
      |      // (2 * CAST(bb AS HUGEINT) * (nn - bb)) AS h
      |  FROM gg),
      |agg AS (SELECT max(n1) AS n1, max(n2) AS n2, sum(h) AS s FROM hh)
      |SELECT n1, n2,
      |  round(CAST(n1 AS DOUBLE) * n2 / 1e12
      |    * (CAST(s AS DOUBLE) / 1e12), 6) AS ad_a2,
      |  (round(CAST(n1 AS DOUBLE) * n2 / 1e12
      |    * (CAST(s AS DOUBLE) / 1e12), 6) > 2.492) AS significant
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L61
  /** Atkinson inequality index (ε = 1) of order totals — the
    * welfare-theoretic member of the inequality family (L49 Lorenz
    * gives the curve, L50's Gini the area; Atkinson(1) = 1 −
    * geomean/mean answers "what fraction of total spend could be
    * discarded if it were spread evenly, at log utility" — the number
    * that moves fastest when the SMALL orders shrink, where Gini is
    * most sensitive mid-distribution). Exact device: per-row
    * ln(cents) µ-quantizes to a long (the E33 device, the
    * q_price_elasticity linear-scan class), Σln and Σcents are exact
    * DECIMAL(38,0) sums, and the index assembles as ONE fixed-order
    * double expression 1 − exp(L/n/10⁶)/(S/n). Positive-only by
    * construction (order totals); zero/negative rows are excluded
    * defensively and counted.
    */
  def qAtkinson(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
    val agg = v.agg(
      sum(when(col("cents") <= 0, 1L).otherwise(0L)).cast("long")
        .as("n_nonpos"),
      count(when(col("cents") > 0, 1)).cast("long").as("n"),
      sum(when(col("cents") > 0, col("cents")).otherwise(0L)).cast(d38)
        .as("s"),
      sum(when(col("cents") > 0,
        round(log(col("cents").cast("double")) * 1e6).cast("long"))
        .otherwise(0L)).cast(d38).as("l"))
    agg.select(col("n"), col("n_nonpos"),
      col("s").cast("long").as("sum_cents"),
      round(exp(col("l").cast("double") / col("n") / 1e6), 4)
        .as("geomean_cents"),
      round(col("s").cast("double") / col("n"), 4).as("mean_cents"),
      round(lit(1.0) - exp(col("l").cast("double") / col("n") / 1e6) /
        (col("s").cast("double") / col("n")), 6).as("atkinson_e1"))
  }

  val qAtkinsonSql: String =
    """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |agg AS (SELECT
      |    CAST(sum(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_nonpos,
      |    CAST(count(CASE WHEN cents > 0 THEN 1 END) AS BIGINT) AS n,
      |    sum(CASE WHEN cents > 0 THEN CAST(cents AS HUGEINT)
      |      ELSE 0 END) AS s,
      |    sum(CASE WHEN cents > 0
      |      THEN CAST(round(ln(CAST(cents AS DOUBLE)) * 1000000) AS HUGEINT)
      |      ELSE 0 END) AS l
      |  FROM v)
      |SELECT n, n_nonpos, CAST(s AS BIGINT) AS sum_cents,
      |  round(exp(CAST(l AS DOUBLE) / n / 1e6), 4) AS geomean_cents,
      |  round(CAST(s AS DOUBLE) / n, 4) AS mean_cents,
      |  round(1.0 - exp(CAST(l AS DOUBLE) / n / 1e6)
      |    / (CAST(s AS DOUBLE) / n), 6) AS atkinson_e1
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L62
  /** Page's trend test (Page 1963) for ordered alternatives — the
    * directional completion of L28's Friedman: Friedman asks "do the
    * months differ at all", Page asks "do they INCREASE in calendar
    * order" (the seasonality-direction readout a forecast chooses its
    * trend term by), and is far more powerful when the alternative is
    * monotone. Blocks = nations, treatments = order months 1–12,
    * block value = exact revenue cents; only complete blocks (all 12
    * months) enter. Ranks are deterministic row_numbers within a
    * block (value ASC, month ASC — the L28 tie convention), so
    * L = ΣΣ j·R_bj is an exact integer; E[L] = n·k(k+1)²/4 and
    * Var[L] = n·k²(k+1)(k²−1)/144 are exact integer formulas, and
    * z = (L − E)/√Var assembles as ONE fixed-order double. One-sided
    * verdict z > 1.645 (increasing calendar trend) on the 6-dp round.
    * Shapes: one (nation, month) keyed aggregate, 12-row block
    * windows, one reduce.
    */
  def qPageTrend(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cell = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast(d38)
        .as("rev"))
    val complete = cell.groupBy(col("nation"))
      .agg(count(lit(1)).as("nm")).filter(col("nm") === 12)
      .select(col("nation"))
    val ranked = cell.join(broadcast(complete), "nation")
      .withColumn("r", row_number().over(Window.partitionBy(col("nation"))
        .orderBy(col("rev").asc, col("mo").asc)))
    val agg = ranked.agg(
      (count(lit(1)) / 12).cast("long").as("n_blocks"),
      sum(col("mo").cast(d38) * col("r")).cast("long").as("l_stat"))
    // k = 12 folds the closed forms to integers: E[L] = 507·n,
    // Var[L] = 1859·n — exact longs, one double division
    agg.select(col("n_blocks"), lit(12).as("k"), col("l_stat"),
        round((col("l_stat") - col("n_blocks") * 507L).cast("double") /
          sqrt((col("n_blocks") * 1859L).cast("double")), 6).as("z"))
      .withColumn("increasing_trend", col("z") > 1.645)
  }

  val qPageTrendSql: String =
    """WITH cell AS (SELECT c_nationkey AS nation,
      |    month(o_orderdate) AS mo,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |complete AS (SELECT nation FROM cell GROUP BY 1
      |  HAVING count(*) = 12),
      |ranked AS (SELECT nation, mo,
      |    row_number() OVER (PARTITION BY nation
      |      ORDER BY rev ASC, mo ASC) AS r
      |  FROM cell JOIN complete USING (nation)),
      |agg AS (SELECT CAST(count(*) // 12 AS BIGINT) AS n_blocks,
      |    CAST(sum(CAST(mo AS HUGEINT) * r) AS BIGINT) AS l_stat
      |  FROM ranked)
      |SELECT n_blocks, 12 AS k, l_stat,
      |  round(CAST(l_stat - n_blocks * 507 AS DOUBLE)
      |    / sqrt(CAST(n_blocks * 1859 AS DOUBLE)), 6) AS z,
      |  (round(CAST(l_stat - n_blocks * 507 AS DOUBLE)
      |    / sqrt(CAST(n_blocks * 1859 AS DOUBLE)), 6) > 1.645)
      |    AS increasing_trend
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L63
  /** Breusch–Pagan heteroskedasticity test on the E22 per-flag OLS
    * (extendedprice ~ quantity) — the residual-variance audit that
    * decides whether E22's RMSE means anything: under
    * heteroskedasticity the single RMSE misstates uncertainty at
    * both ends of the x range and WLS/robust errors are indicated.
    * Two-stage engine-exact device: (1) slope/intercept derive from
    * exact DECIMAL(38,0) power sums via fixed-order double divisions
    * and ROUND AT 6 DP — the rounded coefficients are the shared
    * deterministic anchor (never regr_slope, whose internal
    * accumulation order differs between engines); (2) per-row
    * residuals quantize to whole DOLLARS (one fixed-order double
    * expression over exact ints + the two 6-dp constants), so the
    * auxiliary regression of e² on x runs on exact integer moments
    * (Σz² ≤ ~10³⁶ at 100 TB — inside DECIMAL(38,0) by the dollar
    * quantization, which is WHY the quantization is at dollars, not
    * cents). LM = n·R²_aux as one fixed-order double; verdict vs
    * χ²(1) = 3.841. One extra corpus pass beyond E22's aggregate.
    */
  def qBreuschPagan(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
    val mom = rows.groupBy(col("flag")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x").cast(d38) * col("x")).cast(d38)).as("sxx"),
      sum((col("x").cast(d38) * col("y")).cast(d38)).as("sxy"))
    val coef = mom
      // sign-split cast (SURVEY §5): the slope numerator can be a
      // negative >2^53 decimal, where a direct negative→double cast
      // mis-rounds in DuckDB; the denominator is ≥ 0 by C–S
      .withColumn("bnum", (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast(d38))
      .withColumn("b", round(expr(
        "CASE WHEN bnum >= 0 THEN CAST(bnum AS DOUBLE)" +
          " ELSE -CAST(-bnum AS DOUBLE) END") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
      .withColumn("a", round((col("sy").cast("double") -
        col("b") * col("sx").cast("double")) / col("n").cast("double"), 6))
      .select(col("flag"), col("b"), col("a"))
    val aux = rows.join(broadcast(coef), "flag")
      .withColumn("e", round((col("y").cast("double") - col("a") -
        col("b") * col("x").cast("double")) / 100.0).cast("long"))
      .withColumn("z", (col("e").cast(d38) * col("e")).cast(d38))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum((col("x").cast(d38) * col("x")).cast(d38)).as("sxx"),
        sum(col("z")).as("sz"),
        sum((col("x").cast(d38) * col("z")).cast(d38)).as("sxz"),
        sum((col("z") * col("z")).cast(d38)).as("szz"))
    aux.select(col("flag"), col("n").cast("long").as("n"),
        round(
          pow(col("n").cast("double") * col("sxz").cast("double") -
            col("sx").cast("double") * col("sz").cast("double"), 2) /
            ((col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              (col("n").cast("double") * col("szz").cast("double") -
                col("sz").cast("double") * col("sz").cast("double"))) *
            col("n").cast("double"), 6).as("bp_lm"))
      .withColumn("heteroskedastic", col("bp_lm") > 3.841)
  }

  val qBreuschPaganSql: String =
    """WITH rows0 AS (SELECT l_returnflag AS flag,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem),
      |mom AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM rows0 GROUP BY 1),
      |coef AS (SELECT flag,
      |    round((CASE WHEN n * sxy - sx * sy >= 0
      |        THEN CAST(n * sxy - sx * sy AS DOUBLE)
      |        ELSE -CAST(-(n * sxy - sx * sy) AS DOUBLE) END)
      |      / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS b
      |  FROM mom),
      |coef2 AS (SELECT mom.flag, b,
      |    round((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
      |      / CAST(n AS DOUBLE), 6) AS a
      |  FROM mom JOIN coef ON mom.flag = coef.flag),
      |aux AS (SELECT r.flag, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(e AS HUGEINT) * e) AS sz,
      |    sum(CAST(x AS HUGEINT) * CAST(e AS HUGEINT) * e) AS sxz,
      |    sum((CAST(e AS HUGEINT) * e) * (CAST(e AS HUGEINT) * e)) AS szz
      |  FROM (SELECT flag, x,
      |      CAST(round((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
      |        / 100.0) AS BIGINT) AS e
      |    FROM rows0 JOIN coef2 USING (flag)) r
      |  GROUP BY 1)
      |SELECT flag, n,
      |  round(pow(CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE), 2)
      |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
      |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
      |    * CAST(n AS DOUBLE), 6) AS bp_lm,
      |  (round(pow(CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE), 2)
      |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
      |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)))
      |    * CAST(n AS DOUBLE), 6) > 3.841) AS heteroskedastic
      |FROM aux""".stripMargin

  // ---------------------------------------------------------------- L64
  /** Hill tail-index estimator of order totals — the heavy-tail
    * exponent behind every "can I trust the mean" decision on spend
    * data (α < 2 ⟹ infinite variance: L8/L50's Gini and L61's
    * Atkinson move but the CLT-based tests lose their footing; the
    * L49/L56 curves SHOW the tail, Hill MEASURES its power law).
    * Classic top-k order-statistics estimator at fixed k = 200:
    * α̂ = k / Σ_{i≤k} (ln x_(i) − ln x_(k+1)). Devices: the exact-
    * integer ORDERING top-k cut ((cents DESC, orderkey ASC) — a
    * distributed TakeOrdered, never a global sort); per-value µ-
    * quantized lns (E33) so the log-spacing sum is an exact long;
    * α = ONE double division k·10⁶/Σd. Publishes k, the threshold
    * value, Σd, α (6 dp) and the infinite-variance verdict α < 2.
    */
  def qHillTail(spark: SparkSession, dir: String): DataFrame = {
    val k = 200
    val top = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey").as("okey"))
      .orderBy(col("cents").desc, col("okey").asc)
      .limit(k + 1)
      .withColumn("lmu", round(log(col("cents").cast("double")) * 1e6)
        .cast("long"))
    // bounded 201-row frame: the rank window is driver-bounded by the
    // limit, never corpus-scale
    val ranked = top.withColumn("r", row_number().over(
      Window.orderBy(col("cents").desc, col("okey").asc)))
    val ref = ranked.filter(col("r") === k + 1)
      .select(col("cents").as("x_ref"), col("lmu").as("lref"))
    ranked.filter(col("r") <= k).crossJoin(broadcast(ref))
      .agg(max(lit(k)).as("k"), max(col("x_ref")).as("x_ref_cents"),
        sum(col("lmu") - col("lref")).cast("long").as("sum_dmu"))
      .withColumn("hill_alpha",
        round(lit(k).cast("double") * 1e6 /
          col("sum_dmu").cast("double"), 6))
      .withColumn("infinite_variance", col("hill_alpha") < 2.0)
  }

  val qHillTailSql: String =
    """WITH top0 AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
      |      AS cents, o_orderkey AS okey
      |  FROM orders ORDER BY cents DESC, okey ASC LIMIT 201),
      |ranked AS (SELECT cents,
      |    CAST(round(ln(CAST(cents AS DOUBLE)) * 1000000) AS BIGINT)
      |      AS lmu,
      |    row_number() OVER (ORDER BY cents DESC, okey ASC) AS r
      |  FROM top0),
      |ref AS (SELECT cents AS x_ref, lmu AS lref FROM ranked
      |  WHERE r = 201),
      |agg AS (SELECT 200 AS k, max(x_ref) AS x_ref_cents,
      |    CAST(sum(lmu - lref) AS BIGINT) AS sum_dmu
      |  FROM ranked, ref WHERE r <= 200)
      |SELECT k, x_ref_cents, sum_dmu,
      |  round(200.0 * 1000000 / CAST(sum_dmu AS DOUBLE), 6) AS hill_alpha,
      |  (round(200.0 * 1000000 / CAST(sum_dmu AS DOUBLE), 6) < 2.0)
      |    AS infinite_variance
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L65
  /** Per-column table profile — the ANALYZE-style statistics snapshot
    * (rows, nulls, exact NDV, min/max) every optimizer, data-card and
    * drift monitor keys off; L1 asserts EXPECTATIONS, this publishes
    * the raw profile those expectations are calibrated from. Eleven
    * columns across the four biggest tables, each table scanned ONCE
    * (all of a table's columns fuse into one aggregate — Spark plans
    * the multi-countDistinct as one Expand pass, still a single scan),
    * then `stack` unpivots to one row per column (the L1 device).
    * Exact-render discipline: double columns pre-project to exact
    * integer cents so min/max render identically in both engines
    * (double→string formatting is NOT cross-engine stable; integer
    * strings are). NDV is exact countDistinct — the approximate
    * 100 TB fast path is H9's HLL, oracle-anchored by this exact
    * form (the A11b↔H9 relationship).
    */
  def qTableProfile(spark: SparkSession, dir: String): DataFrame = {
    def prof(df: DataFrame, table: String): DataFrame = {
      val cs = df.schema.fieldNames.toSeq
      val agg = df.agg(count(lit(1)).as("n_rows"),
        cs.flatMap(n => Seq(
          sum(when(col(n).isNull, 1L).otherwise(0L)).cast("long")
            .as(s"nl_$n"),
          countDistinct(col(n)).as(s"nd_$n"),
          min(col(n)).cast("string").as(s"mn_$n"),
          max(col(n)).cast("string").as(s"mx_$n"))): _*)
      agg.select(lit(table).as("tbl"), col("n_rows"), expr(
        "stack(" + cs.size + ", " + cs.map(n =>
          s"'$n', nl_$n, nd_$n, mn_$n, mx_$n").mkString(", ") +
          ") AS (col_name, n_nulls, ndv, min_val, max_val)"))
    }
    prof(Tables.lineitem(spark, dir).select(
        col("l_quantity").cast("long").as("l_quantity"),
        col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("l_price_c")),
      "lineitem")
      .unionAll(prof(Tables.orders(spark, dir).select(
        col("o_orderstatus"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("o_total_c")),
        "orders"))
      .unionAll(prof(Tables.customer(spark, dir).select(
        col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("c_acctbal_c")),
        "customer"))
      .unionAll(prof(Tables.documents(spark, dir).select(
        col("lang"), col("source"), col("n_chars")), "documents"))
  }

  private def tableProfileSqlFor(withNdvOk: Boolean): String = {
    def one(table: String, proj: String,
        cols: Seq[String]): (String, String) = {
      val aggCols = cols.flatMap(n => Seq(
        s"CAST(sum(CASE WHEN $n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl_$n",
        s"CAST(count(DISTINCT $n) AS BIGINT) AS nd_$n",
        s"CAST(min($n) AS VARCHAR) AS mn_$n",
        s"CAST(max($n) AS VARCHAR) AS mx_$n")).mkString(", ")
      // the oracle's side of the A11b device: the exact NDV is
      // recomputed here, the sketch bound is asserted TRUE — a Spark
      // estimate outside its rsd bound flips the boolean and fails
      // the hash
      val okCol = if (withNdvOk) ",\n           |  true AS ndv_ok" else ""
      val rows = cols.map(n =>
        s"""SELECT tbl, n_rows, '$n' AS col_name, nl_$n AS n_nulls,
           |  nd_$n AS ndv$okCol,
           |  mn_$n AS min_val, mx_$n AS max_val
           |  FROM agg_$table""".stripMargin).mkString("\nUNION ALL\n")
      (s"""p_$table AS (SELECT $proj FROM $table),
          |agg_$table AS (SELECT '$table' AS tbl,
          |  CAST(count(*) AS BIGINT) AS n_rows, $aggCols FROM p_$table)"""
        .stripMargin, rows)
    }
    val parts = Seq(
      one("lineitem",
        "CAST(l_quantity AS BIGINT) AS l_quantity, l_returnflag, " +
          "CAST(round(l_extendedprice * 100) AS BIGINT) AS l_price_c",
        Seq("l_quantity", "l_returnflag", "l_price_c")),
      one("orders",
        "o_orderstatus, o_custkey, " +
          "CAST(round(o_totalprice * 100) AS BIGINT) AS o_total_c",
        Seq("o_orderstatus", "o_custkey", "o_total_c")),
      one("customer",
        "c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_c",
        Seq("c_mktsegment", "c_acctbal_c")),
      one("documents", "lang, source, n_chars",
        Seq("lang", "source", "n_chars")))
    "WITH " + parts.map(_._1).mkString(",\n") + "\n" +
      parts.map(_._2).mkString("\nUNION ALL\n")
  }

  val qTableProfileSql: String = tableProfileSqlFor(withNdvOk = false)

  // ---------------------------------------------------------------- L66
  /** The APPROXIMATE table profile — L65's disclosed 100 TB production
    * path (H9's HLL++ NDV instead of the exact Expand pass), promoted
    * from a doc note to a verified query (r16 verdict ask #8). Same
    * eleven columns, same single-scan-per-table shape, but each
    * column's NDV also runs through `approx_count_distinct`
    * (rsd 0.02) and publishes the A11b verdict: the exact NDV plus a
    * boolean asserting the sketch landed within 3× its configured rsd
    * (bound 0.06). The sketch's bit pattern is engine-specific, so
    * the oracle recomputes the exact side and emits `true` — an
    * estimate outside its bound flips the boolean and fails the hash.
    * The exact branch exists here to prove the bound; the pure
    * production form drops it and keeps one pass, fixed sketch
    * memory, no Expand, no distinct shuffle (the I4 rewrite knob
    * applies the same swap plan-wide).
    */
  def qTableProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    def prof(df: DataFrame, table: String): DataFrame = {
      val cs = df.schema.fieldNames.toSeq
      // the sketches aggregate in their OWN pass, not fused into the
      // exact aggregate: HLL++ is an ImperativeAggregate, and one in
      // a HashAggregate disables whole-stage codegen for the whole
      // operator — fused, every CASE/min/max/countDistinct expression
      // fell back to interpreted eval (measured 8× at sf0.1). Split,
      // the wide exact aggregate keeps codegen and the narrow sketch
      // pass pays interpretation only for its own 2-3 updates per row
      val agg = df.agg(count(lit(1)).as("n_rows"),
        cs.flatMap(n => Seq(
          sum(when(col(n).isNull, 1L).otherwise(0L)).cast("long")
            .as(s"nl_$n"),
          countDistinct(col(n)).as(s"nd_$n"),
          min(col(n)).cast("string").as(s"mn_$n"),
          max(col(n)).cast("string").as(s"mx_$n"))): _*)
      val ap = df.agg(
        approx_count_distinct(col(cs.head), 0.02).as(s"ap_${cs.head}"),
        cs.tail.map(n =>
          approx_count_distinct(col(n), 0.02).as(s"ap_$n")): _*)
      agg.crossJoin(broadcast(ap))
        .select(lit(table).as("tbl"), col("n_rows"), expr(
        "stack(" + cs.size + ", " + cs.map(n =>
          s"'$n', nl_$n, nd_$n, " +
            s"CAST(abs(ap_$n - nd_$n) AS DOUBLE) <= 0.06 * CAST(nd_$n AS DOUBLE), " +
            s"mn_$n, mx_$n").mkString(", ") +
          ") AS (col_name, n_nulls, ndv, ndv_ok, min_val, max_val)"))
    }
    prof(Tables.lineitem(spark, dir).select(
        col("l_quantity").cast("long").as("l_quantity"),
        col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("l_price_c")),
      "lineitem")
      .unionAll(prof(Tables.orders(spark, dir).select(
        col("o_orderstatus"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("o_total_c")),
        "orders"))
      .unionAll(prof(Tables.customer(spark, dir).select(
        col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("c_acctbal_c")),
        "customer"))
      .unionAll(prof(Tables.documents(spark, dir).select(
        col("lang"), col("source"), col("n_chars")), "documents"))
  }

  val qTableProfileApproxSql: String = tableProfileSqlFor(withNdvOk = true)

  // ---------------------------------------------------------------- L71
  /** Dunn's post-hoc test — the pairwise follow-up L19's Kruskal–
    * Wallis omnibus demands (KW says "some segment differs"; Dunn
    * says WHICH pairs, at a Bonferroni-held family error — the
    * nonparametric sibling of L32's Tukey HSD). Rides the IDENTICAL
    * $100-bin doubled-rank histogram algebra as L19 (tie-average
    * ranks fold off the bin histogram; the corpus never sorts
    * per-row), so mean ranks here and there agree by construction:
    * z_ab = (R̄_a − R̄_b)/√(V·(1/n_a + 1/n_b)) with the tie-corrected
    * V = (N(N+1) − tsum/(N−1))/12 assembled once per pair from exact
    * integer moments in one documented order. Verdict vs the
    * Bonferroni z for the 10 segment pairs at family α = .05
    * (two-sided .05/20 → 2.807, a fixed documented cut — neither
    * engine exposes a normal quantile). Bounded: k(k−1)/2 = 10 rows.
    */
  def qDunnTest(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val histSeg = seg.groupBy(col("bin"), col("seg"))
      .agg(count(lit(1)).as("n_sb"))
    val histBin = histSeg.groupBy(col("bin"))
      .agg(sum(col("n_sb")).cast("long").as("t"))
    val w = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, -1)
    // cum (bounded bins) feeds grp AND ties; grp (k rows) feeds both
    // pair sides AND the total — cache both so the histogram chain
    // derives once (uncached this query measured 11 exchanges)
    val cum = histBin.withColumn("cumt",
      coalesce(sum(col("t")).over(w), lit(0L)))
      .cache()
    val grp = histSeg.join(cum, "bin")
      .groupBy(col("seg"))
      .agg(sum(col("n_sb")).cast("long").as("n_g"),
        sum(col("n_sb").cast(d38) *
          (lit(2) * col("cumt") + col("t") + 1)).as("r2_g"))
      .cache()
    grp.count() // materialize (cum materializes as grp's input)
    val ties = cum.agg(
      sum(col("t").cast(d38) * col("t") * col("t") - col("t")).as("tsum"))
    val tot = grp.agg(sum(col("n_g")).cast("long").as("n"))
      .crossJoin(broadcast(ties))
    val a = grp.select(col("seg").as("seg_a"), col("n_g").as("n_a"),
      col("r2_g").as("r2_a"))
    val b = grp.select(col("seg").as("seg_b"), col("n_g").as("n_b"),
      col("r2_g").as("r2_b"))
    val nD = col("n").cast("double")
    val v = (nD * (nD + 1) - col("tsum").cast("double") / (nD - 1)) / 12.0
    val ra = col("r2_a").cast("double") / (col("n_a").cast("double") * 2)
    val rb = col("r2_b").cast("double") / (col("n_b").cast("double") * 2)
    val out = a.crossJoin(b).filter(col("seg_a") < col("seg_b"))
      .crossJoin(broadcast(tot))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        round(ra, 6).as("mean_rank_a"), round(rb, 6).as("mean_rank_b"),
        round((ra - rb) /
          sqrt(v * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)
          .as("z"))
      .withColumn("significant", abs(col("z")) > 2.807)
      .cache()
    out.count()
    cum.unpersist(); grp.unpersist()
    out
  }

  val qDunnTestSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |hs AS (SELECT bin, seg, count(*) AS n_sb FROM seg GROUP BY 1, 2),
      |hb AS (SELECT bin, CAST(sum(n_sb) AS BIGINT) AS t FROM hs GROUP BY 1),
      |cum AS (SELECT bin, t, coalesce(sum(t) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumt
      |  FROM hb),
      |grp AS (SELECT seg, CAST(sum(n_sb) AS BIGINT) AS n_g,
      |    sum(CAST(n_sb AS HUGEINT) * (2 * cumt + t + 1)) AS r2_g
      |  FROM hs JOIN cum USING (bin) GROUP BY 1),
      |ties AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS tsum FROM cum),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM grp),
      |pairs AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
      |    a.n_g AS n_a, b.n_g AS n_b, a.r2_g AS r2_a, b.r2_g AS r2_b,
      |    n, tsum
      |  FROM grp a, grp b, tot, ties WHERE a.seg < b.seg)
      |SELECT seg_a, seg_b, n_a, n_b,
      |  round(CAST(r2_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 2), 6)
      |    AS mean_rank_a,
      |  round(CAST(r2_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 2), 6)
      |    AS mean_rank_b,
      |  round((CAST(r2_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 2)
      |      - CAST(r2_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 2))
      |    / sqrt((CAST(n AS DOUBLE) * (n + 1)
      |        - CAST(tsum AS DOUBLE) / (CAST(n AS DOUBLE) - 1)) / 12.0
      |      * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
      |  (abs(round((CAST(r2_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * 2)
      |      - CAST(r2_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * 2))
      |    / sqrt((CAST(n AS DOUBLE) * (n + 1)
      |        - CAST(tsum AS DOUBLE) / (CAST(n AS DOUBLE) - 1)) / 12.0
      |      * (1.0 / n_a + 1.0 / n_b)), 6)) > 2.807) AS significant
      |FROM pairs""".stripMargin

  // ---------------------------------------------------------------- L72
  /** Lin's concordance correlation as a header–detail consistency
    * audit: per order, the HEADER total (o_totalprice) against the
    * DETAIL total recomputed from its lineitems (Σ per-line
    * extendedprice·(1−discount)·(1+tax), each line rounded to cents
    * BEFORE the sum so the order total is an exact integer — a
    * double Σ would be summation-order-dependent). On real TPC-H
    * data the two are identical (CCC = 1); here the audit EXPOSES
    * that the synthetic header is not derived from the details
    * (CCC ≈ 0) — which is precisely the readout a reconciliation
    * pipeline wants: CCC, unlike Pearson r, penalizes location and
    * scale shift, so "correlated but rescaled" cannot masquerade as
    * "consistent". EXACT device: clearing denominators by n² turns
    * every term into exact DECIMAL moments —
    * ccc = 2(nΣxy−ΣxΣy) / (nΣxx−Σx² + nΣyy−Σy² + (Σx−Σy)²) —
    * ONE double division; r splits its sqrt into two IEEE-exact
    * factors. One lineitem aggregate + one header join, 1 row.
    */
  def qLinCcc(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val detail = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")) * 100).cast("long").as("line_c"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("line_c")).as("y"))
    val xy = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("x"))
      .join(detail, col("o_orderkey") === col("l_orderkey"))
    val m = xy.agg(count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
      sum(col("x").cast(d38) * col("y")).as("sxy"),
      sum(col("x").cast(d38) * col("x")).as("sxx"),
      sum(col("y").cast(d38) * col("y")).as("syy"))
    val cxy = (col("n").cast(d38) * col("sxy") - col("sx") * col("sy"))
    val cxx = (col("n").cast(d38) * col("sxx") - col("sx") * col("sx"))
    val cyy = (col("n").cast(d38) * col("syy") - col("sy") * col("sy"))
    val dd = ((col("sx") - col("sy")) * (col("sx") - col("sy")))
    m.select(col("n"),
        round(lit(2.0) * cxy.cast("double") /
          (cxx.cast("double") + cyy.cast("double") + dd.cast("double")), 6)
          .as("ccc"),
        when(cxx <= 0 || cyy <= 0, lit(null).cast("double"))
          .otherwise(round(cxy.cast("double") /
            (sqrt(cxx.cast("double")) * sqrt(cyy.cast("double"))), 6))
          .as("pearson_r"),
        round((col("sx").cast("double") - col("sy").cast("double")) /
          col("n").cast("double") / 100.0, 6).as("mean_shift_dollars"),
        when(cyy <= 0, lit(null).cast("double"))
          .otherwise(round(sqrt(cxx.cast("double")) /
            sqrt(cyy.cast("double")), 6)).as("scale_ratio"))
      .withColumn("consistent", coalesce(col("ccc") > 0.99, lit(false)))
  }

  val qLinCccSql: String =
    """WITH detail AS (SELECT l_orderkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
      |      * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |xy AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x, y
      |  FROM orders JOIN detail ON o_orderkey = l_orderkey),
      |m AS (SELECT count(*) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM xy),
      |c AS (SELECT n,
      |    CAST(n AS HUGEINT) * sxy - sx * sy AS cxy,
      |    CAST(n AS HUGEINT) * sxx - sx * sx AS cxx,
      |    CAST(n AS HUGEINT) * syy - sy * sy AS cyy,
      |    (sx - sy) * (sx - sy) AS dd, sx, sy
      |  FROM m)
      |SELECT n,
      |  round(2.0 * CAST(cxy AS DOUBLE)
      |    / (CAST(cxx AS DOUBLE) + CAST(cyy AS DOUBLE)
      |      + CAST(dd AS DOUBLE)), 6) AS ccc,
      |  CASE WHEN cxx <= 0 OR cyy <= 0 THEN NULL
      |    ELSE round(CAST(cxy AS DOUBLE)
      |      / (sqrt(CAST(cxx AS DOUBLE)) * sqrt(CAST(cyy AS DOUBLE))), 6)
      |    END AS pearson_r,
      |  round((CAST(sx AS DOUBLE) - CAST(sy AS DOUBLE))
      |    / CAST(n AS DOUBLE) / 100.0, 6) AS mean_shift_dollars,
      |  CASE WHEN cyy <= 0 THEN NULL
      |    ELSE round(sqrt(CAST(cxx AS DOUBLE))
      |      / sqrt(CAST(cyy AS DOUBLE)), 6) END AS scale_ratio,
      |  coalesce(round(2.0 * CAST(cxy AS DOUBLE)
      |    / (CAST(cxx AS DOUBLE) + CAST(cyy AS DOUBLE)
      |      + CAST(dd AS DOUBLE)), 6) > 0.99, false) AS consistent
      |FROM c""".stripMargin

  // ---------------------------------------------------------------- L73
  /** Poisson overdispersion audit of the daily event-arrival counts,
    * per event type — the distributional assumption check behind
    * every "events per day" rate model (F11's anomaly bands, F47's
    * burstiness summary): if arrivals were Poisson, the variance-to-
    * mean ratio D is 1, and (n−1)·D ~ χ²(n−1); bursty types show
    * D ≫ 1 (overdispersion — model with negative binomial, L52's
    * fit) and regular ones D < 1. EXACT device: D folds entirely in
    * integers — D = (n·Σc² − (Σc)²)/((n−1)·Σc) — ONE double
    * division; the normal-approx z = (D−1)·√((n−1)/2) in one fixed
    * order. One (type, day) aggregate then a |types|-row fold.
    */
  def qDispersion(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("(ts DIV 1000000000) DIV 86400").cast("long").as("day"))
      .agg(count(lit(1)).as("c"))
    val m = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c").cast(d38)).as("s"),
        sum(col("c").cast(d38) * col("c")).as("s2"))
    val dNum = (col("n").cast(d38) * col("s2") - col("s") * col("s"))
    val d = dNum.cast("double") /
      ((col("n").cast("double") - 1) * col("s").cast("double"))
    m.filter(col("n") > 1)
      .select(col("event_type"), col("n").as("n_days"),
        round(col("s").cast("double") / col("n"), 6).as("mean_per_day"),
        round(d, 6).as("dispersion"),
        round((d - 1) * sqrt((col("n").cast("double") - 1) / 2.0), 6)
          .as("z"))
      .withColumn("overdispersed", col("z") > 1.96)
  }

  val qDispersionSql: String =
    """WITH daily AS (SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, count(*) AS n,
      |    sum(CAST(c AS HUGEINT)) AS s,
      |    sum(CAST(c AS HUGEINT) * c) AS s2
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  round(CAST(s AS DOUBLE) / n, 6) AS mean_per_day,
      |  round(CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
      |    / ((CAST(n AS DOUBLE) - 1) * CAST(s AS DOUBLE)), 6) AS dispersion,
      |  round((CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
      |      / ((CAST(n AS DOUBLE) - 1) * CAST(s AS DOUBLE)) - 1)
      |    * sqrt((CAST(n AS DOUBLE) - 1) / 2.0), 6) AS z,
      |  (round((CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
      |      / ((CAST(n AS DOUBLE) - 1) * CAST(s AS DOUBLE)) - 1)
      |    * sqrt((CAST(n AS DOUBLE) - 1) / 2.0), 6) > 1.96)
      |    AS overdispersed
      |FROM m WHERE n > 1""".stripMargin

  // ---------------------------------------------------------------- L67
  /** Grubbs-style maximum-studentized-deviation screen on order totals
    * — the single-outlier question the L10 MAD screen answers in bulk,
    * asked the classical way: how many sample SDs does the most
    * extreme total sit from the mean? Exact device: cents are exact
    * longs, so the max deviation needs no argmax join — it is
    * max(n·max−Σ, Σ−n·min)/n, with the numerator an exact DECIMAL
    * cross-multiplication; the sample SD comes from the exact
    * (n·Σx²−Σ²) form, and G assembles as ONE fixed-order double
    * expression, 6-dp. Verdict vs the 4σ screening rule (the
    * portable large-n cut; the exact Grubbs critical needs a t
    * quantile neither engine exposes — documented, not hidden).
    * ONE map-side-combined pass, 1 row out.
    */
  def qGrubbs(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val a = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(count(lit(1)).as("n"), sum(col("c").cast(d38)).as("s"),
        sum((col("c") * col("c")).cast(d38)).as("s2"),
        max(col("c")).as("mx"), min(col("c")).as("mn"))
    a.select(col("n"), col("mx").as("max_cents"), col("mn").as("min_cents"),
        greatest(col("mx").cast(d38) * col("n") - col("s"),
          col("s") - col("mn").cast(d38) * col("n")).as("dev_num"),
        ((col("n").cast(d38) * col("s2") - col("s") * col("s")))
          .as("var_num"))
      .select(col("n"), col("max_cents"), col("min_cents"),
        round((col("dev_num").cast("double") / col("n")) /
          sqrt(col("var_num").cast("double") /
            (col("n").cast("double") * (col("n").cast("double") - 1))),
          6).as("g"))
      .withColumn("extreme", col("g") > 4.0)
  }

  val qGrubbsSql: String =
    """WITH a AS (SELECT count(*) AS n,
      |    sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
      |      AS s,
      |    sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |      * CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)) AS s2,
      |    max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx,
      |    min(CAST(round(o_totalprice * 100) AS BIGINT)) AS mn
      |  FROM orders)
      |SELECT n, mx AS max_cents, mn AS min_cents,
      |  round((CAST(greatest(CAST(mx AS HUGEINT) * n - s,
      |      s - CAST(mn AS HUGEINT) * n) AS DOUBLE) / n)
      |    / sqrt(CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS g,
      |  (round((CAST(greatest(CAST(mx AS HUGEINT) * n - s,
      |      s - CAST(mn AS HUGEINT) * n) AS DOUBLE) / n)
      |    / sqrt(CAST(CAST(n AS HUGEINT) * s2 - s * s AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) > 4.0)
      |    AS extreme
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- L69
  /** Cliff's delta — the ordinal effect size that belongs next to the
    * L14 Mann–Whitney p-value (significance says a shift exists;
    * δ = P(X>Y) − P(X<Y) says whether anyone should care). BUILDING
    * vs MACHINERY order totals on the same $100 binning as the
    * L56/L58/L60 family, so the statistic is of the binned
    * distributions and the arithmetic is EXACT: the dominance counts
    * fold off the bin histogram — #{x>y} = Σ_b na(b)·cumB(<b),
    * #{x<y} = Σ_b na(b)·(n2 − cumB(<b) − nb(b)) — as DECIMAL
    * products (n1·n2 wraps int64 past ~3e9 rows, so the counts
    * publish as digit VARCHAR, the rank-sum device), and δ is ONE
    * double division, 6-dp. The magnitude label uses the Romano
    * cuts (.147/.33/.474) on the rounded δ — engine-identical.
    * Bounded bin grid: one histogram pass + a window over bins.
    */
  def qCliffsDelta(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val seg = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
    val hist = seg.groupBy(col("bin"))
      .agg(count(when(col("seg") === "BUILDING", 1)).as("na"),
        count(when(col("seg") === "MACHINERY", 1)).as("nb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cb", coalesce(sum(col("nb")).over(w), lit(0L)))
    val agg = cum.agg(
      sum(col("na")).cast("long").as("n1"),
      sum(col("nb")).cast("long").as("n2"),
      sum(col("na").cast(d38) * col("cb")).as("gt"),
      sum(col("na").cast(d38) * col("nb")).as("tie"))
    agg.select(col("n1"), col("n2"),
        col("gt").cast(d38).cast("string").as("pairs_gt"),
        (col("n1").cast(d38) * col("n2") - col("gt") - col("tie"))
          .cast("string").as("pairs_lt"),
        round((col("gt").cast("double") -
          (col("n1").cast(d38) * col("n2") - col("gt") - col("tie"))
            .cast("double")) /
          (col("n1").cast("double") * col("n2").cast("double")), 6)
          .as("delta"))
      .withColumn("magnitude",
        when(abs(col("delta")) < 0.147, "negligible")
          .when(abs(col("delta")) < 0.33, "small")
          .when(abs(col("delta")) < 0.474, "medium")
          .otherwise("large"))
  }

  val qCliffsDeltaSql: String =
    """WITH seg AS (SELECT c_mktsegment AS seg,
      |    CAST(floor(o_totalprice / 100) AS BIGINT) AS bin
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |hist AS (SELECT bin,
      |    count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS na,
      |    count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS nb
      |  FROM seg GROUP BY 1),
      |cum AS (SELECT bin, na, nb,
      |    coalesce(sum(nb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM hist),
      |agg AS (SELECT CAST(sum(na) AS BIGINT) AS n1,
      |    CAST(sum(nb) AS BIGINT) AS n2,
      |    sum(CAST(na AS HUGEINT) * cb) AS gt,
      |    sum(CAST(na AS HUGEINT) * nb) AS tie
      |  FROM cum)
      |SELECT n1, n2, CAST(gt AS VARCHAR) AS pairs_gt,
      |  CAST(CAST(n1 AS HUGEINT) * n2 - gt - tie AS VARCHAR) AS pairs_lt,
      |  round((CAST(gt AS DOUBLE)
      |    - CAST(CAST(n1 AS HUGEINT) * n2 - gt - tie AS DOUBLE))
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS delta,
      |  CASE WHEN abs(round((CAST(gt AS DOUBLE)
      |      - CAST(CAST(n1 AS HUGEINT) * n2 - gt - tie AS DOUBLE))
      |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)) < 0.147
      |    THEN 'negligible'
      |  WHEN abs(round((CAST(gt AS DOUBLE)
      |      - CAST(CAST(n1 AS HUGEINT) * n2 - gt - tie AS DOUBLE))
      |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)) < 0.33
      |    THEN 'small'
      |  WHEN abs(round((CAST(gt AS DOUBLE)
      |      - CAST(CAST(n1 AS HUGEINT) * n2 - gt - tie AS DOUBLE))
      |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)) < 0.474
      |    THEN 'medium' ELSE 'large' END AS magnitude
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- L70
  /** Heterogeneous uplift readout — the L3 A/B verdict broken out by
    * customer market segment, which is the question a targeting
    * decision actually needs answered (an experiment flat on average
    * routinely hides segments where it wins and loses). Arms by the
    * deterministic md5 parity (the L3/L25 device, null-true by
    * construction so the machinery is what's audited); response =
    * per-user purchase cents (exact longs); segment from the
    * user⋈customer FK. Per segment: exact populations and DECIMAL
    * spend sums, mean spend per arm (one IEEE division each), and
    * the uplift in dollars, 6-dp. One user-level aggregate + one
    * broadcast-sized dim join + a 5-row publish.
    */
  def qUplift(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val pu = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "treat").otherwise("ctrl"))
    val seg = pu.join(Tables.customer(spark, dir),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(when(col("arm") === "treat", 1)).as("n_t"),
        count(when(col("arm") === "ctrl", 1)).as("n_c"),
        sum(when(col("arm") === "treat", col("cents")).otherwise(0L)
          .cast(d38)).as("s_t"),
        sum(when(col("arm") === "ctrl", col("cents")).otherwise(0L)
          .cast(d38)).as("s_c"))
    seg.select(col("segment"), col("n_t"), col("n_c"),
      when(col("n_t") === 0, lit(null).cast("double"))
        .otherwise(round(col("s_t").cast("double") / col("n_t") / 100.0, 6))
        .as("mean_treat"),
      when(col("n_c") === 0, lit(null).cast("double"))
        .otherwise(round(col("s_c").cast("double") / col("n_c") / 100.0, 6))
        .as("mean_ctrl"),
      when(col("n_t") === 0 || col("n_c") === 0, lit(null).cast("double"))
        .otherwise(round(col("s_t").cast("double") / col("n_t") / 100.0 -
          col("s_c").cast("double") / col("n_c") / 100.0, 6)).as("uplift"))
  }

  val qUpliftSql: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1),
      |arms AS (SELECT user_id, cents,
      |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      |      THEN 'treat' ELSE 'ctrl' END AS arm
      |  FROM pu),
      |seg AS (SELECT c_mktsegment AS segment,
      |    count(CASE WHEN arm = 'treat' THEN 1 END) AS n_t,
      |    count(CASE WHEN arm = 'ctrl' THEN 1 END) AS n_c,
      |    sum(CAST(CASE WHEN arm = 'treat' THEN cents ELSE 0 END AS HUGEINT)) AS s_t,
      |    sum(CAST(CASE WHEN arm = 'ctrl' THEN cents ELSE 0 END AS HUGEINT)) AS s_c
      |  FROM arms JOIN customer ON user_id = c_custkey GROUP BY 1)
      |SELECT segment, n_t, n_c,
      |  CASE WHEN n_t = 0 THEN NULL
      |    ELSE round(CAST(s_t AS DOUBLE) / n_t / 100.0, 6) END AS mean_treat,
      |  CASE WHEN n_c = 0 THEN NULL
      |    ELSE round(CAST(s_c AS DOUBLE) / n_c / 100.0, 6) END AS mean_ctrl,
      |  CASE WHEN n_t = 0 OR n_c = 0 THEN NULL
      |    ELSE round(CAST(s_t AS DOUBLE) / n_t / 100.0
      |      - CAST(s_c AS DOUBLE) / n_c / 100.0, 6) END AS uplift
      |FROM seg""".stripMargin

  // ---------------------------------------------------------------- L68
  /** Chow structural-break test — did the price-vs-time regression
    * CHANGE at a known break date (1998-01-01, mid-corpus)? The
    * econometric sibling of F34's changepoint scan: F34 finds the
    * break, Chow tests a hypothesized one. Simple OLS of order cents
    * on epoch-day, fitted three times (pooled, pre, post) from ONE
    * pass of per-segment exact DECIMAL moment sums (the E22 device);
    * each SSR folds to Syy − Sxy²/Sxx in doubles over exact sums, and
    * F = ((SSR_p − SSR_1 − SSR_2)/k) / ((SSR_1 + SSR_2)/(n−2k)),
    * k = 2. Verdict vs the F(2,∞) 5% critical 3.0 (documented fixed
    * cut — neither engine exposes an F quantile). Cents and days are
    * exact integers; only the SSR assembly is floating, in one
    * documented order.
    */
  def qChowTest(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = Tables.orders(spark, dir).select(
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("x"),
      round(col("o_totalprice") * 100).cast("long").as("y"),
      (col("o_orderdate").cast("date") < lit("1998-01-01").cast("date"))
        .as("pre"))
    def moms(df: DataFrame) = df.agg(count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"),
      sum((col("y").cast(d38) * col("y"))).as("syy"))
    val seg = base.groupBy(col("pre")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"),
      sum((col("y").cast(d38) * col("y"))).as("syy"))
    def segCol(p: Boolean, c: String) =
      max(when(col("pre") === p, col(c))).as(c + (if (p) "_1" else "_2"))
    val wide = seg.agg(
      segCol(true, "n"), segCol(true, "sx"), segCol(true, "sy"),
      segCol(true, "sxx"), segCol(true, "sxy"), segCol(true, "syy"),
      segCol(false, "n"), segCol(false, "sx"), segCol(false, "sy"),
      segCol(false, "sxx"), segCol(false, "sxy"), segCol(false, "syy"))
    def ssr(n: org.apache.spark.sql.Column, sx: org.apache.spark.sql.Column,
        sy: org.apache.spark.sql.Column, sxx: org.apache.spark.sql.Column,
        sxy: org.apache.spark.sql.Column, syy: org.apache.spark.sql.Column) = {
      val nd = n.cast("double")
      val cxx = sxx.cast("double") - sx.cast("double") * sx.cast("double") / nd
      val cxy = sxy.cast("double") - sx.cast("double") * sy.cast("double") / nd
      val cyy = syy.cast("double") - sy.cast("double") * sy.cast("double") / nd
      when(cxx <= 0, cyy).otherwise(cyy - cxy * cxy / cxx)
    }
    val j = wide.crossJoin(broadcast(moms(base)))
      .withColumn("ssr_p", ssr(col("n"), col("sx"), col("sy"),
        col("sxx"), col("sxy"), col("syy")))
      .withColumn("ssr_1", ssr(col("n_1"), col("sx_1"), col("sy_1"),
        col("sxx_1"), col("sxy_1"), col("syy_1")))
      .withColumn("ssr_2", ssr(col("n_2"), col("sx_2"), col("sy_2"),
        col("sxx_2"), col("sxy_2"), col("syy_2")))
    j.select(col("n_1").as("n_pre"), col("n_2").as("n_post"),
        round(((col("ssr_p") - col("ssr_1") - col("ssr_2")) / 2.0) /
          ((col("ssr_1") + col("ssr_2")) /
            (col("n").cast("double") - 4.0)), 6).as("f_stat"))
      .withColumn("break_detected", col("f_stat") > 3.0)
  }

  val qChowTestSql: String = {
    val m = "count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx, " +
      "sum(CAST(y AS HUGEINT)) AS sy, " +
      "sum(CAST(x AS HUGEINT) * x) AS sxx, " +
      "sum(CAST(x AS HUGEINT) * y) AS sxy, " +
      "sum(CAST(y AS HUGEINT) * y) AS syy"
    """WITH base AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y,
      |    (CAST(o_orderdate AS DATE) < DATE '1998-01-01') AS pre
      |  FROM orders),
      |p AS (SELECT MOMS FROM base),
      |s1 AS (SELECT MOMS FROM base WHERE pre),
      |s2 AS (SELECT MOMS FROM base WHERE NOT pre),
      |f AS (SELECT s1.n AS n_1, s2.n AS n_2, p.n AS n,
      |    (CAST(p.syy AS DOUBLE) - CAST(p.sy AS DOUBLE) * CAST(p.sy AS DOUBLE) / p.n)
      |      - CASE WHEN CAST(p.sxx AS DOUBLE) - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE) / p.n <= 0 THEN 0
      |        ELSE (CAST(p.sxy AS DOUBLE) - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE) / p.n)
      |          * (CAST(p.sxy AS DOUBLE) - CAST(p.sx AS DOUBLE) * CAST(p.sy AS DOUBLE) / p.n)
      |          / (CAST(p.sxx AS DOUBLE) - CAST(p.sx AS DOUBLE) * CAST(p.sx AS DOUBLE) / p.n) END AS ssr_p,
      |    (CAST(s1.syy AS DOUBLE) - CAST(s1.sy AS DOUBLE) * CAST(s1.sy AS DOUBLE) / s1.n)
      |      - CASE WHEN CAST(s1.sxx AS DOUBLE) - CAST(s1.sx AS DOUBLE) * CAST(s1.sx AS DOUBLE) / s1.n <= 0 THEN 0
      |        ELSE (CAST(s1.sxy AS DOUBLE) - CAST(s1.sx AS DOUBLE) * CAST(s1.sy AS DOUBLE) / s1.n)
      |          * (CAST(s1.sxy AS DOUBLE) - CAST(s1.sx AS DOUBLE) * CAST(s1.sy AS DOUBLE) / s1.n)
      |          / (CAST(s1.sxx AS DOUBLE) - CAST(s1.sx AS DOUBLE) * CAST(s1.sx AS DOUBLE) / s1.n) END AS ssr_1,
      |    (CAST(s2.syy AS DOUBLE) - CAST(s2.sy AS DOUBLE) * CAST(s2.sy AS DOUBLE) / s2.n)
      |      - CASE WHEN CAST(s2.sxx AS DOUBLE) - CAST(s2.sx AS DOUBLE) * CAST(s2.sx AS DOUBLE) / s2.n <= 0 THEN 0
      |        ELSE (CAST(s2.sxy AS DOUBLE) - CAST(s2.sx AS DOUBLE) * CAST(s2.sy AS DOUBLE) / s2.n)
      |          * (CAST(s2.sxy AS DOUBLE) - CAST(s2.sx AS DOUBLE) * CAST(s2.sy AS DOUBLE) / s2.n)
      |          / (CAST(s2.sxx AS DOUBLE) - CAST(s2.sx AS DOUBLE) * CAST(s2.sx AS DOUBLE) / s2.n) END AS ssr_2
      |  FROM s1, s2, p)
      |SELECT n_1 AS n_pre, n_2 AS n_post,
      |  round(((ssr_p - ssr_1 - ssr_2) / 2.0)
      |    / ((ssr_1 + ssr_2) / (CAST(n AS DOUBLE) - 4.0)), 6) AS f_stat,
      |  (round(((ssr_p - ssr_1 - ssr_2) / 2.0)
      |    / ((ssr_1 + ssr_2) / (CAST(n AS DOUBLE) - 4.0)), 6) > 3.0)
      |    AS break_detected
      |FROM f""".stripMargin.replace("MOMS", m)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cvm_test" -> (qCvmTest _),
    "q_mood_median" -> (qMoodMedian _),
    "q_page_trend" -> (qPageTrend _),
    "q_hill_tail" -> (qHillTail _),
    "q_table_profile" -> (qTableProfile _),
    "q_table_profile_approx" -> (qTableProfileApprox _),
    "q_grubbs" -> (qGrubbs _),
    "q_chow_test" -> (qChowTest _),
    "q_cliffs_delta" -> (qCliffsDelta _),
    "q_uplift" -> (qUplift _),
    "q_dunn_test" -> (qDunnTest _),
    "q_lin_ccc" -> (qLinCcc _),
    "q_dispersion" -> (qDispersion _),
    "q_breusch_pagan" -> (qBreuschPagan _),
    "q_wilcoxon_signed" -> (qWilcoxonSigned _),
    "q_anderson_darling" -> (qAndersonDarling _),
    "q_atkinson" -> (qAtkinson _),
    "q_lorenz_curve" -> (qLorenzCurve _),
    "q_ref_integrity" -> (qRefIntegrity _),
    "q_negbin_fit" -> (qNegbinFit _),
    "q_cox_stuart" -> (qCoxStuart _),
    "q_bartlett" -> (qBartlett _),
    "q_kde" -> (qKde _),
    "q_oaxaca" -> (qOaxaca _),
    "q_hbos" -> (qHbos _),
    "q_fdr_by" -> (qFdrBy _),
    "q_propensity_match" -> (qPropensityMatch _),
    "q_bandit_ucb" -> (qBanditUcb _),
    "q_cronbach_alpha" -> (qCronbachAlpha _),
    "q_mahalanobis" -> (qMahalanobis _),
    "q_icc" -> (qIcc _),
    "q_qq_normal" -> (qQqNormal _),
    "q_holm" -> (qHolm _),
    "q_equivalence_tost" -> (qEquivalenceTost _),
    "q_sign_test" -> (qSignTest _),
    "q_power_mde" -> (qPowerMde _),
    "q_cochran_q" -> (qCochranQ _),
    "q_cohens_d" -> (qCohensD _),
    "q_t_closeness" -> (qTCloseness _),
    "q_sprt" -> (qSprt _),
    "q_tukey_hsd" -> (qTukeyHsd _),
    "q_did" -> (qDid _),
    "q_cochran_armitage" -> (qCochranArmitage _),
    "q_fisher_exact" -> (qFisherExact _),
    "q_friedman" -> (qFriedman _),
    "q_jarque_bera" -> (qJarqueBera _),
    "q_srm" -> (qSrm _),
    "q_mcnemar" -> (qMcnemar _),
    "q_cuped" -> (qCuped _),
    "q_poststrat_ate" -> (qPoststratAte _),
    "q_capture_recapture" -> (qCaptureRecapture _),
    "q_anova" -> (qAnova _),
    "q_kruskal_wallis" -> (qKruskalWallis _),
    "q_levene" -> (qLevene _),
    "q_ks_test" -> (qKsTest _),
    "q_hodges_lehmann" -> (qHodgesLehmann _),
    "q_mannwhitney" -> (qMannWhitney _),
    "q_cramers_v" -> (qCramersV _),
    "q_fdr_bh" -> (qFdrBh _),
    "q_pareto_share" -> (qParetoShare _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_gini" -> (qGini _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_l_diversity" -> (qLDiversity _),
    "q_permutation_test" -> (qPermutationTest _),
    "q_dp_counts" -> (qDpCounts _),
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_data_validation" -> (qDataValidation _),
    "q_ab_test" -> (qAbTest _),
    "q_welch_ttest" -> (qWelchTtest _),
    "q_benford" -> (qBenford _))

  def oracle: Map[String, String] = Map(
    "q_cvm_test" -> qCvmTestSql,
    "q_mood_median" -> qMoodMedianSql,
    "q_page_trend" -> qPageTrendSql,
    "q_hill_tail" -> qHillTailSql,
    "q_table_profile" -> qTableProfileSql,
    "q_table_profile_approx" -> qTableProfileApproxSql,
    "q_grubbs" -> qGrubbsSql,
    "q_chow_test" -> qChowTestSql,
    "q_cliffs_delta" -> qCliffsDeltaSql,
    "q_uplift" -> qUpliftSql,
    "q_dunn_test" -> qDunnTestSql,
    "q_lin_ccc" -> qLinCccSql,
    "q_dispersion" -> qDispersionSql,
    "q_breusch_pagan" -> qBreuschPaganSql,
    "q_wilcoxon_signed" -> qWilcoxonSignedSql,
    "q_anderson_darling" -> qAndersonDarlingSql,
    "q_atkinson" -> qAtkinsonSql,
    "q_lorenz_curve" -> qLorenzCurveSql,
    "q_ref_integrity" -> qRefIntegritySql,
    "q_negbin_fit" -> qNegbinFitSql,
    "q_cox_stuart" -> qCoxStuartSql,
    "q_bartlett" -> qBartlettSql,
    "q_kde" -> qKdeSql,
    "q_bandit_ucb" -> qBanditUcbSql,
    "q_propensity_match" -> qPropensityMatchSql,
    "q_hbos" -> qHbosSql,
    "q_oaxaca" -> qOaxacaSql,
    "q_fdr_by" -> qFdrBySql,
    "q_cronbach_alpha" -> qCronbachAlphaSql,
    "q_mahalanobis" -> qMahalanobisSql,
    "q_icc" -> qIccSql,
    "q_qq_normal" -> qQqNormalSql,
    "q_holm" -> qHolmSql,
    "q_equivalence_tost" -> qEquivalenceTostSql,
    "q_sign_test" -> qSignTestSql,
    "q_power_mde" -> qPowerMdeSql,
    "q_cochran_q" -> qCochranQSql,
    "q_cohens_d" -> qCohensDSql,
    "q_t_closeness" -> qTClosenessSql,
    "q_sprt" -> qSprtSql,
    "q_tukey_hsd" -> qTukeyHsdSql,
    "q_did" -> qDidSql,
    "q_cochran_armitage" -> qCochranArmitageSql,
    "q_fisher_exact" -> qFisherExactSql,
    "q_friedman" -> qFriedmanSql,
    "q_jarque_bera" -> qJarqueBeraSql,
    "q_srm" -> qSrmSql,
    "q_mcnemar" -> qMcnemarSql,
    "q_cuped" -> qCupedSql,
    "q_poststrat_ate" -> qPoststratAteSql,
    "q_capture_recapture" -> qCaptureRecaptureSql,
    "q_anova" -> qAnovaSql,
    "q_kruskal_wallis" -> qKruskalWallisSql,
    "q_levene" -> qLeveneSql,
    "q_ks_test" -> qKsTestSql,
    "q_hodges_lehmann" -> qHodgesLehmannSql,
    "q_mannwhitney" -> qMannWhitneySql,
    "q_cramers_v" -> qCramersVSql,
    "q_fdr_bh" -> qFdrBhSql,
    "q_pareto_share" -> qParetoShareSql,
    "q_mad_outliers" -> qMadOutliersSql,
    "q_gini" -> qGiniSql,
    "q_k_anonymity" -> qKAnonymitySql,
    "q_l_diversity" -> qLDiversitySql,
    "q_permutation_test" -> qPermutationTestSql,
    "q_dp_counts" -> qDpCountsSql,
    "q_bootstrap_ci" -> qBootstrapCiSql,
    "q_data_validation" -> qDataValidationSql,
    "q_ab_test" -> qAbTestSql,
    "q_welch_ttest" -> qWelchTtestSql,
    "q_benford" -> qBenfordSql)
}
