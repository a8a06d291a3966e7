package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_validation" -> (qDataValidation _))

  def oracle: Map[String, String] = Map(
    "q_data_validation" -> qDataValidationSql)
}
