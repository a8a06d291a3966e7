package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-parser surface of the engine (SURVEY.md §2 block I): queries
  * submitted as SQL text via `spark.sql` over registered temp views,
  * not the DataFrame DSL.
  *
  * Two things are proven end to end here: (1) the engine's relational
  * core is reachable through the SQL front end with oracle-identical
  * results — [[qSqlPricingSummary]] runs the SAME SQL text in Spark
  * and DuckDB; (2) the custom Catalyst expressions registered by
  * [[graft.GraftExtensions]] resolve and codegen through the SQL
  * parser — [[qSqlRollingFingerprint]] calls `graft_rolling_hash` from
  * SQL (sessions built by [[graft.GraftSession]] install the
  * extension).
  */
object SqlSurface {

  /** A1 through the SQL front end: the oracle SQL itself is valid
    * Spark SQL, so the exact same text runs on both engines — parser
    * path, view resolution, and semantics verified in one shot.
    */
  def qSqlPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(Relational.q1Sql)
  }

  /** B5 through the SQL front end, exercising the
    * GraftExtensions-registered codegen expression from SQL text. The
    * oracle replays the identical fold with DuckDB list_reduce (same
    * oracle as the DataFrame twin q_rolling_fingerprint).
    */
  def qSqlRollingFingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    spark.sql(
      raw"""SELECT doc_id,
           |  graft_rolling_hash(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS rh
           |FROM documents""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_pricing_summary" -> (qSqlPricingSummary _),
    "q_sql_rolling_fingerprint" -> (qSqlRollingFingerprint _))

  def oracle: Map[String, String] = Map(
    "q_sql_pricing_summary" -> Relational.q1Sql,
    "q_sql_rolling_fingerprint" -> TextAnalysis.qRollingFingerprintSql)
}
