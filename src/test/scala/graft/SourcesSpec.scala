package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink round-trips and partitioned-layout pruning — the I/O
  * surface a user of the engine exercises beyond the parquet test
  * tables.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSession._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  test("json sink/source round-trips the documents table") {
    val out = tmp("json")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source")
    docs.write.mode("overwrite").json(out)
    val back = spark.read.json(out).select("doc_id", "text", "lang", "source")
    assert(back.count() == docs.count())
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("csv sink/source round-trips a numeric projection with schema") {
    val out = tmp("csv")
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    ord.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(ord.schema).csv(out)
    assert(back.count() == ord.count())
    assert(back.except(ord).isEmpty && ord.except(back).isEmpty)
  }

  test("hive-partitioned write prunes partitions at the scan") {
    val out = tmp("part")
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    // one directory per event_type
    val dirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(dirs.length >= 3, s"expected hive layout, got ${dirs.mkString(",")}")
    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition predicate must prune directories, not filter rows:\n$plan")
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(q.count() == expected)
  }

  test("orc sink/source round-trips with predicate pushdown") {
    val out = tmp("orc")
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    ord.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.except(ord).isEmpty && ord.except(back).isEmpty)
    // filters reach the ORC scan (search-argument pushdown)
    val q = back.filter(col("o_orderstatus") === "F").select("o_orderkey")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)"),
      s"ORC scan must carry pushed filters:\n$scan")
  }
}
