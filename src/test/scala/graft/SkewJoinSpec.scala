package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSession._

  test("salted join equals plain join on a skewed key") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey",
      saltBy = col("l_partkey") * 31 + col("l_quantity"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("AQE splits a genuinely skewed sort-merge join (OptimizeSkewedJoin fires)") {
    // The engine ships with AQE skew-join ON (GraftSession); this spec
    // proves the mechanism actually FIRES on this engine's joins — the
    // runtime complement to the manual salting H1 provides for
    // aggregates AQE can't rebalance. Thresholds are lowered to make a
    // test-sized skew look like the production 256 MB straggler; the
    // shape is the real one (one key holding ~half the fact side,
    // sort-merge path, no broadcast).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // deterministic skew: key 0 carries 80% of 100k fact rows (the
      // default 5x-median skew factor then genuinely holds), the rest
      // spread over 997 keys; payload inflates partition bytes
      val fact = spark.range(100000).select(
        when(col("id") < 80000, 0L).otherwise(pmod(col("id"), lit(997L))).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("payload"))
      val dim = spark.range(997).select(col("id").as("k"),
        col("id").cast("string").as("name"))
      val joined = fact.join(dim, "k")
      // execute THIS QueryExecution (a .count() would plan its own),
      // then read the final adaptive plan
      val qe = joined.queryExecution
      assert(qe.toRdd.count() == 100000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"OptimizeSkewedJoin must have split the skewed partition:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skew report ratios are >= 1 and ordered (top >= p99 >= mean)") {
    val r = SkewJoin.qSkewReport(spark, sf)
      .select("n_rows", "n_keys", "top_key_over_mean", "p99_over_mean")
      .collect().head
    assert(r.getLong(0) >= r.getLong(1))
    val top = r.getDouble(2); val p99 = r.getDouble(3)
    assert(top >= p99 - 1e-9 && top >= 1.0 && p99 > 0)
  }
}
