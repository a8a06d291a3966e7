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

  test("skew report ratios are >= 1 and ordered (top >= p99 >= mean)") {
    val r = SkewJoin.qSkewReport(spark, sf)
      .select("n_rows", "n_keys", "top_key_over_mean", "p99_over_mean")
      .collect().head
    assert(r.getLong(0) >= r.getLong(1))
    val top = r.getDouble(2); val p99 = r.getDouble(3)
    assert(top >= p99 - 1e-9 && top >= 1.0 && p99 > 0)
  }
}
