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
}
