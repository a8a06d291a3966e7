package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites are
  * cheap views over it).
  */
object TestSession {
  lazy val spark: SparkSession = GraftSession.create(4)
  val sf: String = "/root/testdata/sf0.001"
}

/** Smoke coverage of the full driver contract: every declared query
  * builds a plan and yields rows on the smallest scale factor.
  */
class ContractSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("corpusTag memoizes the listing within the TTL; fresh re-lists") {
    val path = s"$sf/documents.parquet"
    val c0 = Tables.Probe.listCount.get
    val t1 = Tables.Probe.corpusTag(spark, path, fresh = true)
    assert(Tables.Probe.listCount.get == c0 + 1)
    val t2 = Tables.Probe.corpusTag(spark, path)
    assert(t2 == t1 && Tables.Probe.listCount.get == c0 + 1,
      "a TTL'd probe must reuse the cached listing")
    val t3 = Tables.Probe.corpusTag(spark, path, fresh = true)
    assert(t3 == t1 && Tables.Probe.listCount.get == c0 + 2,
      "fresh must always re-list")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if name != "q_mllib_tuning") // exercised in TuningSpec (slow)
    test(s"$name yields rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
}
