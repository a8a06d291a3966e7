package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream
import graft.streaming.EventStream.{Ev, SessionOut}

class StreamingSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("streaming tumbling agg equals batch tumbling agg") {
    val streamed = EventStream.qStreamTumbling(spark, sf)
      .select("bucket", "event_type", "n", "sum_value")
    val batch = graft.operators.TemporalOps.qTumblingWindow(spark, sf)
      .select("bucket", "event_type", "n", "sum_value")
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stateful sessionization closes sessions on gaps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = EventStream.sessionize(input.toDS(), gapSec = 1800)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_test").start()
    // user 1: two sessions (gap 2h); user 2: one open session (never emitted)
    input.addData(Ev(1, 1000), Ev(1, 1500), Ev(2, 1000))
    query.processAllAvailable()
    input.addData(Ev(1, 10000), Ev(2, 2000))
    query.processAllAvailable()
    val out = spark.table("sess_test").as[SessionOut].collect().toSet
    query.stop()
    assert(out == Set(SessionOut(1, 1000, 2)))
  }
}
