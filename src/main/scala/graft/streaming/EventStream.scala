package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Structured Streaming twins of the batch event operators
  * (SURVEY.md §2: F5, F6).
  *
  * 100 TB design: watermarks bound state; aggregation state lives in
  * the state store (RocksDB on a real cluster), keyed by (window,
  * type) / user — no driver-side accumulation. The parquet source
  * here stands in for a real stream (Kafka etc.); the transform
  * pipeline is identical.
  */
object EventStream {

  /** Typed event for the stateful sessionizer. */
  case class Ev(user_id: Long, tsec: Long)
  /** Open-session state per user. */
  case class SessState(start: Long, last: Long, n: Long)
  /** Emitted when a session closes. */
  case class SessionOut(user_id: Long, session_start: Long, n_events: Long)

  /** F5: streaming 5-minute tumbling-window aggregate with watermark,
    * driven to completion over the bounded parquet "stream" and
    * returned as a batch DataFrame. Semantics equal the batch
    * `q_tumbling_window` (same oracle).
    */
  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.events(spark, dir).schema
    // FileStreamSource wants a directory/glob, not a bare file — glob
    // the single events file with the sf dir as basePath.
    val stream = spark.readStream.schema(schema)
      .option("basePath", dir).parquet(s"$dir/events.*")
    val agg = stream
      .withColumn("ets", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"), col("sum_value"))
    val qn = "graft_stream_tumbling"
    spark.streams.active.filter(q => Option(q.name).contains(qn)).foreach(_.stop())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(qn).start()
    q.processAllAvailable()
    q.stop()
    spark.table(qn)
  }

  /** Oracle: identical to the batch tumbling window — `window()` is
    * epoch-aligned, so window.start == floor-second // 300 * 300.
    */
  val qStreamTumblingSql: String =
    """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket, event_type,
      |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** F6: stateful gap sessionization with `flatMapGroupsWithState` —
    * emits a session row when a >gapSec silence closes it. State per
    * user is O(1); on a real stream an event-time timeout evicts idle
    * users. Spec-tested with MemoryStream (not oracle-checkable: the
    * final open session never closes on an unbounded stream).
    */
  def sessionize(events: Dataset[Ev], gapSec: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(_.tsec)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsec - s.last > gapSec =>
                closed += SessionOut(user, s.start, s.n)
                cur = Some(SessState(e.tsec, e.tsec, 1))
              case Some(s) =>
                cur = Some(s.copy(last = e.tsec, n = s.n + 1))
              case None =>
                cur = Some(SessState(e.tsec, e.tsec, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (qStreamTumbling _))

  def oracle: Map[String, String] = Map(
    "q_stream_tumbling" -> qStreamTumblingSql)
}
