package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard local-mode tuning.
  *
  * Scale notes (100 TB): these settings are the local[32] equivalents of
  * a 1000-executor deployment — AQE on (runtime coalesce + skew-join),
  * shuffle partitions sized to cores (cluster: 2-3x total cores),
  * UTC session timezone for deterministic timestamp semantics.
  */
object GraftSession {
  def create(cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries ns-precision timestamps (unsupported by
      // Spark's reader): surface them as Long nanos; query boundaries
      // convert with integer math (`ts DIV 1e9` — see SURVEY.md §5).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming state off-heap in RocksDB (bounded executor memory
      // under unbounded keyspaces; changelog checkpointing keeps
      // commits incremental) — the 100 TB default for stateful queries
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
