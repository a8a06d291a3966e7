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
  /** Total bytes under a directory (0 on any error) — the input-size
    * probe the shuffle-partition default derives from.
    */
  private def dirBytes(dir: String): Long =
    try {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    } catch { case _: Throwable => 0L }

  def create(cores: Int = Runtime.getRuntime.availableProcessors.min(32),
      dataDir: String = null): SparkSession = {
    // Initial shuffle width sized to the DATA, not the core count
    // (guide §2.2: partitions in the 100MB–1GB range, AQE coalesces):
    // a cores-tied width scheduled 4x the tasks for KB-scale shuffles
    // and made local[32] run SLOWER than local[8] on the same corpus
    // (r18 measurement: 35.6s vs 31.6s on the composite subset; 30.6s
    // at 32 cores once the width followed the data). bytes/2MB is the
    // local proxy for post-derivation shuffle volume (shingle/token
    // explodes run ~10x the raw text); the 2x-cores cap is the
    // standard production sizing at real scale, the floor of 8 keeps
    // AQE skew-split headroom. Env override for deployments; callers
    // that pass no dataDir keep the old cores-tied default.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", {
      val bytes = Option(dataDir).map(dirBytes).getOrElse(0L)
      if (bytes == 0L) cores.toString
      else math.max(8L, math.min(bytes / (2L << 20), cores.toLong * 2)).toString
    })
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .withExtensions(new GraftExtensions)
      // scale-dependent knobs are env-parameterised (optimization-round
      // contract): local defaults keep the driver's bench comparable;
      // production values are a deployment decision, not a constant
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      // scan-parallelism FLOOR (guide §6): a sub-128MB parquet table
      // arrives as ONE split, so every map stage over it runs one task
      // no matter the core count — at sf1 q_table_profile measured the
      // same 37s on 8 and 32 cores before this. The floor divides small
      // inputs across the cores; at real scale (millions of splits) it
      // is a no-op, and maxPartitionBytes still governs upward.
      .config("spark.sql.files.minPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_MIN_PARTITIONS", (cores * 2).toString))
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
