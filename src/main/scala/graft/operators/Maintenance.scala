package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance utilities (SURVEY.md §2: H6/J6) — the layout
  * operations that keep a 100 TB table scannable:
  *
  *  - [[compact]]: small-file compaction. Streaming sinks and
  *    fine-grained ingest leave thousands of KB-sized files; every
  *    scan then pays a task per file and the NameNode/listing pays
  *    per entry. Compaction rewrites a directory into ~targetBytes
  *    files — the row data never touches the driver, only file
  *    STATUS listings do.
  *
  *  - [[clusteredWrite]]: range-partitioned, sorted-within-partition
  *    write. Clustering by a filter column gives every output file a
  *    tight min/max range on that column, so parquet row-group stats
  *    (and file-level pruning in table formats) can skip everything
  *    outside a query's range — the layout prerequisite for
  *    time-range scans over an events table.
  */
object Maintenance {

  /** Rewrite the parquet directory at `inPath` into approximately
    * `targetBytes`-sized files at `outPath`. Returns the output file
    * count. Uses a round-robin repartition (no shuffle key needed —
    * compaction must not assume one); at scale this is one
    * read+shuffle+write pass, embarrassingly parallel.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: hive-partitioned tables keep their data files
    // under key=value subdirectories — a top-level-only listing sums 0
    // bytes there and the whole table would rewrite through ONE task
    // as one giant file, the opposite of compaction
    var totalBytes = 0L
    val it = fs.listFiles(new Path(inPath), true)
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet")) totalBytes += s.getLen
    }
    require(totalBytes > 0L, s"no parquet data files found under $inPath")
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    nOut
  }

  /** Range-partition `df` on `clusterCol` into `nFiles` sorted files.
    * Output files carry disjoint [min, max] ranges of `clusterCol`
    * (range partitioner boundaries + within-partition sort), so
    * min/max statistics prune whole files for range predicates.
    */
  def clusteredWrite(df: DataFrame, clusterCol: String, nFiles: Int,
      outPath: String): Unit =
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
}
