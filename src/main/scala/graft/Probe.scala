package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only scratch main: run one query with a stage listener that
  * prints per-stage task counts and durations.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(32)
    val name = if (args.nonEmpty) args(0) else "q_minhash_lsh"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1000.0
        if (dur.exists(_ > 0.3)) {
          val acc = si.accumulables.values
            .filter(a => Set("internal.metrics.shuffle.read.recordsRead",
              "internal.metrics.shuffle.write.recordsWritten",
              "internal.metrics.executorRunTime",
              "internal.metrics.jvmGCTime",
              "internal.metrics.peakExecutionMemory").contains(a.name.orNull))
            .map(a => a.name.get.split("\\.").last + "=" + a.value.getOrElse(0L))
            .mkString(" ")
          println(f"== stage ${si.stageId}%4d tasks=${si.numTasks}%4d ${dur.getOrElse(-1.0)}%8.1fs  $acc")
        }
      }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    println(s"== total ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    spark.stop()
  }
}
