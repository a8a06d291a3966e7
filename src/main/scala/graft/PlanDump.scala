package graft

/** Dev-only: dump `explain("formatted")` for a comma-separated query
  * list to `<outDir>/<query>_<suffix>.txt` — the r17 optimization
  * round's before/after plan evidence (plans/r17/). Usage:
  * PlanDump <q1[,q2,...]> <outDir> <suffix> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: PlanDump <q1[,q2,...]> <outDir> <suffix> [sfDir]")
      sys.exit(2)
    }
    val spark = GraftSession.create(sys.env.getOrElse("XC_CPUS", "8").toInt)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val out = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(out)
    args(0).split(",").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      // GRAFT_PLANDUMP_EXEC: execute first and dump the FINAL adaptive
      // plan (the tree the PlanSpec/Bench exchange counters see);
      // default stays the formatted pre-execution explain.
      val plan =
        if (sys.env.contains("GRAFT_PLANDUMP_EXEC")) {
          val qe = df.queryExecution
          qe.toRdd.count()
          qe.executedPlan.toString
        } else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(out.resolve(s"${q}_${args(2)}.txt"), plan)
      println(s"[plandump] $q -> ${out.resolve(s"${q}_${args(2)}.txt")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
