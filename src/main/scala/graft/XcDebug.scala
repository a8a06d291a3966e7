package graft

/** Dev-only main kept in-repo on purpose: prints the executed-plan
  * exchange count for a comma-separated query list (the per-operator
  * workflow's ceiling check). Usage: XcDebug q1,q2[,...] [sfDir].
  */
object XcDebug {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: XcDebug <q1[,q2,...]> [sfDir]")
      sys.exit(2)
    }
    // 4 threads = the TestSession harness: AQE's plan (and so the
    // exchange count) varies with parallelism, and the pins live in
    // PlanSpec — measure where they are enforced (r17: three pins
    // measured at 8 threads read 2 lower than the suite's 4-thread
    // value, shipping a red tree)
    val spark = GraftSession.create(
      sys.env.getOrElse("XC_CPUS", "4").toInt)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { q =>
      val qe = SparkEntry.queries(q)(spark, dir).queryExecution
      qe.toRdd.count()
      println(s"[xc] $q -> ${Bench.exchangeCount(qe.executedPlan.toString)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
