package graft

/** Dev-only: executed-plan exchange count for queries (deleted before commit). */
object XcDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(8)
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
