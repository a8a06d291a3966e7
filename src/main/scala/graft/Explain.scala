package graft

/** Dev-only: print the formatted physical plan of one query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(8)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
