package graft

/** Dev-only scratch main: schema / plan probes on the test data. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(4)
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    e.printSchema()
    e.show(3, truncate = false)
    spark.stop()
  }
}
