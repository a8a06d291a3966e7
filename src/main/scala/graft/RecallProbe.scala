package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tooling: measure PQ / IVF+PQ mean recall@5 for a sweep of
  * shortlist sizes on a given corpus directory — the measurement
  * behind the [[Similarity.pqShortlist]] schedule (never part of the
  * driver contract; run by hand when retuning the dial).
  *
  *   runMain graft.RecallProbe <dir> <k1,k2,...>   (k=0 → the shipped schedule)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ks = args(1).split(",").map(_.toInt).toSeq
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val n = Tables.Probe.embeddingsCount(spark, dir)
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.select(col("qid"), col("recall_at_5")).na.drop()
        .distinct().agg(avg(col("recall_at_5"))).head().getDouble(0)
      math.rint(r * 1000) / 1000
    }
    ks.foreach { k =>
      val eff = if (k > 0) k else Similarity.pqShortlist(n)
      val pq = meanRecall(Similarity.qAnnPq(spark, dir, shortlistOverride = eff))
      val ivfpq = meanRecall(Similarity.qAnnIvfPq(spark, dir, shortlistOverride = eff))
      println(s"RECALL n=$n k=$eff pq=$pq ivfpq=$ivfpq")
    }
    spark.stop()
  }
}
