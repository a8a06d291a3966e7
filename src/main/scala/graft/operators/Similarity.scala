package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over the embeddings table (SURVEY.md §2 block D).
  *
  * 100 TB design: the exact variant broadcasts the (small) query set
  * and scores map-side against the corpus — the corpus never shuffles;
  * per-query top-k is a single shuffle of scored candidates. When the
  * query set is large, the LSH variant ([[qAnnLsh]]) buckets both
  * sides by random-hyperplane signature and scores only within
  * buckets.
  */
object Similarity {

  /** Exact cosine top-5 neighbors for the query subset
    * (vec_id % 50 == 0). Ranking is on 6-dp-rounded similarity with
    * vec_id tiebreak → deterministic across engines.
    */
  def qAnnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        VectorFunctions.cosine(col("qv"), col("v")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  val qAnnBruteforceSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
      |flat AS (SELECT qid, e.vec_id AS nid, unnest(qv) AS x, unnest(v) AS y
      |  FROM e JOIN q ON e.vec_id <> q.qid),
      |scored AS (SELECT qid, nid,
      |    sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS sim
      |  FROM flat GROUP BY qid, nid),
      |ranked AS (SELECT qid, nid, sim, row_number() OVER (
      |    PARTITION BY qid ORDER BY round(sim, 6) DESC, nid ASC) AS rank
      |  FROM scored)
      |SELECT qid, nid, rank, round(sim, 4) AS sim FROM ranked WHERE rank <= 5""".stripMargin

  /** Random-hyperplane LSH bucketed ANN ([r] — approximate, checked by
    * recall spec against the brute-force baseline, not by oracle).
    *
    * Hyperplane components are a deterministic LCG over (plane, dim) —
    * reproducible across runs with no stored model. Each vector maps
    * to a `nPlanes`-bit bucket; candidates score only within buckets.
    * Scale path: both sides shuffle once on bucket id; bucket count
    * (2^nPlanes) is tuned so buckets fit in a task.
    */
  def qAnnLsh(spark: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // hyperplane(p, d) = LCG(p*64+d) scaled to [-0.5, 0.5)
    def plane(p: Int): Seq[Double] = (0 until 64).map { d =>
      val x = (1103515245L * (p * 64 + d) + 12345L) % 2147483648L
      (if (x < 0) x + 2147483648L else x).toDouble / 2147483648.0 - 0.5
    }
    val bucket = (0 until nPlanes).map { p =>
      val pl = array(plane(p).map(lit): _*)
      when(VectorFunctions.dot(col("v"), pl) >= 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    val bucketed = e.withColumn("bucket", bucket)
    val scored = bucketed.as("a")
      .join(bucketed.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        col("a.bucket").as("bucket"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid"), col("rank"), col("bucket"),
        round(col("sim"), 4).as("sim"))
  }

  /** IVF-style ANN ([r]): a seeded coarse quantizer (KMeans on the
    * corpus) partitions vectors into `nlist` cells; queries search
    * only their `nprobe` nearest cells. The 100 TB shape: centroids
    * are tiny and broadcast; the corpus shuffles once on cell id at
    * index build; at query time only probed cells are scanned.
    */
  def qAnnIvf(spark: SparkSession, dir: String,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val feat = e.withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(nlist).setSeed(13).setMaxIter(10)
    val model = km.fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("v"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.toSeq)
    }
    val cdf = spark.createDataFrame(centroids.toSeq).toDF("cell", "cv")
    // query subset probes its nprobe nearest cells
    val q = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(VectorFunctions.cosine(col("qv"), col("cv")).desc)
    val probes = q.crossJoin(broadcast(cdf))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("nid").asc)
    probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        VectorFunctions.cosine(col("qv"), col("v")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce" -> (qAnnBruteforce _),
    "q_ann_lsh" -> ((s: SparkSession, d: String) => qAnnLsh(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => qAnnIvf(s, d)))

  def oracle: Map[String, String] = Map(
    "q_ann_bruteforce" -> qAnnBruteforceSql)
}
