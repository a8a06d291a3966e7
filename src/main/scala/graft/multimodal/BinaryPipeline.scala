package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal binary-column plumbing (SURVEY.md §2 G1).
  *
  * Media payloads are opaque `binary` columns with typed metadata; the
  * decode step runs as a batched `mapPartitions` stage — the shape a
  * real image/audio decoder plugs into (per-partition batch, bounded
  * memory, no driver involvement). Real codec libraries are absent in
  * this environment by design, so [[StubDecoder]] derives
  * deterministic fake dimensions/statistics from the leading bytes;
  * the schema, batching, and partitioning are the real thing.
  *
  * 100 TB design: payload bytes stay columnar (parquet binary) until
  * the decode stage; decode is map-only; downstream feature columns
  * are narrow. Partition sizing bounds peak memory at
  * maxPartitionBytes × decode-amplification.
  */
object BinaryPipeline {

  /** The pluggable decoder contract: one batch of (id, payload) in,
    * one batch of features out.
    */
  trait Decoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): Decoded
  }

  case class Decoded(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, mean_byte: Double)

  /** Deterministic stand-in for an image decoder (see class docs). */
  object StubDecoder extends Decoder {
    override def decode(id: Long, bytes: Array[Byte]): Decoded = {
      val w = 64L + (bytes(0) & 0xff) % 64
      val h = 64L + (bytes(1) & 0xff) % 64
      val mean = bytes.take(16).map(b => (b & 0xff).toLong).sum.toDouble / 16.0
      Decoded(id, bytes.length.toLong, w, h, mean)
    }
  }

  /** G1: binary payload column (utf-8 bytes of `text` standing in for
    * media bytes) decoded to typed features via batched mapPartitions.
    * Deterministic stub → oracle-checkable.
    */
  def qMultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
    blobs.mapPartitions { batch =>
      batch.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
    }.toDF()
  }

  val qMultimodalDecodeSql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(64 + ascii(substr(text, 1, 1)) % 64 AS BIGINT) AS width,
      |  CAST(64 + ascii(substr(text, 2, 1)) % 64 AS BIGINT) AS height,
      |  CAST(list_sum(list_transform(generate_series(1, 16), i -> ascii(substr(text, i, 1)))) AS DOUBLE) / 16.0 AS mean_byte
      |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (qMultimodalDecode _))

  def oracle: Map[String, String] = Map(
    "q_multimodal_decode" -> qMultimodalDecodeSql)
}
