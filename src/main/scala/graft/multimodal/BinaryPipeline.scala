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

  /** One sampled frame of a (stub) video payload. */
  case class Frame(doc_id: Long, frame_idx: Long, offset: Long,
      frame_mean: Double)

  /** G2: frame sampling — the one-to-MANY decode shape (video → k
    * sampled frames), the second plumbing contract a media pipeline
    * needs beyond G1's one-to-one decode. Each payload yields up to 4
    * frames at fixed strides; per-frame features are typed rows
    * (explode happens inside the distributed flatMap, never on the
    * driver). The deterministic stub (byte-window statistics) keeps it
    * oracle-checkable; a real codec slots into the same signature.
    */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
    blobs.flatMap { case (id, bytes) =>
      val n = math.min(4L, bytes.length / 32L)
      (0L until n).map { i =>
        val off = (i * 32).toInt
        val mean = bytes.slice(off, off + 8)
          .map(b => (b & 0xff).toLong).sum.toDouble / 8.0
        Frame(id, i, off.toLong, mean)
      }
    }.toDF()
  }

  val qMultimodalFramesSql: String =
    """WITH f AS (SELECT doc_id, text,
      |    unnest(generate_series(0, CAST(least(4, length(text) // 32) AS BIGINT) - 1)) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, frame_idx, frame_idx * 32 AS offset,
      |  CAST(list_sum(list_transform(generate_series(1, 8),
      |    j -> ascii(substr(text, CAST(frame_idx * 32 + j AS INTEGER), 1)))) AS DOUBLE) / 8.0 AS frame_mean
      |FROM f""".stripMargin

  /** G3: aspect-preserving resize planning for decoded media — the
    * metadata transform a real resize stage keys off (target box 32×32,
    * integer arithmetic only so both engines are bit-exact). Composes
    * on G1's decoded dimensions; the byte-level resample would slot
    * into the same mapPartitions stage as the [[Decoder]].
    */
  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame =
    qMultimodalDecode(spark, dir)
      .select(col("doc_id"), col("width"), col("height"),
        // integer DIV, not double division: bit-exact in both engines
        expr("width * 32 DIV greatest(width, height)").cast("long").as("out_w"),
        expr("height * 32 DIV greatest(width, height)").cast("long").as("out_h"))

  val qMultimodalResizeSql: String =
    """WITH d AS (SELECT doc_id,
      |    CAST(64 + ascii(substr(text, 1, 1)) % 64 AS BIGINT) AS width,
      |    CAST(64 + ascii(substr(text, 2, 1)) % 64 AS BIGINT) AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |  width * 32 // greatest(width, height) AS out_w,
      |  height * 32 // greatest(width, height) AS out_h
      |FROM d""".stripMargin

  // ---------------------------------------------------------------- G4
  /** The pluggable batch-inference contract: a model call takes a
    * BATCH of vectors, not a row (amortizing per-call overhead is the
    * whole economics of running a model over a corpus); memory per
    * call is bounded by maxBatch × dim.
    */
  trait BatchScorer extends Serializable {
    def maxBatch: Int
    def scoreBatch(vecs: Array[Array[Double]]): Array[Double]
  }

  /** Deterministic stand-in for an embedding-model scorer: dot product
    * with hyperplane 0 (the shared hashed-component generator), so the
    * full batched pipeline is oracle-checkable — a real ONNX/JNI model
    * slots into the same signature. Scores are per-row deterministic,
    * which pins the contract a real scorer must also satisfy: results
    * NEVER depend on batch boundaries or partitioning (spec-asserted
    * by re-running with a different maxBatch).
    */
  object StubScorer extends BatchScorer {
    override val maxBatch = 64
    override def scoreBatch(vecs: Array[Array[Double]]): Array[Double] =
      vecs.map { v =>
        var s = 0.0
        var d = 0
        while (d < v.length) {
          s += v(d) * graft.functions.Hyperplanes.component(d); d += 1
        }
        s
      }
  }

  /** G4: batched model inference over the embeddings corpus —
    * `mapPartitions` + `grouped(maxBatch)` is the whole plumbing: the
    * iterator stays lazy (one batch of vectors materialized at a
    * time), batches never cross partitions, and nothing touches the
    * driver. At 100 TB this is embarrassingly parallel, sized by
    * maxPartitionBytes; GPU executors change the scorer, not the plan.
    */
  def qBatchedScore(spark: SparkSession, dir: String,
      scorer: BatchScorer = StubScorer): DataFrame = {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
    vecs.mapPartitions { it =>
      it.grouped(scorer.maxBatch).flatMap { batch =>
        val scores = scorer.scoreBatch(batch.map(_._2).toArray)
        batch.iterator.zip(scores.iterator).map { case ((id, _), s) => (id, s) }
      }
    }.toDF("vec_id", "score")
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  val qBatchedScoreSql: String =
    """WITH p0 AS (SELECT i, CAST(i - 1 AS BIGINT) AS h0 FROM generate_series(1, 64) g(i)),
      |p1 AS (SELECT i, (xor(h0 >> 16, h0) * 73244475) % 2147483648 AS h1 FROM p0),
      |p2 AS (SELECT i, (xor(h1 >> 16, h1) * 73244475) % 2147483648 AS h2 FROM p1),
      |pl AS (SELECT i, CAST(xor(h2 >> 16, h2) AS DOUBLE) / 2147483648.0 - 0.5 AS c FROM p2)
      |SELECT vec_id, round(sum(list_extract(embedding::DOUBLE[], i) * c), 6) AS score
      |FROM embeddings, pl GROUP BY vec_id""".stripMargin

  // ---------------------------------------------------------------- G5
  /** Perceptual-hash near-dup for media payloads: each payload's G2
    * frame means quantized to 4 bits and packed into a 16-bit pHash;
    * payloads sharing a pHash form a duplicate group with one
    * canonical (least-id) keeper — the media-side analog of C1's text
    * dedup, robust to byte-level noise a cryptographic hash would
    * amplify (a real pipeline swaps the stub frame statistics for DCT
    * coefficients in the same shape). One groupBy on the hash + one
    * join back: fully distributed, no pairwise work anywhere.
    * Integer arithmetic end-to-end (quantize → CASE multiplier →
    * sum), so both engines agree bit-for-bit.
    */
  /** Per-payload 16-bit pHash (G5's core): 4 frame means quantized to
    * 4 bits each, packed little-endian by frame index. */
  private def phashes(spark: SparkSession, dir: String): DataFrame = {
    val q = (floor(col("frame_mean") / 16)).cast("long")
    val m = when(col("frame_idx") === 0, 1L).when(col("frame_idx") === 1, 16L)
      .when(col("frame_idx") === 2, 256L).otherwise(4096L)
    qMultimodalFrames(spark, dir)
      .groupBy(col("doc_id")).agg(sum(q * m).as("phash"))
  }

  def qMultimodalPhash(spark: SparkSession, dir: String): DataFrame = {
    val p = phashes(spark, dir)
    val g = p.groupBy(col("phash"))
      .agg(count(lit(1)).as("group_n"), min(col("doc_id")).as("canon"))
    p.join(g, "phash")
      .select(col("doc_id"), col("phash"), col("group_n"),
        (col("doc_id") === col("canon")).as("keep"))
  }

  val qMultimodalPhashSql: String =
    raw"""WITH f AS (SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(least(4, length(text) // 32) AS BIGINT) - 1)) AS frame_idx
         |  FROM documents),
         |fm AS (SELECT doc_id, frame_idx,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      j -> ascii(substr(text, CAST(frame_idx * 32 + j AS INTEGER), 1)))) AS DOUBLE) / 8.0 AS frame_mean
         |  FROM f),
         |p AS (SELECT doc_id,
         |    CAST(sum(CAST(floor(frame_mean / 16) AS BIGINT) *
         |      (CASE frame_idx WHEN 0 THEN 1 WHEN 1 THEN 16
         |        WHEN 2 THEN 256 ELSE 4096 END)) AS BIGINT) AS phash
         |  FROM fm GROUP BY doc_id),
         |g AS (SELECT phash, count(*) AS group_n, min(doc_id) AS canon
         |  FROM p GROUP BY phash)
         |SELECT doc_id, p.phash, group_n, (doc_id = canon) AS keep
         |FROM p JOIN g USING (phash)""".stripMargin

  // ---------------------------------------------------------------- G6
  /** Perceptual NEAR-dup across media payloads: G5 catches exact
    * pHash collisions; G6 links hashes within hamming distance ≤ 3 —
    * re-encodes, brightness shifts, one corrupted frame. The scale
    * device is that ALL pairwise work runs on the distinct-hash
    * table, bounded at 2^16 rows BY CONSTRUCTION (the hash width),
    * never on payload rows: payloads aggregate once to (phash,
    * group_n), then the bounded table band-joins with itself on its
    * four 4-bit nibbles — pigeonhole-complete for ham ≤ 3 (3 flipped
    * bits cannot touch all 4 nibbles), so the blocked output EQUALS
    * the oracle's brute-force self-join. Corpus size only changes
    * group_n values, never the pair work.
    */
  def qPhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val g = phashes(spark, dir).groupBy(col("phash"))
      .agg(count(lit(1)).as("group_n"))
    val bands = g.select(col("phash"), col("group_n"),
      explode(array((0 to 3).map(i =>
        struct(lit(i).as("band"),
          ((col("phash") / math.pow(16, i).toLong).cast("long") % 16)
            .as("key"))): _*)).as("b"))
      .select(col("phash"), col("group_n"),
        col("b.band").as("band"), col("b.key").as("key"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.phash") < col("y.phash"))
      .select(col("x.phash").as("a"), col("y.phash").as("b"),
        col("x.group_n").as("n_a"), col("y.group_n").as("n_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("a").bitwiseXOR(col("b"))))
      .filter(col("hamming") <= 3)
      .select(col("a"), col("b"), col("hamming"), col("n_a"), col("n_b"))
  }

  val qPhashNeardupSql: String =
    raw"""WITH f AS (SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(least(4, length(text) // 32) AS BIGINT) - 1)) AS frame_idx
         |  FROM documents),
         |fm AS (SELECT doc_id, frame_idx,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      j -> ascii(substr(text, CAST(frame_idx * 32 + j AS INTEGER), 1)))) AS DOUBLE) / 8.0 AS frame_mean
         |  FROM f),
         |p AS (SELECT doc_id,
         |    CAST(sum(CAST(floor(frame_mean / 16) AS BIGINT) *
         |      (CASE frame_idx WHEN 0 THEN 1 WHEN 1 THEN 16
         |        WHEN 2 THEN 256 ELSE 4096 END)) AS BIGINT) AS phash
         |  FROM fm GROUP BY doc_id),
         |g AS (SELECT phash, count(*) AS group_n FROM p GROUP BY 1)
         |SELECT x.phash AS a, y.phash AS b,
         |  bit_count(xor(x.phash, y.phash)) AS hamming,
         |  x.group_n AS n_a, y.group_n AS n_b
         |FROM g x JOIN g y ON x.phash < y.phash
         |WHERE bit_count(xor(x.phash, y.phash)) <= 3""".stripMargin

  // ---------------------------------------------------------------- G7
  /** The media keep list — G5/G6 closed into the verdict a multimodal
    * pipeline ships: pHashes within hamming ≤ 3 cluster into
    * connected components via the SHARED `clusterPairs` propagation
    * loop (text, embedding, and media dedup all ride one clustering
    * path), every payload maps through its hash to a cluster, one
    * least-doc_id canonical survives per cluster. The clustering
    * runs on the ≤ 2^16-node HASH graph (bounded by construction),
    * never on payload rows — corpus growth changes only the final
    * doc⋈cluster join. Oracle: recursive closure over the same
    * hash-pair CTEs + the doc join.
    */
  def qMediaKeepList(spark: SparkSession, dir: String): DataFrame = {
    val p = phashes(spark, dir)
    val pairs = qPhashNeardup(spark, dir)
      .select(col("a").as("id1"), col("b").as("id2"))
    val cl = graft.operators.Dedup.clusterPairs(spark, pairs)
      .select(col("node").as("phash"), col("lab"))
    val withCluster = p.join(cl, Seq("phash"), "left")
      .withColumn("phash_cluster", coalesce(col("lab"), col("phash")))
    val canon = withCluster.groupBy(col("phash_cluster"))
      .agg(min(col("doc_id")).as("canonical_id"))
    withCluster.join(canon, "phash_cluster")
      .select(col("doc_id"), col("phash"), col("phash_cluster"),
        col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }

  val qMediaKeepListSql: String =
    raw"""WITH RECURSIVE f AS (SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(least(4, length(text) // 32) AS BIGINT) - 1)) AS frame_idx
         |  FROM documents),
         |fm AS (SELECT doc_id, frame_idx,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      j -> ascii(substr(text, CAST(frame_idx * 32 + j AS INTEGER), 1)))) AS DOUBLE) / 8.0 AS frame_mean
         |  FROM f),
         |p AS (SELECT doc_id,
         |    CAST(sum(CAST(floor(frame_mean / 16) AS BIGINT) *
         |      (CASE frame_idx WHEN 0 THEN 1 WHEN 1 THEN 16
         |        WHEN 2 THEN 256 ELSE 4096 END)) AS BIGINT) AS phash
         |  FROM fm GROUP BY doc_id),
         |g AS (SELECT phash FROM p GROUP BY 1),
         |pairs AS (SELECT x.phash AS a, y.phash AS b
         |  FROM g x JOIN g y ON x.phash < y.phash
         |  WHERE bit_count(xor(x.phash, y.phash)) <= 3),
         |sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM sym
         |  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         |cl AS (SELECT a AS phash, least(a, min(b)) AS lab
         |  FROM reach GROUP BY a),
         |mem AS (SELECT p.doc_id, p.phash,
         |    coalesce(cl.lab, p.phash) AS phash_cluster
         |  FROM p LEFT JOIN cl ON p.phash = cl.phash),
         |canon AS (SELECT phash_cluster, min(doc_id) AS canonical_id
         |  FROM mem GROUP BY 1)
         |SELECT m.doc_id, m.phash, m.phash_cluster, c.canonical_id,
         |  (m.doc_id = c.canonical_id) AS keep
         |FROM mem m JOIN canon c ON m.phash_cluster = c.phash_cluster""".stripMargin

  // ---------------------------------------------------------------- G8
  /** Hamming-threshold sweep for the media near-dup dial — what C18
    * does for the MinHash similarity cut and D12 for nprobe, applied
    * to G6's hamming radius: for every threshold t ∈ 0..3 (the range
    * the nibble-banding is pigeonhole-complete for), the linked-pair
    * count, cluster count, and the keep-list outcome (payloads
    * dropped = per-cluster survivors-to-one + exact-dup collapse of
    * unlinked hash groups; t = 0 is the pure exact-dup baseline since
    * distinct hashes can't pair at radius 0). The pair set is
    * computed ONCE at the widest radius on the ≤ 2^16 distinct-hash
    * table (cached — each point filters it), and clustering is ONE
    * `clusterPairs` run over the four threshold graphs made
    * node-disjoint by the t·2¹⁶ + phash tag encoding (r17: per-point
    * reruns paid the propagation loop's fixed overhead 4× and
    * re-derived the uncached hash chain ~10×, 31 exchanges) — corpus
    * size changes only `group_n` weights, never the sweep's pair or
    * cluster work. All counts exact integers; no floats anywhere.
    */
  def qPhashThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    // the doc-claimed "computed ONCE" must hold in the PLAN, not just
    // in intent: the four threshold points consume g and cand ~10×
    // between them (pairs + np per point, tot/mem/unlinked on g), and
    // uncached each consumer re-ran the whole payload→phash→band-join
    // chain — measured 31 exchanges at r17, and the likely cause of
    // the r16 +28% drift (cache-eviction order after the chain
    // prologue decided how many re-runs a neighboring query absorbed).
    // Both frames are bounded by the 2^16 hash width, so the qGmmEm
    // cleanup pattern applies: cache, materialize before fan-out,
    // release after the bounded output materializes.
    val g = phashes(spark, dir).groupBy(col("phash"))
      .agg(count(lit(1)).as("group_n")).cache()
    val bands = g.select(col("phash"),
      explode(array((0 to 3).map(i =>
        struct(lit(i).as("band"),
          ((col("phash") / math.pow(16, i).toLong).cast("long") % 16)
            .as("key"))): _*)).as("b"))
      .select(col("phash"), col("b.band").as("band"), col("b.key").as("key"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.phash") < col("y.phash"))
      .select(col("x.phash").as("a"), col("y.phash").as("b"))
      .distinct()
      .withColumn("hamming", bit_count(col("a").bitwiseXOR(col("b"))))
      .filter(col("hamming") <= 3)
      .cache()
    cand.count(); g.count() // materialize before the 4-point fan-out
    // ONE propagation run for all four points (r17): the four
    // threshold graphs are node-disjoint under the tag encoding
    // t·2¹⁶ + phash (phash < 2¹⁶ by the hash width), so a single
    // clusterPairs pass over their union labels every point at once —
    // four separate runs each paid the loop's fixed checkpoint/action
    // overhead on a tiny graph, which dominated the sweep's wall clock
    val L = 65536L
    val tsArr = array((0 to 3).map(t => lit(t.toLong)): _*)
    val allPairs = cand
      .select(explode(tsArr).as("t"), col("a"), col("b"), col("hamming"))
      .filter(col("hamming") <= col("t"))
      .select((col("t") * L + col("a")).as("id1"),
        (col("t") * L + col("b")).as("id2"))
    val dec = graft.operators.Dedup.clusterPairs(spark, allPairs)
      .select(expr(s"node DIV $L").as("t"), expr(s"node % $L").as("phash"),
        col("lab"))
    val mem = dec.join(g, Seq("phash"))
      .groupBy(col("t"), col("lab"))
      .agg(count(lit(1)).as("n_hashes"), sum(col("group_n")).as("payloads"))
    val linked = mem.groupBy(col("t")).agg(
      count(lit(1)).as("n_clusters"),
      sum(col("payloads") - 1).as("drop_linked"),
      sum(col("n_hashes")).as("n_linked_hashes"))
    val np = cand.select(explode(tsArr).as("t"), col("hamming"))
      .filter(col("hamming") <= col("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n_pairs"))
    val tot = g.agg(sum(col("group_n")).cast("long").as("n_payloads"),
      count(lit(1)).as("n_hashes_total"))
    // drop_unlinked needs no anti-join: unlinked hashes drop
    // (group_n − 1) each, and Σ_unlinked(group_n − 1) =
    // (N − Σ_linked group_n) − (H − n_linked_hashes), so
    // n_dropped = drop_linked + drop_unlinked
    //           = (N − H) + n_linked_hashes − n_clusters
    // and n_kept = N − n_dropped — same values as the per-point
    // anti-join form, verified by the unchanged per-point oracle
    val ts = spark.range(1).select(explode(tsArr).as("t"))
    val out = ts
      .join(np, Seq("t"), "left").join(linked, Seq("t"), "left")
      .crossJoin(broadcast(tot))
      .select(col("t").as("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_clusters"), lit(0L)).as("n_clusters"),
        coalesce(col("n_linked_hashes"), lit(0L)).cast("long")
          .as("n_linked_hashes"),
        (col("n_payloads") - col("n_hashes_total") +
          coalesce(col("n_linked_hashes"), lit(0L)) -
          coalesce(col("n_clusters"), lit(0L))).cast("long").as("n_dropped"),
        (col("n_hashes_total") + coalesce(col("n_clusters"), lit(0L)) -
          coalesce(col("n_linked_hashes"), lit(0L))).cast("long").as("n_kept"))
      .cache()
    out.count() // 4-row output materialized; intermediates can release
    g.unpersist(); cand.unpersist()
    out
  }

  val qPhashThresholdSweepSql: String = {
    val perT = (0 to 3).map { t =>
      s"""reach$t(a, b) AS (SELECT a, b FROM sym WHERE ham <= $t
         |  UNION SELECT r.a, s.b FROM reach$t r
         |    JOIN sym s ON r.b = s.a AND s.ham <= $t),
         |cl$t AS (SELECT a AS phash, least(a, min(b)) AS lab
         |  FROM reach$t GROUP BY a),
         |mem$t AS (SELECT cl$t.lab, count(*) AS n_hashes,
         |    sum(g.group_n) AS payloads
         |  FROM cl$t JOIN g ON cl$t.phash = g.phash GROUP BY 1),
         |linked$t AS (SELECT coalesce(count(*), 0) AS n_clusters,
         |    coalesce(CAST(sum(payloads - 1) AS BIGINT), 0) AS drop_linked,
         |    coalesce(CAST(sum(n_hashes) AS BIGINT), 0) AS n_linked_hashes
         |  FROM mem$t),
         |unlinked$t AS (SELECT
         |    coalesce(CAST(sum(group_n - 1) AS BIGINT), 0) AS drop_unlinked
         |  FROM g WHERE phash NOT IN (SELECT phash FROM cl$t)),
         |np$t AS (SELECT count(*) AS n_pairs FROM cand WHERE hamming <= $t),
         |row$t AS (SELECT CAST($t AS BIGINT) AS threshold, n_pairs,
         |    n_clusters, n_linked_hashes,
         |    drop_linked + drop_unlinked AS n_dropped,
         |    n_payloads - drop_linked - drop_unlinked AS n_kept
         |  FROM np$t, linked$t, unlinked$t, tot)""".stripMargin
    }.mkString(",\n")
    val unionRows = (0 to 3).map(t => s"SELECT * FROM row$t")
      .mkString("\nUNION ALL ")
    raw"""WITH RECURSIVE f AS (SELECT doc_id, text,
         |    unnest(generate_series(0, CAST(least(4, length(text) // 32) AS BIGINT) - 1)) AS frame_idx
         |  FROM documents),
         |fm AS (SELECT doc_id, frame_idx,
         |    CAST(list_sum(list_transform(generate_series(1, 8),
         |      j -> ascii(substr(text, CAST(frame_idx * 32 + j AS INTEGER), 1)))) AS DOUBLE) / 8.0 AS frame_mean
         |  FROM f),
         |p AS (SELECT doc_id,
         |    CAST(sum(CAST(floor(frame_mean / 16) AS BIGINT) *
         |      (CASE frame_idx WHEN 0 THEN 1 WHEN 1 THEN 16
         |        WHEN 2 THEN 256 ELSE 4096 END)) AS BIGINT) AS phash
         |  FROM fm GROUP BY doc_id),
         |g AS MATERIALIZED (SELECT phash, count(*) AS group_n FROM p GROUP BY 1),
         |cand AS MATERIALIZED (SELECT x.phash AS a, y.phash AS b,
         |    bit_count(xor(x.phash, y.phash)) AS hamming
         |  FROM g x JOIN g y ON x.phash < y.phash
         |  WHERE bit_count(xor(x.phash, y.phash)) <= 3),
         |sym AS (SELECT a, b, hamming AS ham FROM cand
         |  UNION ALL SELECT b, a, hamming FROM cand),
         |tot AS (SELECT CAST(sum(group_n) AS BIGINT) AS n_payloads FROM g),
         |$perT
         |$unionRows""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_phash_threshold_sweep" -> (qPhashThresholdSweep _),
    "q_phash_neardup" -> (qPhashNeardup _),
    "q_media_keep_list" -> (qMediaKeepList _),
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_phash" -> (qMultimodalPhash _),
    "q_batched_score" -> ((s: SparkSession, d: String) => qBatchedScore(s, d)))

  def oracle: Map[String, String] = Map(
    "q_phash_threshold_sweep" -> qPhashThresholdSweepSql,
    "q_phash_neardup" -> qPhashNeardupSql,
    "q_media_keep_list" -> qMediaKeepListSql,
    "q_multimodal_decode" -> qMultimodalDecodeSql,
    "q_multimodal_frames" -> qMultimodalFramesSql,
    "q_multimodal_resize" -> qMultimodalResizeSql,
    "q_multimodal_phash" -> qMultimodalPhashSql,
    "q_batched_score" -> qBatchedScoreSql)
}
