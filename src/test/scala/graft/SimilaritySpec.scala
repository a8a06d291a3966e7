package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("LSH ANN achieves non-trivial recall against brute force") {
    val exact = Similarity.qAnnBruteforce(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.qAnnLsh(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // LSH only scores within buckets: every returned pair must share a
    // bucket, and the query subset's true neighbors should be partially
    // recovered (recall > 0 on this tiny SF is the plumbing check;
    // recall quality is a tuning concern, not a correctness one).
    assert(approx.nonEmpty)
    val exactQids = exact.map(_._1)
    val recallable = approx.filter(p => exactQids.contains(p._1))
    assert(recallable.nonEmpty, "LSH found no pairs for any brute-force query id")
  }

  test("incremental vector ingest reproduces persisted cells map-only, without refit") {
    val (asg, _) = Similarity.IvfIndex.get(spark, sf, 16)
    val persisted = asg.select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val fits = Similarity.IvfIndex.fitCount.get
    val out = Similarity.assignVectors(spark, sf,
        asg.select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("v")))
      .select("vec_id", "cell").as[(Long, Int)].collect()
    assert(Similarity.IvfIndex.fitCount.get == fits, "ingest path must never fit")
    assert(out.length == persisted.size)
    val mismatched = out.count { case (id, c) => persisted(id) != c }
    assert(mismatched == 0,
      s"$mismatched vectors re-assigned to a different cell than the index fit chose")
  }

  test("LSH buckets are population-bounded and plane count scales") {
    import graft.functions.Hyperplanes
    // every (band, bucket) the pair-join can touch is under the cap
    // (hot buckets are excluded before the self-join), so per-bucket
    // pair output is quadratic in a constant, not in the corpus
    val sizes = Similarity.lshBuckets(spark, sf)
      .groupBy("band", "bucket").count().select("count").as[Long].collect()
    assert(sizes.nonEmpty)
    // the derivation holds expected population ~targetBucket as n grows
    assert(Hyperplanes.bitsFor(500, 8, floor = 8) == 8)
    assert(Hyperplanes.bitsFor(1000000, 8, floor = 8) == 17)
    val approxBuckets = Similarity.qAnnLsh(spark, sf)
      .groupBy("bucket").count().select("count").as[Long].collect()
    // the output bucket column is the min over the pair's colliding
    // tables, so grouping by it can merge across at most AnnNBands
    // band-buckets, each contributing <= cap * 5 top-5 rows
    assert(approxBuckets.forall(_ <= Similarity.AnnBucketCap * 5L * Similarity.AnnNBands))
  }

  test("IVF ANN returns ranked neighbors for every query id") {
    val rows = Similarity.qAnnIvf(spark, sf)
      .select("qid", "rank").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"query $q ranks not dense")
    }
  }

  test("IVF ANN carries a measured recall_at_5 column averaging >= 0.8") {
    val recalls = Similarity.qAnnIvf(spark, sf)
      .select("qid", "recall_at_5").na.drop()
      .as[(Long, Double)].collect().toMap.values
    assert(recalls.nonEmpty, "no sampled query carries a recall value")
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"IVF mean recall@5 $mean%.3f below 0.8")
  }

  test("IVF MIPS carries a measured recall_at_5 vs the exact MIPS truth averaging >= 0.8") {
    val recalls = Similarity.qMipsIvf(spark, sf)
      .select("qid", "recall_at_5").na.drop()
      .as[(Long, Double)].collect().toMap.values
    assert(recalls.nonEmpty, "no sampled query carries a recall value")
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"IVF MIPS mean recall@5 $mean%.3f below 0.8")
  }

  test("IVF MIPS top-1 candidates come from probed cells and rerank by raw dot") {
    // dense ranks per query, and every published dot is reproducible
    // from the raw vectors (the exact-rerank contract: the published
    // score is the true inner product, never an estimate)
    import org.apache.spark.sql.functions._
    val top = Similarity.qMipsIvf(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val recomputed = top
      .join(e.select(col("vec_id").as("qid"), col("v").as("qv")), "qid")
      .join(e.select(col("vec_id").as("nid"), col("v").as("nv")), "nid")
      .select(col("qid"), col("nid"), col("dot"),
        round(graft.functions.GraftExpressions.dot_product(col("qv"), col("nv")), 4)
          .as("dot2"))
      .filter(col("dot") =!= col("dot2"))
    assert(recomputed.count() == 0, "published dot is not the exact inner product")
    val ranks = top.select("qid", "rank").as[(Long, Int)].collect()
    ranks.groupBy(_._1).foreach { case (q, rs) =>
      val r = rs.map(_._2).sorted.toSeq
      assert(r == (1 to r.length), s"query $q ranks not dense")
    }
  }

  test("LSH ANN carries a measured recall_at_5 column averaging >= 0.8") {
    val recalls = Similarity.qAnnLsh(spark, sf)
      .select("qid", "recall_at_5").na.drop()
      .as[(Long, Double)].collect().toMap.values
    assert(recalls.nonEmpty, "no sampled query carries a recall value")
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"LSH mean recall@5 $mean%.3f below 0.8")
  }

  test("PQ ANN carries a measured recall_at_5 column averaging >= 0.8") {
    val recalls = Similarity.qAnnPq(spark, sf)
      .select("qid", "recall_at_5").na.drop()
      .as[(Long, Double)].collect().toMap.values
    assert(recalls.nonEmpty, "no sampled query carries a recall value")
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"PQ mean recall@5 $mean%.3f below 0.8")
  }

  test("IVF+PQ ANN carries a measured recall_at_5 column averaging >= 0.8") {
    val recalls = Similarity.qAnnIvfPq(spark, sf)
      .select("qid", "recall_at_5").na.drop()
      .as[(Long, Double)].collect().toMap.values
    assert(recalls.nonEmpty, "no sampled query carries a recall value")
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, f"IVF+PQ mean recall@5 $mean%.3f below 0.8")
  }

  test("PQ index is durable: cold-session query path performs no KMeans fit") {
    Similarity.qAnnPq(spark, sf).count() // build (or reuse) the index tables
    Similarity.PqIndex.deregister(spark, sf)
    val before = Similarity.PqIndex.fitCount.get
    val rows = Similarity.qAnnPq(spark, sf).count()
    assert(rows > 0)
    assert(Similarity.PqIndex.fitCount.get == before,
      "cold-session PQ query path refit codebooks instead of reading the index tables")
  }

  test("PQ index detects a changed corpus and refits") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_pq_stale").toString
    val emb = Paths.get(dir, "embeddings.parquet")
    Files.createDirectories(emb)
    Files.copy(Paths.get(sf, "embeddings.parquet"), emb.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val c0 = Similarity.PqIndex.fitCount.get
    Similarity.qAnnPq(spark, dir).count()
    assert(Similarity.PqIndex.fitCount.get == c0 + Similarity.PqIndex.PqM,
      "first query must fit one codebook per subspace")
    Similarity.qAnnPq(spark, dir).count()
    assert(Similarity.PqIndex.fitCount.get == c0 + Similarity.PqIndex.PqM,
      "unchanged corpus must not refit")
    Files.copy(Paths.get(sf, "embeddings.parquet"), emb.resolve("part-1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Similarity.qAnnPq(spark, dir).count()
    assert(Similarity.PqIndex.fitCount.get == c0 + 2 * Similarity.PqIndex.PqM,
      "changed corpus must trigger a codebook refit, not serve stale codes")
  }

  test("IVF index detects a changed corpus and refits") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_ivf_stale").toString
    val emb = Paths.get(dir, "embeddings.parquet")
    Files.createDirectories(emb)
    Files.copy(Paths.get(sf, "embeddings.parquet"), emb.resolve("part-0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val c0 = Similarity.IvfIndex.fitCount.get
    Similarity.qAnnIvf(spark, dir).count()
    assert(Similarity.IvfIndex.fitCount.get == c0 + 1, "first query must build the index")
    Similarity.qAnnIvf(spark, dir).count()
    assert(Similarity.IvfIndex.fitCount.get == c0 + 1, "unchanged corpus must not refit")
    // corpus mutates -> fingerprint changes -> stale index must not serve
    Files.copy(Paths.get(sf, "embeddings.parquet"), emb.resolve("part-1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Similarity.qAnnIvf(spark, dir).count()
    assert(Similarity.IvfIndex.fitCount.get == c0 + 2,
      "changed corpus must trigger an index refit, not serve stale centroids")
  }

  test("IVF index is durable: cold-session query path performs no KMeans fit") {
    Similarity.qAnnIvf(spark, sf).count() // build (or reuse) the index tables
    // simulate a cold session: catalog metadata gone, index files remain
    Similarity.IvfIndex.deregister(spark, sf, 16)
    val before = Similarity.IvfIndex.fitCount.get
    val rows = Similarity.qAnnIvf(spark, sf).count()
    assert(rows > 0)
    assert(Similarity.IvfIndex.fitCount.get == before,
      "cold-session query path refit KMeans instead of reading the index table")
  }

  test("brute force ranks are dense 1..5 per query") {
    val byQ = Similarity.qAnnBruteforce(spark, sf)
      .select("qid", "rank").as[(Long, Int)].collect().groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to 5), s"query $q ranks broken")
    }
  }
  test("filtered ANN: every hit matches the query label, recall vs filtered truth >= 0.8, selectivity sane") {
    val rows = Similarity.qAnnFiltered(spark, sf)
      .select("qid", "qlabel", "nid", "rank", "recall_at_5", "selectivity")
      .as[(Long, Int, Long, Int, Option[Double], Option[Double])].collect()
    assert(rows.nonEmpty, "filtered search returned nothing")
    // the filter really filtered: every neighbor shares the query label
    val lbl = Tables.embeddings(spark, sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    rows.foreach { case (q, ql, n, _, _, _) =>
      assert(lbl(q) == ql, s"query $q published wrong label")
      assert(lbl(n) == ql, s"neighbor $n of query $q violates the label filter")
    }
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length),
        s"query $q ranks not dense")
      assert(rs.length <= 5)
    }
    // recall vs the FILTERED exact truth: the filtered pipeline must
    // not lose same-label neighbors that the filtered scan could reach
    val recalls = rows.flatMap(_._5).distinct
    assert(recalls.nonEmpty)
    val mean = rows.groupBy(_._1).flatMap(_._2.head._5).toSeq
    assert(mean.sum / mean.size >= 0.8,
      s"mean filtered recall ${mean.sum / mean.size} below floor")
    // selectivity: a label cut keeps a strict, non-trivial fraction
    rows.flatMap(_._6).foreach(s => assert(s > 0.0 && s < 1.0))
  }

  test("q_matryoshka_overlap: full-dim budget is a perfect overlap, prefixes bounded in [0,1]") {
    val rows = graft.operators.Similarity.queries("q_matryoshka_overlap")(spark, sf)
      .orderBy("budget")
      .as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(16, 32, 64))
    val nq = rows.head._2
    assert(rows.forall(_._2 == nq), "every budget ranks the same panel")
    rows.foreach { case (b, _, ov) =>
      assert(ov >= 0.0 && ov <= 1.0, s"budget $b overlap $ov") }
    assert(rows.last._3 == 1.0, "the 64-dim list IS the truth list")
  }

  test("q_ann_nsw: recall floor holds, the beam never contains the query itself, store builds once and edges are symmetric") {
    val builds = Similarity.NswIndex.buildCount.get
    val nsw = Similarity.queries("q_ann_nsw")(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(nsw.forall { case (q, n) => q != n },
      "leave-one-out: the query must never be its own neighbor")
    val exact = Similarity.qAnnBruteforce(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect()
    val got = nsw.toSet
    val recall = exact.count(got.contains).toDouble / exact.length
    assert(recall >= 0.8, s"NSW beam-search recall@5 $recall below the 0.8 floor")
    // warm path: a second query must not rebuild the persisted graph
    Similarity.queries("q_ann_nsw")(spark, sf).collect()
    assert(Similarity.NswIndex.buildCount.get == builds ||
      Similarity.NswIndex.buildCount.get == builds + 1,
      "at most the one cold build")
    val after = Similarity.NswIndex.buildCount.get
    Similarity.queries("q_ann_nsw")(spark, sf).collect()
    assert(Similarity.NswIndex.buildCount.get == after,
      "warm NSW query must not rebuild the store")
    // the persisted graph is a symmetric bounded-degree edge set
    val t = Similarity.NswIndex.ensure(spark, sf)
    val edges = spark.table(t).as[(Long, Long)].collect().toSet
    assert(edges.nonEmpty)
    edges.foreach { case (s, d) =>
      assert(edges.contains((d, s)), s"edge ($s,$d) missing its reverse") }
  }

  test("q_ann_hnsw: hierarchical entry holds the recall floor with two fewer hops than flat NSW") {
    val hnsw = Similarity.queries("q_ann_hnsw")(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(hnsw.forall { case (q, n) => q != n },
      "leave-one-out: the query must never be its own neighbor")
    val exact = Similarity.qAnnBruteforce(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect()
    val got = hnsw.toSet
    val recall = exact.count(got.contains).toDouble / exact.length
    assert(recall >= 0.8,
      s"HNSW recall@5 $recall below the 0.8 floor at ${Similarity.HnswHops} hops")
    // the hierarchy is the point: the layer-0 walk is shorter by design
    assert(Similarity.HnswHops < Similarity.NswHops,
      "hierarchical entry must need fewer hops than the flat panel")
    // same panel as the flat walk — per-query result counts match
    val flatQs = Similarity.queries("q_ann_nsw")(spark, sf)
      .select("qid").distinct().as[Long].collect().toSet
    assert(hnsw.map(_._1).toSet == flatQs, "identical query panel")
  }

  test("q_knn_classify: predictions equal the mode of D1's top-5 neighbor labels, ties broken low") {
    val pred = Similarity.queries("q_knn_classify")(spark, sf)
      .select("qid", "true_label", "pred_label", "votes", "correct")
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Int]("true_label"), r.getAs[Int]("pred_label"),
          r.getAs[Long]("votes"), r.getAs[Boolean]("correct"))).toMap
    // recompose from the INDEPENDENT oracle-checked brute-force top-5
    val labels: Map[Long, Int] = Tables.embeddings(spark, sf)
      .select("vec_id", "label")
      .as[(Long, Int)].collect().toMap
    val top5: Map[Long, Seq[Int]] = Similarity.qAnnBruteforce(spark, sf)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.toSeq.map(p => labels(p._2)) }
    assert(pred.keySet == top5.keySet, "one prediction per panel query")
    top5.foreach { case (q, nbrLabels) =>
      val (tl, pl, votes, correct) = pred(q)
      val expected: (Int, Int) = nbrLabels.groupBy(identity)
        .map { case (l, g) => (l, g.size) }
        .toSeq.sortBy { case (l, v) => (-v, l) }.head
      assert(pl == expected._1, s"query $q: pred $pl != mode ${expected._1}")
      assert(votes == expected._2)
      assert(tl == labels(q) && correct == (pl == tl))
    }
  }

  test("q_hard_negatives: labels always differ, top-3 matches a label-filtered brute force") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.qHardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("anchor_label") != r.getAs[Int]("neg_label"),
        "a hard negative must carry a different label")
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 3)
      assert(r.getAs[Double]("margin_to_hardest") >= 0.0)
    }
    // rank-1 sits AT the hardest similarity (zero margin)
    rows.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(math.abs(r.getAs[Double]("margin_to_hardest")) < 1e-9)
    }
    // brute-force: the hard negatives are exactly the D1 neighbor list
    // with same-label rows dropped, re-ranked (for queries where D1's
    // top-5 happens to contain 3+ cross-label rows, they must agree)
    // (triplet consistency asserted in its own test below)
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").as[(Long, Int)].collect().toMap
    val bf = Similarity.qAnnBruteforce(spark, sf)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1)
    val got = rows.groupBy(_.getAs[Long]("qid"))
    bf.foreach { case (q, ns) =>
      val cross = ns.sortBy(_._3).map(_._2).filter(n => labels(n) != labels(q))
      if (cross.length >= 3) {
        val expect = cross.take(3).toSeq
        val actual = got(q).sortBy(_.getAs[Int]("rank"))
          .map(_.getAs[Long]("nid")).toSeq
        assert(actual == expect,
          s"query $q: hard negatives $actual != label-filtered brute $expect")
      }
    }
  }

  test("q_triplet_mining: negative agrees with D20 rank-1, labels and semi-hard flag consistent") {
    val rows = Similarity.qTripletMining(spark, sf).collect()
    assert(rows.nonEmpty)
    val hardest = Similarity.qHardNegatives(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("nid")).toMap
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      // the triplet's negative IS D20's rank-1 hard negative
      assert(r.getAs[Long]("neg_id") == hardest(qid),
        s"anchor $qid: negative disagrees with q_hard_negatives")
      assert(r.getAs[Int]("neg_label") != r.getAs[Int]("anchor_label"))
      assert(r.getAs[Long]("pos_id") != qid, "leave-one-out")
      val m = r.getAs[Double]("margin")
      // margin = pos_sim − neg_sim at full 6-dp precision; the 4-dp
      // published sims must agree within their own grain
      assert(math.abs((r.getAs[Double]("pos_sim") -
        r.getAs[Double]("neg_sim")) - m) < 2e-4)
      // semi_hard ⟺ margin < 0.05 (checked off the boundary, where
      // the flag's full-precision compare and the 6-dp margin agree)
      if (math.abs(m - 0.05) > 1e-9)
        assert(r.getAs[Boolean]("semi_hard") == (m < 0.05),
          s"semi-hard flag vs margin $m")
    }
  }
}
