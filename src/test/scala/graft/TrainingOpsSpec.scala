package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TrainingOps

class TrainingOpsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("repetition signals are bounded ratios") {
    val rows = TrainingOps.qRepetition(spark, sf)
      .select("n_tokens", "top_token_frac", "distinct_ratio", "dup_bigram_frac")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (n, top, dis, dup) =>
      n > 0 && top > 0 && top <= 1 && dis > 0 && dis <= 1 && dup >= 0 && dup <= 1
    })
    // top-token share can never be below the uniform floor 1/n_distinct
    assert(rows.forall { case (_, top, dis, _) => top + 1e-9 >= dis * top })
  }

  test("epoch schedule: uncapped sources hit the uniform token target, capped never exceed the cap") {
    val rows = TrainingOps.qEpochSchedule(spark, sf)
      .select("source", "n_tokens", "epochs", "capped_epochs", "effective_tokens", "repeats")
      .as[(String, Long, Double, Double, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    val total = rows.map(_._2).sum
    val target = TrainingOps.EpochBudgetMult * total / rows.length
    rows.foreach { case (_, nt, e, ce, eff, rep) =>
      assert(e > 0 && ce <= TrainingOps.EpochCap + 1e-9 && ce <= e + 1e-9)
      assert(rep == (e > 1.0))
      assert(eff <= (TrainingOps.EpochCap * nt).toLong)
      if (e < TrainingOps.EpochCap)
        assert(math.abs(e * nt - target) <= target * 1e-4,
          "uncapped source must land on the uniform per-source token target")
    }
  }

  test("curriculum plan: 4 phases partition the corpus into disjoint ascending surprisal bands") {
    val phases = TrainingOps.qCurriculumPlan(spark, sf)
      .select("phase", "n_docs", "token_budget", "surprisal_lo", "surprisal_hi")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(phases.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), "all four phases populated")
    val total = TrainingOps.qBigramSurprisal(spark, sf).count()
    assert(phases.map(_._2).sum == total, "phases must partition the scored corpus")
    assert(phases.forall { case (_, n, toks, lo, hi) => n > 0 && toks > n && lo <= hi })
    phases.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4, s"phase ${a._1} band must end before phase ${b._1} begins")
    }
    // quartile split: no phase can hold more than half the corpus
    assert(phases.forall(_._2 <= (total + 1) / 2))
  }

  test("seq packing offsets are the shard-local running sum and chunks are consistent") {
    val rows = TrainingOps.qSeqPacking(spark, sf)
      .select("source", "doc_id", "n_tokens", "tok_offset", "first_chunk", "last_chunk", "n_chunks")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var expected = 0L
      docs.sortBy(_._2).foreach { case (_, _, n, off, first, last, k) =>
        assert(off == expected, "offset must equal the running token sum")
        expected += n
        assert(first == off / TrainingOps.CtxTokens)
        assert(last == (off + n - 1) / TrainingOps.CtxTokens)
        assert(k == last - first + 1 && k >= 1)
      }
    }
  }

  test("hash split covers every doc once with roughly 80/10/10 mass") {
    val perSplit = TrainingOps.qHashSplit(spark, sf)
      .groupBy("split").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val total = perSplit.values.sum
    assert(total == Tables.documents(spark, sf).count())
    // binomial tolerance at n=50: generous bands, determinism is the contract
    assert(perSplit("train").toDouble / total > 0.6)
    assert(perSplit.getOrElse("val", 0L) + perSplit.getOrElse("test", 0L) > 0)
    // determinism: a second run assigns identically
    val again = TrainingOps.qHashSplit(spark, sf)
      .groupBy("split").agg(sum("n_docs").as("n")).as[(String, Long)].collect().toMap
    assert(again == perSplit)
  }

  test("unigram surprisal is positive and bounded by ln(corpus tokens)") {
    val df = TrainingOps.qUnigramSurprisal(spark, sf)
    val totalTokens = df.agg(sum("n_tokens")).as[Long].head()
    val rows = df.select("mean_surprisal").as[Double].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(s => s > 0 && s <= math.log(totalTokens.toDouble) + 1e-6))
  }

  test("source cap keeps at most K docs per source via a pre-shuffle group limit") {
    val df = TrainingOps.qSourceCap(spark, sf)
    val perSource = df.groupBy("source").count().as[(String, Long)].collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_._2 <= TrainingOps.SourceCap))
    // rank cutoff must push below the sort (top-k per group, not full sort+filter)
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    // determinism: same subset on a re-run
    val again = TrainingOps.qSourceCap(spark, sf).select("doc_id").as[Long].collect().toSet
    assert(again == df.select("doc_id").as[Long].collect().toSet)
  }

  test("mixture weights: shares sum to 1 and weight restores the uniform target") {
    val rows = TrainingOps.qMixtureWeights(spark, sf)
      .select("share", "weight").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4)
    val target = 1.0 / rows.length
    assert(rows.forall { case (s, w) => w > 0 && math.abs(s * w - target) < 1e-4 })
  }

  test("resample materializes the mixture deterministically with contiguous copy ids") {
    val rows = TrainingOps.qResample(spark, sf)
      .select("doc_id", "copy_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // copy ids per doc are contiguous 1..n (exploded sequence, no gaps)
    rows.groupBy(_._1).foreach { case (_, copies) =>
      val ids = copies.map(_._2).sorted
      assert(ids.head == 1 && ids.last == ids.length)
    }
    val again = TrainingOps.qResample(spark, sf)
      .select("doc_id", "copy_id").as[(Long, Long)].collect()
    assert(again.sorted.toSeq == rows.sorted.toSeq, "resample must be run-to-run identical")
  }

  test("corpus health partitions every doc into kept/dup/low-quality") {
    val r = TrainingOps.qCorpusHealth(spark, sf)
      .select("n_docs", "n_kept", "n_exact_dup", "n_low_quality", "keep_rate")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r._1 == Tables.documents(spark, sf).count())
    assert(r._2 + r._3 + r._4 == r._1)
    assert(r._5 > 0 && r._5 <= 1.0)
  }

  test("quality deciles cover all docs with non-overlapping quality ranges") {
    val rows = TrainingOps.qQualityDeciles(spark, sf)
      .select("decile", "n_docs", "min_q", "max_q")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    assert(rows.forall { case (d, n, lo, hi) => d >= 1 && d <= 10 && n > 0 && lo <= hi })
    assert(rows.sliding(2).forall {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => lo2 >= hi1 - 1e-9
      case _ => true
    }, "decile quality ranges must not overlap")
  }

  test("retention is 1.0 at k=0 and bounded afterwards") {
    val rows = TrainingOps.qRetention(spark, sf)
      .select("k", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.filter(_._1 == 0).forall(r => r._2 == r._3 && r._4 == 1.0),
      "every cohort member is active in the cohort week by definition")
    assert(rows.forall { case (k, a, s, r) => k >= 0 && a <= s && r > 0 && r <= 1.0 })
  }

  test("anomaly flags agree with the reported z-score") {
    // sf0.01: sf0.001's one-event-per-bucket stream has zero variance
    // everywhere, so no bucket clears the stable-baseline gate.
    val rows = TrainingOps.qAnomaly(spark, "/root/testdata/sf0.01")
      .select("z", "is_anomaly").as[(Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (z, a) => a == (math.abs(z) > 3.0) || math.abs(math.abs(z) - 3.0) < 1e-3 })
  }

  test("q_padding_waste: token mass conserved, narrower buckets pad less, batch count exact") {
    val rows = graft.operators.TrainingOps.queries("q_padding_waste")(spark, sf)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    assert(rows.keySet == Set("global", "bucket64", "bucket256"))
    assert(rows.values.map(_.getAs[Long]("real_tokens")).toSet.size == 1,
      "every policy batches the same token mass")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("pad_tokens") >= 0)
      val ws = r.getAs[Double]("waste_share")
      assert(ws >= 0.0 && ws < 1.0)
    }
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows("global").getAs[Long]("n_batches") == (nDocs + 15) / 16,
      "global policy = ceil(n/16) batches")
    assert(rows("bucket64").getAs[Long]("pad_tokens") <=
      rows("bucket256").getAs[Long]("pad_tokens"),
      "narrower buckets must not pad more")
  }

  test("q_dataset_card: the __total__ row is the exact fold of the per-source rows") {
    import org.apache.spark.sql.functions._
    val rows = TrainingOps.qDatasetCard(spark, sf).collect()
    val (tot, per) = rows.partition(_.getAs[String]("source") == "__total__")
    assert(tot.length == 1 && per.nonEmpty)
    val t = tot.head
    // mass conservation: totals are the sums of the per-source rows
    assert(t.getAs[Long]("n_docs") == per.map(_.getAs[Long]("n_docs")).sum)
    assert(t.getAs[Long]("total_tokens") ==
      per.map(_.getAs[Long]("total_tokens")).sum)
    assert(t.getAs[Long]("n_docs") == Tables.documents(spark, sf).count())
    per.foreach { r =>
      // mean length is the half-up per-mille ratio of its own row
      val expect = (2 * r.getAs[Long]("total_tokens") * 1000 +
        r.getAs[Long]("n_docs")) / (2 * r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("mean_tokens_permille") == expect)
      val d = r.getAs[Long]("lang_diversity_ppm")
      assert(d >= 0 && d < 1000000, s"diversity $d out of [0, 1e6)")
      val q = r.getAs[Long]("mean_quality_ppm")
      assert(q > 0 && q < 1000000, s"quality $q out of (0, 1e6)")
      assert(r.getAs[Long]("n_langs") >= 1)
    }
    // diversity recomposes from the raw language counts for one source
    val src = per.head.getAs[String]("source")
    val langs = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .groupBy(col("lang")).count().collect().map(_.getLong(1))
    val n = langs.sum
    val expectDiv = (2 * BigInt(1000000) * (BigInt(n) * n -
      langs.map(l => BigInt(l) * l).sum) + BigInt(n) * n) /
      (2 * BigInt(n) * n)
    assert(BigInt(per.head.getAs[Long]("lang_diversity_ppm")) == expectDiv,
      s"$src diversity")
  }
}
