package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SkewJoin, TrainingOps, Validation}

/** Bounds for the round-9 audit/pre-flight operators: the validation
  * report's one-scan-per-table plan shape, the segment-dedup ↔
  * exact-dedup implication, the join-cardinality pre-flight against
  * the real join, index-stats mass conservation, and the packing
  * sweep's provable monotonicities.
  */
class ValidationSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("q_data_validation: every check passes on clean data, one scan per table") {
    val df = Validation.qDataValidation(spark, sf)
    val rows = df.collect()
    assert(rows.length == 7)
    assert(rows.forall(_.getAs[Boolean]("pass")), "synthetic snapshot is clean")
    // plan shape: 5 table scans total — lineitem, orders×2 (agg + FK
    // anti-join), customer... would be 6 naively; the point pinned
    // here is that the SEVEN checks do not cost seven scans. Physical
    // nodes on sparkPlan (pre-AQE wrapper).
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.length <= 6,
      s"7 checks must fuse into at most 6 scans, got ${scans.length}")
  }

  test("q_segment_dedup: segment counts conserved, boilerplate found, verdict exact") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001 yields no duplicated segments
    val rows = Dedup.qSegmentDedup(spark, sf01).collect()
    // conservation: n_segments == ceil(ntok/16), recomputed independently
    val ntok = Tables.documents(spark, sf01)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == ntok.size, "one verdict row per document")
    rows.foreach { r =>
      val expect = (ntok(r.getAs[Long]("doc_id")) + 15) / 16
      assert(r.getAs[Long]("n_segments") == expect, s"segment count off at $r")
      assert(r.getAs[Long]("n_dup_segments") <= r.getAs[Long]("n_segments"))
      // verdict is the exact integer rule, no float involved
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Long]("n_dup_segments") * 2 <= r.getAs[Long]("n_segments")))
    }
    // the sf0.01 corpus contains near-dup boilerplate: duplicated
    // 16-token runs must surface even though no doc is an exact dup
    assert(rows.map(_.getAs[Long]("n_dup_segments")).sum > 0,
      "no duplicated segments found — boilerplate detection is dead")
    // a duplicated segment by definition occurs in ≥2 places
    val dupInstances = rows.map(_.getAs[Long]("n_dup_segments")).sum
    assert(dupInstances != 1)
  }

  test("q_segment_dedup: a whitespace-only document cannot fabricate segments (the Spark sequence(0,-1)=[0,-1] trap stays unreachable)") {
    // The r13 qBoilerplate finding: sequence(0, nseg-1) with nseg=0
    // explodes [0,-1] in Spark while DuckDB's generate_series yields
    // nothing. Through tokens() an all-whitespace doc normalizes to
    // [""] (split never returns an EMPTY array), so nseg=1 and BOTH
    // engines agree on exactly one md5("") segment — this pins that
    // contract (one segment, never two fabricated ones, never zero
    // Spark-side only), plus the size(toks)>0 guard for any future
    // token source that CAN yield an empty array.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_c17").toString
    Seq(
      (1L, "   \t  ", "en", "synth", 6L),
      (2L, "alpha beta gamma delta", "en", "synth", 22L),
      (3L, "alpha beta gamma delta", "en", "synth", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.qSegmentDedup(spark, dir).collect()
    val ws = rows.filter(_.getAs[Long]("doc_id") == 1L)
    assert(ws.length == 1 && ws.head.getAs[Long]("n_segments") == 1L,
      s"whitespace-only doc must carry exactly ONE (empty) segment in both engines: ${ws.toSeq}")
    assert(ws.head.getAs[Long]("n_dup_segments") == 0L,
      "the empty segment is unique in this corpus")
    rows.filter(_.getAs[Long]("doc_id") != 1L).foreach { r =>
      assert(r.getAs[Long]("n_segments") == 1L)
      assert(r.getAs[Long]("n_dup_segments") == 1L,
        "identical docs must see their shared segment as duplicated")
    }
  }

  test("q_join_cardinality: pre-flight equals the materialized join") {
    val r = SkewJoin.qJoinCardinality(spark, sf).collect().head
    val actual = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(r.getAs[Long]("join_rows") == actual)
    assert(r.getAs[Long]("n_keys_matched") <= r.getAs[Long]("keys_left"))
    assert(r.getAs[Long]("max_key_contrib") >= 1L)
  }

  test("q_packing_efficiency: pad grows and splits shrink as ctx doubles") {
    val rows = TrainingOps.qPackingEfficiency(spark, sf)
      .orderBy(col("ctx")).collect()
    assert(rows.map(_.getAs[Long]("ctx")).toSeq == Seq(256L, 512L, 1024L, 2048L))
    // ctx values are successive multiples: chunk boundaries of a larger
    // ctx are a subset of a smaller one's, so tail pad is nondecreasing
    // and boundary-crossing docs nonincreasing — provable, so pinned
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("pad_tokens") <= b.getAs[Long]("pad_tokens"))
      assert(a.getAs[Long]("n_docs_split") >= b.getAs[Long]("n_docs_split"))
      assert(a.getAs[Long]("total_tokens") == b.getAs[Long]("total_tokens"))
    }
  }

  test("q_poststrat_ate: strata partition users, arm counts reconcile, single-arm stratum vetoes the estimate") {
    val rows = graft.operators.Validation.qPoststratAte(spark, sf).collect()
    assert(rows.length == 3, "three activity terciles")
    val n = rows.head.getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("n_s")).sum == n, "strata must partition the user set")
    rows.foreach { r =>
      val nt = Option(r.getAs[java.lang.Long]("n_t")).map(_.toLong).getOrElse(0L)
      val nc = Option(r.getAs[java.lang.Long]("n_c")).map(_.toLong).getOrElse(0L)
      assert(nt + nc == r.getAs[Long]("n_s"), "arms must partition each stratum")
    }
    val allTwoArmed = rows.forall(r =>
      r.getAs[java.lang.Long]("n_t") != null && r.getAs[java.lang.Long]("n_c") != null)
    val est = rows.head.getAs[java.lang.Double]("ate_poststrat")
    assert((est != null) == allTwoArmed,
      "post-stratified ATE must be null exactly when a stratum is single-arm")
  }

  test("q_capture_recapture: overlap bounded by both samples, estimator lands on the known truth") {
    val r = graft.operators.Validation.qCaptureRecapture(spark, sf).collect().head
    val (nTrue, nA, nB, nAb) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("n_ab"))
    assert(nAb <= math.min(nA, nB), "overlap cannot exceed either capture")
    assert(nA <= nTrue && nB <= nTrue)
    assert(r.getAs[Double]("n_hat") > 0.0)
    assert(r.getAs[Boolean]("ci_covers_truth"),
      s"95% CI must cover the known corpus size (n_hat=${r.getAs[Double]("n_hat")}, " +
        s"se=${r.getAs[Double]("se")}, truth=$nTrue)")
  }

  test("q_anova: partition identity, eta-squared bounded, F nonnegative") {
    val rows = graft.operators.Validation.qAnova(spark, sf).collect()
    assert(rows.length == 5, "one row per market segment")
    val n = rows.head.getAs[Long]("n")
    assert(rows.map(_.getAs[Long]("n_g")).sum == n,
      "group sizes must partition the order count")
    val f = rows.head.getAs[Double]("f_stat")
    val eta = rows.head.getAs[Double]("eta_sq")
    assert(f >= 0.0, s"F must be nonnegative, got $f")
    assert(eta >= 0.0 && eta <= 1.0, s"eta^2 in [0,1], got $eta")
    assert(rows.forall(_.getAs[Double]("mean_spend") > 0.0))
  }

  test("q_kruskal_wallis: doubled rank sums are exactly n(n+1), tie correction only grows H") {
    val rows = graft.operators.Validation.qKruskalWallis(spark, sf).collect()
    assert(rows.length == 5)
    val n = rows.head.getAs[Long]("n")
    // sum over groups of 2*R_g = n*(n+1) EXACTLY (midranks partition
    // the rank total) — mean_rank is 2R_g/(2 n_g) at 6dp, so recover
    // the doubled sum and compare in scaled-integer space
    val sum2R = rows.map(r => math.round(
      r.getAs[Double]("mean_rank") * 2 * r.getAs[Long]("n_g"))).sum
    assert(sum2R == n * (n + 1), s"rank total $sum2R != ${n * (n + 1)}")
    val h = rows.head.getAs[Double]("h_stat")
    val hc = rows.head.getAs[Double]("h_corrected")
    assert(h >= 0.0)
    assert(hc >= h - 1e-9, "tie correction C<=1 can only raise H")
  }

  test("q_ann_index_stats: occupancy sums to the corpus, load factors average 1") {
    val rows = graft.operators.Similarity.qAnnIndexStats(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == n, "every vector in exactly one cell")
    val meanLf = rows.map(_.getAs[Double]("load_factor")).sum / rows.length
    assert(math.abs(meanLf - 1.0) < 0.01, s"mean load factor $meanLf")
    assert(rows.forall(_.getAs[Double]("mean_coherence") > 0.0),
      "members correlate positively with their own centroid")
  }
  test("q_mcnemar: cells partition the corpus, accuracies and the statistic recompose from the cells") {
    val r = Validation.qMcnemar(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    val (br, ao, ro, bw) = (r.getAs[Long]("both_right"),
      r.getAs[Long]("argmax_only"), r.getAs[Long]("rule_only"),
      r.getAs[Long]("both_wrong"))
    assert(br + ao + ro + bw == n, "the four cells partition the docs")
    assert(n == Tables.documents(spark, sf).count())
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("acc_argmax") == r6((br + ao).toDouble / n))
    assert(r.getAs[Double]("acc_rule") == r6((br + ro).toDouble / n))
    val chi = r.getAs[Double]("mcnemar_chi2")
    if (ao + ro == 0) assert(r.isNullAt(r.fieldIndex("mcnemar_chi2")))
    else {
      val d = math.abs(ao - ro).toDouble - 1
      assert(chi == r6(d * d / (ao + ro)))
      assert(r.getAs[Boolean]("significant") == (chi > 3.841))
    }
  }

  test("q_cuped: theta and both z statistics match a brute-force per-user recomputation") {
    val r = Validation.qCuped(spark, sf).collect().head
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).select(col("user_id"),
      expr("(ts DIV 1000000000) DIV 86400").cast("long").as("day"),
      when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
      .as[(Long, Long, Long)].collect()
    val d0 = ev.map(_._2).min
    val byU = ev.groupBy(_._1).map { case (u, rs) =>
      val x = rs.filter(_._2 < d0 + 15).map(_._3).sum.toDouble
      val y = rs.filter(_._2 >= d0 + 15).map(_._3).sum.toDouble
      val arm = if (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(u.toString)
          .substring(0, 15), 16) % 2 == 0) "treat" else "ctrl"
      (arm, x, y)
    }.toSeq
    val n = byU.length.toDouble
    val xbar = byU.map(_._2).sum / n
    val ybar = byU.map(_._3).sum / n
    val vx = byU.map(t => (t._2 - xbar) * (t._2 - xbar)).sum / n
    val cov = byU.map(t => (t._2 - xbar) * (t._3 - ybar)).sum / n
    val theta = if (vx <= 0) 0.0 else cov / vx
    assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-4,
      s"theta ${r.getAs[Double]("theta")} vs brute $theta")
    def stats(arm: String, th: Double) = {
      val ys = byU.filter(_._1 == arm)
        .map(t => t._3 - th * (t._2 - xbar))
      val m = ys.sum / ys.length
      val v = ys.map(v0 => (v0 - m) * (v0 - m)).sum / (ys.length - 1)
      (ys.length, m, v)
    }
    val (ntr, mtr, vtr) = stats("treat", theta)
    val (ncr, mcr, vcr) = stats("ctrl", theta)
    assert(r.getAs[Long]("n_t") == ntr && r.getAs[Long]("n_c") == ncr)
    val z = (mtr - mcr) / math.sqrt(vtr / ntr + vcr / ncr)
    assert(math.abs(r.getAs[Double]("z_cuped") - z) < 1e-3,
      s"z_cuped ${r.getAs[Double]("z_cuped")} vs brute $z")
    val (_, mtr0, vtr0) = stats("treat", 0.0)
    val (_, mcr0, vcr0) = stats("ctrl", 0.0)
    val z0 = (mtr0 - mcr0) / math.sqrt(vtr0 / ntr + vcr0 / ncr)
    assert(math.abs(r.getAs[Double]("z_raw") - z0) < 1e-3)
    val vr = 1.0 - (vtr / ntr + vcr / ncr) / (vtr0 / ntr + vcr0 / ncr)
    assert(math.abs(r.getAs[Double]("var_reduction") - vr) < 1e-3,
      s"var_reduction ${r.getAs[Double]("var_reduction")} vs brute $vr")
  }

  test("q_jarque_bera: moments match a brute-force recomputation per priority") {
    val rows = Validation.qJarqueBera(spark, sf).collect()
    assert(rows.length == 5, "one row per order priority")
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val xs = cents(r.getAs[String]("priority")).map(_._2.toDouble)
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      assert(r.getAs[Long]("n") == xs.length)
      assert(math.abs(r.getAs[Double]("skewness") - m3 / math.pow(m2, 1.5)) < 1e-4)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") - (m4 / (m2 * m2) - 3)) < 1e-4)
      assert(r.getAs[Double]("jb") >= 0.0, "JB is a sum of squares")
    }
  }

  test("q_cochran_armitage: the trend statistic matches a first-principles recomputation") {
    val rows = Validation.qCochranArmitage(spark, sf).collect()
    assert(rows.length == 5, "one row per priority rank")
    val n = rows.map(_.getAs[Long]("n")).sum
    val r = rows.map(_.getAs[Long]("fulfilled")).sum
    val swn = rows.map(x => x.getAs[Long]("priority_rank") * x.getAs[Long]("n")).sum
    val swwn = rows.map(x => x.getAs[Long]("priority_rank") *
      x.getAs[Long]("priority_rank") * x.getAs[Long]("n")).sum
    val swr = rows.map(x => x.getAs[Long]("priority_rank") *
      x.getAs[Long]("fulfilled")).sum
    val t = swr - r * (swn.toDouble / n)
    val v = (r.toDouble * (n - r) / (n.toDouble * (n - 1))) *
      (swwn - swn * (swn.toDouble / n))
    val z = t / math.sqrt(v)
    rows.foreach { row =>
      assert(math.abs(row.getAs[Double]("z") - z) < 1e-4,
        s"z ${row.getAs[Double]("z")} vs brute $z")
      val rate = row.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("q_vif: auxiliary R2 recomposes from pairwise correlations, VIF >= 1") {
    val rows = graft.ml.FeatureOps.queries("q_vif")(spark, sf).collect()
    assert(rows.length == 3)
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double"), col("l_discount"), col("l_tax"))
      .as[(Double, Double, Double)].collect()
    def corr2(a: Array[Double], b: Array[Double]) = {
      val (ma, mb) = (a.sum / a.length, b.sum / b.length)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
        b.map(y => (y - mb) * (y - mb)).sum)
    }
    val (q, d, t) = (xs.map(_._1), xs.map(_._2), xs.map(_._3))
    val (rqd, rqt, rdt) = (corr2(q, d), corr2(q, t), corr2(d, t))
    def r2Of(ra: Double, rb: Double, rab: Double) =
      (ra * ra + rb * rb - 2 * ra * rb * rab) / (1 - rab * rab)
    val expect = Map("l_quantity" -> r2Of(rqd, rqt, rdt),
      "l_discount" -> r2Of(rqd, rdt, rqt), "l_tax" -> r2Of(rqt, rdt, rqd))
    rows.foreach { r =>
      val f = r.getAs[String]("feature")
      assert(math.abs(r.getAs[Double]("r2_others") - expect(f)) < 1e-4,
        s"$f: r2_others ${r.getAs[Double]("r2_others")} vs brute ${expect(f)}")
      val vif = r.getAs[Double]("vif")
      assert(vif >= 1.0 - 1e-9, s"$f: VIF $vif must be >= 1")
      assert(math.abs(vif - 1.0 / (1.0 - r.getAs[Double]("r2_others"))) < 1e-3)
    }
  }

  test("q_fisher_exact: the recurrence sweep matches a first-principles hypergeometric enumeration") {
    val r = Validation.qFisherExact(spark, sf).collect()(0)
    val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d"))
    assert(a + b + c + d == Tables.documents(spark, sf).count(),
      "cells partition the corpus")
    // independent enumeration: log-factorials, every admissible table
    val lnf = (1 to (a + b + c + d).toInt)
      .scanLeft(0.0)((acc, j) => acc + math.log(j.toDouble)).toArray
    val (r1, r2, c1, n) = (a + b, c + d, a + c, a + b + c + d)
    def lnp(k: Long) = lnf(r1.toInt) + lnf(r2.toInt) + lnf(c1.toInt) +
      lnf((n - c1).toInt) - lnf(n.toInt) - lnf(k.toInt) -
      lnf((r1 - k).toInt) - lnf((c1 - k).toInt) - lnf((r2 - c1 + k).toInt)
    val pobs = math.exp(lnp(a))
    val kmin = math.max(0L, c1 - r2); val kmax = math.min(r1, c1)
    val p = (kmin to kmax).map(k => math.exp(lnp(k)))
      .filter(_ <= pobs * 1.0000001).sum
    assert(math.abs(r.getAs[Double]("p_value") - math.min(p, 1.0)) < 1e-6,
      s"p ${r.getAs[Double]("p_value")} vs enumeration $p")
    val pv = r.getAs[Double]("p_value")
    assert(pv >= 0.0 && pv <= 1.0)
  }

  test("q_friedman: rank sums partition n*k(k+1)/2 and Q recomposes exactly") {
    val rows = Validation.qFriedman(spark, sf).collect()
    assert(rows.length == 5, "one row per priority")
    val n = rows.head.getAs[Long]("n_blocks")
    assert(rows.forall(_.getAs[Long]("n_blocks") == n))
    val totalRanks = rows.map(_.getAs[Long]("rank_sum")).sum
    assert(totalRanks == n * 5 * 6 / 2,
      "every complete block contributes ranks 1..5 exactly once")
    val ssr = rows.map(r => { val s = r.getAs[Long]("rank_sum"); s * s }).sum
    val q = 12.0 * ssr / (n * 5 * 6) - 3.0 * n * 6
    assert(math.abs(rows.head.getAs[Double]("q_stat") - q) < 1e-6)
    rows.foreach { r =>
      val mr = r.getAs[Double]("mean_rank")
      assert(mr >= 1.0 && mr <= 5.0, s"mean rank $mr out of [1,5]") }
  }

  test("q_page_hinkley: the statistic matches a BigInt replay and resets at running minima") {
    val rows = graft.operators.TemporalOps.queries("q_page_hinkley")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length > 5)
    // exact integer replay of the micro-cent chain
    val cents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(expr("(ts DIV 1000000000) DIV 86400").cast("long"),
        round(col("value") * 100).cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).sum }.toSeq.sortBy(_._1)
    var s = BigInt(0); var m = BigInt(0); var mmin: BigInt = null
    cents.zipWithIndex.foreach { case ((day, x), i) =>
      val t = i + 1
      s += x
      val mean6 = (2 * s * 1000000 + t) / (2 * t)
      m += BigInt(x) * 1000000 - mean6
      mmin = if (mmin == null || m < mmin) m else mmin
      val ph = (m - mmin).toDouble / 1e8
      val got = rows(i).getAs[Double]("ph")
      assert(rows(i).getAs[Long]("day") == day)
      assert(math.abs(got - ph) < 1e-3, s"day $day: ph $got vs replay $ph")
      if (m == mmin) assert(got == 0.0, "a new running minimum resets PH to 0")
    }
    assert(rows.forall(_.getAs[Double]("ph") >= 0.0))
  }

  test("q_srm: shares sum to 1, chi2 recomposes from the bucket counts, no SRM on the md5 hash") {
    val rows = Validation.qSrm(spark, sf).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 9 })
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    val n = rows.map(_.getAs[Long]("n_users")).sum
    val chi = rows.map { r =>
      val d = r.getAs[Long]("n_users") * 10 - n; (d * d).toDouble }.sum / (10.0 * n)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("chi2") - chi) < 1e-4)
      assert(!r.getAs[Boolean]("srm_detected"),
        "a correct md5 bucketing must not trip its own alarm") }
  }

  test("q_tukey_hsd: full pair grid, q recomposes from brute-force group moments") {
    val rows = Validation.qTukeyHsd(spark, sf).collect()
    assert(rows.length == 10, "k=5 segments -> 10 unordered pairs")
    val segs = rows.flatMap(r => Seq(r.getAs[String]("seg_a"),
      r.getAs[String]("seg_b")))
    assert(segs.distinct.length == 5)
    segs.groupBy(identity).foreach { case (s, g) =>
      assert(g.length == 4, s"segment $s must appear in 4 pairs") }
    // brute-force MSW + means from the raw orders (exact cents)
    val g = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("c").cast("decimal(38,0)")).as("s"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("q"))
      .collect().map { r =>
        val n = r.getAs[Long]("n")
        val s = r.getAs[java.math.BigDecimal]("s").doubleValue()
        val q = r.getAs[java.math.BigDecimal]("q").doubleValue()
        r.getAs[String]("seg") -> (n, s / n, q - s * s / n)
      }.toMap
    val nTot = g.values.map(_._1).sum
    val msw = g.values.map(_._3).sum / (nTot - g.size)
    rows.foreach { r =>
      val (na, ma, _) = g(r.getAs[String]("seg_a"))
      val (nb, mb, _) = g(r.getAs[String]("seg_b"))
      val qExp = math.abs(ma - mb) /
        math.sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getAs[Double]("q_stat") - qExp) < 1e-4,
        s"${r.getAs[String]("seg_a")}/${r.getAs[String]("seg_b")}: " +
          s"${r.getAs[Double]("q_stat")} vs $qExp")
      assert(r.getAs[Boolean]("significant") ==
        (r.getAs[Double]("q_stat") > 3.858))
    }
  }

  test("q_did: the estimate recomposes from the four cell means and nets out both margins") {
    val r = Validation.qDid(spark, sf).collect().head
    val (tp, t0, cp, c0) = (r.getAs[Double]("mean_treated_post"),
      r.getAs[Double]("mean_treated_pre"),
      r.getAs[Double]("mean_control_post"),
      r.getAs[Double]("mean_control_pre"))
    assert(Seq(tp, t0, cp, c0).forall(_ > 0.0), "all four cells populated")
    val did = r.getAs[Double]("did_dollars")
    assert(math.abs(did - ((tp - t0) - (cp - c0))) < 1e-4,
      "DiD must recompose from the published cell means")
    // brute-force one cell (treated/post) from the raw orders
    val bf = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date"))
      .agg(avg(col("o_totalprice"))).head().getDouble(0)
    assert(math.abs(tp - bf) < 1e-2, s"treated/post cell $tp vs brute $bf")
    assert(r.getAs[Boolean]("significant") ==
      (math.abs(r.getAs[Double]("z")) > 1.96))
  }

  test("q_ridge_fit: alpha=0 is the OLS fit; shrinkage and |slope| strictly decrease in alpha") {
    val rows = graft.ml.FeatureOps.queries("q_ridge_fit")(spark, sf).collect()
    assert(rows.length == 9, "3 flags x 3 alphas")
    val ols = graft.ml.FeatureOps.queries("q_ols_fit")(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("slope"))
      .toMap
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (flag, g) =>
      val byA = g.sortBy(_.getAs[Int]("alpha"))
      assert(byA.map(_.getAs[Int]("alpha")).toSeq == Seq(0, 1, 10))
      // alpha=0 IS OLS (E22 publishes at 4 dp)
      assert(math.abs(byA(0).getAs[Double]("slope") - ols(flag)) < 1e-3,
        s"$flag: ridge alpha=0 ${byA(0).getAs[Double]("slope")} vs OLS ${ols(flag)}")
      assert(math.abs(byA(0).getAs[Double]("shrinkage") - 1.0) < 1e-9)
      val sh = byA.map(_.getAs[Double]("shrinkage"))
      assert(sh(0) > sh(1) && sh(1) > sh(2), "shrinkage strictly decreasing")
      val sl = byA.map(r => math.abs(r.getAs[Double]("slope")))
      assert(sl(0) >= sl(1) && sl(1) >= sl(2), "|slope| shrinks toward 0")
    }
  }

  test("q_cohens_d: d recomposes from brute-force arm moments; label cuts the rounded d") {
    val rows = Validation.qCohensD(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    // brute-force the arms exactly as the query defines them
    val spend = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
      .collect().map(x => x.getAs[String]("arm") -> x.getAs[Long]("cents"))
    val a = spend.filter(_._1 == "A").map(_._2.toDouble)
    val b = spend.filter(_._1 == "B").map(_._2.toDouble)
    assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length)
    val ma = a.sum / a.length; val mb = b.sum / b.length
    val ssA = a.map(x => (x - ma) * (x - ma)).sum
    val ssB = b.map(x => (x - mb) * (x - mb)).sum
    val d = (ma - mb) / math.sqrt((ssA + ssB) / (a.length + b.length - 2))
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-4,
      s"published ${r.getAs[Double]("cohens_d")} vs brute $d")
    // Hedges correction shrinks |d|
    assert(math.abs(r.getAs[Double]("hedges_g")) <=
      math.abs(r.getAs[Double]("cohens_d")) + 1e-9)
    val mag = math.abs(r.getAs[Double]("cohens_d")) match {
      case x if x < 0.2 => "negligible"
      case x if x < 0.5 => "small"
      case x if x < 0.8 => "medium"
      case _            => "large"
    }
    assert(r.getAs[String]("magnitude") == mag, "verdict cuts the rounded d")
  }

  test("q_t_closeness: EMD recomposes brute-force per class; bounds and verdict hold") {
    val rows = Validation.qTCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("t_close")
      assert(t >= 0.0 && t <= 1.0, s"t in [0,1], got $t")
      assert(r.getAs[Boolean]("t_ok") == (t <= 0.25))
    }
    // brute-force the ordinal EMD for every class from raw bands
    val banded = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        least(greatest(
          floor((round(col("c_acctbal") * 100).cast("long") + 100000L)
            / 100000L), lit(0L)), lit(10L)).cast("int").as("band"))
      .collect()
      .map(x => (x.getAs[Int]("c_nationkey"), x.getAs[String]("c_mktsegment"),
        x.getAs[Int]("band")))
    val n = banded.length.toDouble
    val globalP = (0 until 11).map(b => banded.count(_._3 == b) / n)
    rows.foreach { r =>
      val cls = banded.filter(x =>
        x._1 == r.getAs[Int]("c_nationkey") &&
          x._2 == r.getAs[String]("c_mktsegment"))
      assert(cls.length.toLong == r.getAs[Long]("n_g"))
      val p = (0 until 11).map(b => cls.count(_._3 == b).toDouble / cls.length)
      var cum = 0.0; var emd = 0.0
      (0 until 11).foreach { b => cum += p(b) - globalP(b); emd += math.abs(cum) }
      val t = emd / 10.0
      assert(math.abs(r.getAs[Double]("t_close") - t) < 1e-6,
        s"class ${(r.get(0), r.get(1))}: published ${r.getAs[Double]("t_close")} vs brute $t")
    }
  }

  test("q_sprt: LLR recomposes from cumulative counts; decisions respect the bands") {
    val rows = Validation.qSprt(spark, sf).collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    val l1 = 0.33647223662121289; val l0 = -0.14310084364067338
    val band = 2.9444389791664403
    var prevS = 0L; var prevF = 0L
    rows.foreach { r =>
      val s = r.getAs[Long]("s_cum"); val f = r.getAs[Long]("f_cum")
      assert(s >= prevS && f >= prevF, "cumulative counts are monotone")
      prevS = s; prevF = f
      val llr = r.getAs[Double]("llr")
      // mirror Spark's round(): EXACT binary expansion, then HALF_UP
      val expectLlr = new java.math.BigDecimal(s * l1 + f * l0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(llr == expectLlr, s"day ${r.getAs[Long]("day")}: llr mismatch")
      val expect =
        if (llr >= band) "accept_h1"
        else if (llr <= -band) "accept_h0"
        else "continue"
      assert(r.getAs[String]("decision") == expect)
    }
    // decided_by is the first decisive day, identical on every row
    val decided = rows.filter(_.getAs[String]("decision") != "continue")
      .map(_.getAs[Long]("day"))
    val db = rows.map(r => Option(r.getAs[Any]("decided_by"))).distinct
    assert(db.length == 1, "decided_by constant across the trace")
    if (decided.nonEmpty)
      assert(db.head.contains(decided.min))
    else assert(db.head.isEmpty)
    // the synthetic purchase share (~20%) sits below H0=25%: the
    // monitor must eventually accept H0
    assert(rows.last.getAs[String]("decision") == "accept_h0",
      "trace ends decisively for H0 on this corpus")
  }

  test("q_holm: step-down structure holds and Holm is never more permissive than BH") {
    val rows = Validation.qHolm(spark, sf).collect()
      .sortBy(_.getAs[Int]("p_rank"))
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    assert(rows.length.toLong == m)
    // identical battery as BH: same (cell, p) pairs
    val bh = Validation.qFdrBh(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cohort")) ->
        (r.getAs[Double]("p_value"), r.getAs[Boolean]("reject"))).toMap
    rows.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("cohort"))
      assert(bh(key)._1 == r.getAs[Double]("p_value"), s"$key battery drift")
      assert(bh(key)._2 == r.getAs[Boolean]("reject_bh"), s"$key BH verdict")
    }
    // step-down: rejections are a PREFIX of the p-ranking, each
    // rejected rank passes its own criterion, and the first
    // non-rejected rank fails its criterion
    val flags = rows.map(_.getAs[Boolean]("reject_holm"))
    assert(!flags.dropWhile(identity).contains(true),
      "Holm rejections must be a prefix of the p-ranking")
    rows.zip(flags).foreach { case (r, f) =>
      val pass = r.getAs[Double]("p_value") <= r.getAs[Double]("holm_crit")
      if (f) assert(pass, s"rejected rank ${r.getAs[Int]("p_rank")} fails its criterion")
    }
    flags.indexOf(false) match {
      case -1 =>
      case i => assert(rows(i).getAs[Double]("p_value") >
        rows(i).getAs[Double]("holm_crit"), "first accepted rank must fail")
    }
    // Holm controls FWER — strictly less permissive than BH
    rows.foreach { r =>
      if (r.getAs[Boolean]("reject_holm"))
        assert(r.getAs[Boolean]("reject_bh"),
          "a Holm rejection must also be a BH rejection")
    }
  }

  test("q_equivalence_tost: z pair recomposes from arm moments; verdict consistent") {
    val rows = Validation.qEquivalenceTost(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val spend = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
      .collect().map(x => x.getAs[String]("arm") -> x.getAs[Long]("cents"))
    val a = spend.filter(_._1 == "A").map(_._2.toDouble)
    val b = spend.filter(_._1 == "B").map(_._2.toDouble)
    val (ma, mb) = (a.sum / a.length, b.sum / b.length)
    def sv(x: Array[Double], m: Double) =
      x.map(v => (v - m) * (v - m)).sum / (x.length - 1)
    val se = math.sqrt(sv(a, ma) / a.length + sv(b, mb) / b.length)
    val margin = (a.sum + b.sum) / (a.length + b.length) * 0.05
    val zLow = (ma - mb + margin) / se
    val zUp = (margin - (ma - mb)) / se
    assert(math.abs(r.getAs[Double]("z_low") - zLow) < 1e-4)
    assert(math.abs(r.getAs[Double]("z_up") - zUp) < 1e-4)
    val zA = 1.6448536269514722
    assert(r.getAs[Boolean]("equivalent") ==
      (r.getAs[Double]("z_low") > zA && r.getAs[Double]("z_up") > zA))
    assert(r.getAs[Double]("margin_dollars") > 0)
  }

  test("q_sign_test: counts recompose from per-customer paired spends") {
    val rows = Validation.qSignTest(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val per = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("date")).as("yr"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("yr").isin(1996, 1997))
      .collect()
      .groupBy(_.getLong(0))
      .flatMap { case (_, g) =>
        val s96 = g.filter(_.getAs[Int]("yr") == 1996).map(_.getLong(2))
        val s97 = g.filter(_.getAs[Int]("yr") == 1997).map(_.getLong(2))
        if (s96.nonEmpty && s97.nonEmpty) Some((s96.sum, s97.sum)) else None
      }.toSeq
    val nPlus = per.count { case (a, b) => b > a }
    val nMinus = per.count { case (a, b) => b < a }
    assert(r.getAs[Long]("n_pairs") == per.length.toLong)
    assert(r.getAs[Long]("n_plus") == nPlus.toLong)
    assert(r.getAs[Long]("n_minus") == nMinus.toLong)
    val z = (nPlus - nMinus).toDouble / math.sqrt((nPlus + nMinus).toDouble)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
    assert(r.getAs[Boolean]("significant") == (math.abs(r.getAs[Double]("z")) > 1.96))
  }

  test("q_cochran_q: Q recomposes from the raw year-activity matrix; all-zero rows cancel") {
    val rows = Validation.qCochranQ(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("yr")).sorted.toSeq == Seq(1996, 1997, 1998))
    val cy = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate").cast("date")).as("yr"))
      .filter(col("yr").between(1996, 1998)).distinct()
      .collect().map(r => (r.getLong(0), r.getAs[Int]("yr")))
    val byCust = cy.groupBy(_._1).map { case (c, g) => c -> g.length }
    val t = byCust.values.map(_.toLong).sum
    val r2 = byCust.values.map(v => v.toLong * v).sum
    val cj = cy.groupBy(_._2).map { case (y, g) => y -> g.length.toLong }
    val sc2 = cj.values.map(v => v * v).sum
    val qBrute = 2.0 * (3 * sc2 - t * t).toDouble / (3 * t - r2).toDouble
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("q_stat") - qBrute) < 1e-5,
        s"Q ${r.getAs[Double]("q_stat")} vs brute $qBrute")
      assert(r.getAs[Long]("active") == cj(r.getAs[Int]("yr")))
      assert(r.getAs[Long]("n_subjects") == byCust.size.toLong)
      assert(r.getAs[Boolean]("uneven_years") ==
        (r.getAs[Double]("q_stat") > 5.991))
    }
  }

  test("q_power_mde: n-required and MDE recompose from the arm moments; MDE scales as 1/sqrt(n)") {
    val rows = Validation.qPowerMde(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val spend = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("arm",
        when(expr("conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)")
          .cast("long") % 2 === 0, "A").otherwise("B"))
      .collect().map(x => x.getAs[String]("arm") -> x.getAs[Long]("cents"))
    val a = spend.filter(_._1 == "A").map(_._2.toDouble)
    val b = spend.filter(_._1 == "B").map(_._2.toDouble)
    val (ma, mb) = (a.sum / a.length, b.sum / b.length)
    val ss = a.map(x => (x - ma) * (x - ma)).sum +
      b.map(x => (x - mb) * (x - mb)).sum
    val v = ss / (a.length + b.length - 2)
    val z = 2.8015852181129688
    val mde = z * math.sqrt(2 * v / ((a.length + b.length) / 2.0)) / 100
    assert(math.abs(r.getAs[Double]("mde_dollars") - mde) < 1e-4,
      s"MDE ${r.getAs[Double]("mde_dollars")} vs brute $mde")
    val nReq = math.ceil(z * z * 2 * v / math.pow(ma - mb, 2)).toLong
    assert(r.getAs[Long]("n_required_per_arm") == nReq)
    assert(r.getAs[Boolean]("powered") ==
      (math.min(a.length, b.length) >= nReq))
    assert(math.abs(r.getAs[Double]("observed_delta_dollars") -
      math.rint((ma - mb) / 100 * 1e6) / 1e6) < 1e-9)
  }
}
