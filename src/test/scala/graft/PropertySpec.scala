package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftExpressions._

/** Randomized (seeded, reproducible) checks of the custom codegen
  * expressions against independent scalar references — edge cases
  * (empty/short strings, arbitrary ASCII) a fixed corpus never
  * exercises.
  */
class PropertySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def asciiStrings(seed: Long, n: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    // lengths biased to the edges: empty, shorter-than-k, long
    Seq.fill(n) {
      val len = rng.nextInt(12) match {
        case 0 => 0
        case 1 | 2 => rng.nextInt(5)
        case _ => rng.nextInt(80)
      }
      Seq.fill(len)((32 + rng.nextInt(95)).toChar).mkString
    }
  }

  test("rolling_hash equals the BigInt fold for arbitrary ASCII strings") {
    val ss = asciiStrings(seed = 1, n = 200)
    val got = ss.toDF("s").select(rolling_hash(col("s"))).as[Long].collect()
    val expect = ss.map(_.foldLeft(BigInt(0)) {
      (h, c) => (h * 31 + c.toInt) % 1000000007L
    }.toLong)
    assert(got.toSeq == expect)
  }

  test("shingle_hashes window i equals the scalar polynomial of the k chars at i") {
    val ss = asciiStrings(seed = 2, n = 100).filter(_.nonEmpty)
    val got = ss.toDF("s").select(shingle_hashes(col("s"), k = 5))
      .as[Seq[Long]].collect()
    ss.zip(got).foreach { case (s, hashes) =>
      val n = math.max(s.length - 4, 1)
      assert(hashes.length == n, s"'$s'")
      for (i <- 0 until n) {
        var h = BigInt(0); var w = BigInt(1)
        for (j <- 0 until 5) {
          val c = if (i + j < s.length) s.charAt(i + j).toInt else 0
          h += w * c; w *= 31
        }
        assert(hashes(i) == (h % 4294967291L).toLong, s"window $i of '$s'")
      }
    }
  }

  test("hyperplane_bands stays within bits range and matches the reference on random vectors") {
    import graft.functions.Hyperplanes
    val rng = new scala.util.Random(3)
    val bits = 7
    val vs = Seq.fill(40)(Seq.fill(64)(rng.nextDouble() * 2 - 1))
    val got = vs.toDF("v")
      .select(hyperplane_bands(col("v"), nBands = 3, bits = bits))
      .as[Seq[Long]].collect()
    vs.zip(got).foreach { case (v, bands) =>
      assert(bands.length == 3)
      for (b <- 0 until 3) {
        assert(bands(b) >= 0 && bands(b) < (1L << bits))
        var expect = 0L
        for (j <- 0 until bits) {
          val base = (b * bits + j) * Hyperplanes.Dim
          var dot = 0.0
          for (d <- v.indices) dot += v(d) * Hyperplanes.component(base + d)
          if (dot >= 0) expect |= (1L << j)
        }
        assert(bands(b) == expect, s"band $b")
      }
    }
  }

  test("clusterPairs equals a reference union-find on random graphs") {
    // the propagation + pointer-jumping loop backs C6/C6b/C9; check it
    // against an independent driver-side union-find on graph shapes a
    // fixed corpus never exercises (long chains, stars, disjoint
    // cliques, self-loops, duplicate edges)
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val n = 60
      val chain = (0 until 15).map(i => (i.toLong, (i + 1).toLong))
      val star = (40 until 48).map(i => (39L, i.toLong))
      val rand = Seq.fill(30)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val edges = (chain ++ star ++ rand).map { case (a, b) => (a, b) }
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> {
          // canonical = min member of the component
          val r = find(x)
          parent.keys.filter(find(_) == r).min.min(r)
        }).toMap
      val got = graft.operators.Dedup
        .clusterPairs(spark, edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got.keySet == expect.keySet, s"seed $seed: node sets differ")
      expect.foreach { case (node, lab) =>
        assert(got(node) == lab, s"seed $seed: node $node got ${got(node)}, expected $lab")
      }
    }
  }

  test("a 100k-node chain converges via the star-contraction fallback") {
    import graft.operators.Dedup
    // pointer jumping closes distance 2^iter, so a 10k chain still
    // converges inside StarFallbackIter=15 (2^15 = 32k); diameter
    // 100_000 > 2^15 forces the handoff and exercises the
    // large-star/small-star path end to end
    val n = 100000
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val before = Dedup.starRounds.get
    val got = Dedup.clusterPairs(spark, edges.toDF("id1", "id2"))
      .as[(Long, Long)].collect()
    assert(Dedup.starRounds.get > before,
      "chain must be finished by star contraction, not propagation alone")
    assert(got.length == n)
    assert(got.forall(_._2 == 0L),
      s"all chain nodes must label 0, got ${got.filter(_._2 != 0L).take(5).mkString(",")}")
  }

  test("a 100k-leaf star (max-degree hub) clusters in O(1) rounds without hub hot-spotting") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.{col, lit}
    // the skew shape real near-dup graphs produce: one boilerplate hub
    // near-duplicated by everything. Diameter 2 — propagation must
    // converge in a handful of rounds with NO star-contraction handoff
    val n = 100000
    val edges = (1 until n).map(i => (0L, i.toLong))
    val starBefore = Dedup.starRounds.get
    val got = Dedup.clusterPairs(spark, edges.toDF("id1", "id2"))
      .as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L),
      s"all star nodes must label 0, got ${got.filter(_._2 != 0L).take(5).mkString(",")}")
    assert(Dedup.starRounds.get == starBefore,
      "a diameter-2 star must converge by propagation, not the contraction fallback")
    assert(Dedup.lastPropIters.get <= 3,
      s"star must converge in O(1) propagation rounds, took ${Dedup.lastPropIters.get}")
    // no hub hot-spot: the per-iteration neighborhood aggregate must
    // partial-reduce BEFORE its exchange — on the dst-partitioned join
    // output the hub's rows then collapse to <= 1 row per partition,
    // instead of one task receiving the whole 100k-row neighborhood.
    // Plan print is top-down, so the partial aggregate (executed
    // first) must appear BELOW the exchange it feeds.
    val e = edges.toDF("id1", "id2")
      .unionAll(edges.toDF("id1", "id2").select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst").repartition(8, col("dst"))
    val l = e.select(col("src").as("node")).distinct().withColumn("lab", col("node"))
    val p = Dedup.neighborMin(e, l).queryExecution.executedPlan.toString
    val iPartial = p.indexOf("partial_min")
    val iExchange = p.indexOf("Exchange hashpartitioning(src")
    assert(iPartial >= 0 && iExchange >= 0 && iPartial > iExchange,
      s"neighbor aggregate must map-side combine before the src exchange:\n$p")
  }

  test("star contraction alone equals union-find on random graphs") {
    // the fallback must be correct independent of how much propagation
    // preceded it — run it directly on raw pair sets
    for (seed <- 4 to 6) {
      val rng = new scala.util.Random(seed)
      val n = 80
      val rand = Seq.fill(60)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      rand.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = rand.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      val got = graft.operators.Dedup
        .starContract(rand.toDF("u", "v"), width = 8)
        .as[(Long, Long)].collect().toMap
      assert(got.keySet == expect.keySet, s"seed $seed: node sets differ")
      expect.foreach { case (node, lab) =>
        assert(got(node) == lab, s"seed $seed: node $node got ${got(node)}, expected $lab")
      }
    }
  }

  test("labelPropagate: k rounds reach exactly distance k; disjoint cliques stay distinct") {
    import graft.operators.GraphOps
    // chain 0-1-2-...-9 (src<dst pairs): after k rounds node i holds
    // min(0, i-k) = max(0, i-k); k=3 must NOT collapse the far end
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val gotChain = GraphOps.labelPropagate(chain, rounds = 3)
      .as[(Long, Long)].collect().toMap
    (0L to 9L).foreach { i =>
      assert(gotChain(i) == math.max(0L, i - 3),
        s"chain node $i: got ${gotChain(i)}")
    }
    // two disjoint 4-cliques {10..13}, {20..23}: one round suffices
    // per clique and the communities must not merge at any round count
    val cliques = (for {
      base <- Seq(10L, 20L)
      a <- 0L until 4L; b <- (a + 1) until 4L
    } yield (base + a, base + b)).toDF("src", "dst")
    val gotCliques = GraphOps.labelPropagate(cliques, rounds = 3)
      .as[(Long, Long)].collect().toMap
    (10L to 13L).foreach(i => assert(gotCliques(i) == 10L))
    (20L to 23L).foreach(i => assert(gotCliques(i) == 20L))
    // star with hub 30: one round pulls every leaf to the hub's min
    val star = (31L to 60L).map(i => (30L, i)).toDF("src", "dst")
    val gotStar = GraphOps.labelPropagate(star, rounds = 1)
      .as[(Long, Long)].collect().toMap
    (30L to 60L).foreach(i => assert(gotStar(i) == 30L))
  }

  test("q_knn_graph: out-degree <= K everywhere, mutual subgraph degree-bounded both ways, cutoff pushed pre-shuffle") {
    import graft.operators.GraphOps
    val df = GraphOps.qKnnGraph(spark, sf)
    val rows = df.select("node", "nbr", "rank", "mutual")
      .as[(Long, Long, Int, Boolean)].collect()
    assert(rows.nonEmpty)
    // selection side: at most K partners per node, ranks contiguous 1..d
    rows.groupBy(_._1).foreach { case (n, rs) =>
      assert(rs.length <= GraphOps.KnnK, s"node $n kept ${rs.length} > K")
      assert(rs.map(_._3).sorted.sameElements(1 to rs.length),
        s"node $n: ranks not contiguous")
    }
    // mutual flag is exactly symmetric membership of the selection set
    val sel = rows.map(r => (r._1, r._2)).toSet
    rows.foreach { case (n, b, _, m) =>
      assert(m == sel.contains((b, n)), s"mutual flag wrong on ($n,$b)")
    }
    // the MUTUAL subgraph bounds degree on BOTH sides — the wedge-count
    // guarantee (<= |V| * K^2) the sparsifier exists to provide
    val mutualDeg = rows.filter(_._4).groupBy(_._1).map(_._2.length)
    assert(mutualDeg.forall(_ <= GraphOps.KnnK))
    // the top-K cutoff must prune map-side, before the rank shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "per-node top-K must prune pre-shuffle via WindowGroupLimit")
  }

  test("q_triangle_knn: degrees equal the mutual kNN subgraph's, K-bounded; triangles within C(deg,2)") {
    import graft.operators.GraphOps
    val tri = GraphOps.qTriangleKnn(spark, sf)
      .select("s_suppkey", "degree", "triangles", "clustering")
      .as[(Long, Long, Long, Double)].collect()
    assert(tri.nonEmpty)
    // scope + degree: exactly the nodes with >= 1 mutual edge, degree
    // equal to their mutual-edge count in M5's readout, and <= K (the
    // bound that caps the wedge join at |V|*K^2)
    val mutualEdges = GraphOps.qKnnGraph(spark, sf)
      .filter("mutual").select("node", "nbr")
      .as[(Long, Long)].collect()
    val mDeg = mutualEdges.groupBy(_._1).map { case (n, es) => (n, es.length.toLong) }
    assert(tri.map(t => (t._1, t._2)).toMap == mDeg)
    tri.foreach { case (n, d, t, c) =>
      assert(d <= GraphOps.KnnK, s"node $n degree $d > K")
      assert(t <= d * (d - 1) / 2, s"node $n triangles $t exceed C($d,2)")
      assert(c >= 0.0 && c <= 1.0, s"node $n clustering $c out of [0,1]")
      if (d < 2) assert(t == 0 && c == 0.0)
    }
    // global consistency: the per-node counts sum to 3x the triangle total
    assert(tri.map(_._3).sum % 3 == 0)
  }

  test("q_global_clustering: transitivity recomposes exactly from M6's per-node counts") {
    import graft.operators.GraphOps
    val r = GraphOps.queries("q_global_clustering")(spark, sf).collect().head
    val tri = GraphOps.qTriangleKnn(spark, sf)
      .select("degree", "triangles").as[(Long, Long)].collect()
    // wedges = sum C(deg,2); triangle total = sum(per-node)/3 — both
    // derived from the INDEPENDENT per-node M6 readout
    val wedges = tri.map { case (d, _) => d * (d - 1) / 2 }.sum
    val triangles = tri.map(_._2).sum / 3
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == triangles)
    assert(r.getAs[Long]("n_nodes") == tri.length)
    val t = r.getAs[Double]("transitivity")
    if (wedges > 0) {
      assert(t >= 0.0 && t <= 1.0)
      assert(math.abs(t - 3.0 * triangles / wedges) < 1e-6)
    }
  }

  test("q_skyline: grid-pruned sweep equals brute-force Pareto dominance on the full supplier set") {
    import graft.operators.AnalyticExt
    val got = AnalyticExt.qSkyline(spark, sf)
      .select("s_suppkey", "unit_price", "total_qty")
      .as[(Long, Double, Long)].collect().toSet
    // the full (unpruned) supplier metric set, same arithmetic
    val all = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        sum(col("l_quantity").cast("decimal(12,0)")).as("sq"))
      .select(col("l_suppkey"),
        round(col("sp").cast("double") / col("sq").cast("double"), 6),
        col("sq").cast("long"))
      .as[(Long, Double, Long)].collect()
    def dominated(p: (Long, Double, Long)) = all.exists(q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3))
    val want = all.filterNot(dominated).toSet
    assert(got == want, s"skyline mismatch: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty)
  }

  test("q_active_users invariants: WAU >= DAU per day, stickiness in (0,1], WAU <= 7-day DAU sum") {
    val rows = graft.operators.TemporalOps.queries("q_active_users")(spark, sf)
      .select("day", "dau", "wau", "stickiness")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val dauByDay = rows.map(r => (r._1, r._2)).toMap
    rows.foreach { case (d, dau, wau, st) =>
      assert(wau >= dau, s"day $d: WAU $wau < DAU $dau")
      assert(st > 0.0 && st <= 1.0, s"day $d: stickiness $st out of (0,1]")
      // the window's users are a union of its days' user sets
      val cap = (d - 6 to d).flatMap(dauByDay.get).sum
      assert(wau <= cap, s"day $d: WAU $wau exceeds 7-day DAU sum $cap")
    }
  }

  test("q_record_linkage: sorted-neighborhood pairs are within-block, canonical, and score-consistent") {
    val rows = graft.operators.AnalyticExt.queries("q_record_linkage")(spark, sf)
      .select("a", "b", "name_dist", "brand_match", "price_close", "score", "matched")
      .as[(Long, Long, Int, Boolean, Boolean, Int, Boolean)].collect()
    assert(rows.nonEmpty)
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_name", "p_size")
      .as[(Long, String, Int)].collect()
      .map { case (k, n, s) => k -> (n.split(" ").last, s) }.toMap
    rows.foreach { case (a, b, lev, bm, pc, sc, m) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(parts(a) == parts(b), s"pair ($a,$b) crosses blocks")
      val want = (if (lev == 0) 2 else if (lev <= 2) 1 else 0) +
        (if (bm) 1 else 0) + (if (pc) 1 else 0)
      assert(sc == want && m == (sc >= 3), s"pair ($a,$b) score wrong")
    }
  }

  test("q_mmr_diversify: 3 distinct picks per query from the top-10 pool; rank-1 is the relevance argmax") {
    val rows = graft.operators.Similarity.queries("q_mmr_diversify")(spark, sf)
      .select("qid", "mmr_rank", "nid", "score")
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    val brute = graft.operators.Similarity.queries("q_ann_bruteforce")(spark, sf)
      .filter(col("rank") === 1).select("qid", "nid")
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.sameElements(Seq(1, 2, 3)))
      assert(rs.map(_._3).distinct.length == 3, s"qid $qid repeated a pick")
      // MMR's first pick is pure relevance == the exact top-1
      val p1 = rs.find(_._2 == 1).get._3
      assert(p1 == brute(qid), s"qid $qid rank-1 $p1 != exact top-1 ${brute(qid)}")
      // diversity trades relevance monotonically: scores non-increasing
      val sc = rs.sortBy(_._2).map(_._4)
      assert(sc(0) >= sc(1) - 1e-9, s"qid $qid: rank-2 score above rank-1")
    }
  }

  test("q_lift_curve invariants: lift-weighted sizes reconstruct totals; cum_capture monotone to 1.0") {
    val rows = graft.ml.FeatureOps.queries("q_lift_curve")(spark, sf)
      .select("decile", "n", "n_pos", "resp_rate", "lift", "cum_capture")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val totPos = rows.map(_._3).sum
    assert(math.abs(rows.last._6 - 1.0) < 1e-9, "final cum_capture != 1")
    rows.sliding(2).foreach {
      case Array(p, c) => assert(c._6 >= p._6 - 1e-9, "cum_capture not monotone")
      case _ =>
    }
    // response rates rebuild n_pos; cumulative matches the running sum
    var run = 0L
    rows.foreach { case (d, n, np, rr, _, cc) =>
      assert(math.abs(rr - np.toDouble / n) < 1e-6)
      run += np
      assert(math.abs(cc - run.toDouble / totPos) < 1e-6, s"decile $d cum wrong")
    }
  }

  test("q_weighted_sample structural contract: 5 ranks per lang, keys non-increasing") {
    val rows = graft.operators.TrainingOps
      .queries("q_weighted_sample")(spark, sf)
      .select("lang", "sample_rank", "sample_key")
      .as[(String, Int, Double)].collect()
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1 to 5),
        s"$lang: ranks must be exactly 1..5")
      val keysInRankOrder = rs.sortBy(_._2).map(_._3)
      assert(keysInRankOrder.zip(keysInRankOrder.tail)
        .forall { case (a, b) => a >= b },
        s"$lang: sample_key must be non-increasing in rank")
    }
    assert(byLang.nonEmpty)
  }

  test("q_knn_components: labels are component minima, sizes partition the node set, and components refine 3-round label-prop communities") {
    val rows = graft.operators.GraphOps.queries("q_knn_components")(spark, sf)
      .select("s_suppkey", "component", "component_size")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty, "kNN graph has no mutual edges at test SF")
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.map(_._1).min == comp,
        s"component label $comp is not the minimum member id")
      members.foreach { case (_, _, sz) =>
        assert(sz == members.length, s"component $comp size column inconsistent")
      }
    }
    // exact CC can only MERGE what 3-round propagation separates —
    // never split: two nodes sharing a label-prop community (distance
    // <= 3) are connected, so they must share a component
    val lp = graft.operators.GraphOps.queries("q_label_prop_knn")(spark, sf)
      .select("s_suppkey", "community").as[(Long, Long)].collect().toMap
    val compOf = rows.map(r => r._1 -> r._2).toMap
    assert(lp.keySet == compOf.keySet, "node sets must match (same graph input)")
    lp.groupBy(_._2).values.foreach { members =>
      val comps = members.keys.map(compOf).toSet
      assert(comps.size == 1,
        s"label-prop community split across exact components: $comps")
    }
  }

  test("q_template_score invariants: diversity and top_share in (0,1], counts consistent, all sources present") {
    val rows = graft.operators.TextAnalysis.queries("q_template_score")(spark, sf)
      .select("source", "n_trigrams", "distinct_trigrams", "diversity", "top_share")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, d, div, top) =>
      assert(n > 0 && d > 0 && d <= n, s"$src: counts inconsistent ($d of $n)")
      assert(div > 0 && div <= 1.0, s"$src: diversity $div out of range")
      assert(top > 0 && top <= 1.0, s"$src: top_share $top out of range")
      // the most repeated trigram cannot exceed the mass left over by
      // the other distinct - 1 trigrams appearing at least once
      assert(top <= (n - d + 1).toDouble / n + 1e-9,
        s"$src: top_share $top impossible for $d distinct of $n")
    }
    val srcCount = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == srcCount, "every source must be scored")
  }

  test("q_naive_bayes: confusion matrix partitions the scored test docs and predicts only trained classes") {
    import org.apache.spark.sql.functions.col
    val rows = graft.operators.TextAnalysis.queries("q_naive_bayes")(spark, sf)
      .select("true_lang", "pred_lang", "n").as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    val langs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 =!= 0)
      .select("lang").distinct().as[String].collect().toSet
    rows.foreach { case (t, p, n) =>
      assert(n > 0)
      assert(langs.contains(p), s"predicted untrained class $p")
      assert(t.nonEmpty)
    }
    // every test doc with at least one token is classified exactly once
    val scoredDocs = Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(org.apache.spark.sql.functions.expr(
        "size(filter(toks, t -> length(t) > 0)) > 0"))
      .count()
    assert(rows.map(_._3).sum == scoredDocs,
      s"confusion total ${rows.map(_._3).sum} != scored test docs $scoredDocs")
  }

  test("rank statistics invariants: tau/rho bounded, pair accounting exact, KS/HL consistent with segment counts") {
    // Kendall: pair counts partition, tau in [-1, 1]
    val kt = graft.operators.AnalyticExt.queries("q_kendall_tau")(spark, sf)
      .select("n_days", "n_pairs", "nc", "nd", "tau_b")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(kt._2 == kt._1 * (kt._1 - 1) / 2, "n_pairs != C(n_days, 2)")
    assert(kt._3 + kt._4 <= kt._2, "concordant+discordant exceed pairs")
    kt._5.foreach(t => assert(math.abs(t) <= 1.0, s"tau $t out of range"))
    // Spearman: rho bounded, n matches the base join
    val sp = graft.operators.AnalyticExt.queries("q_spearman")(spark, sf)
      .select("n_orders", "rho_spearman")
      .as[(Long, Option[Double])].head()
    val nOrders = Tables.orders(spark, sf).count()
    assert(sp._1 == nOrders, "every order must be ranked (FK join is total)")
    sp._2.foreach(r => assert(math.abs(r) <= 1.0, s"rho $r out of range"))
    // KS: D in [0,1], p in [0,1], counts match the two segments
    val ks = graft.operators.Validation.queries("q_ks_test")(spark, sf)
      .select("n1", "n2", "d_stat", "p_value")
      .as[(Long, Long, Double, Double)].head()
    assert(ks._3 >= 0 && ks._3 <= 1.0 && ks._4 >= 0 && ks._4 <= 1.0)
    val segN = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).count()
      .as[(String, Long)].collect().toMap
    assert(ks._1 == segN("BUILDING") && ks._2 == segN("MACHINERY"))
    // HL: pair mass is exactly n1*n2; the shift lies inside the
    // possible bin-difference span
    val hl = graft.operators.Validation.queries("q_hodges_lehmann")(spark, sf)
      .select(col("hl_shift_dollars"), col("n_pairs").cast("double"))
      .as[(Long, Double)].head()
    assert(hl._2 == ks._1.toDouble * ks._2, "HL pair mass != n1*n2")
    assert(math.abs(hl._1) < 600000, "shift outside the price domain")
  }

  test("ivf nprobe curve: recall and candidate count monotone in nprobe, panel complete, top point matches D3's floor") {
    val rows = graft.operators.Similarity
      .queries("q_ivf_nprobe_curve")(spark, sf)
      .select("nprobe", "n_queries", "mean_recall_5", "mean_candidates",
        "scan_frac")
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == graft.operators.Similarity.NprobeGrid,
      "one row per grid point")
    assert(rows.map(_._2).distinct.length == 1, "same panel at every point")
    // probing more cells can only add candidates and never lose a hit
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 - 1e-9, s"recall not monotone at nprobe=${b._1}")
      assert(b._4 >= a._4, s"candidates not monotone at nprobe=${b._1}")
      assert(b._5 > a._5)
    }
    rows.foreach { r =>
      assert(r._3 >= 0 && r._3 <= 1.0 && r._5 > 0 && r._5 <= 1.0)
    }
  }

  test("cohens kappa: po is the observed accuracy, kappa <= po <= 1, band cut matches the published kappa") {
    val k = graft.operators.TextAnalysis.queries("q_cohens_kappa")(spark, sf)
      .select("n_docs", "po", "pe", "kappa", "band")
      .as[(Long, Double, Double, Option[Double], String)].head()
    val pred = graft.operators.TextAnalysis.queries("q_lang_id")(spark, sf)
      .select(col("is_match").cast("long")).as[Long].collect()
    assert(k._1 == pred.length, "kappa n_docs != scored docs")
    assert(math.abs(k._2 - pred.sum.toDouble / pred.length) < 1e-6,
      "po != observed accuracy")
    assert(k._3 > 0 && k._3 <= 1.0)
    k._4.foreach { kap =>
      assert(kap <= 1.0 && kap >= -1.0)
      val expected = if (kap < 0.2) "slight" else if (kap < 0.4) "fair"
        else if (kap < 0.6) "moderate" else if (kap < 0.8) "substantial"
        else "almost_perfect"
      assert(k._5 == expected, s"band ${k._5} != $expected for kappa $kap")
    }
  }

  test("eigencentrality: scores in (0,1], max normalized to exactly 1, node set matches the kNN pagerank's") {
    val rows = graft.operators.GraphOps.queries("q_eigencentrality")(spark, sf)
      .select("s_suppkey", "degree", "centrality")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 > 0.0 && r._3 <= 1.0, s"centrality in (0,1]: ${r._3}")
      assert(r._2 >= 1, "every scored node has an edge")
    }
    assert(rows.map(_._3).max == 1.0, "L-infinity normalization pins the max at 1")
    val prNodes = graft.operators.GraphOps.queries("q_pagerank_knn")(spark, sf)
      .select("s_suppkey").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == prNodes,
      "same mutual-kNN node set as the damped walk")
  }

  test("community conductance: edge accounting partitions the kNN edge set, conductance in [0,1]") {
    val rows = graft.operators.GraphOps
      .queries("q_community_conductance")(spark, sf)
      .select("community", "community_size", "internal_edges",
        "boundary_edges", "conductance")
      .as[(Long, Long, Long, Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    val m = graft.operators.GraphOps.queries("q_knn_graph")(spark, sf)
      .filter(col("mutual")).count() / 2 // both orientations listed
    assert(rows.map(_._3).sum + rows.map(_._4).sum / 2 == m,
      "sum(internal) + sum(boundary)/2 must equal |E|")
    assert(rows.map(_._4).sum % 2 == 0, "boundary edges counted twice")
    rows.foreach { case (c, sz, in, bd, cond) =>
      assert(sz > 0 && in >= 0 && bd >= 0)
      cond.foreach(x => assert(x >= 0.0 && x <= 1.0, s"community $c: $x"))
    }
    // sizes partition the node set of the kNN graph
    val nNodes = graft.operators.GraphOps.queries("q_label_prop_knn")(spark, sf)
      .count()
    assert(rows.map(_._2).sum == nNodes, "community sizes must partition |V|")
  }

  test("q_modularity: degree identity vs conductance, Q is the contribution sum, bounds hold") {
    val rows = graft.operators.GraphOps.queries("q_modularity")(spark, sf)
      .select("community", "community_size", "internal_edges", "degree_sum",
        "contribution", "modularity", "strong_structure")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    // the SAME partition M9 audits: degree_sum = 2·internal + boundary
    val cond = graft.operators.GraphOps
      .queries("q_community_conductance")(spark, sf)
      .select("community", "internal_edges", "boundary_edges")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (c, sz, in, deg, _, _, _) =>
      val (cin, cbd) = cond(c)
      assert(in == cin, s"community $c internal edges disagree with M9")
      assert(deg == 2 * cin + cbd,
        s"community $c: degree_sum $deg != 2·$cin + $cbd")
      assert(sz > 0)
    }
    // handshake: Σ degree_sum = 2m
    val m = graft.operators.GraphOps.queries("q_knn_graph")(spark, sf)
      .filter(col("mutual")).count() / 2
    assert(rows.map(_._4).sum == 2 * m, "sum of degree sums must be 2|E|")
    // Q equals the contribution sum (to rounding grain) and is bounded
    val q = rows.head._6
    assert(rows.forall(_._6 == q), "global Q constant across rows")
    assert(math.abs(rows.map(_._5).sum - q) < 1e-3 * rows.length,
      s"Q $q vs contribution sum ${rows.map(_._5).sum}")
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of [-1/2, 1]")
    assert(rows.forall(_._7 == (q > 0.3)))
    // exact recompose: Q = Σ(4m·e_c − d_c²) / 4m²
    val qBrute = rows.map { case (_, _, in, deg, _, _, _) =>
      BigInt(4) * BigInt(m) * in - BigInt(deg) * BigInt(deg) }.sum
    val qExact = qBrute.toDouble / (BigInt(4) * BigInt(m) * BigInt(m)).toDouble
    assert(math.abs(q - qExact) < 1e-6, s"Q $q vs exact $qExact")
  }

  test("phash threshold sweep: monotone in radius, keep/drop partitions payloads, radius 0 is the exact-dup baseline") {
    val rows = graft.multimodal.BinaryPipeline
      .queries("q_phash_threshold_sweep")(spark, sf)
      .select("threshold", "n_pairs", "n_clusters", "n_linked_hashes",
        "n_dropped", "n_kept")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val nPayloads = Tables.documents(spark, sf).count()
    rows.foreach { r =>
      assert(r._5 + r._6 == nPayloads, s"t=${r._1}: drop+keep != payloads")
    }
    assert(rows.head._2 == 0, "distinct hashes cannot pair at radius 0")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, "pair count must grow with the radius")
      assert(b._5 >= a._5, "a wider radius can only drop more")
      assert(b._3 <= b._4 || b._3 == 0, "clusters cannot exceed linked hashes")
    }
  }

  test("nelson-aalen: hazard nondecreasing, FH survival dominates the KM product-limit everywhere") {
    val na = graft.operators.TemporalOps.queries("q_nelson_aalen")(spark, sf)
      .select("dur_hour", "cum_hazard", "fh_survival", "at_risk")
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(na.nonEmpty)
    na.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, "cumulative hazard must be nondecreasing")
      assert(b._4 <= a._4, "risk set can only shrink over time")
    }
    val km = graft.operators.TemporalOps.queries("q_kaplan_meier")(spark, sf)
      .select("dur_hour", "survival").as[(Long, Double)].collect().toMap
    na.foreach { case (h, _, fh, _) =>
      assert(fh >= km(h) - 1e-9,
        s"Fleming-Harrington exp(-H) must dominate KM at hour $h: $fh < ${km(h)}")
    }
  }

  test("burstiness: event totals conserved, active days bounded by the span") {
    val rows = graft.operators.TemporalOps.queries("q_burstiness")(spark, sf)
      .select("n_events", "n_active_days", "span_days", "fano")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._1).sum == total, "per-user event counts must sum to the corpus")
    rows.foreach { r =>
      assert(r._2 <= r._3, "active days cannot exceed the span")
      assert(r._4 >= -1e-9, s"Fano factor is nonnegative, got ${r._4}")
    }
  }

  test("js divergence: bounded by ln 2, token totals conserved") {
    val rows = graft.operators.TrainingOps.queries("q_js_divergence")(spark, sf)
      .select("source", "n_tokens", "jsd_nats", "jsd_bits")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 >= 0.0 && r._3 <= math.log(2) + 1e-6,
        s"JSD in [0, ln 2], got ${r._3} for ${r._1}")
      assert(r._4 <= 1.0 + 1e-6, "JSD in bits is at most 1")
    }
  }

  test("pii scan: detected counts equal the planted truth per modulus class") {
    val got = graft.operators.TextAnalysis.queries("q_pii_scan")(spark, sf)
      .select("emails", "phones", "ips", "docs", "docs_flagged")
      .as[(Long, Long, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, sf).select("doc_id").as[Long].collect()
    assert(got.map(_._1).sum == docs.count(_ % 5 == 0), "every planted email found, nothing else")
    assert(got.map(_._2).sum == docs.count(_ % 7 == 0), "every planted phone found, nothing else")
    assert(got.map(_._3).sum == docs.count(_ % 11 == 0), "every planted IP found, nothing else")
    assert(got.map(_._5).sum ==
      docs.count(d => d % 5 == 0 || d % 7 == 0 || d % 11 == 0))
    assert(got.map(_._4).sum == docs.length)
  }

  test("pq distortion: 8 complete subspaces, unit energy partition, quantization destroys less than it keeps") {
    val rows = graft.operators.Similarity.queries("q_pq_distortion")(spark, sf)
      .select("m", "n_vectors", "mse", "mean_energy", "distortion_ratio")
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0 until 8), "one row per subspace")
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r._2 == n, "every vector coded in every subspace")
      assert(r._3 >= 0.0 && r._3 <= r._4, "MSE cannot exceed the subvector energy")
      assert(r._5 < 1.0, s"subspace ${r._1} ratio ${r._5}: codebook worse than zero-vector")
    }
    val totalEnergy = rows.map(_._4).sum
    assert(math.abs(totalEnergy - 1.0) < 1e-3,
      s"subspace energies of unit vectors must partition 1, got $totalEnergy")
  }

  test("minhash calibration: bucket means live in their decile, estimator error bounded") {
    val rows = graft.operators.Dedup.queries("q_minhash_calibration")(spark, sf)
      .select("bin", "n_pairs", "mean_est", "mean_exact", "mae")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r._1 / 10.0, if (r._1 == 9) 1.0 else (r._1 + 1) / 10.0)
      assert(r._3 >= lo && r._3 <= hi,
        s"bin ${r._1}: mean_est ${r._3} outside its decile")
      assert(r._4 >= 0.0 && r._4 <= 1.0)
      assert(r._5 <= 0.35, s"bin ${r._1}: 32-perm MAE ${r._5} implausibly large")
      assert(r._2 > 0)
    }
  }

  test("trimmed mean: kept count exact, estimate inside the trimmed value range per segment") {
    val rows = graft.operators.AnalyticExt.queries("q_trimmed_mean")(spark, sf)
      .select("seg", "n_g", "mean_spend", "trimmed_mean", "n_kept")
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.length == 5)
    val vals = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .as[(String, Double)].collect().groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).sorted }
    rows.foreach { r =>
      assert(r._5 == r._2 - 2 * (r._2 / 10), s"${r._1}: kept-count arithmetic")
      val xs = vals(r._1)
      val lo = (r._2 / 10).toInt
      // the binned estimator keeps mass between exact ranks lo+1..n-lo;
      // its mean must land inside that value range, +-1 bin of slack
      assert(r._4 >= xs(lo) - 100 && r._4 <= xs(xs.length - lo - 1) + 100,
        s"${r._1}: trimmed mean ${r._4} outside [${xs(lo)}, ${xs(xs.length - lo - 1)}]")
    }
  }

  test("sql window suite and grouping sets: the SQL-text surface equals the DataFrame twin") {
    val sqlW = graft.operators.SqlSurface.queries("q_sql_window_suite")(spark, sf)
    val dfW = graft.operators.AnalyticExt.queries("q_window_suite")(spark, sf)
    assert(sqlW.exceptAll(dfW).isEmpty && dfW.exceptAll(sqlW).isEmpty,
      "parser path and DSL path must agree row-for-row")
    val gs = graft.operators.SqlSurface.queries("q_sql_grouping_sets")(spark, sf)
      .select("gid").as[Int].collect()
    assert(gs.count(_ == 3) == 1, "exactly one grand-total row")
    assert(gs.forall(g => g == 0 || g == 2 || g == 3), "gid encodes the declared sets only")
  }

  test("q_hybrid_rrf: fusion recomposes from the two rank lists and respects list membership") {
    val rows = graft.operators.Similarity.queries("q_hybrid_rrf")(spark, sf).collect()
    assert(rows.length == 10)
    val lex = graft.ml.FeatureOps.qBm25(spark, sf)
      .select(col("doc_id"), col("rank")).as[(Long, Int)].collect().toMap
    rows.foreach { r =>
      val rl = Option(r.getAs[Integer]("rank_lex")).map(_.toInt)
      val rv = Option(r.getAs[Integer]("rank_vec")).map(_.toInt)
      assert(rl.nonEmpty || rv.nonEmpty, "a fused doc must come from some list")
      rl.foreach(v => assert(lex(r.getAs[Long]("doc_id")) == v,
        "lexical rank must be BM25's rank"))
      val expect = rl.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        rv.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-8,
        s"rrf ${r.getAs[Double]("rrf")} vs recomposed $expect")
    }
    // fused order is non-increasing in rrf with doc_id tiebreak
    val sorted = rows.sortBy(_.getAs[Int]("rank"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
      assert(sa > sb || (sa == sb &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
  }

  test("q_kcore: peeling invariants hold and the ladder reaches the true 3-core fixpoint here") {
    val rows = graft.operators.GraphOps.queries("q_kcore")(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, deg0, coreDeg, inCore) =>
      assert(coreDeg <= deg0, s"node $n: peeling cannot add edges")
      assert(inCore == (coreDeg > 0))
      assert(deg0 <= graft.operators.GraphOps.KnnK,
        "mutual-kNN caps every degree at K") }
    // brute-force exact 3-core by peeling to fixpoint; on this corpus
    // 3 rounds must already be the fixpoint (the doc's honesty claim)
    val und = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
      .as[(Long, Long)].collect()
    var edges = (und ++ und.map(p => (p._2, p._1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    val trueCore = edges.map(_._1)
    val got = rows.filter(_._4).map(_._1).toSet
    assert(got == trueCore,
      s"3 peel rounds should reach the fixpoint on this corpus: ${got.size} vs ${trueCore.size}")
  }

  test("q_holt_forecast: the decimal fold matches a BigDecimal recomputation step for step") {
    val rows = graft.operators.TemporalOps.queries("q_holt_forecast")(spark, sf)
      .orderBy("month").collect()
    assert(rows.length > 2, "multi-month series expected")
    // rev is a 2-dp decimal published as double (correctly rounded),
    // so a 2-dp setScale recovers the exact decimal; level/trend/
    // forecast are 6-dp decimals published as double, so comparing
    // toDouble against toDouble is exact on both sides
    val rev = rows.map(r => BigDecimal(r.getAs[Double]("rev"))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP))
    var l = rev(0)
    var b = (rev(1) - rev(0)).setScale(6)
    assert(rows.head.isNullAt(rows.head.fieldIndex("forecast")),
      "first month has no prior state to forecast from")
    for (i <- 1 until rows.length) {
      val fc = l + b
      val lN = (BigDecimal("0.3") * rev(i) + BigDecimal("0.7") * (l + b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val bN = (BigDecimal("0.1") * (lN - l) + BigDecimal("0.9") * b)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(rows(i).getAs[Double]("forecast") == fc.toDouble, s"month $i forecast")
      assert(rows(i).getAs[Double]("level") == lN.toDouble, s"month $i level")
      assert(rows(i).getAs[Double]("trend") == bN.toDouble, s"month $i trend")
      l = lN; b = bN
    }
  }

  test("sql bfs: recursive-CTE hop distances equal an iterative DataFrame BFS") {
    val rec = graft.operators.SqlSurface.queries("q_sql_bfs")(spark, sf)
      .select(col("s_suppkey"), col("hops").cast("int"))
      .as[(Long, Int)].collect().toMap
    // iterative twin: frontier-expansion BFS over the same mutual-kNN
    // graph, capped at the same 3 hops
    val und = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
      .as[(Long, Long)].collect()
    val adj = (und ++ und.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val root = adj.keys.min
    var dist = Map(root -> 0)
    var frontier = Set(root)
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj(_)).diff(dist.keySet)
      dist = dist ++ next.map(_ -> h)
      frontier = next
    }
    assert(rec.keySet == dist.keySet, "recursion reaches exactly the 3-hop ball")
    dist.foreach { case (n, d) =>
      assert(rec(n) == d, s"node $n: recursive hop ${rec(n)} != BFS $d") }
  }

  test("q_listagg: the ordered concat equals a driver-side top-5 recomputation") {
    val rows = graft.operators.AnalyticExt.queries("q_listagg")(spark, sf)
      .as[(String, String, Long)].collect()
    assert(rows.length == 5 && rows.forall(_._3 == 5L))
    val byKey = graft.Tables.customer(spark, sf)
      .select(col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long"), col("c_custkey"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    rows.foreach { case (seg, csv, _) =>
      val expect = byKey(seg).sortBy(t => (-t._2, t._3)).take(5)
        .map(_._3).mkString(",")
      assert(csv == expect, s"$seg: $csv vs $expect")
    }
  }

  test("q_rolling_corr: every frame's correlation matches a brute-force recomputation") {
    val rows = graft.operators.TemporalOps.queries("q_rolling_corr")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length > 7)
    val xs = rows.map(r => r.getAs[Double]("revenue") * 100)
    val ys = rows.map(r => r.getAs[Long]("n_events").toDouble)
    rows.zipWithIndex.foreach { case (r, i) =>
      val lo = math.max(0, i - 6)
      val (fx, fy) = (xs.slice(lo, i + 1), ys.slice(lo, i + 1))
      val n = fx.length
      assert(r.getAs[Long]("frame_days") == n)
      val num = n * fx.zip(fy).map { case (a, b) => a * b }.sum - fx.sum * fy.sum
      val vx = n * fx.map(a => a * a).sum - fx.sum * fx.sum
      val vy = n * fy.map(a => a * a).sum - fy.sum * fy.sum
      val got = Option(r.getAs[java.lang.Double]("rolling_corr")).map(_.toDouble)
      if (n < 3 || vx <= 1e-9 || vy <= 1e-9) ()
      else {
        assert(got.nonEmpty, s"day index $i expected a correlation")
        val expect = num / math.sqrt(vx * vy)
        assert(math.abs(got.get - expect) < 1e-4,
          s"day index $i: ${got.get} vs $expect")
        assert(got.get >= -1.0 - 1e-9 && got.get <= 1.0 + 1e-9)
      }
    }
  }

  test("q_crosstab_residuals: margins recompose, residuals recompute, sql set-ops surface equals the DSL") {
    val rows = graft.operators.AnalyticExt.queries("q_crosstab_residuals")(spark, sf)
      .collect()
    assert(rows.length == 15, "3 statuses x 5 priorities")
    val n = rows.map(_.getAs[Long]("observed")).sum
    assert(n == Tables.orders(spark, sf).count())
    val rt = rows.groupBy(_.getAs[String]("status"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("observed")).sum }
    val ct = rows.groupBy(_.getAs[String]("priority"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("observed")).sum }
    rows.foreach { r =>
      val e = rt(r.getAs[String]("status")).toDouble *
        ct(r.getAs[String]("priority")) / n
      assert(math.abs(r.getAs[Double]("expected") - e) < 1e-3)
      val res = (r.getAs[Long]("observed") - r.getAs[Double]("expected")) /
        math.sqrt(r.getAs[Double]("expected"))
      assert(math.abs(r.getAs[Double]("residual") - res) < 1e-3)
    }
    val sqlS = graft.operators.SqlSurface.queries("q_sql_set_ops")(spark, sf)
    val dsl = graft.operators.AnalyticExt.queries("q_set_ops")(spark, sf)
    assert(sqlS.exceptAll(dsl).isEmpty && dsl.exceptAll(sqlS).isEmpty,
      "set-ops parser path and DSL path must agree")
  }

  test("sql unpivot: wide-to-long through the parser equals the direct long-form aggregate") {
    val up = graft.operators.SqlSurface.queries("q_sql_unpivot")(spark, sf)
    val names = Map("1-URGENT" -> "urgent", "2-HIGH" -> "high",
      "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "notspec", "5-LOW" -> "low")
    val long = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_orderpriority"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .na.replace("o_orderpriority", names)
      .withColumnRenamed("o_orderpriority", "prio")
    assert(up.exceptAll(long).isEmpty && long.exceptAll(up).isEmpty,
      "UNPIVOT parser path and direct long aggregate must agree row-for-row")
  }

  test("sql lateral: correlated LATERAL top-3 equals the window-function formulation") {
    val lat = graft.operators.SqlSurface.queries("q_sql_lateral")(spark, sf)
    assert(lat.count() == 25 * 3, "3 customers per nation, 25 nations")
    val win = graft.Tables.customer(spark, sf)
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("n_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
      .where(col("rk") <= 3)
      .select(col("n_name").as("nation"), col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    assert(lat.exceptAll(win).isEmpty && win.exceptAll(lat).isEmpty,
      "LATERAL parser path and window DSL path must agree row-for-row")
  }

  test("sql decontam: the SQL-text surface equals the DataFrame twin row-for-row") {
    val sqlD = graft.operators.SqlSurface.queries("q_sql_decontam")(spark, sf)
    val dfD = graft.operators.Dedup.queries("q_ngram_decontam")(spark, sf)
    assert(sqlD.count() > 0, "planted leaks must surface")
    assert(sqlD.exceptAll(dfD).isEmpty && dfD.exceptAll(sqlD).isEmpty,
      "parser path and DSL path must agree row-for-row")
  }

  test("theil index: shares sum to 1, contributions sum to the published totals, inequality nonnegative; mcc bounded") {
    val rows = graft.operators.AnalyticExt.queries("q_theil_index")(spark, sf)
      .select("nation", "rev_share", "t_between_g", "t_within_g",
        "theil_between", "theil_within", "theil_total")
      .as[(String, Double, Double, Double, Double, Double, Double)].collect()
    assert(rows.length == 25, "one row per nation")
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "shares must sum to 1")
    assert(math.abs(rows.map(_._4).sum - rows.head._6) < 1e-4,
      "within contributions must sum to theil_within")
    assert(math.abs(rows.map(_._3).sum - rows.head._5) < 1e-4,
      "between contributions must sum to theil_between")
    rows.foreach { r =>
      assert(r._4 >= -1e-6, s"${r._1}: within-group Theil cannot be negative")
      assert(r._7 == rows.head._7, "totals replicated identically")
    }
    assert(rows.head._7 >= 0.0, "Theil T >= 0")
    val mcc = graft.operators.TextAnalysis.queries("q_mcc")(spark, sf)
      .select("n_docs", "mcc").as[(Long, Option[Double])].head()
    assert(mcc._1 > 0)
    mcc._2.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }

  test("drawdown and bollinger invariants: trough in-domain, drawdown nonnegative, breaches really breach") {
    val dd = graft.operators.TemporalOps.queries("q_drawdown")(spark, sf)
      .select("n_days", "trough_day", "max_drawdown", "dd_vs_mean_day")
      .as[(Long, Long, Double, Double)].head()
    assert(dd._3 >= 0.0, "max drawdown of a demeaned cumsum is >= 0")
    assert(dd._4 >= 0.0)
    val days = Tables.orders(spark, sf)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(min("day"), max("day"), countDistinct("day"))
      .as[(Long, Long, Long)].head()
    assert(dd._1 == days._3, "n_days != distinct order days")
    assert(dd._2 >= days._1 && dd._2 <= days._2, "trough day outside domain")
    val bb = graft.operators.TemporalOps.queries("q_bollinger")(spark, sf)
      .select("day", "rev_c", "mean7_micro", "var7_num", "breach")
      .as[(Long, Long, Long, String, String)]
      .collect()
    assert(bb.nonEmpty, "a year of daily revenue should breach somewhere")
    bb.foreach { case (day, revC, mMicro, varNum, br) =>
      // r15 decimal-free publishes: rev_c exact cents, mean7 =
      // mean7_micro µ$, band σ derives from the raw variance
      // numerator digit string (σ² = var7_num/30 ¢²)
      assert(BigInt(varNum).signum >= 0 && Set("high", "low").contains(br))
      val m = mMicro / 1e6
      val sd = math.sqrt(BigInt(varNum).doubleValue / 30.0) / 100.0
      val r = revC / 100.0
      // µ$-quantized published mean: re-check with a tolerance one
      // quantum-class wider than the half-up publish grain
      if (br == "high") assert(r > m + 2 * sd - 1e-4, s"day $day not high")
      else assert(r < m - 2 * sd + 1e-4, s"day $day not low")
    }
  }

  test("q_stl_decompose: additive identity holds, seasonal effects center to zero, trend is the centered MA") {
    val rows = graft.operators.TemporalOps.queries("q_stl_decompose")(spark, sf)
      .select("day", "rev_c", "trend", "seasonal", "remainder")
      .as[(Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // additive identity per day, up to the three 6-dp roundings
    rows.foreach { case (day, revC, t, s, r) =>
      assert(math.abs(revC / 100.0 - (t + s + r)) < 3e-6,
        s"day $day: ${revC / 100.0} != $t + $s + $r") }
    // the seasonal effects center to zero — exactly when all 7
    // day-of-weeks survive the full-window filter (the centering
    // constant divides by the period length 7 by construction; at
    // sf0.001 the sparse order calendar can leave fewer)
    val bySeason = rows.groupBy { case (day, _, _, _, _) => (day + 3) % 7 }
    assert(bySeason.size <= 7)
    if (bySeason.size == 7) {
      val seasonVals = bySeason.map(_._2.head._4)
      assert(math.abs(seasonVals.sum) < 1e-4,
        s"seasonal effects must sum to ~0, got ${seasonVals.sum}")
    }
    // trend = centered 7-day MA, brute-forced from the raw series
    val byDay = rows.map { case (d, revC, _, _, _) => d -> revC / 100.0 }.toMap
    val all = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (d, r) => d -> r.doubleValue() }.sortBy(_._1)
    val series = all.toMap
    rows.take(50).foreach { case (day, _, t, _, _) =>
      val win = (day - 3 to day + 3).flatMap(series.get)
      assert(win.size == 7, s"day $day published without a full window")
      assert(math.abs(t - win.sum / 7) < 1e-4, s"day $day trend $t != MA")
    }
  }

  test("assortativity: bounded correlation, edge/node counts match the kNN graph") {
    val sf = TestSession.sf
    val row = graft.operators.GraphOps.queries("q_assortativity")(spark, sf)
      .select("n_nodes", "n_edges", "mean_degree", "assortativity")
      .as[(Long, Long, Double, Double)].collect().head
    val (nNodes, nEdges, meanDeg, r) = row
    val und = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
    val e = und.count()
    val v = und.select("src").union(und.select("dst")).distinct().count()
    assert(nEdges == e && nNodes == v)
    assert(math.abs(meanDeg - 2.0 * e / v) < 1e-5)
    assert(r >= -1.0 && r <= 1.0, s"assortativity $r out of [-1,1]")
  }

  test("levene: W matches a brute-force Brown-Forsythe over the binned prices") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_levene")(spark, sf)
      .select("seg", "n_g", "median_price", "mean_absdev", "w_stat")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length == 5)
    val binned = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        floor(col("o_totalprice") / 100).cast("long").as("bin"))
      .as[(String, Long)].collect()
    val byseg = binned.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // 2x-scaled lo+hi weighted median, exactly the operator's convention
    def m2(xs: Seq[Long]): Long = {
      val n = xs.length
      xs((n - 1) / 2) + xs(n / 2)
    }
    val z = byseg.map { case (s, xs) => s -> xs.map(x => math.abs(2 * x - m2(xs))) }
    val n = binned.length.toDouble
    val k = byseg.size.toDouble
    val zbarG = z.view.mapValues(v => v.sum.toDouble / v.length).toMap
    val zbar = z.values.flatten.sum.toDouble / n
    val ssb = z.map { case (s, v) => v.length * math.pow(zbarG(s) - zbar, 2) }.sum
    val ssw = z.map { case (s, v) => v.map(x => math.pow(x - zbarG(s), 2)).sum }.sum
    val w = ((n - k) / (k - 1)) * ssb / ssw
    assert(math.abs(rows.head._5 - w) < 1e-4,
      s"W ${rows.head._5} != brute-force $w")
    rows.foreach { case (s, ng, med, mad, _) =>
      assert(ng == byseg(s).length)
      assert(math.abs(med - m2(byseg(s)) * 50.0) < 1e-9)
      assert(math.abs(mad - z(s).sum * 50.0 / ng) < 1e-4)
    }
  }

  test("quality tradeoff: monotone frontier, floor 0 keeps everything") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_quality_tradeoff")(spark, sf)
      .select("floor", "docs_kept", "tokens_kept", "doc_frac", "token_frac")
      .as[(Double, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 10)
    // floor 0.0 is the identity gate
    assert(rows.head._1 == 0.0 && rows.head._4 == 1.0 && rows.head._5 == 1.0)
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.head._2 == total)
    // raising the bar never keeps more
    assert(rows.map(_._2).sameElements(rows.map(_._2).sorted.reverse))
    assert(rows.map(_._3).sameElements(rows.map(_._3).sorted.reverse))
    // the curve must actually discriminate on this corpus
    assert(rows.last._2 < rows.head._2, "highest floor must drop something")
  }

  test("recall curve: bounds hold, ivfpq clears the published floor, hits consistent") {
    val sf = TestSession.sf
    val rows = graft.operators.Similarity.queries("q_recall_curve")(spark, sf)
      .select("method", "k", "n_queries", "hits", "mean_recall")
      .as[(String, Int, Long, Long, Double)].collect()
    assert(rows.length == 6)
    rows.foreach { case (_, k, nq, hits, r) =>
      assert(hits <= k * nq, "cannot recover more than k per query")
      assert(r >= 0.0 && r <= 1.0)
      assert(math.abs(r - hits.toDouble / (k * nq)) < 1e-6)
    }
    // the exact-rerank stack must clear the D2 published floor at k=5
    val ivf5 = rows.find(x => x._1 == "ivfpq" && x._2 == 5).get._5
    assert(ivf5 >= 0.8, s"ivfpq recall@5 $ivf5 below the 0.8 floor")
  }

  test("mann-kendall: S and Var(S) match a brute-force pair sweep over the day table") {
    val sf = TestSession.sf
    val row = graft.operators.AnalyticExt.queries("q_mann_kendall")(spark, sf)
      .select("n_days", "s_stat", "var_s", "z", "trend")
      .as[(Long, Long, Double, Option[Double], String)].collect().head
    val days = graft.Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(row._1 == days.length)
    var s = 0L
    for (i <- days.indices; j <- i + 1 until days.length)
      s += java.lang.Long.signum(days(j) - days(i))
    assert(row._2 == s, s"S ${row._2} != brute force $s")
    val n = days.length.toLong
    val tsum = days.groupBy(identity).values
      .map(g => g.length.toLong).map(t => t * (t - 1) * (2 * t + 5)).sum
    val vs = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
    assert(math.abs(row._3 - vs) < 1e-3)
    row._4.foreach { z =>
      val zb = (s - math.signum(s.toDouble)) / math.sqrt(vs)
      assert(math.abs(z - zb) < 1e-4)
      val expTrend = if (math.abs(z) <= 1.96) "none"
        else if (z > 0) "increasing" else "decreasing"
      assert(row._5 == expTrend)
    }
  }

  test("rich club: counts match a driver-side induced-subgraph sweep, phi bounded") {
    val sf = TestSession.sf
    val rows = graft.operators.GraphOps.queries("q_rich_club")(spark, sf)
      .select("k", "n_nodes", "n_edges", "phi")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L until graft.operators.GraphOps.KnnK))
    val und = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
      .as[(Long, Long)].collect()
    val deg = (und.map(_._1) ++ und.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (k, nn, ne, phi) =>
      assert(nn == deg.values.count(_ > k))
      assert(ne == und.count { case (a, b) => deg(a) > k && deg(b) > k })
      phi.foreach(p => assert(p >= 0.0 && p <= 1.0))
      if (nn >= 2) {
        assert(phi.isDefined)
        assert(math.abs(phi.get - 2.0 * ne / (nn * (nn - 1.0))) < 1e-6)
      }
    }
    // the club shrinks as the bar rises
    assert(rows.map(_._2).sameElements(rows.map(_._2).sorted.reverse))
    assert(rows.map(_._3).sameElements(rows.map(_._3).sorted.reverse))
  }

  test("welch t-test matches a brute-force recomputation from raw events") {
    val sf = TestSession.sf
    val row = graft.operators.Validation.queries("q_welch_ttest")(spark, sf)
      .select("n_a", "mean_a", "n_b", "mean_b", "t_stat", "df_welch")
      .as[(Long, Double, Long, Double, Double, Double)].collect().head
    val perUser = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .as[(Long, Long)].collect()
    def arm(uid: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val (as, bs) = perUser.partition { case (u, _) => arm(u) == "A" }
    def mom(xs: Array[(Long, Long)]) = {
      val v = xs.map(_._2.toDouble)
      val n = v.length
      val m = v.sum / n
      (n, m, v.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = mom(as); val (nb, mb, vb) = mom(bs)
    assert(row._1 == na && row._3 == nb)
    assert(math.abs(row._2 - ma / 100) < 1e-4 && math.abs(row._4 - mb / 100) < 1e-4)
    val se = math.sqrt(va / na + vb / nb)
    assert(math.abs(row._5 - (ma - mb) / se) < 1e-4, "t mismatch")
    val df = math.pow(va / na + vb / nb, 2) /
      (math.pow(va / na, 2) / (na - 1) + math.pow(vb / nb, 2) / (nb - 1))
    assert(math.abs(row._6 - df) < 1e-3, "Welch df mismatch")
  }

  test("heaps fit: per-source evidence exact, fit matches a driver-side OLS") {
    import graft.functions.TextFunctions.tokens
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_heaps_fit")(spark, sf)
      .select("source", "n_tokens", "v_distinct", "heaps_beta", "ln_k")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.length == 20)
    val truth = graft.Tables.documents(spark, sf)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        countDistinct(col("tok")).as("v"))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    rows.foreach { case (s, n, v, _, _) => assert(truth(s) == ((n, v))) }
    val xs = rows.map(r => math.log(r._2.toDouble))
    val ys = rows.map(r => math.log(r._3.toDouble))
    val mx = xs.sum / xs.length; val my = ys.sum / ys.length
    val beta = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      xs.map(x => (x - mx) * (x - mx)).sum
    assert(math.abs(rows.head._4 - beta) < 2e-3, "beta mismatch")
    assert(math.abs(rows.head._5 - (my - beta * mx)) < 2e-3, "ln_k mismatch")
  }

  test("temperature mixture: weights normalize, ordering preserved, upsampling favors low-resource langs") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_temperature_mixture")(spark, sf)
      .select("lang", "share", "weight", "upsample")
      .as[(String, Double, Double, Double)].collect()
    assert(rows.length >= 3)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights must normalize")
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "shares must normalize")
    // alpha < 1 flattens: weight ordering matches share ordering, but
    // every below-"pivot" language is upsampled (upsample > 1) and the
    // largest language is downsampled
    val byShare = rows.sortBy(_._2)
    assert(byShare.map(_._3).sameElements(byShare.map(_._3).sorted),
      "weight ordering must preserve share ordering")
    assert(byShare.head._4 > 1.0, "smallest language must be upsampled")
    assert(byShare.last._4 < 1.0, "largest language must be downsampled")
  }
  test("q_two_hop: expansion bounded by K*(K-1), two-hop set disjoint from direct neighbors, brute-force agreement") {
    import graft.operators.GraphOps
    val rows = GraphOps.qTwoHop(spark, sf)
      .select("s_suppkey", "degree", "two_hop", "expansion")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val K = GraphOps.KnnK.toLong
    rows.foreach { case (n, d, t, e) =>
      assert(d >= 1 && d <= K, s"node $n degree $d outside kNN bound")
      // each of d neighbors contributes at most K-1 new nodes
      assert(t <= d * (K - 1), s"node $n two_hop $t exceeds d*(K-1)")
      assert(math.abs(e - BigDecimal(t.toDouble / d)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // brute force on the same mutual pair set
    val und = GraphOps.mutualKnnPairs(spark, sf)
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    und.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    rows.foreach { case (n, d, t, _) =>
      assert(adj(n).size.toLong == d)
      val two = adj(n).flatMap(adj(_)) - n -- adj(n)
      assert(two.size.toLong == t, s"node $n: brute two-hop ${two.size} != $t")
    }
  }

  test("q_neighbor_jaccard: counts match brute-force neighbor sets, jaccard consistent by inclusion-exclusion") {
    import graft.operators.GraphOps
    val rows = GraphOps.qNeighborJaccard(spark, sf)
      .select("src", "dst", "common_neighbors", "union_size", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val und = GraphOps.mutualKnnPairs(spark, sf).as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    und.foreach { case (a, b) => adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    assert(rows.length == und.length, "one output row per mutual edge")
    rows.foreach { case (a, c, nc, u, j) =>
      val inter = (adj(a) intersect adj(c)).size.toLong
      assert(nc == inter, s"edge ($a,$c): common $nc != brute $inter")
      assert(u == (adj(a) union adj(c)).size.toLong,
        s"edge ($a,$c): union via inclusion-exclusion broke")
      assert(u >= 2, "adjacent endpoints always contribute both selves")
      assert(j >= 0.0 && j < 1.0, "J < 1: a and c are never common neighbors of themselves")
      assert(math.abs(j - BigDecimal(nc.toDouble / u)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("q_cross_corr: 15-lag grid complete, bounds hold, lag-0 equals an exact driver-side Pearson") {
    import graft.operators.AnalyticExt
    val rows = AnalyticExt.qCrossCorr(spark, sf)
      .select("lag", "n_days", "xcorr", "peak")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._1).sameElements(-7L to 7L), "lag grid incomplete")
    rows.foreach { case (_, n, c, _) =>
      assert(n > 0 && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    val mx = rows.map(_._3).max
    assert(rows.forall { case (_, _, c, p) => p == (c == mx) })
    // driver-side exact lag-0 Pearson from the raw day table
    import org.apache.spark.sql.functions._
    val day = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"),
        count(lit(1)).as("cnt"))
      .as[(Long, Long, Long)].collect()
    val n = day.length.toDouble
    val (xs, ys) = (day.map(_._2.toDouble), day.map(_._3.toDouble))
    val (mxx, myy) = (xs.sum / n, ys.sum / n)
    val num = xs.zip(ys).map { case (x, y) => (x - mxx) * (y - myy) }.sum / n
    val den = math.sqrt(
      xs.map(x => (x - mxx) * (x - mxx)).sum / n *
        ys.map(y => (y - myy) * (y - myy)).sum / n)
    val lag0 = rows.find(_._1 == 0L).get._3
    assert(math.abs(lag0 - num / den) < 1e-4,
      s"lag-0 xcorr $lag0 vs driver Pearson ${num / den}")
  }

  test("q_ljung_box: Q and every r_k recompose from the raw hourly series") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TemporalOps.queries("q_ljung_box")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts DIV 1000000000) DIV 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, g) =>
        t -> g.sortBy(_._2).map(_._3.toDouble) }
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val y = hourly(et)
      val n = y.length
      assert(r.getAs[Long]("n_hours") == n.toLong)
      val mean = y.sum / n
      val den = y.map(v => (v - mean) * (v - mean)).sum
      def rk(k: Int): Double =
        (k until n).map(t => (y(t) - mean) * (y(t - k) - mean)).sum / den
      Seq(1 -> "r1", 2 -> "r2", 3 -> "r3", 6 -> "r6").foreach { case (k, cname) =>
        assert(math.abs(r.getAs[Double](cname) - rk(k)) < 1e-4,
          s"$et lag $k: ${r.getAs[Double](cname)} vs brute ${rk(k)}")
      }
      val q = (1 to 6).map(k => rk(k) * rk(k) / (n - k)).sum * n * (n + 2)
      assert(math.abs(r.getAs[Double]("q_stat") - q) < 1e-3,
        s"$et: Q ${r.getAs[Double]("q_stat")} vs brute $q")
      assert(r.getAs[Boolean]("serial_structure") ==
        (r.getAs[Double]("q_stat") > 12.592))
    }
  }

  test("q_oaxaca: gap decomposition recomposes and the components are additive") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Validation.queries("q_oaxaca")(spark, sf)
      .collect().head
    val pc = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"),
          (col("c_mktsegment") === "AUTOMOBILE").as("auto")), Seq("o_custkey"))
      .as[(Long, Long, Long, Boolean)].collect()
    val (ga, gb) = pc.partition(_._4)
    def beta(g: Array[(Long, Long, Long, Boolean)]): Double = {
      val n = BigInt(g.length)
      val (sx, sy) = (g.map(t => BigInt(t._2)).sum, g.map(t => BigInt(t._3)).sum)
      val (sxx, sxy) = (g.map(t => BigInt(t._2) * t._2).sum,
        g.map(t => BigInt(t._2) * t._3).sum)
      (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    }
    val gap = ga.map(_._3).sum.toDouble / ga.length -
      gb.map(_._3).sum.toDouble / gb.length
    val dx = ga.map(_._2).sum.toDouble / ga.length -
      gb.map(_._2).sum.toDouble / gb.length
    val bPool = beta(pc)
    assert(r.getAs[Long]("n_auto") == ga.length.toLong)
    assert(r.getAs[Long]("n_rest") == gb.length.toLong)
    assert(math.abs(r.getAs[Double]("spend_gap_dollars") - gap / 100) < 1e-3,
      s"gap ${r.getAs[Double]("spend_gap_dollars")} vs brute ${gap / 100}")
    assert(math.abs(r.getAs[Double]("explained_dollars") - bPool * dx / 100) < 1e-3)
    assert(math.abs(r.getAs[Double]("beta_auto_dollars_per_order") - beta(ga) / 100) < 1e-3)
    assert(math.abs(r.getAs[Double]("beta_rest_dollars_per_order") - beta(gb) / 100) < 1e-3)
    // the decomposition is additive: gap = explained + unexplained
    assert(math.abs(r.getAs[Double]("spend_gap_dollars") -
      (r.getAs[Double]("explained_dollars") +
        r.getAs[Double]("unexplained_dollars"))) < 1e-5)
  }

  test("q_partial_corr: raw and partial correlations recompose from exact moments") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.AnalyticExt.queries("q_partial_corr")(spark, sf)
      .collect().head
    val rows = Tables.lineitem(spark, sf).select(
      col("l_quantity").cast("long"),
      round(col("l_extendedprice") * 100).cast("long"),
      round(col("l_discount") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    val n = BigInt(rows.length)
    def s(f: ((Long, Long, Long)) => BigInt) = rows.map(f).sum
    val (sx, sy, sz) = (s(t => BigInt(t._1)), s(t => BigInt(t._2)), s(t => BigInt(t._3)))
    def cov(sab: BigInt, sa: BigInt, sb: BigInt) = (n * sab - sa * sb).toDouble
    val cxx = cov(s(t => BigInt(t._1) * t._1), sx, sx)
    val cyy = cov(s(t => BigInt(t._2) * t._2), sy, sy)
    val czz = cov(s(t => BigInt(t._3) * t._3), sz, sz)
    val rxy = cov(s(t => BigInt(t._1) * t._2), sx, sy) / math.sqrt(cxx * cyy)
    val rxz = cov(s(t => BigInt(t._1) * t._3), sx, sz) / math.sqrt(cxx * czz)
    val ryz = cov(s(t => BigInt(t._2) * t._3), sy, sz) / math.sqrt(cyy * czz)
    val part = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert(r.getAs[Long]("n_rows") == rows.length.toLong)
    assert(math.abs(r.getAs[Double]("r_qty_price") - rxy) < 1e-5)
    assert(math.abs(r.getAs[Double]("r_qty_disc") - rxz) < 1e-5)
    assert(math.abs(r.getAs[Double]("r_price_disc") - ryz) < 1e-5)
    assert(math.abs(r.getAs[Double]("r_partial") - part) < 1e-5,
      s"partial ${r.getAs[Double]("r_partial")} vs brute $part")
    assert(r.getAs[Boolean]("discount_explains") ==
      (math.abs(r.getAs[Double]("r_partial")) <
        math.abs(r.getAs[Double]("r_qty_price")) / 2))
  }

  test("q_seasonal_mk: per-season S and Var recompose; total is the season fold") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.AnalyticExt.queries("q_seasonal_mk")(spark, sf)
      .collect().map(r => r.getAs[String]("season") -> r).toMap
    val byYm = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    val perSeason = byYm.groupBy(_._2).map { case (mo, g) =>
      val series = g.sortBy(_._1).map(_._3)
      val s = (for (i <- series.indices; j <- (i + 1) until series.length)
        yield java.lang.Long.compare(series(j), series(i)).sign.toLong).sum
      val ties = series.groupBy(identity).values.map(_.length.toLong)
      val tsum = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
      val ny = series.length.toLong
      (mo, s, ny * (ny - 1) * (2 * ny + 5) - tsum, ny)
    }.toSeq
    perSeason.foreach { case (mo, s, v18, ny) =>
      val r = rows(f"$mo%02d")
      assert(r.getAs[Long]("s_stat") == s, s"S($mo)")
      assert(r.getAs[Long]("n_years") == ny)
      assert(math.abs(r.getAs[Double]("var_s") - v18.toDouble / 18) < 1e-6)
    }
    val t = rows("__total__")
    assert(t.getAs[Long]("s_stat") == perSeason.map(_._2).sum)
    assert(math.abs(t.getAs[Double]("var_s") -
      perSeason.map(_._3).sum.toDouble / 18) < 1e-6)
    rows.values.foreach { r =>
      val z = Option(r.getAs[java.lang.Double]("z")).map(_.toDouble)
      val expect = z match {
        case None => "none"
        case Some(v) if math.abs(v) <= 1.96 => "none"
        case Some(v) if v > 0 => "increasing"
        case _ => "decreasing"
      }
      assert(r.getAs[String]("trend") == expect)
    }
  }

  test("q_clustering_agreement: ARI recomposes from driver-side pair counting") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.Tuning.queries("q_clustering_agreement")(spark, sf)
      .collect().map(r => r.getAs[String]("pair") -> r).toMap
    assert(rows.keySet ==
      Set("kmeans_vs_label", "dbscan_vs_label", "kmeans_vs_dbscan"))
    val km = spark.table(graft.ml.Tuning.KmeansStore.ensure(spark, sf))
      .select(col("vec_id"), col("cluster").cast("long"))
      .as[(Long, Long)].collect().toMap
    val db = graft.operators.Dedup.queries("q_dbscan")(spark, sf)
      .select(col("vec_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    val lb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    def ari(p1: Map[Long, Long], p2: Map[Long, Long]): (Long, Double) = {
      val ids = p1.keySet.intersect(p2.keySet).toSeq
      val n = BigInt(ids.length)
      def c2(x: BigInt) = x * (x - 1) / 2
      val sij = ids.groupBy(i => (p1(i), p2(i))).values
        .map(g => c2(BigInt(g.length))).sum
      val sa = ids.groupBy(p1).values.map(g => c2(BigInt(g.length))).sum
      val sb = ids.groupBy(p2).values.map(g => c2(BigInt(g.length))).sum
      val n2 = c2(n)
      (sij.toLong,
        (2 * n2 * sij - 2 * sa * sb).toDouble /
          (n2 * (sa + sb) - 2 * sa * sb).toDouble)
    }
    Seq(("kmeans_vs_label", km, lb), ("dbscan_vs_label", db, lb),
      ("kmeans_vs_dbscan", km, db)).foreach { case (name, p1, p2) =>
      val (sij, a) = ari(p1, p2)
      val r = rows(name)
      assert(r.getAs[Long]("n_vectors") == km.size.toLong)
      assert(r.getAs[Long]("agree_pairs") == sij, s"$name pairs")
      assert(math.abs(r.getAs[Double]("ari") - a) < 1e-5,
        s"$name ari ${r.getAs[Double]("ari")} vs brute $a")
    }
  }

  test("q_cusum: the integer recursion recomposes and alarms match the 4-sigma band") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TemporalOps.queries("q_cusum")(spark, sf)
      .collect().sortBy(_.getAs[Long]("day"))
    val daily = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("(ts DIV 1000000000) DIV 86400").cast("long").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.length == daily.length)
    val n = daily.length
    val r = daily.map(d => BigInt(d._2)).sum
    val v = (BigInt(n) * daily.map(d => BigInt(d._2) * d._2).sum - r * r)
    val k = math.round(math.sqrt(v.toDouble) / 2)
    val h = math.round(4.0 * math.sqrt(v.toDouble))
    var (sp, sn) = (0L, 0L)
    daily.zip(rows).foreach { case ((day, rev), row) =>
      val e = (BigInt(n) * rev - r).toLong
      sp = math.max(0L, sp + e - k)
      sn = math.max(0L, sn - e - k)
      assert(row.getAs[Long]("day") == day)
      assert(row.getAs[Long]("rev_cents") == rev)
      assert(row.getAs[Long]("s_plus") == sp, s"sp($day)")
      assert(row.getAs[Long]("s_minus") == sn, s"sn($day)")
      assert(row.getAs[Boolean]("alarm_up") == (sp > h))
      assert(row.getAs[Boolean]("alarm_down") == (sn > h))
    }
  }

  test("q_mmd_drift: linear-time MMD recomposes; null-true splits never fire") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.FeatureOps.queries("q_mmd_drift")(spark, sf)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("null_md5", "label0_vs_rest"))
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label"))
      .as[(Long, Seq[Double], Int)].collect().sortBy(_._1)
    def kern(a: Seq[Double], b: Seq[Double]): Double = {
      val d2 = a.zip(b).foldLeft(0.0) { case (acc, (p, q)) =>
        acc + (p - q) * (p - q) }
      math.exp(-d2 / 0.5)
    }
    def brute(gOf: ((Long, Seq[Double], Int)) => String): (Long, Double) = {
      val xs = emb.filter(gOf(_) == "x").map(_._2)
      val ys = emb.filter(gOf(_) == "y").map(_._2)
      val quads = (xs.grouped(2).filter(_.length == 2).toSeq
        .zip(ys.grouped(2).filter(_.length == 2).toSeq))
      val hqs = quads.map { case (x, y) =>
        math.round((kern(x(0), x(1)) + kern(y(0), y(1)) -
          kern(x(0), y(1)) - kern(x(1), y(0))) * 1000000L)
      }
      (quads.length.toLong, hqs.map(BigInt(_)).sum.toDouble / quads.length / 1e6)
    }
    def md5g(t: (Long, Seq[Double], Int)): String =
      if (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(t._1.toString)
          .substring(0, 15), 16) % 2 == 0) "x" else "y"
    Seq("null_md5" -> md5g _,
      "label0_vs_rest" -> ((t: (Long, Seq[Double], Int)) =>
        if (t._3 == 0) "x" else "y")).foreach { case (name, g) =>
      val (nq, mmd) = brute(g)
      val r = rows(name)
      assert(r.getAs[Long]("n_quads") == nq, s"$name quads")
      assert(math.abs(r.getAs[Double]("mmd2") - mmd) < 1e-5,
        s"$name mmd ${r.getAs[Double]("mmd2")} vs brute $mmd")
      // both splits are same-distribution in this corpus: the verdict
      // audits the false-positive side
      assert(!r.getAs[Boolean]("shifted"), s"$name fired on a null split")
    }
  }

  test("q_blocking_quality: ratios recompose; truth pairs from exact-dup groups") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Dedup.queries("q_blocking_quality")(spark, sf)
      .collect().head
    val n = Tables.documents(spark, sf).count()
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_total_pairs") == n * (n - 1) / 2)
    // truth pairs recompose from exact-dup group sizes: sum k(k-1)/2
    val groups = graft.operators.Dedup.queries("q_dedup_exact")(spark, sf)
      .select(col("n_copies")).as[Long].collect()
    val truth = groups.map(k => k * (k - 1) / 2).sum
    assert(r.getAs[Long]("n_true_dup_pairs") == truth)
    assert(r.getAs[Long]("n_recovered") <= truth)
    val rr = 1.0 - r.getAs[Long]("n_candidates").toDouble / (n * (n - 1) / 2)
    assert(math.abs(r.getAs[Double]("reduction_ratio") - rr) < 1e-5)
    if (truth == 0) assert(r.isNullAt(r.fieldIndex("pairs_completeness")))
    else assert(math.abs(r.getAs[Double]("pairs_completeness") -
      r.getAs[Long]("n_recovered").toDouble / truth) < 1e-5)
    // blocking must actually block: candidate set far below the pair space
    assert(r.getAs[Long]("n_candidates") < r.getAs[Long]("n_total_pairs") / 10)
  }

  test("q_gmm_em: the quantized EM recomposes driver-side and log-likelihood ascends") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.FeatureOps.queries("q_gmm_em")(spark, sf)
      .collect().sortBy(_.getAs[Int]("iter"))
    assert(rows.length == 3)
    val M = 1000000L
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long").as("c"))
      .as[Long].collect()
      .map(c => math.round(math.log(1.0 + c) * M))
    val n = z.length
    val (mn, mx) = (z.min, z.max)
    var mu1 = mn + (mx - mn) / 4
    var mu2 = mn + (3 * (mx - mn)) / 4
    var s2 = ((BigInt(n) * z.map(v => BigInt(v) * v).sum -
      BigInt(z.sum) * BigInt(z.sum)) / (BigInt(n) * n)).toLong
    var wq = 500000L
    val trace = (0 to 2).map { i =>
      val rowsq = z.map { zi =>
        val (d1, d2) = (zi - mu1, zi - mu2)
        val earg = ((d2 * d2).toDouble - (d1 * d1).toDouble) / (2.0 * s2)
        val g = math.round(1.0 * M /
          (1.0 + ((M - wq).toDouble / wq) * math.exp(earg)))
        val mix = ((M - wq).toDouble * math.exp(-(d1 * d1).toDouble / (2.0 * s2))
          + wq.toDouble * math.exp(-(d2 * d2).toDouble / (2.0 * s2))) / 1.0e6
        val lq = math.round((math.log(math.max(mix, 1.0e-290))
          - 0.5 * math.log(6.283185307179586 * s2 / 1.0e12)) * M)
        (zi, g, lq)
      }
      val out = (wq, mu1, mu2, s2,
        rowsq.map(t => BigInt(t._3)).sum.toDouble / n / 1e6)
      val (b1, c1) = (rowsq.map(t => BigInt(M - t._2) * t._1).sum,
        rowsq.map(t => BigInt(M - t._2)).sum)
      val (b2, c2) = (rowsq.map(t => BigInt(t._2) * t._1).sum,
        rowsq.map(t => BigInt(t._2)).sum)
      val a1 = rowsq.map(t => BigInt(M - t._2) * (BigInt(t._1) * t._1)).sum
      val a2 = rowsq.map(t => BigInt(t._2) * (BigInt(t._1) * t._1)).sum
      mu1 = math.round(b1.toDouble / c1.toDouble)
      mu2 = math.round(b2.toDouble / c2.toDouble)
      s2 = math.round(((a1.toDouble - b1.toDouble * b1.toDouble / c1.toDouble)
        + (a2.toDouble - b2.toDouble * b2.toDouble / c2.toDouble))
        / (c1.toDouble + c2.toDouble))
      wq = math.round(c2.toDouble / n)
      out
    }
    rows.zip(trace).foreach { case (r, (w, m1, m2, v, ll)) =>
      assert(math.abs(r.getAs[Double]("w2") - w.toDouble / 1e6) < 1e-5)
      assert(math.abs(r.getAs[Double]("mu1_nats") - m1.toDouble / 1e6) < 2e-5)
      assert(math.abs(r.getAs[Double]("mu2_nats") - m2.toDouble / 1e6) < 2e-5)
      assert(math.abs(r.getAs[Double]("sigma2") - v.toDouble / 1e12) < 2e-5)
      assert(math.abs(r.getAs[Double]("mean_ll") - ll) < 1e-4,
        s"ll ${r.getAs[Double]("mean_ll")} vs brute $ll")
    }
    // the EM contract: mean log-likelihood never decreases
    val lls = rows.map(_.getAs[Double]("mean_ll"))
    assert(lls.zip(lls.tail).forall { case (a, b) => b >= a - 1e-6 },
      s"ll not ascending: ${lls.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Double]("sigma2") > 0)
      assert(r.getAs[Double]("w2") > 0 && r.getAs[Double]("w2") < 1)
      assert(r.getAs[Double]("mu1_nats") < r.getAs[Double]("mu2_nats"))
    }
  }

  test("q_path_centrality: mediation counts recompose from driver-side panel BFS") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.GraphOps.queries("q_path_centrality")(spark, sf)
      .collect().map(r => r.getAs[Long]("s_suppkey") -> r).toMap
    val edges = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    val panel = adj.keys.toSeq
      .sortBy(n => (org.apache.commons.codec.digest.DigestUtils
        .md5Hex(n.toString), n))
      .take(graft.operators.GraphOps.ClosenessPanel)
    def bfs(s: Long): Map[Long, Int] = {
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).filterNot(dist.contains)
        val dd = dist.values.max + 1
        frontier.foreach(n => dist(n) = dd)
      }
      dist.toMap
    }
    val d = panel.map(s => s -> bfs(s)).toMap
    val pairs = for {
      s <- panel; t <- panel if s < t && d(s).contains(t)
    } yield (s, t, d(s)(t))
    val covered = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((s, t, dst) <- pairs; v <- adj.keys
         if v != s && v != t &&
           d(s).contains(v) && d(t).contains(v) &&
           d(s)(v) + d(t)(v) == dst)
      covered(v) += 1
    val expect = covered.filter(_._2 > 0).toMap
    assert(rows.keySet == expect.keySet,
      s"nodes: extra=${(rows.keySet -- expect.keySet).take(3)} missing=${(expect.keySet -- rows.keySet).take(3)}")
    expect.foreach { case (v, c) =>
      val r = rows(v)
      assert(r.getAs[Long]("n_pairs_covered") == c, s"covered($v)")
      assert(r.getAs[Long]("n_pairs_total") == pairs.length.toLong)
      assert(math.abs(r.getAs[Double]("coverage") -
        c.toDouble / pairs.length) < 1e-5)
    }
  }

  test("q_doc_clusters: keyword summaries recompose from the persisted assignment") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.Tuning.queries("q_doc_clusters")(spark, sf)
      .collect().map(r => r.getAs[Int]("cluster") -> r).toMap
    val fits = graft.ml.Tuning.DocClusterStore.fitCount.get
    val t = graft.ml.Tuning.DocClusterStore.ensure(spark, sf)
    assert(graft.ml.Tuning.DocClusterStore.fitCount.get == fits,
      "warm ensure must not refit")
    val asg = spark.table(t).as[(Long, Int)].collect().toMap
    val toks = graft.operators.TextAnalysis.tokenStream(spark, sf)
      .select(col("doc_id"), col("tok")).as[(Long, String)].collect()
    val ndocs = asg.size
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum == ndocs.toLong)
    val df = toks.distinct.groupBy(_._2).view.mapValues(_.length).toMap
    val keep = df.filter { case (_, d) => d * 2 <= ndocs }.keySet
    val byCluster = toks.groupBy { case (d, _) => asg(d) }
    rows.foreach { case (cl, r) =>
      val ct = byCluster.getOrElse(cl, Array.empty[(Long, String)])
      assert(r.getAs[Long]("n_tokens") == ct.length.toLong, s"mass($cl)")
      val counts = ct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
        .filter { case (tok, _) => keep(tok) }
      val top = counts.toSeq.sortBy { case (tok, c) => (-c, tok) }.take(3)
      def expTerm(i: Int): String = if (top.length > i) top(i)._1 else null
      assert(r.getAs[String]("term1") == expTerm(0), s"term1($cl)")
      assert(r.getAs[String]("term2") == expTerm(1), s"term2($cl)")
      assert(r.getAs[String]("term3") == expTerm(2), s"term3($cl)")
      if (top.nonEmpty)
        assert(math.abs(r.getAs[Double]("top_term_share") -
          top.head._2.toDouble / ct.length) < 1e-5)
      assert(math.abs(r.getAs[Double]("doc_share") -
        r.getAs[Long]("n_docs").toDouble / ndocs) < 1e-5)
    }
  }

  test("q_fdr_by: BY subset of BH, harmonic factor exact, thresholds recompose") {
    val rows = graft.operators.Validation.queries("q_fdr_by")(spark, sf)
      .collect().sortBy(_.getAs[Int]("p_rank"))
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    assert(rows.length.toLong == m)
    val cm = (1 to m.toInt).foldLeft(0.0)((acc, i) => acc + 1.0 / i)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("c_m") - cm) < 1e-7)
      val rank = r.getAs[Int]("p_rank").toLong
      assert(math.abs(r.getAs[Double]("bh_crit") - 0.10 * rank / m) < 1e-7)
      assert(math.abs(r.getAs[Double]("by_crit") - 0.10 * rank / (m * cm)) < 1e-7)
      // BY pays the harmonic factor: strictly harder than BH past m=1
      assert(r.getAs[Double]("by_crit") <= r.getAs[Double]("bh_crit"))
      // BY rejections are a subset of BH rejections
      if (r.getAs[Boolean]("reject_by")) assert(r.getAs[Boolean]("reject_bh"))
    }
    // step-up structure: rejections are exactly ranks <= k for each rule
    Seq("reject_bh", "reject_by").foreach { c =>
      val rej = rows.filter(_.getAs[Boolean](c)).map(_.getAs[Int]("p_rank"))
      assert(rej.sorted.toSeq == (1 to rej.length).toSeq, s"$c not a prefix")
    }
  }

  test("q_hbos: top-20 recomposes from driver-side histograms; top-k rides TakeOrderedAndProject") {
    import org.apache.spark.sql.functions._
    val df = graft.operators.Validation.queries("q_hbos")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "the top-k must ride TakeOrderedAndProject, not a global sort")
    val rows = df.collect()
    assert(rows.length == 20)
    val li = Tables.lineitem(spark, sf).select(
      col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
      col("l_quantity").cast("long"),
      round(col("l_discount") * 100).cast("long"),
      (round(col("l_extendedprice") * 100).cast("long") / 10000L).cast("long"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val n = li.length
    val hq = li.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val hd = li.groupBy(_._4).view.mapValues(_.length.toLong).toMap
    val hp = li.groupBy(_._5).view.mapValues(_.length.toLong).toMap
    val expect = li.map { case (ok, ln, q, d, pb) =>
      (hq(q) * hd(d) * hp(pb), ok, ln, q, d, pb) }
      .sortBy(t => (t._1, t._2, t._3)).take(20)
    rows.zip(expect).foreach { case (r, (prod, ok, ln, q, d, pb)) =>
      def lv(c: String) = r.getAs[Number](c).longValue
      assert(lv("l_orderkey") == ok && lv("l_linenumber") == ln,
        s"row order: got (${lv("l_orderkey")},${lv("l_linenumber")}) want ($ok,$ln)")
      assert(lv("quantity") == q)
      val score = -math.log(hq(q).toDouble / n) - math.log(hd(d).toDouble / n) -
        math.log(hp(pb).toDouble / n)
      assert(math.abs(r.getAs[Double]("hbos_score") - score) < 1e-5)
    }
    // monotonicity: published scores are non-increasing in rank order
    // ... non-decreasing: rank 1 = rarest bins = HIGHEST score
    val scores = rows.map(_.getAs[Double]("hbos_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("q_propensity_match: ATE recomposes from an UNBLOCKED driver-side matcher") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Validation.queries("q_propensity_match")(spark, sf)
      .collect().head
    val pu0 = Tables.events(spark, sf).groupBy(col("user_id")).agg(
      sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
      sum(when(col("event_type").isin("click", "error", "signup"), 1L)
        .otherwise(0L)).as("x"),
      sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .as[(Long, Long, Long, Long)].collect()
    val (users, tv) = (pu0.length.toLong, pu0.map(_._2).sum)
    val pu = pu0.map { case (u, v, x, y) =>
      (u, if (v * users > tv) 1L else 0L, x, y) }
    val n = pu.length.toLong
    val (sx, sxx) = (pu.map(_._3).sum, pu.map(u => u._3 * u._3).sum)
    val (st, sxt) = (pu.map(_._2).sum, pu.map(u => u._3 * u._2).sum)
    val b = (n * sxt - sx * st).toDouble / (n * sxx - sx * sx)
    val a = (st.toDouble - b * sx) / n
    val scoredAll = pu.map(u => (u._1, u._2, u._4, a + b * u._3))
    val treated = scoredAll.filter(_._2 == 1L)
    val control = scoredAll.filter(_._2 == 0L)
    assert(r.getAs[Long]("n_treated") == treated.length.toLong)
    assert(r.getAs[Long]("n_control") == control.length.toLong)
    // UNBLOCKED nearest-within-caliper: proves the +/-1 bucket explode
    // (width = caliper) drops no admissible candidate
    val cal = graft.operators.Validation.PsmCaliper
    val matches = treated.flatMap { case (_, _, ty, tp) =>
      val cands = control.map { case (cu, _, cy, cp) =>
        (math.abs(tp - cp), cu, cy) }.filter(_._1 <= cal)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(c => (c._1, c._2))
        Some((ty - best._3, best._1))
      }
    }
    assert(r.getAs[Long]("n_matched") == matches.length.toLong)
    if (matches.isEmpty) {
      // tiny-SF degenerate: no control inside any treated's caliper —
      // the query must publish nulls, never a divide error
      assert(r.isNullAt(r.fieldIndex("ate_dollars")))
      assert(r.isNullAt(r.fieldIndex("max_propensity_gap")))
    } else {
      val ate = matches.map(_._1).sum.toDouble / matches.length / 100.0
      assert(math.abs(r.getAs[Double]("ate_dollars") - ate) < 1e-4,
        s"ate ${r.getAs[Double]("ate_dollars")} vs brute $ate")
      assert(math.abs(r.getAs[Double]("max_propensity_gap") -
        matches.map(_._2).max) < 1e-5)
    }
    assert(math.abs(r.getAs[Double]("match_rate") -
      matches.length.toDouble / treated.length) < 1e-5)
  }

  test("q_closeness: distances recompose from a driver-side BFS; diameter far below the cap") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.GraphOps.queries("q_closeness")(spark, sf)
      .collect().map(r => r.getAs[Long]("s_suppkey") -> r).toMap
    val edges = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
      .as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    // the deterministic md5-ranked source panel
    val panel = adj.keys.toSeq
      .sortBy(n => (org.apache.commons.codec.digest.DigestUtils
        .md5Hex(n.toString), n))
      .take(graft.operators.GraphOps.ClosenessPanel).toSet
    assert(rows.keySet == panel)
    panel.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).filterNot(dist.contains)
        val d = dist.values.max + 1
        frontier.foreach(n => dist(n) = d)
      }
      dist.remove(s)
      val r = rows(s)
      assert(r.getAs[Long]("n_reachable") == dist.size.toLong, s"reach($s)")
      assert(r.getAs[Long]("total_dist") == dist.values.map(_.toLong).sum,
        s"dist($s)")
      assert(r.getAs[Int]("eccentricity") ==
        (if (dist.isEmpty) 0 else dist.values.max), s"ecc($s)")
      assert(math.abs(r.getAs[Double]("closeness") -
        dist.size.toDouble / dist.values.sum) < 1e-5, s"closeness($s)")
      // the MaxHops cap must never bind on a real corpus
      assert(dist.values.forall(_ < graft.operators.GraphOps.MaxHops / 2))
    }
  }

  test("q_stupid_backoff: per-source scores recompose from a driver-side backoff LM") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TrainingOps.queries("q_stupid_backoff")(spark, sf)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val toks = graft.operators.TextAnalysis.tokenStream(spark, sf)
      .withColumn("b",
        expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
          .cast("long") % 100)
      .as[(Long, Int, String, Long)].collect()
    val srcOf = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val docs = toks.groupBy(_._1).map { case (d, g) =>
      (d, g.head._4, g.sortBy(_._2).map(_._3)) }.toSeq
    val train = docs.filter(_._2 < 80)
    val uni = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val big = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    train.foreach { case (_, _, ts) =>
      ts.foreach(t => uni(t) += 1)
      ts.zip(ts.drop(1)).foreach(p => big(p) += 1)
    }
    val n = uni.values.sum
    val v = uni.size
    val agg = scala.collection.mutable.Map[String, (Long, Long, Double)]()
    docs.filter(_._2 >= 90).foreach { case (d, _, ts) =>
      val src = srcOf(d)
      ts.zip(ts.drop(1)).foreach { case (w1, w2) =>
        val (nb, bo, ss) = agg.getOrElse(src, (0L, 0L, 0.0))
        val c12 = big((w1, w2))
        val s =
          if (c12 > 0) -math.log(c12.toDouble / uni(w1))
          else -math.log(0.4 * (uni(w2) + 1).toDouble / (n + v))
        agg(src) = (nb + 1, bo + (if (c12 > 0) 0L else 1L), ss + s)
      }
    }
    assert(rows.keySet == agg.keySet)
    agg.foreach { case (src, (nb, bo, ss)) =>
      val r = rows(src)
      assert(r.getAs[Long]("n_bigrams") == nb, s"$src n_bigrams")
      assert(r.getAs[Long]("n_backoff") == bo, s"$src n_backoff")
      assert(math.abs(r.getAs[Double]("backoff_rate") - bo.toDouble / nb) < 1e-5)
      assert(math.abs(r.getAs[Double]("mean_neg_logscore") - ss / nb) < 1e-4,
        s"$src mean ${r.getAs[Double]("mean_neg_logscore")} vs brute ${ss / nb}")
    }
    // the corpus must exercise BOTH branches (seen bigrams and backoff)
    val (tnb, tbo) = (agg.values.map(_._1).sum, agg.values.map(_._2).sum)
    assert(tbo > 0 && tbo < tnb)
  }

  test("q_dbscan: roles and cluster labels recompose from a driver-side DBSCAN") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Dedup.queries("q_dbscan")(spark, sf).collect()
    val (asg, _) = graft.operators.Similarity.IvfIndex.get(spark, sf, 16)
    val vecs = asg.select(col("vec_id"), col("v"), col("cell"))
      .as[(Long, Seq[Double], Int)].collect()
    assert(rows.length == vecs.length)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byCell = vecs.groupBy(_._3)
    val nbrs = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    byCell.values.foreach { g =>
      for (i <- g.indices; j <- (i + 1) until g.length) {
        val (a, b) = (g(i), g(j))
        val dot = a._2.zip(b._2).map { case (x, y) => x * y }.sum
        val sim = dot / (math.sqrt(a._2.map(x => x * x).sum) *
          math.sqrt(b._2.map(x => x * x).sum))
        if (r6(sim) >= graft.operators.Dedup.DbscanTau) {
          nbrs(a._1) = nbrs(a._1) + b._1; nbrs(b._1) = nbrs(b._1) + a._1
        }
      }
    }
    val core = vecs.map(_._1)
      .filter(v => nbrs(v).size >= graft.operators.Dedup.DbscanMinPts).toSet
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for (u <- core; v <- nbrs(u) if core(v)) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    def clusterOf(c: Long): Long = {
      val r = find(c)
      (core.filter(find(_) == r) + r).min
    }
    rows.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("n_neighbors") == nbrs(v).size.toLong, s"deg($v)")
      val coreNbrs = nbrs(v).filter(core)
      val (role, cl) =
        if (core(v)) ("core", clusterOf(v))
        else if (coreNbrs.nonEmpty) ("border", coreNbrs.map(clusterOf).min)
        else ("noise", -1L)
      assert(r.getAs[String]("role") == role, s"role($v)")
      assert(r.getAs[Long]("cluster_id") == cl, s"cluster($v)")
    }
    // sanity: the corpus exercises all three roles
    val roles = rows.map(_.getAs[String]("role")).toSet
    assert(roles.contains("core") && roles.contains("noise"), roles.toString)
  }

  test("q_ar2_forecast: Yule-Walker coefficients and forecast recompose from the hourly series") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TemporalOps.queries("q_ar2_forecast")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts DIV 1000000000) DIV 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, g) =>
        t -> g.sortBy(_._2).map(_._3.toDouble) }
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val y = hourly(et)
      val n = y.length
      assert(r.getAs[Long]("n_hours") == n.toLong)
      val mean = y.sum / n
      val den = y.map(v => (v - mean) * (v - mean)).sum
      def rk(k: Int): Double =
        (k until n).map(t => (y(t) - mean) * (y(t - k) - mean)).sum / den
      val (r1, r2) = (rk(1), rk(2))
      val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
      val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
      assert(math.abs(r.getAs[Double]("phi1") - phi1) < 1e-4,
        s"$et phi1 ${r.getAs[Double]("phi1")} vs brute $phi1")
      assert(math.abs(r.getAs[Double]("phi2") - phi2) < 1e-4,
        s"$et phi2 ${r.getAs[Double]("phi2")} vs brute $phi2")
      val fc = mean + phi1 * (y(n - 1) - mean) + phi2 * (y(n - 2) - mean)
      assert(math.abs(r.getAs[Double]("forecast_next") - fc) < 1e-3,
        s"$et forecast ${r.getAs[Double]("forecast_next")} vs brute $fc")
      assert(r.getAs[Boolean]("stationary") ==
        (phi1 + phi2 < 1.0 && phi2 - phi1 < 1.0 && math.abs(phi2) < 1.0))
    }
  }

  test("q_bandit_ucb: exact-rational rank, posterior/UCB recompose, arms partition users") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Validation.queries("q_bandit_ucb")(spark, sf)
      .collect().sortBy(_.getAs[String]("arm"))
    assert(rows.length == 4)
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    // rank = exact cross-multiplied posterior ordering, arm tiebreak
    val key = rows.map { r =>
      (r.getAs[String]("arm"),
        r.getAs[Long]("n_conversions") + 1, r.getAs[Long]("n_users") + 2)
    }
    rows.foreach { r =>
      val (arm, s1, n1) =
        (r.getAs[String]("arm"),
          r.getAs[Long]("n_conversions") + 1, r.getAs[Long]("n_users") + 2)
      val better = key.count { case (a2, s2, n2) =>
        s2 * n1 > s1 * n2 || (s2 * n1 == s1 * n2 && a2 < arm) }
      assert(r.getAs[Long]("rank") == better + 1L, s"$arm rank")
      assert(r.getAs[Boolean]("play_next") == (r.getAs[Long]("rank") == 1L))
      val pm = (r.getAs[Long]("n_conversions") + 1).toDouble /
        (r.getAs[Long]("n_users") + 2)
      assert(math.abs(r.getAs[Double]("posterior_mean") - pm) < 1e-5)
      val ucb = r.getAs[Long]("n_conversions").toDouble / r.getAs[Long]("n_users") +
        math.sqrt(2.0 * math.log(nUsers.toDouble) / r.getAs[Long]("n_users"))
      assert(math.abs(r.getAs[Double]("ucb1") - ucb) < 1e-5)
    }
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("q_granger: F and betas recompose from a driver-side least-squares") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TemporalOps.queries("q_granger")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val daily = Tables.events(spark, sf)
      .select(expr("(ts DIV 1000000000) DIV 86400").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("y"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val y = daily.drop(1).map(_._3.toDouble)
    val y1 = daily.dropRight(1).map(_._3.toDouble)
    val x1 = daily.dropRight(1).map(_._2.toDouble)
    val n = y.length
    assert(r.getAs[Long]("n_days") == n.toLong)
    def c(a: Array[Double], b: Array[Double]): Double = {
      val (ma, mb) = (a.sum / n, b.sum / n)
      a.zip(b).map { case (p, q) => (p - ma) * (q - mb) }.sum
    }
    val (s11, s12, s22) = (c(y1, y1), c(y1, x1), c(x1, x1))
    val (s1y, s2y, syy) = (c(y1, y), c(x1, y), c(y, y))
    val det = s11 * s22 - s12 * s12
    val b = (s1y * s22 - s2y * s12) / det
    val cc = (s11 * s2y - s12 * s1y) / det
    val rssU = syy - b * s1y - cc * s2y
    val rssR = syy - s1y * s1y / s11
    val f = (rssR - rssU) * (n - 3) / rssU
    // the query solves on covariance-QUANTIZED moments (cents-scale
    // half-up); tolerances reflect the declared quantization grain
    assert(math.abs(r.getAs[Double]("beta_self") - b) < 1e-3,
      s"beta_self ${r.getAs[Double]("beta_self")} vs brute $b")
    assert(math.abs(r.getAs[Double]("beta_x") - cc) <
      math.max(1e-3, math.abs(cc) * 0.01),
      s"beta_x ${r.getAs[Double]("beta_x")} vs brute $cc")
    assert(math.abs(r.getAs[Double]("f_stat") - f) <
      math.max(1e-2, math.abs(f) * 0.01),
      s"f_stat ${r.getAs[Double]("f_stat")} vs brute $f")
    assert(r.getAs[Boolean]("granger_causal") ==
      (r.getAs[Double]("f_stat") > 3.84))
  }

  test("q_bradley_terry: strengths recompose from pairwise wins via BigInt half-up replay") {
    import org.apache.spark.sql.functions._
    val rows = graft.ml.FeatureOps.queries("q_bradley_terry")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // replay the two fixed-point iterations from the raw pair table
    val cb = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey"), col("p_brand"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .as[(Long, String, Long)].collect()
    val byCust = cb.groupBy(_._1)
    val pairW = scala.collection.mutable.Map[(String, String), (Long, Long)]()
    byCust.values.foreach { g =>
      for (a <- g; b <- g if a._2 < b._2 && a._3 != b._3) {
        val k = (a._2, b._2)
        val (n0, w0) = pairW.getOrElse(k, (0L, 0L))
        pairW(k) = (n0 + 1, w0 + (if (a._3 > b._3) 1L else 0L))
      }
    }
    def hu(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    val brands = rows.map(_.getAs[String]("brand"))
    val wins = brands.map { br =>
      br -> pairW.collect {
        case ((i, j), (n, w)) if i == br => w
        case ((i, j), (n, w)) if j == br => n - w
      }.sum
    }.toMap
    val comps = brands.map { br =>
      br -> pairW.collect { case ((i, j), (n, _)) if i == br || j == br => n }.sum
    }.toMap
    val p1 = brands.map(br =>
      br -> hu(BigInt(2) * wins(br) * 1000000, BigInt(comps(br)))).toMap
    val den = brands.map { br =>
      br -> pairW.collect {
        case ((i, j), (n, _)) if i == br || j == br =>
          hu(BigInt(n) * BigInt("1000000000000"),
            p1(i) + p1(j))
      }.sum
    }.toMap
    val p2 = brands.map(br =>
      br -> hu(BigInt(wins(br)) * BigInt("1000000000000"), den(br))).toMap
    rows.foreach { r =>
      val br = r.getAs[String]("brand")
      assert(r.getAs[Long]("n_comparisons") == comps(br), s"$br comparisons")
      assert(r.getAs[Long]("wins") == wins(br), s"$br wins")
      assert(BigInt(r.getAs[Long]("p1_micro")) == p1(br), s"$br p1")
      assert(BigInt(r.getAs[Long]("p2_micro")) == p2(br), s"$br p2")
    }
    // ranks are the p2 order, dense 1..k
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(byRank.map(r => (-r.getAs[Long]("p2_micro"),
      r.getAs[String]("brand"))).toSeq ==
      byRank.map(r => (-r.getAs[Long]("p2_micro"),
        r.getAs[String]("brand"))).sorted.toSeq, "rank follows (p2 DESC, brand)")
  }

  test("q_hurst: per-size R/S recomposes from a driver-side replay; H in (0,1)") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TemporalOps.queries("q_hurst")(spark, sf)
      .collect().sortBy(_.getAs[Int]("m"))
    assert(rows.map(_.getAs[Int]("m")).toSeq == Seq(16, 64, 256))
    val y = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("day")).select("y").as[Long].collect()
    rows.foreach { r =>
      val m = r.getAs[Int]("m")
      val blocks = y.grouped(m).filter(_.length == m).toSeq
      val rsU = blocks.flatMap { blk =>
        val sb = blk.sum
        val d = blk.map(v => m.toLong * v - sb)
        val cum = d.scanLeft(0L)(_ + _).drop(1)
        val s2 = d.map(x => BigInt(x) * BigInt(x)).sum
        if (s2 > 0)
          Some(math.round((cum.max - cum.min).toDouble /
            math.sqrt(s2.toDouble / m) * 1e6))
        else None
      }
      assert(r.getAs[Long]("n_blocks") == rsU.length.toLong,
        s"m=$m: ${r.getAs[Long]("n_blocks")} blocks vs brute ${rsU.length}")
      val mean = rsU.sum.toDouble / rsU.length / 1e6
      assert(math.abs(r.getAs[Double]("mean_rs") - mean) < 1e-5,
        s"m=$m: ${r.getAs[Double]("mean_rs")} vs brute $mean")
    }
    val h = rows.head.getAs[Double]("hurst")
    assert(rows.forall(_.getAs[Double]("hurst") == h), "H constant across rows")
    assert(h > 0.0 && h < 1.0, s"H=$h out of range")
    val expect = if (h > 0.55) "persistent"
      else if (h < 0.45) "mean_reverting" else "random_walk"
    assert(rows.forall(_.getAs[String]("regime") == expect))
  }

  test("q_median_polish: additive identity exact per cell, effects are swept medians, fence is the exact MAD") {
    val rows = graft.operators.AnalyticExt.queries("q_median_polish")(spark, sf)
      .collect()
    assert(rows.length == 35, "5 segments x 7 years, all populated")
    rows.foreach { r =>
      // the invariant the polish is FOR: cell = row + col + residual
      assert(r.getAs[Long]("cell_cents") ==
        r.getAs[Long]("row_effect_cents") + r.getAs[Long]("col_effect_cents") +
          r.getAs[Long]("residual_cents"),
        s"additive identity broken at ${(r.get(0), r.get(1))}")
    }
    // after the second column sweep, every year's residual median is 0
    rows.groupBy(_.getAs[Int]("yr")).foreach { case (y, g) =>
      val res = g.map(_.getAs[Long]("residual_cents")).sorted
      assert(res(2) == 0L, s"year $y residual median ${res(2)} != 0")
    }
    // MAD fence recomposes: outlier == |res| > 2 * median(|res|)
    val absRes = rows.map(r => math.abs(r.getAs[Long]("residual_cents")))
      .sorted
    val mad = absRes(17) // element 18 of 35
    rows.foreach { r =>
      assert(r.getAs[Boolean]("outlier") ==
        (math.abs(r.getAs[Long]("residual_cents")) > 2 * mad))
    }
  }

  test("q_variance_ratio: VR recomposes from raw q-period differences") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TemporalOps.queries("q_variance_ratio")(spark, sf)
      .collect().sortBy(_.getAs[Int]("q"))
    assert(rows.map(_.getAs[Int]("q")).toSeq == Seq(2, 5, 10))
    val y = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("day")).select("y").as[Long].collect()
    def popVar(d: Array[Double]): Double = {
      val m = d.sum / d.length
      d.map(x => (x - m) * (x - m)).sum / d.length
    }
    val d1 = y.indices.drop(1).map(i => (y(i) - y(i - 1)).toDouble).toArray
    rows.foreach { r =>
      val q = r.getAs[Int]("q")
      val dq = y.indices.drop(q).map(i => (y(i) - y(i - q)).toDouble).toArray
      assert(r.getAs[Long]("n_diffs") == dq.length.toLong)
      val vr = popVar(dq) / (q * popVar(d1))
      assert(math.abs(r.getAs[Double]("vr") - vr) < 1e-4,
        s"q=$q: VR ${r.getAs[Double]("vr")} vs brute $vr")
      val expect = if (r.getAs[Double]("vr") > 1.2) "persistent"
        else if (r.getAs[Double]("vr") < 0.8) "mean_reverting"
        else "random_walk"
      assert(r.getAs[String]("regime") == expect)
    }
  }

  /** Sign-split half-up integer division — the shared quantizer the
    * r14 survival/spectral wave publishes through. */
  private def huB(a: BigInt, b: BigInt): BigInt =
    if (a >= 0) (2 * a + b) / (2 * b) else -((2 * -a + b) / (2 * b))

  test("q_mase: MASE recomposes from the raw day series with a 28-row holdout") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps.queries("q_mase")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val y = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("day")).select("y").as[Long].collect()
    val n = y.length
    val hold = 28
    assert(r.getAs[Long]("n_holdout") == hold.toLong)
    assert(r.getAs[Long]("n_train") == (n - hold).toLong)
    val saeF = (n - hold until n).filter(_ >= 7)
      .map(i => BigInt((y(i) - y(i - 7)).abs)).sum
    val h = (n - hold until n).count(_ >= 7)
    val saeN = (1 until n - hold).map(i => BigInt((y(i) - y(i - 1)).abs)).sum
    val nTn = n - hold - 1
    assert(BigInt(r.getAs[Long]("sae_seasonal_cents")) == saeF)
    assert(BigInt(r.getAs[Long]("sae_naive_cents")) == saeN)
    val mase = (saeF * nTn).toDouble / (saeN * h).toDouble
    assert(math.abs(r.getAs[Double]("mase") - mase) < 1e-4)
    assert(r.getAs[Boolean]("seasonal_beats_naive") ==
      (r.getAs[Double]("mase") < 1.0))
  }

  test("q_logrank: O−E and variance sums recompose exactly in BigInt") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps.queries("q_logrank")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val users = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts DIV 1000000000").cast("long").as("t"))
      .as[(Long, String, Long, Long)].collect()
      .groupBy(_._1).map { case (_, evs) =>
        val first = evs.minBy(e => (e._4, e._3))
        val fp = evs.filter(_._2 == "purchase").map(_._4).sorted.headOption
        val organic = first._2 == "view" || first._2 == "click"
        (organic, evs.map(_._4).min, fp, evs.map(_._4).max)
      }.toSeq
    val endg = users.map(_._4).max
    val na0 = users.count(_._1)
    val nb0 = users.size - na0
    assert(r.getAs[Long]("n_organic") == na0.toLong)
    assert(r.getAs[Long]("n_direct") == nb0.toLong)
    // per-hour (da, db, ca, cb), sequential at-risk, BigInt quantized terms
    val byHour = users.map { case (org, f, fp, _) =>
      val dur = fp.map(_ - f).getOrElse(endg - f) / 3600
      (dur, org, fp.isDefined)
    }.groupBy(_._1).toSeq.sortBy(_._1)
    var (na, nb) = (BigInt(na0), BigInt(nb0))
    var (oe, vr) = (BigInt(0), BigInt(0))
    byHour.foreach { case (_, g) =>
      val da = BigInt(g.count(x => x._2 && x._3))
      val db = BigInt(g.count(x => !x._2 && x._3))
      val ca = BigInt(g.count(x => x._2 && !x._3))
      val cb = BigInt(g.count(x => !x._2 && !x._3))
      val d = da + db
      val nn = na + nb
      if (d > 0 && nn > 1) {
        oe += huB((da * nn - d * na) * 1000000, nn)
        vr += (2 * (d * na * nb * (nn - d)) * 1000000 +
          nn * nn * (nn - 1)) / (2 * nn * nn * (nn - 1))
      }
      na -= da + ca
      nb -= db + cb
    }
    assert(BigInt(r.getAs[Long]("oe_micro")) == oe,
      s"oe ${r.getAs[Long]("oe_micro")} vs brute $oe")
    assert(BigInt(r.getAs[Long]("var_micro")) == vr,
      s"var ${r.getAs[Long]("var_micro")} vs brute $vr")
    val chi2 = oe.toDouble * oe.toDouble / (vr.toDouble * 1e6)
    assert(math.abs(r.getAs[Double]("logrank_chi2") - chi2) < 1e-4)
    assert(r.getAs[Boolean]("curves_differ") ==
      (r.getAs[Double]("logrank_chi2") > 3.841))
  }

  test("q_pacf: Durbin–Levinson recomposes from brute-force autocorrelations") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps.queries("q_pacf")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts DIV 1000000000) DIV 3600").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, g) =>
        t -> g.sortBy(_._2).map(_._3.toDouble) }
    rows.foreach { row =>
      val y = hourly(row.getAs[String]("event_type"))
      val n = y.length
      assert(row.getAs[Long]("n_hours") == n.toLong)
      val mean = y.sum / n
      val den = y.map(v => (v - mean) * (v - mean)).sum
      def rk(k: Int): Double =
        (k until n).map(t => (y(t) - mean) * (y(t - k) - mean)).sum / den
      val (r1, r2, r3) = (rk(1), rk(2), rk(3))
      val p2 = (r2 - r1 * r1) / (1 - r1 * r1)
      val a21 = r1 - p2 * r1
      val p3 = (r3 - a21 * r2 - p2 * r1) / (1 - a21 * r1 - p2 * r2)
      assert(math.abs(row.getAs[Double]("pacf1") - r1) < 1e-4)
      assert(math.abs(row.getAs[Double]("pacf2") - p2) < 1e-4)
      assert(math.abs(row.getAs[Double]("pacf3") - p3) < 1e-4)
      val band = 1.96 / math.sqrt(n.toDouble)
      val expect =
        if (math.abs(row.getAs[Double]("pacf3")) > band) 3
        else if (math.abs(row.getAs[Double]("pacf2")) > band) 2
        else if (math.abs(row.getAs[Double]("pacf1")) > band) 1
        else 0
      assert(row.getAs[Int]("ar_order_hint") == expect)
    }
  }

  test("q_periodogram: spectral power recomposes from a full-precision DFT; one peak") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps.queries("q_periodogram")(spark, sf)
      .collect()
    assert(rows.length == 4)
    assert(rows.count(_.getAs[Boolean]("is_peak")) >= 1)
    val relSum = rows.map(_.getAs[Double]("rel_power")).sum
    assert(math.abs(relSum - 1.0) < 1e-4, s"rel powers sum to $relSum")
    val days = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .as[(Long, Long)].collect()
    val n = days.length
    val s = days.map(d => BigInt(d._2)).sum
    // full-precision reference on the same n-scaled centered series
    val pw = Seq(5, 7, 9, 11).map { p =>
      var (c, si) = (0.0, 0.0)
      days.foreach { case (day, y) =>
        val yt = (BigInt(n) * y - s).toDouble
        val a = 2 * math.Pi * (((day % p) + p) % p) / p
        c += yt * math.cos(a); si += yt * math.sin(a)
      }
      p -> (c * c + si * si)
    }.toMap
    val tot = pw.values.sum
    rows.foreach { r =>
      val p = r.getAs[Int]("period")
      val rel = pw(p) / tot
      assert(math.abs(r.getAs[Double]("rel_power") - rel) < 2e-3,
        s"period $p: ${r.getAs[Double]("rel_power")} vs brute $rel")
    }
  }

  test("q_shapley_attribution: efficiency axiom and a brute-force coalition replay") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps
      .queries("q_shapley_attribution")(spark, sf).collect()
    assert(rows.length == 3)
    val total = rows.head.getAs[Long]("total_conversions")
    assert(rows.map(_.getAs[Long]("phi6")).sum == 6 * total,
      "efficiency: sum of 6-scaled Shapley credits must equal 6*v(C)")
    val journeys = Tables.events(spark, sf)
      .select(col("user_id"), expr("(ts DIV 1000000000) DIV 86400").as("day"),
        col("event_type"))
      .as[(Long, Long, String)].collect()
      // toSeq BEFORE map: tuple results on a Map re-key by mask and
      // collapse distinct journeys
      .groupBy(j => (j._1, j._2)).toSeq.map { case (_, evs) =>
        val types = evs.map(_._3).toSet
        val mask = (if (types("view")) 1 else 0) +
          (if (types("click")) 2 else 0) + (if (types("signup")) 4 else 0)
        (mask, types("purchase"))
      }
    def v(t: Int): Long =
      journeys.count { case (m, conv) => conv && m != 0 && (m & ~t) == 0 }
    assert(v(7) == total)
    rows.foreach { r =>
      val bit = r.getAs[String]("channel") match {
        case "view" => 1; case "click" => 2; case "signup" => 4
      }
      val phi = (0 to 7).filter(t => (t & bit) == 0).map { t =>
        val w6 = Integer.bitCount(t) match {
          case 0 | 2 => 2L; case _ => 1L
        }
        w6 * (v(t | bit) - v(t))
      }.sum
      assert(r.getAs[Long]("phi6") == phi,
        s"${r.getAs[String]("channel")}: phi6 ${r.getAs[Long]("phi6")} vs brute $phi")
      assert(r.getAs[Long]("solo_conversions") == v(bit))
    }
  }

  test("q_cronbach_alpha: alpha recomposes from driver-side item moments in BigInt") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation
      .queries("q_cronbach_alpha")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    import graft.functions.TextFunctions.{tokens, vocabHits}
    val items = Tables.documents(spark, sf).select(
      length(col("text")).cast("long"),
      size(tokens(col("text"))).cast("long"),
      vocabHits(tokens(col("text")),
        graft.operators.TextAnalysis.stopwords("en")).cast("long"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.!?]", ""))).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => Array(BigInt(t._1), BigInt(t._2), BigInt(t._3), BigInt(t._4)))
    val n = BigInt(items.length)
    assert(r.getAs[Long]("n_docs") == items.length.toLong)
    def vOf(xs: Array[BigInt]): BigInt =
      n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val vi = (0 until 4).map(i => vOf(items.map(_(i)))).sum
    val vt = vOf(items.map(_.sum))
    val alpha = 4.0 * (vt - vi).toDouble / (3.0 * vt.toDouble)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-4,
      s"alpha ${r.getAs[Double]("alpha")} vs brute $alpha")
    assert(r.getAs[Boolean]("reliable") == (r.getAs[Double]("alpha") >= 0.7))
  }

  test("q_mahalanobis: top-20 ranking and d² agree with a driver-side inverse-covariance") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation
      .queries("q_mahalanobis")(spark, sf).collect()
    assert(rows.length == 20)
    val data = Tables.lineitem(spark, sf).select(
      col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
      col("l_quantity").cast("long"),
      round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val n = data.length.toDouble
    val (mx, my) = (data.map(_._3).sum / n, data.map(_._4).sum / n)
    var (cxx, cxy, cyy) = (0.0, 0.0, 0.0)
    data.foreach { case (_, _, x, y) =>
      cxx += (x - mx) * (x - mx); cxy += (x - mx) * (y - my)
      cyy += (y - my) * (y - my)
    }
    val (vxx, vxy, vyy) = (cxx / n, cxy / n, cyy / n)
    val det = vxx * vyy - vxy * vxy
    def d2(x: Long, y: Long): Double = {
      val (ux, uy) = (x - mx, y - my)
      (vyy * ux * ux - 2 * vxy * ux * uy + vxx * uy * uy) / det
    }
    val bruteTop = data.map { case (ok, ln, x, y) => (d2(x, y), ok, ln) }
      .sortBy { case (d, ok, ln) => (-d, ok, ln) }.take(20)
    rows.zip(bruteTop).foreach { case (r, (bd, _, _)) =>
      // population-covariance d² vs the query's quantized-moment d²:
      // agreement at the quantization grain
      assert(math.abs(r.getAs[Double]("md2") - bd) <
        math.max(1e-3, bd * 0.01),
        s"md2 ${r.getAs[Double]("md2")} vs brute $bd")
      assert(r.getAs[Boolean]("outlier_999") ==
        (r.getAs[Double]("md2") > 13.816))
    }
    // the ranked KEYS agree with the brute ranking (Q-order = d²-order)
    assert(rows.map(r => (r.getAs[Number]("l_orderkey").longValue,
      r.getAs[Number]("l_linenumber").longValue)).toSeq ==
      bruteTop.map { case (_, ok, ln) => (ok, ln) }.toSeq)
  }

  test("q_fleiss_kappa: kappa recomposes from the rater verdict matrix") {
    val sf = TestSession.sf
    val rows = graft.operators.TextAnalysis
      .queries("q_fleiss_kappa")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    import graft.functions.TextFunctions.{tokens, vocabHits}
    val rated = Tables.documents(spark, sf).select(
      when(length(col("text")) >= 500, 1L).otherwise(0L),
      when(size(tokens(col("text"))) >= 80, 1L).otherwise(0L),
      when(vocabHits(tokens(col("text")),
        graft.operators.TextAnalysis.stopwords("en")) >= 5, 1L)
        .otherwise(0L))
      .as[(Long, Long, Long)].collect()
    val n = BigInt(rated.length)
    assert(r.getAs[Long]("n_docs") == rated.length.toLong)
    assert(r.getAs[Long]("accepts_r1") == rated.map(_._1).sum)
    assert(r.getAs[Long]("accepts_r2") == rated.map(_._2).sum)
    assert(r.getAs[Long]("accepts_r3") == rated.map(_._3).sum)
    val a = rated.map { t =>
      val na = BigInt(t._1 + t._2 + t._3)
      na * na + (3 - na) * (3 - na) - 3
    }.sum
    val ca = rated.map(t => BigInt(t._1 + t._2 + t._3)).sum
    val e = ca * ca + (3 * n - ca) * (3 * n - ca)
    val kappa = (3 * a * n - 2 * e).toDouble / (18 * n * n - 2 * e).toDouble
    assert(math.abs(r.getAs[Double]("fleiss_kappa") - kappa) < 1e-4,
      s"kappa ${r.getAs[Double]("fleiss_kappa")} vs brute $kappa")
    val pBar = a.toDouble / (6.0 * n.toDouble)
    assert(math.abs(r.getAs[Double]("p_bar") - pBar) < 1e-4)
  }

  test("q_durbin_watson: DW recomposes from a driver-side OLS residual series") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps.queries("q_durbin_watson")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val day = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("t"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("t")).as[(Long, Long)].collect()
    val n = day.length
    assert(r.getAs[Long]("n_days") == n.toLong)
    val (ts, ys) = (day.map(_._1.toDouble), day.map(_._2.toDouble))
    val (mt, my) = (ts.sum / n, ys.sum / n)
    val b = ts.zip(ys).map { case (t, y) => (t - mt) * (y - my) }.sum /
      ts.map(t => (t - mt) * (t - mt)).sum
    val e = day.map { case (t, y) => (y - my) - b * (t - mt) }
    val dw = e.indices.drop(1).map(i => (e(i) - e(i - 1)) * (e(i) - e(i - 1)))
      .sum / e.map(x => x * x).sum
    // the query's slope is µ-quantized; agreement at that grain
    assert(math.abs(r.getAs[Double]("dw") - dw) < 1e-3,
      s"dw ${r.getAs[Double]("dw")} vs brute $dw")
    val expect = if (r.getAs[Double]("dw") < 1.5) "positive"
      else if (r.getAs[Double]("dw") > 2.5) "negative" else "none"
    assert(r.getAs[String]("residual_autocorr") == expect)
  }

  test("q_cooks_distance: top-20 influence agrees with a driver-side replay") {
    val sf = TestSession.sf
    val rows = graft.ml.FeatureOps.queries("q_cooks_distance")(spark, sf)
      .collect()
    assert(rows.length == 20)
    val data = Tables.lineitem(spark, sf).select(
      col("l_orderkey").cast("long"), col("l_linenumber").cast("long"),
      col("l_quantity").cast("long"),
      round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val n = data.length.toDouble
    val (mx, my) = (data.map(_._3).sum / n, data.map(_._4).sum / n)
    val sxx = data.map(d => (d._3 - mx) * (d._3 - mx)).sum
    val sxy = data.map(d => (d._3 - mx) * (d._4 - my)).sum
    val b = sxy / sxx
    val e = data.map(d => (d._4 - my) - b * (d._3 - mx))
    val s2 = {
      val sse = e.map(x => x * x).sum
      sse / (n - 2)
    }
    def cook(i: Int): Double = {
      val h = 1 / n + (data(i)._3 - mx) * (data(i)._3 - mx) / sxx
      e(i) * e(i) * h / (2 * s2 * (1 - h) * (1 - h))
    }
    val brute = data.indices
      .map(i => (cook(i), data(i)._1, data(i)._2))
      .sortBy { case (d, ok, ln) => (-d, ok, ln) }.take(20)
    rows.zip(brute).foreach { case (row, (bd, ok, ln)) =>
      assert(row.getAs[Number]("l_orderkey").longValue == ok)
      assert(row.getAs[Number]("l_linenumber").longValue == ln)
      // quantized-slope D vs full-precision D: grain-level agreement
      assert(math.abs(row.getAs[Double]("cooks_d") - bd) <
        math.max(1e-4, bd * 0.01),
        s"D ${row.getAs[Double]("cooks_d")} vs brute $bd")
    }
  }

  test("q_icc: ICC(1) recomposes from driver-side one-way ANOVA") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_icc")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    val groups = Tables.orders(spark, sf)
      .select(col("o_custkey").cast("long"),
        round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).values.map(_.map(_._2.toDouble)).toSeq
    val k = groups.size
    val nn = groups.map(_.length).sum
    assert(r.getAs[Long]("n_customers") == k.toLong)
    assert(r.getAs[Long]("n_orders") == nn.toLong)
    val all = groups.flatten
    val gm = all.sum / nn
    val ssb = groups.map { g =>
      val m = g.sum / g.length; g.length * (m - gm) * (m - gm) }.sum
    val ssw = groups.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }.sum
    val n0 = (nn - groups.map(g =>
      g.length.toDouble * g.length).sum / nn) / (k - 1)
    val msb = ssb / (k - 1)
    val msw = ssw / (nn - k)
    val icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert(math.abs(r.getAs[Double]("icc") - icc) < 1e-4,
      s"icc ${r.getAs[Double]("icc")} vs brute $icc")
    assert(math.abs(r.getAs[Double]("n0") - n0) < 0.01)
  }

  test("q_kendall_w: W recomposes from driver-side rank sums; perfect concordance bound") {
    val sf = TestSession.sf
    val rows = graft.operators.TextAnalysis.queries("q_kendall_w")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    import graft.functions.TextFunctions.{tokens, vocabHits}
    val per = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(sum(length(col("text")).cast("long")).as("v1"),
        sum(size(tokens(col("text"))).cast("long")).as("v2"),
        sum(vocabHits(tokens(col("text")),
          graft.operators.TextAnalysis.stopwords("en")).cast("long")).as("v3"))
      .as[(String, Long, Long, Long)].collect()
    val k = per.length
    assert(r.getAs[Long]("k") == k.toLong)
    def ranks(f: ((String, Long, Long, Long)) => Long): Map[String, Int] =
      per.sortBy(t => (-f(t), t._1)).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1) }.toMap
    val rs = Seq(ranks(_._2), ranks(_._3), ranks(_._4))
    val m = 3
    val sumR = per.map(t => t._1 -> rs.map(_(t._1)).sum).toMap
    val d2 = sumR.values.map { ri =>
      val d = 2L * ri - m * (k + 1); d * d }.sum
    val w = 3.0 * d2 / (m.toDouble * m * (k.toLong * k * k - k))
    assert(math.abs(r.getAs[Double]("kendall_w") - w) < 1e-4,
      s"W ${r.getAs[Double]("kendall_w")} vs brute $w")
    assert(w >= 0 && w <= 1.0 + 1e-9)
    // r15: the cut derives from the data-driven k (χ²(k−1, .05)
    // literal table), no longer a hardcoded k=20 assumption
    val crit = r.getAs[Double]("chi2_crit")
    assert(!r.isNullAt(r.fieldIndex("chi2_crit")),
      s"k=$k outside the χ² literal table")
    assert(r.getAs[Boolean]("concordant") ==
      (r.getAs[Double]("chi2") > crit))
  }

  test("q_qq_normal: deciles are exact order statistics; z literals are symmetric") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_qq_normal")(spark, sf)
      .collect().sortBy(_.getAs[Double]("p"))
    assert(rows.length == 9)
    // sample quantiles are monotone and the z table is symmetric
    val qs = rows.map(_.getAs[Long]("sample_cents"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    val zs = rows.map(_.getAs[Double]("z_normal"))
    assert(zs.zip(zs.reverse).forall { case (a, b) => math.abs(a + b) < 1e-9 })
    // each decile IS the ⌈p·n⌉-th order statistic of the day series
    val days = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .select("y").as[Long].collect().sorted
    val n = days.length
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      val rank = math.ceil(p * n).toInt
      assert(r.getAs[Long]("sample_cents") == days(rank - 1),
        s"p=$p: ${r.getAs[Long]("sample_cents")} vs order stat ${days(rank - 1)}")
      // standardization replay
      val mean = days.map(BigInt(_)).sum.toDouble / n
      val sd = math.sqrt(days.map(y => (y - mean) * (y - mean)).sum / n)
      val z = (days(rank - 1) - mean) / sd
      assert(math.abs(r.getAs[Double]("std_sample") - z) < 1e-4)
    }
  }

  test("q_scaling_curve: fractions nest, counts recompose, slope matches the 4-point fit") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_scaling_curve")(spark, sf)
      .collect().sortBy(_.getAs[Long]("train_pct"))
    assert(rows.map(_.getAs[Long]("train_pct")).toSeq == Seq(10L, 25L, 50L, 100L))
    // nested fractions: token counts and vocab sizes are monotone
    val ns = rows.map(_.getAs[Long]("n_train_tokens"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
    val vs = rows.map(_.getAs[Long]("vocab_size"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
    // one shared slope row; it recomposes from the published points
    val slope = rows.head.getAs[Double]("loss_slope")
    assert(rows.forall(_.getAs[Double]("loss_slope") == slope))
    val xs = ns.map(n => math.log(n.toDouble))
    val ys = rows.map(_.getAs[Double]("heldout_surprisal"))
    val (xb, yb) = (xs.sum / 4, ys.sum / 4)
    val fit = xs.zip(ys).map { case (x, y) => (x - xb) * (y - yb) }.sum /
      xs.map(x => (x - xb) * (x - xb)).sum
    assert(math.abs(slope - fit) < 1e-4, s"slope $slope vs fit $fit")
    assert(rows.head.getAs[Boolean]("more_data_helps") == (slope < 0))
    // the 100% fraction IS the K16 train split: recompose its token count
    val n80 = graft.operators.TextAnalysis
      .queries("q_token_count")(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
      .withColumn("b",
        expr("conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)")
          .cast("long") % 100)
      .filter(col("b") < 80)
      .agg(sum(col("n_tokens"))).as[Long].head()
    assert(ns.last == n80, s"n_train(100%) ${ns.last} vs token count $n80")
  }

  test("q_davies_bouldin: lower-is-better index recomposes from the persisted partition") {
    val sf = TestSession.sf
    val rows = graft.ml.Tuning.queries("q_davies_bouldin")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val db = rows.head.getAs[Double]("davies_bouldin")
    assert(rows.forall(_.getAs[Double]("davies_bouldin") == db))
    assert(db > 0)
    // DB is the mean of per-cluster worst ratios
    val worst = rows.map(_.getAs[Double]("worst_ratio"))
    assert(math.abs(db - worst.sum / worst.length) < 1e-5,
      s"db $db vs mean of worst ratios ${worst.sum / worst.length}")
    // every cluster's scatter is positive and its worst ratio at least
    // (its own scatter)/(farthest-centroid distance) > 0
    assert(rows.forall(_.getAs[Double]("mean_scatter") > 0))
    assert(rows.forall(r =>
      r.getAs[Double]("worst_ratio") >= r.getAs[Double]("mean_scatter") / 100))
  }

  test("q_freq_itemsets: every published count recomposes from driver-side baskets") {
    val sf = TestSession.sf
    val rows = graft.operators.AnalyticExt.queries("q_freq_itemsets")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // brute-force baskets: order -> distinct brand set
    val baskets = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }.toSeq
    val nOrders = baskets.size
    def cnt(s: Set[String]) = baskets.count(b => s.subsetOf(b)).toLong
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"),
        r.getAs[String]("brand_c"))
      assert(a < b && b < c, s"triple not sorted: $a $b $c")
      val nAbc = cnt(Set(a, b, c)); val nAb = cnt(Set(a, b)); val nC = cnt(Set(c))
      assert(r.getAs[Long]("n_abc") == nAbc, s"n_abc($a,$b,$c)")
      assert(r.getAs[Long]("n_ab") == nAb, s"n_ab($a,$b)")
      assert(r.getAs[Long]("n_c") == nC, s"n_c($c)")
      assert(math.abs(r.getAs[Double]("support") - nAbc.toDouble / nOrders) < 1e-6)
      assert(math.abs(r.getAs[Double]("confidence") - nAbc.toDouble / nAb) < 1e-6)
      assert(math.abs(r.getAs[Double]("lift") -
        nAbc.toDouble * nOrders / (nAb.toDouble * nC)) < 1e-6)
    }
    // the published list is the top of the full lattice: no unpublished
    // triple may beat the last published (rounded) lift
    val minLift = rows.map(_.getAs[Double]("lift")).min
    val allBrands = baskets.flatten.distinct.sorted
    val better = (for {
      i <- allBrands.indices; j <- (i + 1) until allBrands.size
      k <- (j + 1) until allBrands.size
      s3 = cnt(Set(allBrands(i), allBrands(j), allBrands(k))) if s3 > 0
      ab = cnt(Set(allBrands(i), allBrands(j)))
      l = BigDecimal(s3.toDouble * nOrders /
        (ab.toDouble * cnt(Set(allBrands(k)))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield l).count(_ > minLift)
    assert(better < 20, s"$better lattice triples beat the published cut")
  }

  test("q_ppmi_embed: vectors and cosine neighbors recompose from a driver-side PPMI build") {
    val sf = TestSession.sf
    import graft.operators.TrainingOps.{PpmiMinCount, PpmiTopDims, PpmiProbes, PpmiNeighbors}
    val rows = graft.operators.TrainingOps.queries("q_ppmi_embed")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // driver-side rebuild from the raw token stream
    val docs = graft.operators.TextAnalysis.tokenStream(spark, sf)
      .orderBy("doc_id", "pos").as[(Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val uni = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val keep = uni.filter(_._2 >= PpmiMinCount)
    val co = scala.collection.mutable.Map.empty[(String, String), Long]
    def bump(a: String, b: String): Unit = {
      co((a, b)) = co.getOrElse((a, b), 0L) + 1
      co((b, a)) = co.getOrElse((b, a), 0L) + 1
    }
    docs.values.foreach { ts =>
      for (i <- ts.indices; d <- 1 to 2 if i + d < ts.size) bump(ts(i), ts(i + d))
    }
    val t = co.values.sum
    def wq(a: String, b: String): Option[Long] = for {
      ca <- keep.get(a); cb <- keep.get(b)
      cab <- co.get((a, b))
      if BigInt(cab) * t > BigInt(ca) * cb
    } yield math.round(math.log(
      (BigInt(cab) * t).toDouble / (BigInt(ca) * cb).toDouble) * 1e6)
    def vec(tok: String): Map[String, Long] = {
      // self-co-occurrence (adjacent repeats) is a legal dim, matching
      // the operator, which never filters w1 == w2
      val cands = keep.keys.toSeq.flatMap(d => wq(tok, d).map(w => (d, w)))
      // rank by the exact integer key (cab·1e12 DIV c_dim) DESC, dim ASC
      cands.sortBy { case (d, _) =>
        (-(BigInt(co((tok, d))) * BigInt("1000000000000") / keep(d)), d)
      }.take(PpmiTopDims).toMap
    }
    val probes = keep.toSeq.sortBy { case (tok, c) => (-c, tok) }
      .take(PpmiProbes).map(_._1)
    assert(rows.map(_.getAs[String]("probe")).toSet == probes.toSet)
    val vecs = keep.keys.map(k => k -> vec(k)).toMap
    probes.foreach { p =>
      val vp = vecs(p)
      val np = vp.values.map(w => BigInt(w) * w).sum
      val scoredAll = vecs.toSeq.filter(_._1 != p).flatMap { case (tok, vt) =>
        val shared = vp.keySet & vt.keySet
        if (shared.isEmpty) None else {
          val num = shared.toSeq.map(d => BigInt(vp(d)) * vt(d)).sum
          val nt = vt.values.map(w => BigInt(w) * w).sum
          Some((tok, shared.size, num, nt))
        }
      }
      val top = scoredAll.sortBy { case (tok, _, num, nt) =>
        (-(num * num / nt), tok) }.take(PpmiNeighbors)
      val pub = rows.filter(_.getAs[String]("probe") == p)
        .sortBy(_.getAs[Int]("neighbor_rank").toLong)
      assert(pub.length == math.min(PpmiNeighbors, top.length))
      pub.zip(top).foreach { case (r, (tok, nsh, num, nt)) =>
        assert(r.getAs[String]("neighbor") == tok,
          s"probe $p rank ${r.getAs[Int]("neighbor_rank")}: " +
            s"${r.getAs[String]("neighbor")} != $tok")
        assert(r.getAs[Long]("n_shared_dims") == nsh)
        val cos = num.toDouble / (math.sqrt(np.toDouble) * math.sqrt(nt.toDouble))
        assert(math.abs(r.getAs[Double]("cos_sim") - cos) < 1e-5)
      }
    }
  }

  test("q_rf_oob: per-tree stumps and OOB accuracies recompose from driver-side Poisson bags") {
    val sf = TestSession.sf
    val rows = graft.ml.FeatureOps.queries("q_rf_oob")(spark, sf).collect()
    assert(rows.length == 6)
    val trees = rows.filter(_.getAs[Long]("tree") > 0)
    val ens = rows.find(_.getAs[Long]("tree") == -1L).get
    // driver-side rebuild: exact Poisson weights from the md5 words
    val thr = Seq(0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
      0.9963401532, 0.9994058152, 0.9999167589)
    def pois(u: Double): Long = thr.indexWhere(u < _) match {
      case -1 => 7L; case i => i.toLong
    }
    def words(s: String): Seq[Long] = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 4).map(i => ((d(4 * i) & 0xffL) << 24) |
        ((d(4 * i + 1) & 0xffL) << 16) | ((d(4 * i + 2) & 0xffL) << 8) |
        (d(4 * i + 3) & 0xffL))
    }
    val data = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (ok, ln, v, y) =>
        val us = (words(s"$ok|${ln}_rf1") ++ words(s"$ok|${ln}_rf2"))
          .take(5).map(_ / 4294967296.0)
        (v, y, us.map(pois))
      }
    // per-tree stump replicated from the weighted histogram
    (0 until 5).foreach { t =>
      val r = trees.find(_.getAs[Long]("tree") == t + 1L).get
      val hist = data.groupBy(_._1).map { case (v, xs) =>
        (v, xs.map(_._3(t)).sum, xs.map(x => x._3(t) * x._2).sum,
          xs.count(_._3(t) == 0).toLong,
          xs.filter(_._3(t) == 0).map(_._2).sum)
      }.toSeq.sortBy(_._1)
      val nn = hist.map(_._2).sum; val npos = hist.map(_._3).sum
      val vmax = hist.filter(_._2 > 0).map(_._1).max
      var (slr, nl, pl) = (BigInt(0), 0L, 0L)
      val cands = hist.flatMap { case (v, nw, pw, _, _) =>
        slr += BigInt(pw) * nn - BigInt(npos) * nw; nl += nw; pl += pw
        if (v < vmax && nl > 0 && nn > nl) {
          val gain = (2 * slr * slr * nn + BigInt(nl) * (nn - nl)) /
            (2 * BigInt(nl) * (nn - nl))
          Some((v, gain, nl, pl))
        } else None
      }
      val (bt, _, bnl, bpl) = cands.maxBy { case (v, g, _, _) => (g, -v) }
      assert(r.getAs[Long]("threshold") == bt, s"tree ${t + 1} threshold")
      assert(r.getAs[Boolean]("left_pos") == (bpl * 2 > bnl))
      assert(r.getAs[Boolean]("right_pos") ==
        ((npos - bpl) * 2 > (nn - bnl)))
      // OOB accuracy on the w=0 rows
      val (lp, rp) = (r.getAs[Boolean]("left_pos"), r.getAs[Boolean]("right_pos"))
      val oob = data.filter(_._3(t) == 0)
      val correct = oob.count { case (v, y, _) =>
        val pred = if (v <= bt) lp else rp
        (y == 1L) == pred
      }
      assert(r.getAs[Long]("oob_n") == oob.length.toLong)
      val ppm = (2L * 1000000L * correct + oob.length) / (2L * oob.length)
      assert(r.getAs[Long]("oob_acc_ppm") == ppm, s"tree ${t + 1} oob acc")
    }
    // ensemble OOB: strict-majority vote of only the trees that
    // excluded the row; rows sampled by every tree are excluded
    val stumpDefs = trees.map(r => (r.getAs[Long]("tree").toInt - 1,
      r.getAs[Long]("threshold"), r.getAs[Boolean]("left_pos"),
      r.getAs[Boolean]("right_pos"))).sortBy(_._1)
    val oobRows = data.filter(_._3.contains(0L))
    val correctE = oobRows.count { case (v, y, ws) =>
      val votes = stumpDefs.filter(s => ws(s._1) == 0L)
        .map { case (_, t, lp, rp) => if (v <= t) lp else rp }
      val pred = votes.count(identity) * 2 > votes.length
      (y == 1L) == pred
    }
    assert(ens.getAs[Long]("oob_n") == oobRows.length.toLong)
    val ppmE = (2L * 1000000L * correctE + oobRows.length) /
      (2L * oobRows.length)
    assert(ens.getAs[Long]("oob_acc_ppm") == ppmE, "ensemble oob acc")
    // sanity floor: the ensemble must beat the majority-class baseline
    // on its OOB rows (the vote can't be worse than constant guessing)
    val basePos = oobRows.map(_._2).sum
    val baseAcc = math.max(basePos, oobRows.length - basePos) * 1000000L /
      oobRows.length
    assert(ens.getAs[Long]("oob_acc_ppm") >= baseAcc - 20000,
      s"ensemble OOB ${ens.getAs[Long]("oob_acc_ppm")} far below baseline $baseAcc")
  }

  test("q_ref_integrity: all seven FKs audited, clean corpus passes, counts match tables") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_ref_integrity")(spark, sf)
      .collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[String]("fk")).distinct.length == 7)
    // driver-generated corpus is referentially clean by construction
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"), s"${r.getAs[String]("fk")} not ok")
      assert(r.getAs[Long]("n_orphans") == 0L)
      assert(r.getAs[Long]("orphan_ppm") == 0L)
    }
    val liRows = Tables.lineitem(spark, sf).count()
    assert(rows.filter(_.getAs[String]("fk").startsWith("lineitem."))
      .forall(_.getAs[Long]("n_rows") == liRows))
    // the anti-join device actually detects a planted orphan: doctor
    // the parent set by dropping one order key — exactly that key's
    // lineitems must surface as orphans
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val k0 = o.select(col("o_orderkey")).orderBy(col("o_orderkey"))
      .as[Long].head()
    val doctored = o.filter(col("o_orderkey") =!= k0)
      .select(col("o_orderkey").as("l_orderkey")).distinct()
    val orphans = li.join(doctored, Seq("l_orderkey"), "left_anti").count()
    val expected = li.filter(col("l_orderkey") === k0).count()
    assert(expected > 0, "chosen order must have lineitems")
    assert(orphans == expected, s"planted $expected orphans, found $orphans")
  }

  test("q_negbin_fit: moments recompose from driver-side counts; verdict is the integer inequality") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_negbin_fit")(spark, sf)
      .collect().head
    val counts = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("c"))
      .as[(Long, Long)].collect().map(_._2)
    val n = counts.length
    val s = counts.map(BigInt(_)).sum
    val q = counts.map(c => BigInt(c) * c).sum
    val num = BigInt(n) * q - s * s
    assert(r.getAs[Long]("n_users") == n.toLong)
    assert(r.getAs[Long]("sum_c") == s.toLong)
    val mean = s.toDouble / n
    val vr = num.toDouble / (n.toDouble * (n - 1))
    assert(math.abs(r.getAs[Double]("mean_c") - mean) < 1e-5)
    assert(math.abs(r.getAs[Double]("var_c") - vr) < 1e-4)
    val over = num > BigInt(n - 1) * s
    assert(r.getAs[Boolean]("overdispersed") == over)
    if (over) {
      assert(math.abs(r.getAs[Double]("r_hat") - mean * mean / (vr - mean)) < 1e-3)
      assert(math.abs(r.getAs[Double]("p_hat") - mean / vr) < 1e-5)
    } else assert(r.isNullAt(r.fieldIndex("r_hat")))
  }

  test("q_cox_stuart: sign counts recompose from the driver-side day series") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_cox_stuart")(spark, sf)
      .collect().head
    val days = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rc"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val n = days.length
    val c = (n + 1) / 2
    val pairs = (0 until n - c).map(i => (days(i), days(i + c)))
    val up = pairs.count { case (a, b) => b > a }
    val down = pairs.count { case (a, b) => b < a }
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("s_up") == up.toLong, "s_up")
    assert(r.getAs[Long]("s_down") == down.toLong, "s_down")
    val nn = up + down
    val z = (2.0 * math.max(up, down) - nn - 1) / math.sqrt(nn.toDouble)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    val trend = if (z <= 1.96) "none"
      else if (up > down) "increasing" else "decreasing"
    assert(r.getAs[String]("trend") == trend)
  }

  test("q_bartlett: per-segment binned variances recompose; verdict keys on the chi-square table") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_bartlett")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val k = rows.head.getAs[Long]("k")
    assert(rows.length == k.toInt)
    val bins = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") / 100).cast("long"))
      .as[(String, Long)].collect()
    rows.foreach { r =>
      val seg = r.getAs[String]("seg")
      val xs = bins.filter(_._1 == seg).map(_._2)
      val n = xs.length
      val s = xs.map(BigInt(_)).sum
      val q = xs.map(x => BigInt(x) * x).sum
      val v = (BigInt(n) * q - s * s).toDouble / (n.toDouble * (n - 1))
      assert(r.getAs[Long]("n_g") == n.toLong)
      assert(math.abs(r.getAs[Double]("var_bins") - v) < 1e-3,
        s"$seg var ${r.getAs[Double]("var_bins")} vs $v")
      assert(r.getAs[Boolean]("heteroscedastic") ==
        (r.getAs[Double]("bartlett_stat") > r.getAs[Double]("chi2_crit")))
      assert(r.getAs[Double]("bartlett_stat") >= 0.0)
    }
  }

  test("q_kde: densities are non-negative and the grid mass is consistent with the histogram") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_kde")(spark, sf)
      .collect().sortBy(_.getAs[Long]("dollars"))
    assert(rows.length == 21)
    assert(rows.forall(_.getAs[Double]("density_e9") >= 0.0))
    // recompose one interior grid point driver-side
    val hist = Tables.orders(spark, sf)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val n = hist.map(_._2).sum
    val h = graft.operators.Validation.KdeBandwidth
    val g = rows(4).getAs[Long]("dollars").toDouble
    val mass = hist.map { case (b, c) =>
      val d = g - (b * 100 + 50)
      BigInt(c) * BigInt(math.round(math.exp(-d * d / (2 * h * h)) * 1e6))
    }.sum
    val dens = mass.toDouble / (n.toDouble * h * 2.5066282746310002 * 1e6) * 1e9
    assert(math.abs(rows(4).getAs[Double]("density_e9") - dens) < 1e-4)
    // a density peak exists where the data mass is (not all ~zero)
    assert(rows.map(_.getAs[Double]("density_e9")).max > 0.1)
  }

  test("q_hits: three HITS iterations recompose from the collected directed top-K graph") {
    val sf = TestSession.sf
    val rows = graft.operators.GraphOps.queries("q_hits")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hubs = rows.map(r => r.getAs[Long]("s_suppkey") ->
      r.getAs[Double]("hub")).toMap
    val auths = rows.map(r => r.getAs[Long]("s_suppkey") ->
      r.getAs[Double]("authority")).toMap
    assert(hubs.values.max <= 1.0 + 1e-9 && auths.values.max <= 1.0 + 1e-9)
    assert(hubs.values.exists(_ > 0.99) && auths.values.exists(_ > 0.99))
    // driver-side replay of the fixed point
    val g = graft.operators.GraphOps.queries("q_knn_graph")(spark, sf)
      .select(col("node"), col("nbr")).as[(Long, Long)].collect()
    def r10(x: Double) = BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    var h = g.map(_._1).distinct.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 3) {
      val aRaw = g.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h.getOrElse(e._1, 0.0)).sum }
      val aMax = aRaw.values.max
      a = aRaw.map { case (k, v) => k -> r10(v / aMax) }
      val hRaw = g.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => a.getOrElse(e._2, 0.0)).sum }
      val hMax = hRaw.values.max
      h = hRaw.map { case (k, v) => k -> r10(v / hMax) }
    }
    rows.foreach { r =>
      val node = r.getAs[Long]("s_suppkey")
      assert(math.abs(r.getAs[Double]("hub") - h.getOrElse(node, 0.0)) < 1e-4,
        s"hub($node)")
      assert(math.abs(r.getAs[Double]("authority") -
        a.getOrElse(node, 0.0)) < 1e-4, s"authority($node)")
    }
  }

  test("q_mips: inner-product top-5 recomposes brute-force and diverges from cosine where norms vary") {
    val sf = TestSession.sf
    val rows = graft.operators.Similarity.queries("q_mips")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val qv = vecs(q)
      val expected = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, dot(qv, v)) }
        .sortBy { case (id, d) => (-r6(d), id) }.take(5).map(_._1)
      val got = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("nid")).toSeq
      assert(got == expected, s"qid $q: $got != $expected")
    }
    // the dot/cosine identity holds cell-for-cell: dot = cos·‖q‖·‖v‖
    // (divergence of the two top-5 LISTS is corpus-dependent — on a
    // near-unit-norm corpus they legitimately coincide, so the strong
    // check is the identity plus the brute-force recomposition above)
    rows.take(20).foreach { r =>
      val (q, nid) = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      val d = dot(vecs(q), vecs(nid))
      val cos = d / (math.sqrt(dot(vecs(q), vecs(q))) *
        math.sqrt(dot(vecs(nid), vecs(nid))))
      assert(math.abs(r.getAs[Double]("dot") - d) < 1e-3)
      assert(cos <= 1.0 + 1e-9)
    }
  }

  test("q_turning_points: count recomposes from the driver-side day series") {
    val sf = TestSession.sf
    val r = graft.operators.AnalyticExt.queries("q_turning_points")(spark, sf)
      .collect().head
    val days = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rc"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val n = days.length
    val turning = (1 until n - 1).count(i =>
      (days(i) > days(i - 1) && days(i) > days(i + 1)) ||
        (days(i) < days(i - 1) && days(i) < days(i + 1)))
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("n_turning") == turning.toLong)
    val z = (turning - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29) / 90)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    assert(r.getAs[Boolean]("random_ok") == (math.abs(
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) <= 1.96))
  }

  test("q_lorenz_curve: monotone convex, decile 10 is the whole corpus, shares bracket Gini's complement") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_lorenz_curve")(spark, sf)
      .collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10)
    val shares = rows.map(_.getAs[Double]("rev_share"))
    val pops = rows.map(_.getAs[Double]("pop_share"))
    // monotone and convex (increments non-decreasing), under the diagonal
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a - 1e-9 })
    val inc = shares.head +: shares.zip(shares.tail).map { case (a, b) => b - a }
    assert(inc.zip(inc.tail).forall { case (a, b) => b >= a - 1e-6 },
      "Lorenz curve must be convex")
    rows.foreach { r =>
      assert(r.getAs[Double]("rev_share") <=
        r.getAs[Double]("pop_share") + 1e-9, "curve must sit under the diagonal")
    }
    assert(math.abs(pops.last - 1.0) < 1e-9)
    assert(math.abs(shares.last - 1.0) < 1e-6)
  }

  test("q_cvm_test: the integral statistic recomposes from driver-side binned ECDFs") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_cvm_test")(spark, sf)
      .collect().head
    val bins = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") / 100).cast("long"))
      .as[(String, Long)].collect()
    val hist = bins.groupBy(_._2).map { case (b, xs) =>
      (b, xs.count(_._1 == "BUILDING").toLong,
        xs.count(_._1 == "MACHINERY").toLong) }.toSeq.sortBy(_._1)
    val n1 = hist.map(_._2).sum; val n2 = hist.map(_._3).sum
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    var (ca, cb) = (0L, 0L)
    var s2 = BigInt(0)
    hist.foreach { case (_, na, nb) =>
      ca += na; cb += nb
      val num = BigInt(ca) * n2 - BigInt(cb) * n1
      val den = BigInt(n1) * n2
      val dmu = if (num >= 0) (2 * num * 1000000 + den) / (2 * den)
        else -((2 * -num * 1000000 + den) / (2 * den))
      s2 += BigInt(na + nb) * dmu * dmu
    }
    val t = n1.toDouble * n2 / ((n1 + n2).toDouble * (n1 + n2)) *
      (s2.toDouble / 1e12)
    assert(math.abs(r.getAs[Double]("cvm_t") - t) < 1e-5,
      s"cvm ${r.getAs[Double]("cvm_t")} vs $t")
    assert(r.getAs[Double]("cvm_t") >= 0.0)
    assert(r.getAs[Boolean]("significant") ==
      (r.getAs[Double]("cvm_t") > 0.461))
  }

  test("q_anderson_darling: A2 recomposes from driver-side binned ECDFs") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_anderson_darling")(spark, sf)
      .collect().head
    val bins = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") / 100).cast("long"))
      .as[(String, Long)].collect()
    val hist = bins.groupBy(_._2).map { case (b, xs) =>
      (b, xs.count(_._1 == "BUILDING").toLong,
        xs.count(_._1 == "MACHINERY").toLong) }.toSeq.sortBy(_._1)
    val n1 = hist.map(_._2).sum; val n2 = hist.map(_._3).sum
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    var (ma, mb) = (0L, 0L)
    var s = BigInt(0)
    var a2ref = 0.0 // unquantized Pettitt A2, independently assembled
    val nn = n1 + n2
    hist.foreach { case (_, na, nb) =>
      ma += na; mb += nb
      val bb = ma + mb
      if (bb < nn) {
        val e = BigInt(ma) * n2 - BigInt(mb) * n1
        val den = BigInt(n1) * n2
        val g = if (e >= 0) (2 * e * 1000000 + den) / (2 * den)
          else -((2 * -e * 1000000 + den) / (2 * den))
        val hden = BigInt(bb) * (nn - bb)
        s += (2 * (BigInt(na + nb) * g * g) * BigInt("1000000000000") +
          hden) / (2 * hden)
        a2ref += (na + nb).toDouble * e.toDouble * e.toDouble /
          (n1.toDouble * n2 * bb.toDouble * (nn - bb))
      }
    }
    val a2 = n1.toDouble * n2 / 1e12 * (s.toDouble / 1e12)
    assert(math.abs(r.getAs[Double]("ad_a2") - a2) < 1e-5,
      s"ad ${r.getAs[Double]("ad_a2")} vs $a2")
    // the quantized statistic must track the raw double-precision Pettitt
    // form (two µ-quantization stages bound the drift), and it must be a
    // non-vacuous magnitude — the r16 scale bug published 0.000000 forever
    assert(math.abs(r.getAs[Double]("ad_a2") - a2ref) < 1e-2,
      s"ad quantized ${r.getAs[Double]("ad_a2")} vs raw $a2ref")
    assert(r.getAs[Double]("ad_a2") > 0.01,
      s"ad_a2 ${r.getAs[Double]("ad_a2")} is vacuously small")
    assert(r.getAs[Boolean]("significant") ==
      (r.getAs[Double]("ad_a2") > 2.492))
  }

  test("q_mood_median: cells recompose and chi2 matches a driver-side fold") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_mood_median")(spark, sf)
      .collect()
    val data = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") / 100).cast("long"))
      .as[(String, Long)].collect()
    val sorted = data.map(_._2).sorted
    val n = sorted.length
    // the two middle order statistics, interpolated (quantile_cont
    // semantics recomposed over the bin domain)
    val med = (sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)) / 2.0
    val cells = data.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.count(_._2 > med).toLong, xs.count(_._2 <= med).toLong)) }
    rows.foreach { r =>
      val (ea, el) = (r.getAs[Long]("n_above"), r.getAs[Long]("n_le"))
      val c = cells(r.getAs[String]("seg"))
      assert(c == ((ea, el)), s"cells drift for ${r.get(0)}")
    }
    val ra = cells.values.map(_._1).sum.toDouble
    val rl = cells.values.map(_._2).sum.toDouble
    val nn = ra + rl
    val chi2 = cells.values.map { case (a, l) =>
      val nj = a + l
      val ea = ra * nj / nn; val el = rl * nj / nn
      BigDecimal((a - ea) * (a - ea) / ea)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble +
        BigDecimal((l - el) * (l - el) / el)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum
    assert(math.abs(rows.head.getAs[Double]("chi2") - chi2) < 1e-4,
      s"chi2 ${rows.head.getAs[Double]("chi2")} vs $chi2")
    assert(rows.head.getAs[Long]("dof") == cells.size - 1)
  }

  test("q_wilcoxon_signed: doubled rank sums partition n(n+1) and z recomposes") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_wilcoxon_signed")(spark, sf)
      .collect().head
    val n = r.getAs[Long]("n_pairs")
    val wp = BigInt(r.getAs[String]("w2_plus"))
    val wm = BigInt(r.getAs[String]("w2_minus"))
    // doubled ranks over n items sum to 2·n(n+1)/2 = n(n+1)
    assert(wp + wm == BigInt(n) * (n + 1), s"rank mass $wp + $wm != n(n+1)")
    val tc = BigInt(r.getAs[String]("tie_term"))
    val z = ((wp * 2 - BigInt(n) * (n + 1)).toDouble / 4.0) /
      math.sqrt((2.0 * n * (n + 1) * (2 * n + 1) - tc.toDouble) / 48.0)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    assert(r.getAs[Boolean]("significant") ==
      (math.abs(r.getAs[Double]("z")) > 1.96))
  }

  test("q_atkinson: index recomposes from driver-side quantized logs and sits in [0,1)") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_atkinson")(spark, sf)
      .collect().head
    val cents = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long"))
      .as[Long].collect().filter(_ > 0)
    val n = cents.length.toLong
    assert(r.getAs[Long]("n") == n)
    val l = cents.map(c => math.round(math.log(c.toDouble) * 1e6)).sum
    val s = cents.map(BigInt(_)).sum
    val a = 1.0 - math.exp(l.toDouble / n / 1e6) / (s.toDouble / n)
    assert(math.abs(r.getAs[Double]("atkinson_e1") - a) < 1e-5)
    val v = r.getAs[Double]("atkinson_e1")
    assert(v >= 0.0 && v < 1.0, s"atkinson $v out of [0,1)")
  }

  test("q_hapax: per-source counts recompose from raw tokens") {
    val sf = TestSession.sf
    import graft.functions.TextFunctions.tokens
    val rows = graft.operators.TextAnalysis.queries("q_hapax")(spark, sf)
      .collect()
    val toks = Tables.documents(spark, sf)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .as[(String, String)].collect()
    val bySource = toks.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val counts = bySource(src).groupBy(_._2).map(_._2.length)
      assert(r.getAs[Long]("n_tokens") == counts.sum)
      assert(r.getAs[Long]("n_types") == counts.size)
      assert(r.getAs[Long]("n_hapax") == counts.count(_ == 1))
      assert(r.getAs[Long]("n_dis") == counts.count(_ == 2))
    }
  }

  test("q_moran_i: statistic recomposes from driver-side quantized deviations") {
    val sf = TestSession.sf
    val r = graft.operators.GraphOps.queries("q_moran_i")(spark, sf)
      .collect().head
    val edges = graft.operators.GraphOps.mutualKnnPairs(spark, sf)
      .select("src", "dst").as[(Long, Long)].collect()
    val bal = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), round(col("s_acctbal") * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    assert(r.getAs[Long]("n_nodes") == n)
    assert(r.getAs[Long]("n_edges") == edges.length.toLong)
    val sx = nodes.map(bal).sum
    def zk(x: Long): Long = {
      val zz = BigInt(x) * n - sx
      val q = if (zz >= 0) (2 * 1000 * zz + n) / (2 * BigInt(n))
        else -((2 * 1000 * -zz + n) / (2 * BigInt(n)))
      q.toLong
    }
    val zkm = nodes.map(u => u -> zk(bal(u))).toMap
    val num = edges.map { case (u, v) => BigInt(zkm(u)) * zkm(v) * 2 }.sum
    val den = nodes.map(u => BigInt(zkm(u)) * zkm(u)).sum
    val i = n.toDouble * num.toDouble /
      (edges.length.toDouble * 2 * den.toDouble)
    assert(math.abs(r.getAs[Double]("moran_i") - i) < 1e-5,
      s"moran ${r.getAs[Double]("moran_i")} vs $i")
  }

  test("q_gopher_rules: rule counts recompose; mark-dependent rules pass vacuously here") {
    val sf = TestSession.sf
    import graft.functions.TextFunctions.tokens
    val rows = graft.operators.TextAnalysis.queries("q_gopher_rules")(spark, sf)
      .collect()
    // the synthetic corpus has no '#', '...', bullets or newlines —
    // those rules must pass every doc (pins the vacuous-pass claim)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_r_sym") == n)
      assert(r.getAs[Long]("n_r_bullet") == n)
      assert(r.getAs[Long]("n_r_ellip") == n)
      assert(r.getAs[Long]("n_pass") <= n)
    }
    // word-count and stopword rules recompose from raw tokens
    val docs = Tables.documents(spark, sf)
      .select(col("source"), tokens(col("text")))
      .as[(String, Seq[String])].collect()
    val stop = graft.operators.TextAnalysis.stopwords("en").toSet
    val bySource = docs.groupBy(_._1)
    rows.foreach { r =>
      val ds = bySource(r.getAs[String]("source")).map(_._2)
      assert(r.getAs[Long]("n_r_wc") ==
        ds.count(t => t.size >= 50 && t.size <= 100000))
      assert(r.getAs[Long]("n_r_stop") == ds.count(_.count(stop) >= 2))
    }
  }

  test("q_dsir_weights: per-source means recompose from a driver-side bucket model") {
    val sf = TestSession.sf
    import graft.functions.TextFunctions.tokens
    val rows = graft.operators.TrainingOps.queries("q_dsir_weights")(spark, sf)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_logw_mu"),
          r.getAs[Long]("pos_docs"))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), tokens(col("text")))
      .as[(String, Long, Seq[String])].collect()
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val stream = docs.flatMap { case (s, id, ts) =>
      ts.filter(_.nonEmpty).map(t => (s, id, bucket(t))) }
    val tgt = docs.groupBy(_._1).toSeq
      .sortBy { case (s, d) => (-d.length, s) }.head._1
    val cr = stream.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val ct = stream.filter(_._1 == tgt).groupBy(_._3)
      .map { case (b, xs) => b -> xs.length.toLong }
    val st = cr.keys.toSeq.map(b => ct.getOrElse(b, 0L) + 1).sum
    val sr = cr.values.toSeq.map(_ + 1).sum
    val lr = cr.keys.toSeq.map { b =>
      b -> (math.round(math.log((ct.getOrElse(b, 0L) + 1).toDouble / st) * 1e6) -
        math.round(math.log((cr(b) + 1).toDouble / sr) * 1e6))
    }.toMap
    val perDoc = stream.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((s, _), xs) => s -> xs.map(x => lr(x._3)).sum }
    perDoc.groupBy(_._1).foreach { case (s, ws) =>
      val (n, mean, pos) = rows(s)
      assert(n == ws.size)
      assert(pos == ws.count(_._2 > 0))
      val sw = ws.map(w => BigInt(w._2)).sum
      val expMean = if (sw >= 0) (2 * sw + n) / (2 * BigInt(n))
        else -((2 * -sw + n) / (2 * BigInt(n)))
      assert(BigInt(mean) == expMean, s"source $s mean $mean != $expMean")
    }
  }

  test("q_page_trend: L recomposes from driver-side block ranks; z from closed forms") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_page_trend")(spark, sf)
      .collect().head
    val cells = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), month(col("o_orderdate")))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .as[(Int, Int, Long)].collect()
    val byNation = cells.groupBy(_._1).filter(_._2.length == 12)
    assert(r.getAs[Long]("n_blocks") == byNation.size)
    var l = 0L
    byNation.values.foreach { ms =>
      val ranked = ms.sortBy(m => (m._3, m._2)).zipWithIndex
      ranked.foreach { case ((_, mo, _), i) => l += mo.toLong * (i + 1) }
    }
    assert(r.getAs[Long]("l_stat") == l, s"L ${r.getAs[Long]("l_stat")} vs $l")
    val n = byNation.size
    val z = (l - n * 507L).toDouble / math.sqrt(n * 1859.0)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
  }

  test("q_breusch_pagan: LM recomposes from driver-side coefficient anchoring") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_breusch_pagan")(spark, sf)
      .collect().map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n"), r.getAs[Double]("bp_lm"))).toMap
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long, Long)].collect()
    data.groupBy(_._1).foreach { case (flag, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(v => BigInt(v._2)).sum
      val sy = xs.map(v => BigInt(v._3)).sum
      val sxx = xs.map(v => BigInt(v._2) * v._2).sum
      val sxy = xs.map(v => BigInt(v._2) * v._3).sum
      val b = BigDecimal((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val a = BigDecimal((sy.toDouble - b * sx.toDouble) / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val es = xs.map { case (_, x, y) =>
        math.round((y.toDouble - a - b * x.toDouble) / 100.0) }
      val zs = es.map(e => BigInt(e) * e)
      val sz = zs.sum
      val sxz = xs.map(_._2).zip(zs).map { case (x, z) => BigInt(x) * z }.sum
      val szz = zs.map(z => z * z).sum
      val lm = math.pow(n.toDouble * sxz.toDouble - sx.toDouble * sz.toDouble, 2) /
        ((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (n.toDouble * szz.toDouble - sz.toDouble * sz.toDouble)) * n.toDouble
      assert(rows(flag)._1 == n)
      assert(math.abs(rows(flag)._2 - lm) < 1e-4,
        s"flag $flag lm ${rows(flag)._2} vs $lm")
    }
  }

  test("q_context_len: windows reconcile and widen monotonically") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_context_len")(spark, sf)
      .collect().map(r => r.getAs[Long]("window") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_fit"),
          r.getAs[Long]("n_trunc"), r.getAs[Long]("tok_total"),
          r.getAs[Long]("tok_lost"))).toMap
    assert(rows.keySet == Set(512L, 2048L, 8192L))
    rows.foreach { case (_, (nd, fit, tr, tot, lost)) =>
      assert(fit + tr == nd)
      assert(lost <= tot)
    }
    // a wider window fits at least as many docs and loses no more mass
    val ws = Seq(512L, 2048L, 8192L)
    ws.sliding(2).foreach { case Seq(a, b) =>
      assert(rows(b)._2 >= rows(a)._2)
      assert(rows(b)._5 <= rows(a)._5)
    }
  }

  test("q_hill_tail: alpha recomposes from the driver-side top-201 order statistics") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_hill_tail")(spark, sf)
      .collect().head
    val cents = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long"),
        col("o_orderkey"))
      .as[(Long, Long)].collect()
      .sortBy { case (c, k) => (-c, k) }.take(201).map(_._1)
    assert(r.getAs[Long]("x_ref_cents") == cents.last)
    val lref = math.round(math.log(cents.last.toDouble) * 1e6)
    val sumd = cents.init
      .map(c => math.round(math.log(c.toDouble) * 1e6) - lref).sum
    assert(r.getAs[Long]("sum_dmu") == sumd)
    val alpha = 200.0 * 1e6 / sumd
    assert(math.abs(r.getAs[Double]("hill_alpha") - alpha) < 1e-5)
  }

  test("q_mixture_entropy: H recomposes and effective sources sit in [1, |sources|]") {
    val sf = TestSession.sf
    import graft.functions.TextFunctions.tokens
    val rows = graft.operators.TrainingOps.queries("q_mixture_entropy")(spark, sf)
      .collect()
    val mass = Tables.documents(spark, sf)
      .select(col("source"), size(tokens(col("text"))).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val t = mass.values.sum
    val lnt = math.round(math.log(t.toDouble) * 1e6)
    var hsum = 0L
    rows.foreach { r =>
      val m = mass(r.getAs[String]("source"))
      assert(r.getAs[Long]("tok_mass") == m)
      val lnm = math.round(math.log(m.toDouble) * 1e6)
      val term = (2 * BigInt(m) * (lnt - lnm) * 1000000 + t) / (2 * BigInt(t))
      assert(BigInt(r.getAs[Long]("h_term")) == term,
        s"${r.getAs[String]("source")} term drift")
      hsum += term.toLong
    }
    val h = rows.head.getAs[Double]("entropy")
    assert(math.abs(h - hsum.toDouble / 1e12) < 1e-5)
    val eff = rows.head.getAs[Double]("effective_sources")
    assert(eff >= 1.0 && eff <= mass.size + 1e-9)
    assert(math.abs(eff - math.exp(hsum.toDouble / 1e12)) < 1e-3)
  }

  test("q_table_profile: stats recompose for the lineitem columns") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_table_profile")(spark, sf)
      .filter(col("tbl") === "lineitem")
      .collect().map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("ndv"), r.getAs[String]("min_val"),
          r.getAs[String]("max_val"))).toMap
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"))
      .as[(Long, String, Long)].collect()
    val q = li.map(_._1)
    assert(rows("l_quantity") ==
      ((li.length.toLong, 0L, q.distinct.length.toLong,
        q.min.toString, q.max.toString)))
    val f = li.map(_._2)
    assert(rows("l_returnflag")._3 == f.distinct.length)
    assert(rows("l_returnflag")._4 == f.min && rows("l_returnflag")._5 == f.max)
    val p = li.map(_._3)
    assert(rows("l_price_c")._3 == p.distinct.length.toLong)
    assert(rows("l_price_c")._4 == p.min.toString)
  }

  test("q_leverage_audit: flags recompose from integer moments; h_max bounds hold") {
    val sf = TestSession.sf
    val rows = graft.ml.FeatureOps.queries("q_leverage_audit")(spark, sf)
      .collect().map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_high"),
          r.getAs[Double]("h_max"))).toMap
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .as[(String, Long)].collect()
    data.groupBy(_._1).foreach { case (flag, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(v => BigInt(v._2)).sum
      val sxx = xs.map(v => BigInt(v._2) * v._2).sum
      val sc = n * sxx - sx * sx
      val nHigh = xs.count { case (_, x) =>
        val d = BigInt(n) * x - sx; d * d > sc * 3 }
      val (qn, qh, hm) = rows(flag)
      assert(qn == n && qh == nHigh, s"$flag: $qh vs $nHigh")
      // leverage is bounded by (1/n, 1]
      assert(hm > 1.0 / n - 1e-12 && hm <= 1.0 + 1e-9)
      val d2max = xs.map { case (_, x) =>
        val d = BigInt(n) * x - sx; d * d }.max
      val expectH = 1.0 / n + d2max.toDouble / (n.toDouble * sc.toDouble)
      assert(math.abs(hm - expectH) < 1e-5)
    }
  }

  test("q_anisotropy: per-label index recomposes from quantized component sums") {
    val sf = TestSession.sf
    val rows = graft.operators.Similarity.queries("q_anisotropy")(spark, sf)
      .collect()
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val byLabel = vecs.groupBy(_._1)
    rows.foreach { r =>
      val vs = byLabel(r.getAs[Long]("label")).map(_._2)
      val n = vs.length.toLong
      assert(r.getAs[Long]("n_vectors") == n)
      val dims = vs.head.length
      val sums = Array.fill(dims)(BigInt(0))
      vs.foreach { v =>
        val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
        v.zipWithIndex.foreach { case (x, d) =>
          sums(d) += BigInt(math.round(x / nrm * 1e9)) }
      }
      val ssq = sums.map(s => s * s).sum
      val anis = (ssq.toDouble / 1e18 - n) / (n.toDouble * (n - 1))
      assert(math.abs(r.getAs[Double]("anisotropy") - anis) < 1e-5,
        s"label ${r.getAs[Long]("label")}: ${r.getAs[Double]("anisotropy")} vs $anis")
      // expected pairwise cosine lives in [-1/(n-1), 1]
      assert(r.getAs[Double]("anisotropy") >= -1.0 / (n - 1) - 1e-9)
      assert(r.getAs[Double]("anisotropy") <= 1.0 + 1e-9)
    }
  }

  test("q_price_elasticity: moments recompose from driver-side quantized logs") {
    val sf = TestSession.sf
    val rows = graft.ml.FeatureOps.queries("q_price_elasticity")(spark, sf)
      .collect()
    assert(rows.length > 0 && rows.length <= 25)
    val data = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .as[(String, Long, Long)].collect()
    val byBrand = data.groupBy(_._1)
    rows.foreach { r =>
      val xs = byBrand(r.getAs[String]("brand")).map { case (_, ec, qty) =>
        val pq = math.round(math.log(ec.toDouble) * 1e6)
        val qq = math.round(math.log(qty.toDouble) * 1e6)
        (pq - qq, qq)
      }
      val n = BigInt(xs.length)
      val sx = xs.map(t => BigInt(t._1)).sum
      val sy = xs.map(t => BigInt(t._2)).sum
      val sxy = xs.map(t => BigInt(t._1) * t._2).sum
      val sxx = xs.map(t => BigInt(t._1) * t._1).sum
      val num = n * sxy - sx * sy
      val dx = n * sxx - sx * sx
      assert(r.getAs[Long]("n") == xs.length.toLong)
      if (dx > 0) {
        val el = num.toDouble / dx.toDouble
        assert(math.abs(r.getAs[Double]("elasticity") - el) < 1e-4,
          s"${r.getAs[String]("brand")}")
        val r2 = r.getAs[Double]("r2")
        assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9)
      }
    }
  }

  // ------------------------------------------------------------ r17 wave

  test("q_grubbs: G recomposes from exact driver-side moments, verdict consistent") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_grubbs")(spark, sf)
      .collect().head
    val cents = Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long"))
      .as[Long].collect()
    val n = BigInt(cents.length)
    val s = cents.map(BigInt(_)).sum
    val s2 = cents.map(c => BigInt(c) * c).sum
    val devNum = (BigInt(cents.max) * n - s).max(s - BigInt(cents.min) * n)
    val g = (devNum.toDouble / n.toDouble) /
      math.sqrt((n * s2 - s * s).toDouble /
        (n.toDouble * (n.toDouble - 1)))
    assert(r.getAs[Long]("n") == cents.length.toLong)
    assert(r.getAs[Long]("max_cents") == cents.max)
    assert(math.abs(r.getAs[Double]("g") - g) < 1e-5,
      s"grubbs ${r.getAs[Double]("g")} vs $g")
    assert(r.getAs[Boolean]("extreme") == (r.getAs[Double]("g") > 4.0))
  }

  test("q_chow_test: F recomposes from exact per-segment moment sums") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_chow_test")(spark, sf)
      .collect().head
    val rows = Tables.orders(spark, sf).select(
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long"),
      round(col("o_totalprice") * 100).cast("long"),
      (col("o_orderdate").cast("date") < lit("1998-01-01").cast("date")))
      .as[(Long, Long, Boolean)].collect()
    def ssr(xs: Array[(Long, Long, Boolean)]): Double = {
      val n = BigInt(xs.length)
      val sx = xs.map(t => BigInt(t._1)).sum
      val sy = xs.map(t => BigInt(t._2)).sum
      val sxx = xs.map(t => BigInt(t._1) * t._1).sum
      val sxy = xs.map(t => BigInt(t._1) * t._2).sum
      val syy = xs.map(t => BigInt(t._2) * t._2).sum
      val nd = n.toDouble
      val cxx = sxx.toDouble - sx.toDouble * sx.toDouble / nd
      val cxy = sxy.toDouble - sx.toDouble * sy.toDouble / nd
      val cyy = syy.toDouble - sy.toDouble * sy.toDouble / nd
      if (cxx <= 0) cyy else cyy - cxy * cxy / cxx
    }
    val (pre, post) = rows.partition(_._3)
    val f = ((ssr(rows) - ssr(pre) - ssr(post)) / 2.0) /
      ((ssr(pre) + ssr(post)) / (rows.length.toDouble - 4.0))
    assert(r.getAs[Long]("n_pre") == pre.length.toLong)
    assert(r.getAs[Long]("n_post") == post.length.toLong)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-4,
      s"chow ${r.getAs[Double]("f_stat")} vs $f")
    assert(r.getAs[Boolean]("break_detected") ==
      (r.getAs[Double]("f_stat") > 3.0))
  }

  test("q_cliffs_delta: delta matches a driver-side all-pairs count on the binned values") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_cliffs_delta")(spark, sf)
      .collect().head
    val data = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") / 100).cast("long"))
      .as[(String, Long)].collect()
    val a = data.filter(_._1 == "BUILDING").map(_._2)
    val b = data.filter(_._1 == "MACHINERY").map(_._2)
    // brute force is O(n1·n2) — fine at the smallest SF only
    var gt = BigInt(0); var lt = BigInt(0)
    // count via sorted b + binary search to keep the spec fast
    val bs = b.sorted
    def lowerBound(x: Long): Int = {
      var lo = 0; var hi = bs.length
      while (lo < hi) { val m = (lo + hi) >>> 1
        if (bs(m) < x) lo = m + 1 else hi = m }
      lo
    }
    def upperBound(x: Long): Int = {
      var lo = 0; var hi = bs.length
      while (lo < hi) { val m = (lo + hi) >>> 1
        if (bs(m) <= x) lo = m + 1 else hi = m }
      lo
    }
    a.foreach { x =>
      gt += lowerBound(x)
      lt += bs.length - upperBound(x)
    }
    assert(BigInt(r.getAs[String]("pairs_gt")) == gt)
    assert(BigInt(r.getAs[String]("pairs_lt")) == lt)
    val delta = (gt.toDouble - lt.toDouble) /
      (a.length.toDouble * b.length.toDouble)
    assert(math.abs(r.getAs[Double]("delta") - delta) < 1e-5)
    val mag = math.abs(r.getAs[Double]("delta"))
    val expect = if (mag < 0.147) "negligible" else if (mag < 0.33) "small"
      else if (mag < 0.474) "medium" else "large"
    assert(r.getAs[String]("magnitude") == expect)
  }

  test("q_kpss: eta recomposes from exact partial sums and Bartlett autocovariances") {
    val sf = TestSession.sf
    val r = graft.operators.TemporalOps.queries("q_kpss")(spark, sf)
      .collect().head
    val daily = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("day")).as[(Int, Long)].collect().map(_._2)
    val L = 7
    val n = BigInt(daily.length)
    val s = daily.map(BigInt(_)).sum
    val m = (2 * s + n) / (2 * n) // halfUp (all-positive revenue)
    val d = daily.map(BigInt(_) - m)
    val st = d.scanLeft(BigInt(0))(_ + _).tail
    val num = st.map(x => x * x).sum
    val c = (0 to L).map(j =>
      (j until d.length).map(t => d(t) * d(t - j)).sum)
    val lrvNum = BigInt(L + 1) * c(0) +
      (1 to L).map(j => BigInt(2 * (L + 1 - j)) * c(j)).sum
    val eta = num.toDouble * (L + 1) / (daily.length.toDouble * lrvNum.toDouble)
    assert(r.getAs[Long]("n_days") == daily.length.toLong)
    assert(math.abs(r.getAs[Double]("eta") - eta) < 1e-5,
      s"kpss ${r.getAs[Double]("eta")} vs $eta")
    assert(r.getAs[Boolean]("stationary") == (r.getAs[Double]("eta") < 0.463))
  }

  test("q_ece: folds the q_calibration reliability diagram exactly") {
    val sf = TestSession.sf
    val r = graft.ml.FeatureOps.queries("q_ece")(spark, sf).collect().head
    // cross-query consistency: ECE/MCE must be the µ-quantized fold of
    // the ORACLE-CHECKED per-bin diagram — no independent scoring path
    val bins = graft.ml.FeatureOps.queries("q_calibration")(spark, sf)
      .select(col("n"),
        round(abs(col("mean_score") - col("frac_pos")) * 1e6).cast("long"))
      .as[(Long, Long)].collect()
    val nDocs = bins.map(_._1).sum
    val sw = bins.map(t => BigInt(t._1) * t._2).sum
    val ece = sw.toDouble / (nDocs.toDouble * 1e6)
    val mce = bins.map(_._2).max.toDouble / 1e6
    assert(r.getAs[Long]("n_docs") == nDocs)
    assert(r.getAs[Long]("n_bins") == bins.length.toLong)
    assert(math.abs(r.getAs[Double]("ece") - ece) < 1e-6)
    assert(math.abs(r.getAs[Double]("mce") - mce) < 1e-6)
    assert(r.getAs[Double]("mce") >= r.getAs[Double]("ece") - 1e-9,
      "MCE must dominate the weighted mean gap")
  }

  test("q_uplift: arm assignment and per-segment means recompose driver-side") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_uplift")(spark, sf)
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    val spend = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      .as[(Long, Long)].collect()
    val segOf = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .as[(Long, String)].collect().toMap
    def arm(u: Long): String = {
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(u.toString).substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "treat" else "ctrl"
    }
    val bySeg = spend.filter(t => segOf.contains(t._1))
      .groupBy(t => segOf(t._1))
    bySeg.foreach { case (seg, us) =>
      val r = rows(seg)
      val t = us.filter(u => arm(u._1) == "treat")
      val c = us.filter(u => arm(u._1) == "ctrl")
      assert(r.getAs[Long]("n_t") == t.length.toLong, s"$seg n_t")
      assert(r.getAs[Long]("n_c") == c.length.toLong, s"$seg n_c")
      if (t.nonEmpty && c.nonEmpty) {
        val up = t.map(x => BigInt(x._2)).sum.toDouble / t.length / 100.0 -
          c.map(x => BigInt(x._2)).sum.toDouble / c.length / 100.0
        assert(math.abs(r.getAs[Double]("uplift") - up) < 1e-5, s"$seg uplift")
      }
    }
    assert(rows.keySet == bySeg.keySet, "segment coverage drift")
  }

  test("q_ngram_novelty: decile 0 is all-novel and first-seen counts partition the distinct grams") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_ngram_novelty")(spark, sf)
      .collect().map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("n_first_seen"), r.getAs[Long]("novelty_ppm")))
    assert(rows.nonEmpty)
    val d0 = rows.find(_._1 == 0L).get
    assert(d0._4 == 1000000L, "every decile-0 gram is by definition first-seen")
    rows.foreach { case (dec, nd, nf, _) =>
      assert(nf <= nd, s"decile $dec: first_seen > distinct")
    }
    // Σ first-seen over deciles = the corpus's distinct gram count
    // (each distinct gram is first-seen exactly once)
    val n = graft.operators.TrainingOps.NoveltyN
    val totalDistinct = Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> md5(concat_ws(' ', slice(toks, i, $n))))")).as("g"))
      .agg(countDistinct(col("g"))).as[Long].collect().head
    assert(rows.map(_._3).sum == totalDistinct,
      s"first-seen mass ${rows.map(_._3).sum} != distinct grams $totalDistinct")
  }

  test("q_span_corruption_plan: per-source identities hold exactly") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps
      .queries("q_span_corruption_plan")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (tok, spans, corr) = (r.getAs[Long]("tok_total"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("tok_corrupted"))
      assert(r.getAs[Long]("input_total") == tok - corr + spans, s"$src input")
      assert(r.getAs[Long]("target_total") ==
        corr + spans + r.getAs[Long]("n_docs"), s"$src target")
      assert(corr <= tok, s"$src corrupted > tokens")
      assert(spans >= r.getAs[Long]("n_docs"),
        s"$src every doc plans at least one span")
      val ppm = r.getAs[Long]("corruption_ppm")
      // rate 15% at mean span 3 → halfUp(n/20)·3/n clusters near 15%
      assert(ppm > 100000L && ppm < 200000L, s"$src corruption_ppm $ppm")
    }
  }

  test("q_ann_binary: ranks well-formed, recall floor holds on the panel") {
    val sf = "/root/testdata/sf0.01" // panel too sparse at sf0.001
    val rows = graft.operators.Similarity.queries("q_ann_binary")(spark, sf)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length),
        s"qid $q ranks")
      rs.foreach(r => assert(math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-9))
    }
    val recalls = rows.map(_.getAs[Double]("recall_at_5")).distinct
    val mean = byQ.map { case (_, rs) => rs.head.getAs[Double]("recall_at_5") }
    assert(mean.sum / mean.size >= 0.6,
      s"mean recall ${mean.sum / mean.size} below the binary-sketch floor")
  }

  test("q_dunn_test: pairwise z recomposes from the driver-side rank histogram") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_dunn_test")(spark, sf)
      .collect()
    assert(rows.length == 10, "5 segments -> 10 pairs")
    val data = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), floor(col("o_totalprice") / 100).cast("long"))
      .as[(String, Long)].collect()
    val byBin = data.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bins = byBin.keys.toSeq.sorted
    val cumt = bins.scanLeft(0L)((acc, b) => acc + byBin(b)).init
    val cumOf = bins.zip(cumt).toMap
    // doubled tie-average rank per bin: 2·cum_below + t + 1
    val rank2 = bins.map(b => b -> (2 * cumOf(b) + byBin(b) + 1)).toMap
    val grp = data.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(t => BigInt(rank2(t._2))).sum)
    }.toMap
    val n = data.length.toLong
    val tsum = byBin.values.map(t => BigInt(t) * t * t - t).sum
    val v = (n.toDouble * (n + 1) - tsum.toDouble / (n.toDouble - 1)) / 12.0
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"))
      assert(sa < sb)
      val (na, r2a) = grp(sa); val (nb, r2b) = grp(sb)
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      val z = (r2a.toDouble / (na.toDouble * 2) -
        r2b.toDouble / (nb.toDouble * 2)) /
        math.sqrt(v * (1.0 / na + 1.0 / nb))
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-5, s"$sa-$sb z")
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(r.getAs[Double]("z")) > 2.807))
    }
  }

  test("q_lin_ccc: CCC recomposes from exact moments and is dominated by |r|") {
    val sf = TestSession.sf
    val r = graft.operators.Validation.queries("q_lin_ccc")(spark, sf)
      .collect().head
    val xy = Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    val detail = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")) * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => BigInt(t._2)).sum).toMap
    val pairs = detail.toSeq.collect { case (k, y) if xy.contains(k) =>
      (BigInt(xy(k)), y) }
    val n = BigInt(pairs.length)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(t => t._1 * t._2).sum
    val sxx = pairs.map(t => t._1 * t._1).sum
    val syy = pairs.map(t => t._2 * t._2).sum
    val cxy = n * sxy - sx * sy
    val cxx = n * sxx - sx * sx; val cyy = n * syy - sy * sy
    val ccc = 2.0 * cxy.toDouble /
      (cxx.toDouble + cyy.toDouble + ((sx - sy) * (sx - sy)).toDouble)
    assert(r.getAs[Long]("n") == pairs.length.toLong)
    assert(math.abs(r.getAs[Double]("ccc") - ccc) < 1e-5)
    assert(math.abs(r.getAs[Double]("ccc")) <=
      math.abs(r.getAs[Double]("pearson_r")) + 1e-6,
      "CCC can never exceed |r| in magnitude")
    assert(r.getAs[Boolean]("consistent") == (r.getAs[Double]("ccc") > 0.99))
  }

  test("q_dispersion: variance-to-mean ratio recomposes from day counts") {
    val sf = TestSession.sf
    val rows = graft.operators.Validation.queries("q_dispersion")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("(ts DIV 1000000000) DIV 86400").cast("long").as("day"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    rows.foreach { r =>
      val cs = daily(r.getAs[String]("event_type"))
      val n = BigInt(cs.length); val s = cs.map(BigInt(_)).sum
      val s2 = cs.map(c => BigInt(c) * c).sum
      val d = (n * s2 - s * s).toDouble / ((n.toDouble - 1) * s.toDouble)
      assert(r.getAs[Long]("n_days") == cs.length.toLong)
      assert(math.abs(r.getAs[Double]("dispersion") - d) < 1e-5)
      val z = (d - 1) * math.sqrt((n.toDouble - 1) / 2.0)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-4)
      assert(r.getAs[Boolean]("overdispersed") == (r.getAs[Double]("z") > 1.96))
    }
  }

  test("q_arch_lm: LM recomposes from the quantized squared-shock series") {
    val sf = TestSession.sf
    val r = graft.operators.TemporalOps.queries("q_arch_lm")(spark, sf)
      .collect().head
    val daily = Tables.orders(spark, sf)
      .groupBy(datediff(col("o_orderdate"), lit("1970-01-01")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("day")).as[(Int, Long)].collect().map(_._2)
    val diffs = daily.sliding(2).map(p => BigInt(p(1) - p(0))).toArray
    val nr = BigInt(diffs.length); val sr = diffs.sum
    val m = if (sr >= 0) (2 * sr + nr) / (2 * nr)
      else -((2 * -sr + nr) / (2 * nr))
    val u = diffs.map { rr =>
      val e = rr - m; (2 * e * e + 1000000) / 2000000
    }
    val pairs = u.sliding(2).map(p => (p(0), p(1))).toArray
    val n = BigInt(pairs.length)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(t => t._1 * t._2).sum
    val sxx = pairs.map(t => t._1 * t._1).sum
    val syy = pairs.map(t => t._2 * t._2).sum
    val cxy = n * sxy - sx * sy
    val cxx = n * sxx - sx * sx; val cyy = n * syy - sy * sy
    val lm = n.toDouble * (cxy.toDouble * cxy.toDouble) /
      (cxx.toDouble * cyy.toDouble)
    assert(r.getAs[Long]("n_obs") == pairs.length.toLong)
    assert(math.abs(r.getAs[Double]("lm_stat") - lm) < 1e-4,
      s"arch ${r.getAs[Double]("lm_stat")} vs $lm")
    assert(r.getAs[Boolean]("arch_present") ==
      (r.getAs[Double]("lm_stat") > 3.841))
  }

  test("q_bipartite_stats: counts recompose from the distinct incidence set") {
    val sf = TestSession.sf
    val r = graft.operators.GraphOps.queries("q_bipartite_stats")(spark, sf)
      .collect().head
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .as[(Long, Long)].collect()
    val pd = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val sd = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(r.getAs[Long]("n_parts") == pd.size.toLong)
    assert(r.getAs[Long]("n_suppliers") == sd.size.toLong)
    assert(r.getAs[Long]("n_edges") == pairs.length.toLong)
    assert(r.getAs[Long]("max_part_degree") == pd.values.max)
    assert(r.getAs[Long]("max_supp_degree") == sd.values.max)
    val proj = pd.values.map(d => BigInt(d) * (d - 1)).sum
    assert(BigInt(r.getAs[String]("proj_pairs_x2")) == proj)
  }

  test("q_ann_binary_sweep: recall is monotone in depth and agrees with q_ann_binary at 50") {
    val sf = "/root/testdata/sf0.01" // the panel needs the fuller corpus
    val rows = graft.operators.Similarity.queries("q_ann_binary_sweep")(spark, sf)
      .collect().map(r => (r.getAs[Long]("shortlist"),
        r.getAs[Double]("mean_recall_at_5"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ==
      graft.operators.Similarity.BinarySweepDepths.map(_.toLong))
    rows.toSeq.sliding(2).foreach {
      case Seq((ka, ra), (kb, rb)) =>
        assert(rb >= ra - 1e-9, s"recall fell $ka->$kb: $ra -> $rb")
      case _ => ()
    }
    // cross-query identity: the depth-50 point IS q_ann_binary's recall
    val perQ = graft.operators.Similarity.queries("q_ann_binary")(spark, sf)
      .select(col("qid"), col("recall_at_5")).distinct()
      .as[(Long, Double)].collect()
    val mean = perQ.map(_._2).sum / perQ.length
    val at50 = rows.find(_._1 == 50L).get._2
    assert(math.abs(at50 - mean) < 1e-4,
      s"sweep@50 $at50 != q_ann_binary mean $mean")
  }

  test("q_length_lognormal: mu/sigma recompose from the quantized log-lengths") {
    val sf = TestSession.sf
    val rows = graft.operators.TrainingOps.queries("q_length_lognormal")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val lmus = Tables.documents(spark, sf)
      .select(col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("nt"))
      .filter(col("nt") >= 1)
      .select(col("source"), round(log(col("nt")) * 1e6).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val xs = lmus(r.getAs[String]("source"))
      val n = BigInt(xs.length); val s = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * x).sum
      val mu = s.toDouble / (n.toDouble * 1e6)
      val sigma = math.sqrt((n * s2 - s * s).toDouble /
        (n.toDouble * (n.toDouble - 1))) / 1e6
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mu_ln") - mu) < 1e-5)
      assert(math.abs(r.getAs[Double]("sigma_ln") - sigma) < 1e-5)
      assert(r.getAs[Boolean]("high_dispersion") ==
        (r.getAs[Double]("sigma_ln") > 1.0))
    }
  }

  test("q_ewma_chart: the decimal fold replays driver-side; limits recompose from exact moments") {
    val sf = TestSession.sf
    val rows = graft.operators.TemporalOps.queries("q_ewma_chart")(spark, sf)
      .collect().sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(rows.nonEmpty)
    val daily = Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rc"))
      .orderBy(col("day")).as[(java.sql.Date, Long)].collect()
    assert(rows.length == daily.length)
    // replay the DECIMAL(18,6) recursion exactly
    var s = BigDecimal(daily.head._2) / 100
    rows.zip(daily).zipWithIndex.foreach { case ((r, (_, rc)), i) =>
      if (i > 0) {
        val x = BigDecimal(rc) / 100
        s = (BigDecimal("0.125") * x + BigDecimal("0.875") * s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(math.abs(r.getAs[Double]("ewma") - s.toDouble) < 1e-9,
        s"day $i ewma ${r.getAs[Double]("ewma")} vs $s")
    }
    val n = BigInt(daily.length)
    val sm = daily.map(t => BigInt(t._2)).sum
    val s2 = daily.map(t => BigInt(t._2) * t._2).sum
    val sd = math.sqrt((n * s2 - sm * sm).toDouble /
      (n.toDouble * (n.toDouble - 1)))
    val ucl = (sm.toDouble / n.toDouble +
      3.0 * sd * math.sqrt(0.125 / 1.875)) / 100.0
    assert(math.abs(rows.head.getAs[Double]("ucl") - ucl) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("breach") ==
        (r.getAs[Double]("ewma") > r.getAs[Double]("ucl") ||
          r.getAs[Double]("ewma") < r.getAs[Double]("lcl")))
    }
  }

  test("q_stl_strength: strengths are the variance ratios of the published STL components") {
    val sf = TestSession.sf
    val r = graft.operators.TemporalOps.queries("q_stl_strength")(spark, sf)
      .collect().head
    // cross-query consistency with the ORACLE-CHECKED decomposition:
    // recompute the two F-measures from q_stl_decompose's published
    // components (the rescale quantization bounds the drift)
    val comp = graft.operators.TemporalOps.queries("q_stl_decompose")(spark, sf)
      .select(col("seasonal"), col("remainder"),
        col("rev_c") / 100.0 - col("seasonal") - col("remainder"))
      .as[(Double, Double, Double)].collect()
    def popVar(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val vr = popVar(comp.map(_._2))
    val fS = math.max(0.0, 1.0 - vr / popVar(comp.map(t => t._1 + t._2)))
    assert(r.getAs[Long]("n_days") == comp.length.toLong)
    assert(math.abs(r.getAs[Double]("f_seasonal") - fS) < 1e-3,
      s"f_seasonal ${r.getAs[Double]("f_seasonal")} vs $fS")
    // f_trend recomposes against trend+remainder directly
    val comp2 = graft.operators.TemporalOps.queries("q_stl_decompose")(spark, sf)
      .select(col("trend") + col("remainder"), col("remainder"))
      .as[(Double, Double)].collect()
    val fT2 = math.max(0.0, 1.0 - popVar(comp2.map(_._2)) / popVar(comp2.map(_._1)))
    assert(math.abs(r.getAs[Double]("f_trend") - fT2) < 1e-3,
      s"f_trend ${r.getAs[Double]("f_trend")} vs $fT2")
    assert(r.getAs[Boolean]("strong_seasonality") ==
      (r.getAs[Double]("f_seasonal") > 0.6))
  }

  test("q_degree_gini: gini recomposes from sorted degrees and sits in [0, 1)") {
    val sf = TestSession.sf
    val r = graft.operators.GraphOps.queries("q_degree_gini")(spark, sf)
      .collect().head
    val edges = graft.operators.GraphOps.GraphStore.knn(spark, sf)
      .as[(Long, Long)].collect()
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map(_._2.length.toLong).toArray.sorted
    val n = deg.length.toLong
    val tot = deg.map(BigInt(_)).sum
    val iws = deg.zipWithIndex.map { case (d, i) => BigInt(i + 1) * d }.sum
    val gini = (2 * iws - (BigInt(n) + 1) * tot).toDouble /
      (n.toDouble * tot.toDouble)
    assert(r.getAs[Long]("n_nodes") == n)
    assert(BigInt(r.getAs[Long]("total_degree")) == tot)
    assert(math.abs(r.getAs[Double]("degree_gini") - gini) < 1e-6,
      s"gini ${r.getAs[Double]("degree_gini")} vs $gini")
    assert(r.getAs[Double]("degree_gini") >= 0.0 &&
      r.getAs[Double]("degree_gini") < 1.0)
  }

  test("q_contamination_matrix: row sums bound the C22 verdicts and ppm is exact") {
    val sf = TestSession.sf
    val rows = graft.operators.Dedup.queries("q_contamination_matrix")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no contamination pairs at test SF")
    rows.foreach { r =>
      val (c, t) = (r.getAs[Long]("n_collisions"), r.getAs[Long]("n_train_grams"))
      assert(c >= 1 && c <= t)
      val ppm = (2 * BigInt(c) * 1000000 + t) / (2 * BigInt(t))
      assert(BigInt(r.getAs[Long]("collision_ppm")) == ppm)
      assert(graft.operators.Dedup.EvalSources
        .contains(r.getAs[String]("eval_source")))
      assert(!graft.operators.Dedup.EvalSources
        .contains(r.getAs[String]("train_source")))
    }
    // every contaminated training doc's source (C22) must appear in
    // the matrix — the matrix is the per-source rollup of that channel
    val c22Sources = graft.operators.Dedup.queries("q_ngram_decontam")(spark, sf)
      .select(col("source")).distinct().as[String].collect().toSet
    val mxSources = rows.map(_.getAs[String]("train_source")).toSet
    assert(c22Sources.subsetOf(mxSources),
      s"C22 flagged sources missing from the matrix: ${c22Sources -- mxSources}")
  }

  test("q_youden_threshold: the cut maximizes the exact cross-multiplied J over all bins") {
    val sf = TestSession.sf
    val r = graft.ml.FeatureOps.queries("q_youden_threshold")(spark, sf)
      .collect().head
    val enStops = graft.operators.TextAnalysis.stopwords("en")
    import graft.functions.TextFunctions.{tokens => tks, tokenCount, vocabHits}
    val scored = Tables.documents(spark, sf)
      .select((col("lang") === "en").as("is_pos"),
        round(vocabHits(tks(col("text")), enStops).cast("double") /
          tokenCount(col("text")), 4).as("sb"))
      .as[(Boolean, Double)].collect()
    val p = scored.count(_._1).toLong
    val nn = scored.length - p
    val bins = scored.map(_._2).distinct.sorted
    val js = bins.map { c =>
      val tp = scored.count(t => t._1 && t._2 >= c).toLong
      val fp = scored.count(t => !t._1 && t._2 >= c).toLong
      (c, tp, fp, BigInt(tp) * nn - BigInt(fp) * p)
    }
    val best = js.maxBy(t => (t._4, -t._1))
    assert(r.getAs[Double]("threshold") == best._1,
      s"threshold ${r.getAs[Double]("threshold")} vs ${best._1}")
    assert(r.getAs[Long]("tp") == best._2 && r.getAs[Long]("fp") == best._3)
    assert(r.getAs[Long]("n_pos") == p && r.getAs[Long]("n_neg") == nn)
    val j = best._2.toDouble / p - best._3.toDouble / nn
    assert(math.abs(r.getAs[Double]("youden_j") - j) < 1e-6)
  }

  test("q_reciprocity: reciprocal edge mass equals twice the mutual-kNN graph") {
    val sf = TestSession.sf
    val r = graft.operators.GraphOps.queries("q_reciprocity")(spark, sf)
      .collect().head
    // the mutual graph IS the reciprocal subset of the directed top-K
    // store (src < dst, one row per unordered pair) — cross-store identity
    val mutual = graft.operators.GraphOps.GraphStore.knn(spark, sf).count()
    assert(r.getAs[Long]("n_reciprocal") == 2 * mutual,
      s"reciprocal ${r.getAs[Long]("n_reciprocal")} != 2×mutual $mutual")
    val rec = r.getAs[Double]("reciprocity")
    assert(rec >= 0.0 && rec <= 1.0)
    assert(r.getAs[Long]("n_reciprocal") <= r.getAs[Long]("n_edges"))
  }
}
