package graft
import org.apache.spark.sql.SparkSession

/** Per-query shuffle/memory tap (VERDICT r12 task 5): accumulates the
  * stage-level shuffle metrics while a query runs so bench_out.json
  * carries the plan-shaped numbers a wall-clock total hides — a
  * silently added exchange shows up as shuffle records/bytes (and in
  * the static `exch` count) the round it appears, not as seconds two
  * rounds later.
  */
private object ShuffleTap extends org.apache.spark.scheduler.SparkListener {
  import java.util.concurrent.atomic.AtomicLong
  val srRec = new AtomicLong; val swRec = new AtomicLong
  val swBytes = new AtomicLong; val peakMem = new AtomicLong
  def reset(): Unit = { srRec.set(0); swRec.set(0); swBytes.set(0); peakMem.set(0) }
  def snapshot: (Long, Long, Long, Long) =
    (srRec.get, swRec.get, swBytes.get, peakMem.get)
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val acc = sc.stageInfo.accumulables.values
    def v(n: String): Long = acc.find(_.name.contains(n))
      .flatMap(_.value).map(_.toString.toLong).getOrElse(0L)
    srRec.addAndGet(v("internal.metrics.shuffle.read.recordsRead"))
    swRec.addAndGet(v("internal.metrics.shuffle.write.recordsWritten"))
    swBytes.addAndGet(v("internal.metrics.shuffle.write.bytesWritten"))
    val pm = v("internal.metrics.peakExecutionMemory")
    peakMem.getAndUpdate(m => math.max(m, pm))
  }
}

object Bench {
  /** Count the shuffle exchanges in an executed-plan string — the
    * same regex device PlanSpec pins the relational core with. An
    * executed adaptive plan appends an "== Initial Plan ==" section
    * that would double-count; only the current (final) plan counts. */
  def exchangeCount(plan: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(plan.split("== Initial Plan ==")(0)).length

  /** Flush the async listener bus so ShuffleTap has seen every stage
    * of the query that just returned. LiveListenerBus.waitUntilEmpty
    * is private[spark] at the source level but public in bytecode;
    * fall back to a short sleep if the internals move.
    */
  private def drainListeners(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(100) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // the engine's session factory (see Verify) — benches the shipped
    // configuration, extensions included
    val spark = GraftSession.create(cpus, dataDir = sfDir)
    // Every single-partition window in the suite runs over a
    // documented BOUNDED table (day/hour/bin grids — the PlanSpec
    // windowExempt set pins the inventory), so WindowExec's generic
    // warning is noise here; dozens of repeats were drowning real
    // signal out of the driver's bounded log-tail capture (r14
    // VERDICT ask #9). Scoped to the one noisy class, not the root
    // logger — anything unexpected still surfaces.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // Optional comma-list filter for targeted profiling runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // JVM/codegen warmup outside the timed loop — the first query
    // otherwise absorbs ~5-10s of one-time JIT and Spark init cost
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1000).count()

    // Fixed chain-build prologue (r15 VERDICT ask #3): the persisted
    // store artifacts (MinHash signatures, ANN indexes, graph edge
    // tables, ML prediction stores) build lazily on first touch, so
    // in a fresh-warehouse bench session whichever query reached a
    // store first absorbed its build — q_decontam_keep_list and
    // graph_warm moved round-over-round with no code change. Building
    // every store HERE, each timed and reported as its own line,
    // makes the per-query numbers pure query cost and the build cost
    // visible instead of randomly attributed.
    // each entry carries its own ok flag (the per-query discipline):
    // a failed store build must be visible in the ARTIFACT, not only
    // on stderr — the first-touch query would otherwise silently
    // re-absorb the build cost this prologue exists to isolate
    val chainBuild = scala.collection.mutable.LinkedHashMap[String, (Double, Boolean)]()
    def buildChain(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      val ok =
        try { f; true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] chain $name FAILED: ${e.getClass.getSimpleName}")
          false
        }
      chainBuild(name) = ((System.nanoTime() - t0) / 1e9, ok)
    }
    if (!sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) {
      buildChain("sig_store") { operators.Dedup.SigStore.ensure(spark, sfDir) }
      buildChain("graph_store") { operators.GraphOps.GraphStore.strong(spark, sfDir) }
      buildChain("nsw_index") { operators.Similarity.NswIndex.ensure(spark, sfDir) }
      // nlist=16 is the one cell count every IVF consumer uses
      // (IvfBuckets=8 is the FILE bucket count, a different dial)
      buildChain("ivf_index") { operators.Similarity.IvfIndex.get(spark, sfDir, 16) }
      buildChain("pq_index") { operators.Similarity.PqIndex.get(spark, sfDir) }
      buildChain("kmeans_store") { ml.Tuning.KmeansStore.ensure(spark, sfDir) }
      buildChain("doccluster_store") { ml.Tuning.DocClusterStore.ensure(spark, sfDir) }
      buildChain("cv_store") { ml.Tuning.CvStore.ensure(spark, sfDir) }
      buildChain("pipe_store") { ml.Tuning.PipeStore.ensure(spark, sfDir) }
      buildChain("learn_store") { ml.Tuning.LearnStore.ensure(spark, sfDir) }
      buildChain("als_store") { ml.Tuning.AlsStore.ensure(spark, sfDir) }
      spark.catalog.clearCache()
    }

    // A throwing query must not masquerade as a fast success, and a
    // failed attempt's time-to-throw must never be min'd against a
    // real measurement: each attempt carries its own ok flag, and only
    // like attempts compare.
    spark.sparkContext.addSparkListener(ShuffleTap)
    // per-query shuffle metrics from the latest successful attempt:
    // (shuffle-read records, shuffle-write records, shuffle-write
    // bytes, peak execution memory, exchange count in the final
    // adaptive plan) — plan-shaped, so identical across retries
    val shuffleStats =
      scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long, Long, Int)]()
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      ShuffleTap.reset()
      val t0 = System.nanoTime()
      val ok =
        try {
          val qe = fn(spark, sfDir).queryExecution
          qe.toRdd.count()
          drainListeners(spark)
          val (sr, sw, swb, pm) = ShuffleTap.snapshot
          shuffleStats(name) =
            (sr, sw, swb, pm, exchangeCount(qe.executedPlan.toString))
          true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          false
        }
        // drain in ALL exits (a failed attempt's stage-completed
        // events otherwise land after the NEXT query's reset() and
        // pollute its shuffle numbers)
        finally drainListeners(spark)
      // drop per-query caches so later queries aren't skewed by
      // accumulated storage/GC pressure
      spark.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // prefer any successful measurement; among like outcomes take the min
    def best(a: (Double, Boolean), b: (Double, Boolean)): (Double, Boolean) =
      (a, b) match {
        case ((ta, true), (tb, true)) => (math.min(ta, tb), true)
        case ((_, false), (tb, true)) => (tb, true)
        case ((ta, true), (_, false)) => (ta, true)
        case ((ta, false), (tb, false)) => (math.min(ta, tb), false)
      }
    // This host's scheduler noise can inflate a single execution 10-50x
    // (verified: identical back-to-back stages 9.4s vs 98.3s cpuSum).
    // r16 shipped two same-tree snapshots ±47 % apart on composites, so
    // single-shot numbers are not decision-grade on this host: every
    // query is measured MIN-OF-2 unconditionally (the SCALING.md
    // harness discipline, lifted here per the r16 verdict ask #2).
    val retryAbove = sys.env.getOrElse("SPARK_GRAFT_RETRY_ABOVE_SEC", "5").toDouble
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val firstPass = selected.map { case (name, fn) =>
      name -> best(once(name, fn), once(name, fn))
    }
    // Noise storms on this host last long enough to cover a back-to-back
    // min-of-2 (r2: q_kmeans 58s, q1 33s in-batch vs 6.9s/4.3s isolated).
    // A final pass at the END of the run re-measures anything still slow
    // at a decorrelated point in time.
    val results0 = firstPass.map { case (name, r) =>
      name -> (if (r._1 > retryAbove && r._2) best(r, once(name, selected(name))) else r)
    }
    val failed = results0.collect { case (name, (_, false)) => name }.toSeq.sorted
    val results = results0.map { case (name, (t, _)) => name -> t }
    // The per-query loop clears caches (cold numbers by design), which
    // makes each dedup composite re-pay the shared MinHash/shingle
    // chain it would share in a real session. Measure that real-session
    // shape once: the composite family back-to-back in ONE cache
    // session (cold chain paid once, then shared), reported as
    // "composite_warm" next to the cold total.
    // Returns the family total AND per-query warm seconds: the cold
    // map answers "what does one query cost alone", the warm map
    // answers "what does it cost in a session that already paid the
    // shared chain" — bench_out.json carries both so the headline
    // total stops reading as a per-query regression for chain-design
    // composites (~45s of the cold total is the re-paid MinHash chain).
    val warmPerQuery = scala.collection.mutable.LinkedHashMap[String, Double]()
    def warmFamily(names: Seq[String]): Option[Double] = {
      val family = names.filter(selected.contains)
      if (family.size != names.size) return None
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val allOk = family.forall { n =>
        val q0 = System.nanoTime()
        try {
          selected(n)(spark, sfDir).queryExecution.toRdd.count()
          warmPerQuery(n) = (System.nanoTime() - q0) / 1e9
          true
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench] warm $n FAILED: ${e.getClass.getSimpleName}")
          false
        }
      }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (allOk) Some(t) else None
    }
    val compositeWarm = warmFamily(Seq("q_neardup_keep_list",
      "q_decontam_keep_list", "q_source_overlap", "q_containment_pairs",
      "q_cluster_sizes", "q_crosslingual_pairs", "q_dedup_threshold_sweep",
      "q_pipeline_e2e"))
    // the 5 ANN queries each re-pay the shared brute-force recall
    // truth (and the persisted-index read) under the cold-per-query
    // contract; a real session computes the truth panel once
    val annWarm = warmFamily(Seq("q_ann_bruteforce", "q_ann_lsh",
      "q_ann_ivf", "q_ann_pq", "q_ann_ivfpq", "q_ann_index_stats"))
    // the M-block queries all derive the same strong co-supply graph
    // (one shared cache entry inside coSupplyPairs); cold-per-query
    // re-pays that derivation three times, a session pays it once
    val graphWarm = warmFamily(Seq("q_pagerank", "q_triangle_count",
      "q_link_prediction", "q_label_propagation", "q_degree_distribution",
      "q_knn_graph", "q_triangle_knn", "q_pagerank_knn", "q_label_prop_knn",
      "q_kcore", "q_sql_bfs"))
    // the 8 token-stream consumers share ONE cached tokenization pass
    // in a session (TextAnalysis.tokenStream); cold-per-query re-pays
    // the explode 8 times, a real session once
    val textWarm = warmFamily(Seq("q_repetition", "q_unigram_surprisal",
      "q_bigram_surprisal", "q_pmi_collocations", "q_keyphrases",
      "q_inverted_index", "q_vocab_coverage", "q_heldout_surprisal"))
    val warmJson = compositeWarm.map(t => f""","composite_warm":$t%.2f""").getOrElse("") +
      annWarm.map(t => f""","ann_warm":$t%.2f""").getOrElse("") +
      graphWarm.map(t => f""","graph_warm":$t%.2f""").getOrElse("") +
      textWarm.map(t => f""","text_warm":$t%.2f""").getOrElse("")
    // The driver captures only the log TAIL (~2 KiB): a 95-query map
    // overflows it from the FRONT and the line arrives truncated
    // (BENCH r4/r5/r6 all "parsed": null). So stdout gets a SHORT line —
    // total plus the 10 slowest queries — guaranteed to fit the tail
    // window; the full per-query map is persisted to bench_out.json.
    def fmt(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val shuffleJson = shuffleStats.map { case (k, (sr, sw, swb, pm, ex)) =>
      s""""$k":{"sr_rec":$sr,"sw_rec":$sw,"sw_bytes":$swb,"peak_mem":$pm,"exch":$ex}"""
    }.mkString("{", ",", "}")
    val chainTotal = chainBuild.values.map(_._1).sum
    val chainJson = chainBuild.map { case (k, (t, ok)) =>
      f""""$k":{"sec":$t%.2f,"ok":$ok}""" }.mkString("{", ",", "}")
    val fullLine =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec"$warmJson,"chain_build_total":$chainTotal%.2f,"chain_build":$chainJson,"queries":${fmt(results)},"queries_warm":${fmt(warmPerQuery)},"shuffle":$shuffleJson,"err":$errJson,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), fullLine + "\n")
    catch { case _: Throwable => () }
    val slowest = results.toSeq.sortBy(-_._2).take(10)
    val shortLine =
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","n":${results.size}$warmJson,"chain_build_total":$chainTotal%.2f,"queries":${fmt(slowest)},"err":$errJson,"sf":"$sfDir"}"""
    println(shortLine)
    spark.stop()
  }
}
