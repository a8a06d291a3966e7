package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Formula-level checks for the B13 character-entropy gate on crafted
  * strings with hand-computable values.
  */
class TextAnalysisSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def score(texts: (Long, String)*): Map[Long, (Long, Double, Double, Boolean)] =
    TextAnalysis.scoreCharEntropy(texts.toSeq.toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map { case (id, n, e, m, p) => id -> ((n, e, m, p)) }.toMap

  test("q_unigram_lm: round-1 counts equal a driver-side Viterbi recomposition") {
    import org.apache.spark.sql.functions.{col, explode, length => slen}
    import graft.functions.TextFunctions.tokens
    val out = TextAnalysis.qUnigramLm(spark, sf).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("piece"),
        r.getAs[Long]("cnt"), r.getAs[Long]("lp_mu")))
    // seed piece set + µ-log-probs straight from the query's round 0
    val p0 = out.filter(_._1 == 0).map(r => r._2 -> r._4).toMap
    // word types (letters-only, <= 16 chars) recomputed independently
    val words = TestSession.spark.read
      .parquet(s"$sf/documents.parquet")
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && slen(col("w")) <= 16)
      .groupBy("w").count().as[(String, Long)].collect()
    // plain-Scala Viterbi: max total lp, ties to the SHORTEST piece
    def viterbi(w: String): Seq[String] = {
      val n = w.length
      val b = Array.fill(n + 1)(Long.MinValue); b(0) = 0L
      val bk = Array.fill(n + 1)(0)
      for (i <- 1 to n) {
        for (k <- 1 to math.min(4, i)) {
          val p = w.substring(i - k, i)
          p0.get(p).foreach { lp =>
            val s = b(i - k) + lp
            if (s > b(i) || (s == b(i) && (bk(i) == 0 || k < bk(i)))) {
              // strict improvement wins; equal score prefers small k,
              // matching the query's CASE order
              if (s > b(i)) { b(i) = s; bk(i) = k }
              else if (k < bk(i)) bk(i) = k
            }
          }
        }
      }
      var pos = n
      val ps = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) { ps += w.substring(pos - bk(pos), pos); pos -= bk(pos) }
      ps.toSeq
    }
    val expected = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, c) =>
      viterbi(w).foreach(p => expected(p) = expected.getOrElse(p, 0L) + c)
    }
    val r1 = out.filter(_._1 == 1).map(r => r._2 -> r._3).toMap
    // every retained round-1 piece count matches the recomposition;
    // retained-but-unused pieces are exactly the single chars at 0
    r1.foreach { case (p, cnt) =>
      assert(expected.getOrElse(p, 0L) == cnt,
        s"piece '$p' count $cnt != recomposed ${expected.getOrElse(p, 0L)}")
    }
    // pruning: every multi-char piece with a zero recomposed count is
    // gone from round 1; all single chars of round 0 survive
    val p0chars = out.filter(r => r._1 == 0 && r._2.length == 1).map(_._2).toSet
    val r1keys = r1.keySet
    assert(p0chars.subsetOf(r1keys), "a single-char piece was pruned")
    out.filter(r => r._1 == 0 && r._2.length >= 2).foreach { r =>
      val used = expected.getOrElse(r._2, 0L) > 0
      assert(r1keys.contains(r._2) == used,
        s"pruning verdict wrong for '${r._2}'")
    }
  }

  test("q_unigram_apply: fertility columns reconcile and unigram never loses to chars") {
    val rows = TextAnalysis.qUnigramApply(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("delta_ppm") ==
        r.getAs[Long]("fertility_uni_ppm") - r.getAs[Long]("fertility_bpe_ppm"))
      // any segmentation has >= 1 piece per word
      assert(r.getAs[Long]("n_tokens_uni") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("fertility_uni_ppm") >= 1000000L)
    }
  }

  test("q_bpe_merges: round-1 merge equals a brute-force pair count; merge counts never increase across rounds") {
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    import graft.functions.TextFunctions.tokens
    val rows = TextAnalysis.qBpeMerges(spark, sf).orderBy("round").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
      assert(r.getAs[Long]("pair_count") > 0)
    }
    // a round-k+1 pair is either an old pair (count can only shrink)
    // or flanks the round-k merge (count ≤ that merge's count), so the
    // chosen max is non-increasing — a provable BPE invariant
    val c = rows.map(_.getAs[Long]("pair_count"))
    assert(c(1) <= c(0) && c(2) <= c(1), s"merge counts increased: ${c.toSeq}")
    // brute-force round 1 from the collected word-type table
    val words = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val pc = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    words.foreach { case (w, c0) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        pc((p(0).toString, p(1).toString)) += c0 } }
    val best = pc.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.head
    assert((rows(0).getAs[String]("lhs"), rows(0).getAs[String]("rhs")) == best._1,
      s"round-1 merge ${rows(0)} != brute-force $best")
    assert(rows(0).getAs[Long]("pair_count") == best._2)
  }

  test("char entropy: flood is 0 and gated, uniform string is log2(k), natural text passes") {
    val r = score(
      1L -> "aaaaaaaaaaaaaaaa",
      2L -> "abcdefgh",
      3L -> "the quick brown fox jumps over the lazy dog")
    val (n1, e1, m1, p1) = r(1L)
    assert(n1 == 16 && e1 == 0.0 && m1 == 1.0 && !p1,
      "single-char flood must score zero entropy and fail the gate")
    val (_, e2, _, _) = r(2L)
    assert(math.abs(e2 - 3.0) < 1e-6, "8 uniform chars = log2(8) = 3 bits")
    val (_, e3, m3, p3) = r(3L)
    assert(e3 > 3.5 && e3 < math.log(27.0) / math.log(2.0) && m3 < 0.3 && p3,
      s"pangram should land in the natural-language band, got $e3")
  }

  test("char entropy: out-of-alphabet chars are excluded from the closed-alphabet count") {
    val r = score(10L -> "ab12!?ab")
    val (n, _, _, _) = r(10L)
    assert(n == 4, s"only [a-z ] counts toward n_alpha, got $n")
  }

  test("char entropy: empty text yields zeros without dividing by zero") {
    val r = score(20L -> "")
    assert(r(20L) == ((0L, 0.0, 0.0, false)))
  }

  test("q_preference_pairs: endpoints are the stratum quality extremes, margins strict") {
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    val pairs = TextAnalysis.qPreferencePairs(spark, sf01).collect()
    assert(pairs.nonEmpty)
    // brute-force the per-stratum extremes from the B3 scores
    val docs = Tables.documents(spark, sf01)
      .select("doc_id", "source", "lang").as[(Long, String, String)]
      .collect().map(d => d._1 -> (d._2, d._3)).toMap
    val q = TextAnalysis.qQualityScore(spark, sf01)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    val strata = docs.groupBy(_._2).map { case (sl, ds) => sl -> ds.keys.toSeq }
    pairs.foreach { p =>
      val key = (p.getAs[String]("source"), p.getAs[String]("lang"))
      val ids = strata(key)
      assert(ids.length >= 2 && ids.length.toLong == p.getAs[Long]("n_docs"))
      val chosen = p.getAs[Long]("chosen_id")
      val rejected = p.getAs[Long]("rejected_id")
      assert(chosen != rejected)
      // chosen is the argmax (quality DESC, id ASC); rejected the
      // argmin (quality ASC, id DESC)
      val bestBrute = ids.minBy(id => (-q(id), id))
      val worstBrute = ids.minBy(id => (q(id), -id))
      assert(chosen == bestBrute, s"$key: chosen $chosen != $bestBrute")
      assert(rejected == worstBrute, s"$key: rejected $rejected != $worstBrute")
      assert(p.getAs[Double]("margin") > 0, "strict preference only")
      assert(math.abs(p.getAs[Double]("chosen_q") - q(chosen)) < 1e-9)
      assert(math.abs(p.getAs[Double]("rejected_q") - q(rejected)) < 1e-9)
    }
    // every stratum with a strict quality spread emits exactly one pair
    val expected = strata.count { case (_, ids) =>
      ids.length >= 2 &&
        math.rint((ids.map(q).max - ids.map(q).min) * 1e6) > 0
    }
    assert(pairs.length == expected,
      s"${pairs.length} pairs vs $expected strata with strict spread")
  }
}
