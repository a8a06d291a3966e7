package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Convergence contracts for the iterative graph family (VERDICT r12
  * task 4). The ORACLE queries run a fixed 3 unrolled rounds — an
  * engine-parity convention, not a convergence claim. These specs
  * supply the missing contract three ways:
  *
  *  1. label-prop: the tolerance-stopped variant terminates under the
  *     cap and its fixpoint EQUALS the pointer-jumping components
  *     (M8) — cross-algorithm agreement, the strongest check.
  *  2. PageRank: damping-0.85 L1 contraction is MEASURED per round,
  *     and the fixed-3 snapshot is certified within the geometric
  *     tail bound ‖r_3 − r*‖₁ ≤ ‖Δ_3‖₁·0.85/0.15 of the true
  *     fixpoint — a closed-form distance, not a vibe.
  *  3. eigencentrality: termination under the cap plus a
  *     non-expanding delta tail (rate is the data-dependent spectral
  *     ratio, so no universal constant exists to assert).
  */
class ConvergenceSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("label-prop fixpoint: terminates, equals pointer-jumping components, and the 3-round snapshot refines it") {
    val und = GraphOps.mutualKnnPairs(spark, sf)
    val (fix, rounds) = GraphOps.labelPropToFixpoint(und, maxRounds = 64)
    assert(rounds < 64, s"min-label must reach fixpoint under the cap (ran $rounds)")

    // fixpoint labels are component minima — cross-check against the
    // independent pointer-jumping CC engine (M8)
    val comp = GraphOps.queries("q_knn_components")(spark, sf)
      .select(col("s_suppkey").as("node"), col("component"))
    val fixMap = fix.as[(Long, Long)].collect().toMap
    val compMap = comp.as[(Long, Long)].collect().toMap
    assert(fixMap.keySet == compMap.keySet, "node sets must agree")
    fixMap.foreach { case (n, l) =>
      assert(l == compMap(n), s"node $n: fixpoint label $l != component ${compMap(n)}")
    }

    // the shipped 3-round snapshot refines the fixpoint: per node the
    // 3-ball minimum can only be ≥ the component minimum, and every
    // 3-round community maps INTO exactly one fixpoint component
    val l3 = GraphOps.labelPropagate(und, rounds = 3).as[(Long, Long)].collect()
    l3.foreach { case (n, l) =>
      assert(l >= fixMap(n), s"node $n: 3-round label below the component min")
    }
    l3.groupBy(_._2).foreach { case (c3, members) =>
      val comps = members.map { case (n, _) => fixMap(n) }.distinct
      assert(comps.size == 1,
        s"3-round community $c3 straddles fixpoint components $comps")
    }
  }

  test("pagerank: measured geometric L1 contraction; fixed-3 snapshot within the closed-form tail bound of the fixpoint") {
    val und = GraphOps.mutualKnnPairs(spark, sf)
    val (fix, rounds, deltas) =
      GraphOps.pagerankToConvergence(und, tol = 1e-9, maxRounds = 60)
    assert(rounds < 60, s"PageRank must reach tol under the cap (ran $rounds)")
    // column-stochastic transition: every round contracts the L1
    // delta by at least the damping factor (plus 10-dp rounding slack,
    // |V| nodes each re-rounded per iterate)
    val slack = 1e-9 * fix.count()
    deltas.sliding(2).foreach {
      case Seq(a, b) => assert(b <= 0.85 * a + slack,
        s"L1 delta must contract by the damping factor: $a -> $b")
      case _ =>
    }
    // certify the shipped fixed-3 snapshot: geometric tail gives
    // ||r_3 - r*||_1 <= ||Δ_3||_1 * 0.85/0.15; the published cells
    // round at 6 dp, so allow that grain per node on top. If the
    // corpus converges in < 3 rounds the round-3 delta is its last
    // recorded one (the tail bound only tightens).
    val d3 = if (deltas.length >= 3) deltas(2) else deltas.last
    val bound = d3 * 0.85 / 0.15 + 5e-7 * fix.count()
    val pr3 = GraphOps.queries("q_pagerank_knn")(spark, sf)
      .select(col("s_suppkey").as("node"), col("pagerank"))
    val dist = pr3.join(fix.select(col("node"), col("pr")), "node")
      .agg(sum(abs(col("pagerank") - col("pr")))).head().getDouble(0)
    assert(dist <= bound,
      s"fixed-3 snapshot L1 distance $dist exceeds the geometric bound $bound")
  }

  test("eigencentrality: power iteration terminates under the cap with a non-expanding tail; limit is a valid L-inf-normalized score") {
    val und = GraphOps.mutualKnnPairs(spark, sf)
    val (fix, rounds, deltas) =
      GraphOps.eigencentralityToConvergence(und, tol = 1e-7, maxRounds = 200)
    assert(rounds < 200, s"power iteration must reach tol under the cap (ran $rounds)")
    // no universal contraction constant (rate = λ2/λ1), but the tail
    // must not expand: each of the last 5 deltas ≤ its predecessor
    // (up to the 10-dp iterate rounding grain)
    deltas.takeRight(5).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9,
        s"delta tail must be non-expanding: $a -> $b")
      case _ =>
    }
    val scores = fix.as[(Long, Double)].collect()
    assert(scores.map(_._2).max == 1.0, "L-inf normalization pins max to 1")
    scores.foreach { case (n, s) =>
      assert(s > 0.0 && s <= 1.0, s"node $n score $s outside (0,1]")
    }
  }
}
