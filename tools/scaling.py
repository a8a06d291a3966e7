#!/usr/bin/env python3
"""Fit time-vs-rows scaling exponents from the three bench_scale_*.json
runs (seeded DataGen corpora at sf0.1/0.3/1 — every table grows by
exactly 3x and 10x, so the exponent needs no per-table row mapping:
alpha = ln(t_b/t_a) / ln(sf_b/sf_a)).

Usage: python3 tools/scaling.py [scratch_dir] > report.md
"""
import json, math, sys, os

SCRATCH = sys.argv[1] if len(sys.argv) > 1 else "scratch"
SFS = [("sf0.1", 0.1), ("sf0.3", 0.3), ("sf1", 1.0)]

FAMILIES = [
    ("relational", ["q1_pricing_summary", "q3_shipping_priority", "q_topn_per_group"]),
    ("events", ["q_sessionize", "q_session_stats", "q_funnel"]),
    ("text", ["q_bigram_surprisal", "q_inverted_index"]),
    ("dedup", ["q_minhash_lsh", "q_simhash", "q_embedding_neardup",
               "q_dedup_clusters_text", "q_pipeline_e2e"]),
    ("graph", ["q_pagerank", "q_triangle_count", "q_label_propagation"]),
    ("ann", ["q_ann_bruteforce", "q_ann_lsh", "q_ann_ivf", "q_ann_pq"]),
]

def load(sf):
    with open(os.path.join(SCRATCH, f"bench_scale_{sf}.json")) as f:
        d = json.loads(f.read().strip())
    assert not d.get("err"), f"{sf} had erroring queries: {d['err']}"
    return d["queries"]

runs = {sf: load(sf) for sf, _ in SFS}

def alpha(t_a, t_b, r):
    return math.log(t_b / t_a) / math.log(r)

print("| family | query | t(sf0.1) s | t(sf0.3) s | t(sf1) s | α(0.1→0.3) | α(0.3→1) | α(0.1→1) |")
print("|---|---|---|---|---|---|---|---|")
worst = []
for fam, qs in FAMILIES:
    for q in qs:
        t1, t3, t10 = runs["sf0.1"][q], runs["sf0.3"][q], runs["sf1"][q]
        a13 = alpha(t1, t3, 3.0)
        a310 = alpha(t3, t10, 10.0 / 3.0)
        a110 = alpha(t1, t10, 10.0)
        worst.append((a310, fam, q))
        print(f"| {fam} | {q} | {t1:.2f} | {t3:.2f} | {t10:.2f} | "
              f"{a13:.2f} | {a310:.2f} | {a110:.2f} |")
print()
worst.sort(reverse=True)
print("Steepest large-segment exponents (α 0.3→1):")
for a, fam, q in worst[:5]:
    print(f"- {q} ({fam}): {a:.2f}")
