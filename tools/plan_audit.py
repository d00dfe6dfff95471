#!/usr/bin/env python
"""Registry-wide physical-plan audit → PLANS.md.

Sweeps EVERY registry entry (operators.ALL_QUERIES — the graded window
and all suite members) at sf0.01, renders the executed plan, and greps
it for the anti-patterns the 100 TB design bans:

- ``CartesianProduct`` — data x data blowup, never acceptable;
- ``BroadcastNestedLoopJoin`` outside the allowlist — non-equi joins
  are only acceptable when the loop side is a broadcast few-row table
  (kNN query fan-out, 1-row scalar denominators, literal salt ranges,
  per-wave deletion root lists);
- ``BatchEvalPython`` — row-at-a-time Python UDF in any plan. Python is
  allowed only Arrow-batched (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas``), and only at the I/O or kernel edges;
- ``Exchange SinglePartition`` over an UNBOUNDED input — a global
  sort/window funnel. A SinglePartition exchange whose child is a
  ``keys=[]`` partial aggregate is the final step of a scalar
  aggregate (1 row per upstream partition — corpus totals, MIN-rate
  normalizers, AQE's injected runtime bloom-filter builds) and is
  bounded by the partition count, not the data; those are clean.

Exit status is non-zero on any violation, so this doubles as a CI gate:
``python tools/plan_audit.py``. PLANS.md records, per query, the
exchange/broadcast/Python-eval counts and scan column width — the
"is this the plan I'd want at 1000 executors" record the plan-pin
tests (tests/test_plans.py) spot-check in depth.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(REPO, "PLANS.md")

#: non-equi joins whose loop side is a broadcast few-row table — the
#: same rationale as tests/test_plans.py::_BNLJ_OK, keyed by the
#: per-operator name (suites inherit their members' hits)
BNLJ_OK_MEMBERS = {
    "v1_knn_bruteforce",  # broadcast query rows vs corpus
    "v3_ivf_topk",
    "v4_ivf_nprobe",  # broadcast centroid routing table
    "v5_sq_rerank",
    "v6_kmeans_refine",  # broadcast k x dim centroids per round
    "v7_pq_adc",  # broadcast per-query distance maps
    "d19_tfidf_keywords",  # broadcast 1-row corpus doc count
    "d23_source_divergence",  # broadcast 1-row corpus total
    "d26_temperature_mix",  # broadcast 1-row MIN-rate normalizer
    "d30_bpe_train",  # broadcast 1-row chosen-merge-pair table per round
    "d31_training_manifest",  # broadcast 1-row MIN-rate normalizer (d26 pattern)
    "j13_salted_join",  # literal salt-range table
    "g2_hash_lifecycle",  # broadcast per-wave vanished-root prefix list
    "x19_pagerank",  # broadcast 1-row vertex-count normalizer
    "d32_bpe_encode",  # d30 trained chain: broadcast 1-row merge pair per round
    "v9_index_add",  # broadcast k x dim trained centroids (v6 pattern)
    "v10_kmeanspp_init",  # broadcast <=1+R*l-row center/candidate tables
    "a7_skew_profile",  # broadcast 1-row stats table onto top-K rows
    "d36_kneser_ney_lm",  # broadcast 1-row distinct-bigram total (d19/d23 pattern)
    "v12_sq_train_adc",  # broadcast 1-row trained ranges + broadcast query rows
    "d38_bm25_search",  # broadcast 1-row corpus stats (n_docs, total_len)
    "d39_dsir_sampling",  # broadcast 1-row corpus token totals (d19/d23 pattern)
    "d40_unimax_mix",  # broadcast |langs|-row theta self-join + 1-row waterline
    "e15_rfm_segments",  # broadcast 1-row anchor + 1-row quartile cutoffs
    "v15_mmr_rerank",  # broadcast query rows (v1 pattern) + tiny cand tables
    "v16_ivf_pq_residual",  # broadcast coarse/PQ codebooks (v6/v7 pattern)
    "v16_serve",  # serve half of v16: same broadcast-codebook query fan-out
    "v20_pq_index_add",  # incremental add: same broadcast-codebook encode/serve fan-out
    "a16_dormant_accounts",  # broadcast 1-row balance threshold (d19 scalar pattern)
    "a25_important_stock",  # broadcast 1-row stock-value total (a16 pattern)
    "a18_top_supplier",  # broadcast 1-row MAX revenue (d19 scalar pattern)
    "x32_prototype_pruning",  # v6's broadcast k x dim centroid rounds (Lloyd loop)
    "v17_ann_recall_eval",  # evaluates v1/v2/v3/v4/v16 — inherits their broadcast-query scans
    "v18_filtered_search",  # broadcast query rows (v1 pattern), both filter modes
    "g11_zorder_layout",  # broadcast 1-row bucket extent (the d19 pattern)
    "g14_stats_merge",  # broadcast 1-row part-stats + merged-sketch rows
    "e19_gapfill_locf",  # broadcast 1-row hour-range extent (spine generator)
    "e20_ewma_smoothing",  # composes e19 — same 1-row extent
    "v19_retrieval_cascade",  # broadcast centroid routing (v4 pattern)
}
#: graded carriers of those members
BNLJ_OK = BNLJ_OK_MEMBERS | {
    "v346_ivf_kmeans",
    "dq2_split_sample",
    "dq4_corpus_reports",
    "dq6_term_sketches",
    "rq2_join_suite",
    "x710_components_survivors",
    "e812_rollup_pivot",
    "g3456_control_suite",
}


def _unbounded_single_partition(plan: str) -> bool:
    """True if any ``Exchange SinglePartition`` funnels something other
    than a keys=[] partial aggregate (see module docstring)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        # a keys=[] aggregate (partial scalar agg, or the columnless
        # 1-row aggregate a pruned cross-join side leaves behind) emits
        # at most one row per upstream partition — bounded by the
        # partition count, not the data
        if "keys=[]" not in child:
            return True
    return False


def main() -> int:
    from file_db_spark import operators as ops
    from file_db_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    rows = []
    violations: dict[str, list[str]] = {}
    for name, fn in sorted(ops.ALL_QUERIES.items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming drains etc. still return a DF
            rows.append((name, "-", "-", "-", "-", f"plan unavailable: {type(exc).__name__}"))
            continue
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        n_bc = len(re.findall(r"BroadcastExchange", plan))
        n_arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
        n_scan = len(re.findall(r"FileScan parquet|Scan parquet", plan))
        probs = []
        if "CartesianProduct" in plan:
            probs.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            probs.append("BNLJ")
        if "BatchEvalPython" in plan:
            probs.append("row-Python-UDF")
        if _unbounded_single_partition(plan):
            probs.append("SinglePartition-exchange")
        if probs:
            violations[name] = probs
        rows.append(
            (name, n_ex, n_bc, n_arrow, n_scan, "; ".join(probs) or "clean")
        )

    with open(OUT, "w") as f:
        f.write(
            "# PLANS — registry-wide physical-plan audit\n\n"
            f"Generated by `python tools/plan_audit.py` at sf_dir=`{SF_DIR}`.\n"
            "Columns: shuffle exchanges / broadcast exchanges / Arrow-batched\n"
            "Python stages / parquet scans in the executed plan. `clean` = no\n"
            "CartesianProduct, no un-allowlisted BroadcastNestedLoopJoin, no\n"
            "row-at-a-time Python UDF, no single-partition exchange. See the\n"
            "module docstring for why each pattern is banned at 100 TB.\n\n"
            "| query | exchanges | broadcasts | arrow-python | scans | status |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write("| " + " | ".join(str(c) for c in r) + " |\n")
        f.write(
            f"\n**{len(rows)} plans audited, "
            f"{sum(1 for r in rows if r[5] == 'clean')} clean, "
            f"{len(violations)} violations.**\n"
        )
    print(f"wrote {OUT}: {len(rows)} plans, {len(violations)} violations")
    for name, probs in violations.items():
        print(f"VIOLATION {name}: {', '.join(probs)}")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
