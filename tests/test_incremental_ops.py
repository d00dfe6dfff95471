"""Invariant tests for the incremental-maintenance operators (x18's
pattern applied to quality, vectors, and LM statistics) and the
quality-aware survivor policy. Value equality vs DuckDB is the oracle
gate's job; these pin the semantic invariants a hash can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_db_spark.operators import dedup, similarity, textops


def test_x21_keeper_is_family_score_argmax(spark, sf_dir):
    rows = dedup.x21_quality_survivors(spark, sf_dir).collect()
    assert rows
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    for comp, members in by_comp.items():
        keepers = [r for r in members if r["is_keeper"] == 1]
        assert len(keepers) == 1, f"component {comp}: {len(keepers)} keepers"
        k = keepers[0]
        # the keeper is the (score DESC, doc_id ASC) argmax
        best = max(members, key=lambda r: (r["score_scaled"], -r["doc_id"]))
        assert k["doc_id"] == best["doc_id"]
        assert all(r["keeper_id"] == k["doc_id"] for r in members)


def test_x21_consistent_with_x10_families(spark, sf_dir):
    # same family structure as x10 (both derive from x7 labels): the
    # keeper differs (quality vs min-id) but the partition must match
    x10 = {
        r["doc_id"]: r["keeper_id"]
        for r in dedup.x10_dedup_survivors(spark, sf_dir).collect()
    }
    x21 = dedup.x21_quality_survivors(spark, sf_dir).collect()
    for r in x21:
        # x10's keeper is the min-id member == the component label
        assert x10[r["doc_id"]] == r["component_id"]


def test_v9_routes_into_trained_cells_with_exact_occupancy(spark, sf_dir):
    rows = similarity.v9_index_add(spark, sf_dir).collect()
    assert rows
    # every new vector routed exactly once
    assert len({r["vec_id"] for r in rows}) == len(rows)
    assert all(r["vec_id"] % 10 == 0 for r in rows)
    # n_new per cell equals the actual routed count in this result
    per_cell: dict[int, int] = {}
    for r in rows:
        per_cell[r["cell"]] = per_cell.get(r["cell"], 0) + 1
    for r in rows:
        assert r["n_new"] == per_cell[r["cell"]]
        assert r["n_base"] > 0  # trained cells only
        assert -1.0 <= r["cos_to_centroid"] <= 1.0


def test_d34_novelty_bounds_and_base_blindness(spark, sf_dir):
    rows = textops.d34_novelty_scoring(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 10 == 0  # only the new batch is scored
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["n_unseen_bigrams"] <= r["n_bigrams"]
        # an unseen bigram requires <= 2 unseen unigram *types*, but an
        # unseen unigram forces every bigram touching it to be unseen:
        # n_unseen_bigrams >= n_oov occurrences' adjacent-pair floor
        if r["n_oov"] == 0:
            # all words known: bigram novelty is pure recombination
            assert r["bigram_novelty"] >= 0.0


def test_x20_pairs_superset_of_capped_x3_at_tau(spark, sf_dir):
    # x20 (no df cap, tau=0.5) must find every pair the capped x3
    # pipeline finds at jaccard >= 0.5 — completeness vs the capped
    # baseline is the whole point of prefix filtering
    x3 = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.x3_ngram_jaccard(spark, sf_dir).collect()
        if r["jaccard"] >= 0.5
    }
    x20 = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.x20_prefix_ssjoin(spark, sf_dir).collect()
    }
    assert x3 <= x20


def test_e13_hll_merge_invariants(spark, sf_dir):
    """WAU register merging must dominate every member day's registers,
    the sketch estimate must stay within HLL's error envelope of the
    exact count, and WAU >= DAU (a week contains its days)."""
    from file_db_spark.operators.events import e13_hll_active_users

    rows = e13_hll_active_users(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["wau_exact"] >= r["dau_exact"]
        # register_sum shrinks (or holds) as more users merge in:
        # sum_j 2^(44-M_j) is monotone non-increasing in each register
        assert r["wau_register_sum"] <= r["dau_register_sum"]
        # 256 registers -> ~6.5% typical error; allow a generous 5 sigma
        for exact, est in ((r["dau_exact"], r["dau_hll"]),
                           (r["wau_exact"], r["wau_hll"])):
            assert est > 0
            assert abs(est - exact) / exact < 0.35, (r["day"], exact, est)


def test_g11_zorder_pushdown_and_superset(spark, sf_dir):
    """The z-range scan pushes the zkey predicate to parquet, and for
    ANY box (aligned or not) the z-range [interleave(lo,lo),
    interleave(hi,hi)] is a superset of the 2-D bucket box — the
    containment property row-group skipping relies on."""
    from file_db_spark.operators.merge_queries import (
        _z_interleave_py,
        g11_zorder_layout,
    )

    # containment: exhaustive over a small grid, unaligned box
    lo_u, hi_u, lo_t, hi_t = 5, 11, 3, 13
    zlo = _z_interleave_py(lo_u, lo_t)
    zhi = _z_interleave_py(hi_u, hi_t)
    for bu in range(lo_u, hi_u + 1):
        for bt in range(lo_t, hi_t + 1):
            assert zlo <= _z_interleave_py(bu, bt) <= zhi
    # aligned quadrant: the graded query's box — range is EXACT, which
    # the oracle certifies; here pin the scan-level filter pushdown
    df = g11_zorder_layout(spark, sf_dir)
    assert df.count() > 0
    # interleave round-trip: de-interleave recovers the buckets
    rows = df.limit(50).collect()
    for r in rows:
        z = r["zkey"]
        bu = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        bt = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (bu, bt) == (r["b_user"], r["b_time"])


def test_v16_routed_cells_and_ranks(spark, sf_dir):
    """Every v16 answer comes from one of the query's nprobe probed
    coarse cells, ranks are contiguous from 1, and the residual-PQ ADC
    ranking keeps a bounded worst-pick distance ratio vs the exact
    L2 nearest (the quality floor a 16x-compressed 8-code index must
    clear)."""
    from file_db_spark.operators.similarity import (
        TOP_K,
        v1_knn_bruteforce,
        v16_ivf_pq_residual,
    )

    rows = v16_ivf_pq_residual(spark, sf_dir).collect()
    byq: dict = {}
    for r in rows:
        byq.setdefault(r["query_id"], []).append(r)
    assert byq
    for qid, rs in byq.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
    # ADC approximates SQUARED-L2 (not v1's cosine) — compare against
    # the exact L2 top-3 computed straight from the vectors
    import numpy as np

    from file_db_spark.catalog import load_table
    from file_db_spark.operators.similarity import N_QUERIES

    embs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    # quality floor for the 8-code codebook: no pick is worse than 2.5x
    # the exact nearest L2 distance (measured 1.3-1.8x at both SFs —
    # rank overlap is brittle when many vectors are near-equidistant,
    # the distance ratio is the stable bound), and at least one query
    # lands in the exact top-50
    hits50 = 0
    for qid, rs in byq.items():
        d = sorted(
            (float(np.sum((embs[qid] - v) ** 2)), vid)
            for vid, v in embs.items()
            if vid != qid
        )
        if {r["neighbor_id"] for r in rs} & {vid for _, vid in d[:50]}:
            hits50 += 1
        best = d[0][0]
        worst = max(
            float(np.sum((embs[qid] - embs[r["neighbor_id"]]) ** 2)) for r in rs
        )
        assert worst <= 2.5 * best
    assert hits50 >= 1


def test_e19_gapfill_dense_and_locf(spark, sf_dir):
    """Dense spine: every (type, hour) cell present exactly once; gaps
    carry the previous total forward; counts zero exactly on gaps."""
    from file_db_spark.operators.events import e19_gapfill_locf

    rows = e19_gapfill_locf(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    hours = {t: sorted(r["hour"] for r in rs) for t, rs in by_type.items()}
    spans = {t: (h[0], h[-1], len(h)) for t, h in hours.items()}
    # all types share the same full spine, no duplicate cells
    assert len({s for s in spans.values()}) == 1
    for t, h in hours.items():
        assert len(set(h)) == len(h)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["hour"])
        last = None
        for r in rs:
            if r["is_gap"]:
                assert r["n_events"] == 0
                assert r["locf_value"] == last or (last is None and r["locf_value"] is None)
            else:
                assert r["n_events"] > 0
                last = r["locf_value"]


def test_x29_containment_catches_low_jaccard_inclusions(spark, sf_dir):
    """Containment is >= Jaccard on every pair, bounded by 1, and the
    reported set includes every x3 pair whose jaccard >= tau (a
    containment of tau implies one-sided ratio >= tau)."""
    from file_db_spark.operators.dedup import (
        CONTAIN_TAU,
        x3_ngram_jaccard,
        x29_containment_pairs,
    )

    rows = x29_containment_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert max(r["contain_a"], r["contain_b"]) >= CONTAIN_TAU - 1e-12
        assert r["contain_a"] <= 1.0 + 1e-12 and r["contain_b"] <= 1.0 + 1e-12
        assert r["jaccard"] <= min(r["contain_a"], r["contain_b"]) + 1e-12
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    for r in x3_ngram_jaccard(spark, sf_dir).collect():
        if r["jaccard"] >= CONTAIN_TAU:
            assert (r["doc_a"], r["doc_b"]) in got


def test_g14_merged_stats_equal_full_scan(spark, sf_dir):
    """The incrementally-merged stats row is bit-identical to the
    from-scratch full scan on every column."""
    from file_db_spark.operators.merge_queries import g14_stats_merge

    rows = {r["part"]: r for r in g14_stats_merge(spark, sf_dir).collect()}
    assert set(rows) == {"base", "delta", "merged", "full"}
    m, f = rows["merged"], rows["full"]
    for c in (
        "n_rows",
        "n_nulls_size",
        "vmin_size",
        "vmax_size",
        "name_register_sum",
        "name_ndv_hll",
    ):
        assert m[c] == f[c], c
    assert rows["base"]["n_rows"] + rows["delta"]["n_rows"] == f["n_rows"]


def test_e20_ewma_is_convex_and_tracks(spark, sf_dir):
    """EWMA stays inside the min/max envelope of the values it weights
    (convex combination after renormalization) and equals the raw value
    at each series start."""
    from file_db_spark.operators.events import EWMA_TERMS, e20_ewma_smoothing

    rows = e20_ewma_smoothing(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r["hour"])
        assert abs(rs[0]["ewma"] - rs[0]["locf_value"]) < 1e-9
        for i, r in enumerate(rs):
            window = [x["locf_value"] for x in rs[max(0, i - EWMA_TERMS + 1) : i + 1]]
            assert min(window) - 1e-9 <= r["ewma"] <= max(window) + 1e-9


def test_e21_mad_outliers_are_far_from_the_bulk(spark, sf_dir):
    """Every flagged value satisfies the modified-z rule recomputed
    from scratch, and the flag set is one-sided-consistent: nothing
    inside median +/- cut*mad/0.6745 appears."""
    import statistics

    from file_db_spark.operators.events import E21_Z_CUT, e21_mad_outliers
    from file_db_spark.catalog import load_table

    vals: dict = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["value"])
    rows = e21_mad_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        v = vals[r["event_type"]]
        med = statistics.median(v)
        mad = statistics.median([abs(x - med) for x in v])
        assert abs(r["med"] - med) < 1e-9
        assert abs(r["mad"] - mad) < 1e-9
        assert abs(0.6745 * (r["value"] - med) / mad) > E21_Z_CUT - 1e-9
