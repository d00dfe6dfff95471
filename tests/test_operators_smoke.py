"""Registry smoke: every queries() entry runs at sf0.001 and returns a
DataFrame with a stable schema; the m2 multimodal decode pipeline is
run twice in one session (pinned repro for the round-1 flake)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from file_db_spark import operators as ops


def test_contract_shape():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    # the driver grades the first 50 entries in insertion order: the
    # graded surface must be EXACTLY 50 so nothing registered is
    # invisible to the gate
    assert len(q) == 50
    assert set(o) <= set(q)
    assert set(q) <= set(ops.ALL_QUERIES)
    # insertion order IS the grading order: catalog + events first,
    # merge-engine waves last — and every family inside the window
    names = list(q)
    assert names[0] == "c1_vw_ll" and names[5] == "cs1_name_search_suite"
    assert names[3] == "cs3_param_listing_suite"  # packs c4 + c7
    assert names[4] == "cs4_probe_agg_suite"  # packs c5 + c10
    assert names[8] == "cs2_duplicate_suite"  # packs c13 + c14 + c15
    assert names[9] == "e1_tumbling_window" and names[19] == "e11_value_outliers"
    # the collapse-first dedup graph is the CERTIFIED components path
    assert "x30_collapsed_dedup_graph" in names
    # both streaming carriers + the CDC source family are graded
    assert "s311_streaming_suite" in names and "s1319_streaming_suite" in names
    assert names[-4:] == [
        "g1_merge_recrawl",
        "g2_hash_lifecycle",
        "g3456_control_suite",
        "g26_merge_into",
    ]
    prefixes = {n.split("_")[0][0] for n in names}
    assert {"c", "e", "a", "r", "d", "x", "v", "m", "s", "g"} <= prefixes


@pytest.mark.parametrize("name", sorted(ops.ALL_QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = ops.ALL_QUERIES[name](spark, sf_dir)
    assert df.columns  # schema resolves
    assert df.count() >= 0


def test_m2_decode_twice_same_session(spark, sf_dir):
    fn = ops.ALL_QUERIES["m2_decode_features"]
    n1 = fn(spark, sf_dir).count()
    n2 = fn(spark, sf_dir).count()
    assert n1 == n2


def test_a7_skew_profile_consistency(spark, sf_dir):
    from file_db_spark.operators.relational import SKEW_TOP_K, a7_skew_profile

    rows = a7_skew_profile(spark, sf_dir).collect()
    summary = [r for r in rows if r["part"] == "summary"]
    top = sorted((r for r in rows if r["part"] == "top"), key=lambda r: r["rank"])
    assert len(summary) == 1 and 1 <= len(top) <= SKEW_TOP_K
    s = summary[0]
    assert s["skew_factor"] == s["cnt"] * s["n_keys"] / s["n_rows"]
    assert top[0]["cnt"] == s["cnt"]  # rank 1 is the max key
    cnts = [r["cnt"] for r in top]
    assert cnts == sorted(cnts, reverse=True)
    assert all(abs(r["share"] - r["cnt"] / s["n_rows"]) < 1e-15 for r in top)
