"""Stats-driven physical planning: the join strategy must FLIP when
the persisted ANALYZE stats say the dimension outgrew the broadcast
threshold, and salt when the skew profile flags a hot key — pinned on
the actual physical plans, with Spark's own auto-broadcast disabled so
the decision under test is the planner's alone."""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_db_spark import planner
from file_db_spark.filedb.store import TableStore

_DIM = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("label", T.StringType())]
)


@contextmanager
def _no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fact(spark, n=200, hot_share=0.0):
    hot = int(n * hot_share)
    rows = [(i % 10, i) for i in range(n - hot)] + [(3, n + i) for i in range(hot)]
    return spark.createDataFrame(rows, "fk long, v long")


def test_analyze_persists_planner_stats(spark, tmp_path):
    st = TableStore(spark, str(tmp_path / "p"), {"dim": _DIM}, bucketing=False)
    st.replace(
        "dim", spark.createDataFrame([(i, f"label_{i}") for i in range(10)], _DIM)
    )
    doc = st.analyze("dim", skew_cols=["id"])
    assert doc["n_rows"] == 10 and doc["bytes_est"] > 0
    assert doc["skew"]["id"]["max_share"] == 0.1
    assert st.table_stats("dim") == doc  # metadata read round-trips


def test_broadcast_flips_to_shuffle_when_dim_outgrows(spark, tmp_path):
    st = TableStore(spark, str(tmp_path / "p"), {"dim": _DIM}, bucketing=False)
    st.replace(
        "dim", spark.createDataFrame([(i, f"label_{i}") for i in range(10)], _DIM)
    )
    st.analyze("dim")
    dim = st.read("dim")
    fact = _fact(spark)
    with _no_auto_broadcast(spark):
        joined, strat = planner.plan_join(
            fact, dim, "fk", "id", dim_stats=st.table_stats("dim")
        )
        assert strat == "broadcast"
        assert "BroadcastHashJoin" in _plan(joined)

        # the dim "outgrows" the threshold: overwrite the stats file
        # the way a post-growth ANALYZE would
        p = os.path.join(st._dir("dim"), "_STATS-dim.json")
        doc = json.load(open(p))
        doc["n_rows"] = 50_000_000
        doc["bytes_est"] = 2 * 1024**3
        json.dump(doc, open(p, "w"))

        joined2, strat2 = planner.plan_join(
            fact, dim, "fk", "id", dim_stats=st.table_stats("dim")
        )
        assert strat2 == "shuffle"
        plan2 = _plan(joined2)
        assert "BroadcastHashJoin" not in plan2
        assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2
        # strategy changes HOW, never WHAT
        a = sorted(tuple(r) for r in joined.select("fk", "label").collect())
        b = sorted(tuple(r) for r in joined2.select("fk", "label").collect())
        assert a == b


def test_skew_profile_triggers_salted_join(spark, tmp_path):
    st = TableStore(spark, str(tmp_path / "p"), {"dim": _DIM}, bucketing=False)
    st.replace(
        "dim", spark.createDataFrame([(i, f"label_{i}") for i in range(10)], _DIM)
    )
    # fact: 60% of rows share key 3 — well past SKEW_SHARE
    fact = _fact(spark, n=200, hot_share=0.6)
    fact_stats = {
        "n_rows": 200,
        "skew": {"fk": {"max_share": 0.6, "top": [{"value": "3", "count": 120}]}},
    }
    big_dim_stats = {"n_rows": 50_000_000, "bytes_est": 2 * 1024**3, "skew": {}}
    with _no_auto_broadcast(spark):
        joined, strat = planner.plan_join(
            fact, st.read("dim"), "fk", "id",
            dim_stats=big_dim_stats, fact_stats=fact_stats,
        )
        assert strat == "salted"
        # values identical to the plain join
        dimdf = st.read("dim")
        plain = fact.join(dimdf, fact["fk"] == dimdf["id"])
        a = sorted(tuple(r) for r in joined.select("fk", "label").collect())
        b = sorted(tuple(r) for r in plain.select("fk", "label").collect())
        assert a == b
        # without the skew profile the same stats shuffle un-salted
        _, strat2 = planner.plan_join(
            fact, st.read("dim"), "fk", "id", dim_stats=big_dim_stats
        )
        assert strat2 == "shuffle"


def test_engine_listing_flips_on_stats(spark, tmp_path):
    """The engine API path itself consults the stats: listing()'s
    directory join drops its broadcast hint when ANALYZE says the
    dimension outgrew the planner thresholds."""
    from file_db_spark.filedb.engine import Engine

    eng = Engine(spark, str(tmp_path / "eng"))
    eng.install()
    root = tmp_path / "data" / "src"
    root.mkdir(parents=True)
    (root / "a.txt").write_text("x")
    eng.add_root(str(tmp_path / "data"))
    eng.run_until_idle(max_waves=3)
    with _no_auto_broadcast(spark):
        assert "BroadcastHashJoin" in _plan(eng.listing())
        p = os.path.join(eng.store._dir("directory"), "_STATS-directory.json")
        doc = json.load(open(p))
        doc["n_rows"], doc["bytes_est"] = 50_000_000, 2 * 1024**3
        json.dump(doc, open(p, "w"))
        assert "BroadcastHashJoin" not in _plan(eng.listing())
