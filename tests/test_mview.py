"""Materialized-view refresh contracts (TableStore.create_mview /
refresh_mview) — the edge cases the graded g28 entry can't isolate:
zero-net-group exclusion, SUM0 semantics for all-NULL groups, the
replay guard, and spec validation.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from file_db_spark.filedb.store import TableStore

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)


def _store(spark):
    root = tempfile.mkdtemp(prefix="mvt_")
    return TableStore(spark, root, {"src": SCHEMA}, bucketing=False)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mv(store):
    store.create_mview(
        "mv",
        "src",
        group_by=["grp"],
        count_col="n",
        sums={"total": "val"},
        key_cols=["id"],
        compare_cols=["grp", "val"],
    )


def _rows(store):
    return {
        r["grp"]: (r["n"], r["total"]) for r in store.read("mv").collect()
    }


def test_seed_then_incremental_matches_recompute(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 10), (2, "a", 5), (3, "b", 7)]))
    _mv(store)
    assert _rows(store) == {"a": (2, 15), "b": (1, 7)}
    # move 2 a->b, change 3's value, insert c, delete 1
    store.replace("src", _df(spark, [(2, "b", 5), (3, "b", 9), (4, "c", 1)]))
    m = store.refresh_mview("mv")
    assert m["status"] == "applied"
    assert _rows(store) == {"b": (2, 14), "c": (1, 1)}
    # group 'a' emptied -> deleted; 'c' new -> inserted
    assert m["deleted"] == 1 and m["inserted"] == 1 and m["updated"] == 1


def test_zero_net_group_writes_nothing(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 10), (2, "b", 5)]))
    _mv(store)
    gens_before = len(store.generations("mv"))
    # swap ids within 'a'-equivalent state: delete 1, insert 3 same group
    # and value -> net zero for 'a', real change for 'b'
    store.replace("src", _df(spark, [(3, "a", 10), (2, "b", 6)]))
    m = store.refresh_mview("mv")
    assert m["updated"] == 1 and m["inserted"] == 0 and m["deleted"] == 0
    assert _rows(store) == {"a": (1, 10), "b": (1, 6)}
    assert len(store.generations("mv")) == gens_before + 1


def test_sum0_all_null_group(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", None), (2, "a", None)]))
    _mv(store)
    assert _rows(store) == {"a": (2, 0)}
    store.replace("src", _df(spark, [(1, "a", None)]))
    store.refresh_mview("mv")
    assert _rows(store) == {"a": (1, 0)}


def test_null_group_key(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, None, 3), (2, "a", 4)]))
    _mv(store)
    store.replace("src", _df(spark, [(1, None, 5), (2, "a", 4)]))
    store.refresh_mview("mv")
    assert _rows(store) == {None: (1, 5), "a": (1, 4)}


def test_noop_and_replay_guard(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    _mv(store)
    assert store.refresh_mview("mv")["status"] == "noop"
    store.replace("src", _df(spark, [(1, "a", 2)]))
    assert store.refresh_mview("mv")["status"] == "applied"
    # crash window: cursor rolled back, applied marker current
    gens = store.generations("src")
    with open(store._cursor_path("src", "__mv_mv"), "w") as fh:
        fh.write(os.path.basename(gens[0]))
    assert store.refresh_mview("mv")["status"] == "replayed"
    # no double apply
    assert _rows(store) == {"a": (1, 2)}
    # and the cursor is healed: next refresh is a plain noop
    assert store.refresh_mview("mv")["status"] == "noop"


def test_spec_validation(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="not covered"):
        store.create_mview(
            "mv",
            "src",
            group_by=["grp"],
            count_col="n",
            sums={"total": "val"},
            key_cols=["id"],
            compare_cols=["grp"],  # val missing from the feed
        )


def test_mview_is_a_real_store_table(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1), (2, "b", 2)]))
    _mv(store)
    store.replace("src", _df(spark, [(1, "a", 9), (2, "b", 2)]))
    store.refresh_mview("mv")
    # time travel to the seeded MV generation
    old = {
        r["grp"]: (r["n"], r["total"])
        for r in store.read_at("mv", back=1).collect()
    }
    assert old == {"a": (1, 1), "b": (1, 2)}


def test_vacuumed_cursor_reseeds(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1), (2, "b", 2)]))
    _mv(store)
    # two source commits WITHOUT refreshing, then vacuum past the cursor
    store.replace("src", _df(spark, [(1, "a", 5), (2, "b", 2)]))
    store.replace("src", _df(spark, [(1, "a", 5), (3, "c", 7)]))
    store.vacuum(retain=1)
    m = store.refresh_mview("mv")
    assert m["status"] == "reseeded"
    assert _rows(store) == {"a": (1, 5), "c": (1, 7)}
    # incremental maintenance resumes cleanly after the re-seed
    store.replace("src", _df(spark, [(1, "a", 6), (3, "c", 7)]))
    m2 = store.refresh_mview("mv")
    assert m2["status"] == "applied" and m2["updated"] == 1
    assert _rows(store) == {"a": (1, 6), "c": (1, 7)}


# -- generative: incremental == recompute under arbitrary wave chains --

from hypothesis import given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.integers(min_value=0, max_value=11),                    # id
    st.sampled_from(["a", "b", "c", None]),                    # grp
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # val
)


def _state(rows):
    # key-distinct by id (last write wins, like a table state)
    return list({r[0]: r for r in rows}.values())


@st.composite
def _wave_chain(draw):
    base = _state(draw(st.lists(_row, min_size=0, max_size=10)))
    waves = [
        _state(draw(st.lists(_row, min_size=0, max_size=10)))
        for _ in range(draw(st.integers(min_value=1, max_value=3)))
    ]
    return base, waves


@settings(max_examples=12, deadline=None)
@given(_wave_chain())
def test_mv_refresh_equals_recompute_generatively(spark, chain):
    """For ANY base state and wave sequence — inserts, deletes,
    group moves, NULL groups, NULL values, groups emptied to zero —
    every incremental refresh must equal the straight recompute."""
    base, waves = chain
    store = _store(spark)
    store.replace("src", _df(spark, base))
    _mv(store)
    for wave in waves:
        store.replace("src", _df(spark, wave))
        store.refresh_mview("mv")
        want = {
            (r["grp"],): (r["n"], r["total"])
            for r in store._mv_compute(
                store.read("src"), store.mview_spec("mv")
            ).collect()
        }
        got = {(k,): v for k, v in _rows(store).items()}
        assert got == want


def test_consumer_aware_vacuum_keeps_lagging_cursor(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    _mv(store)
    store.replace("src", _df(spark, [(1, "a", 2)]))
    store.replace("src", _df(spark, [(1, "a", 3)]))
    # consumer-aware vacuum: the lagging MV cursor's generation survives
    store.vacuum(retain=1, respect_consumers=True)
    m = store.refresh_mview("mv")
    assert m["status"] == "applied"
    assert _rows(store) == {"a": (1, 3)}
    # cursor advanced -> the next vacuum reclaims the old generations
    store.vacuum(retain=1, respect_consumers=True)
    assert len(store.generations("src")) == 1


def test_racing_source_commit_not_skipped(spark):
    """ADVICE r7: a source commit landing between the refresh's CDC
    pull and its cursor advance must NOT be skipped. The refresh pins
    the generation it actually diffed and advances the cursor to
    exactly that generation, so the racing commit stays ahead of the
    cursor and the NEXT refresh applies it."""
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    _mv(store)
    store.replace("src", _df(spark, [(1, "a", 2)]))

    real_merge = store.merge
    raced = {"done": False}

    def racing_merge(name, *a, **kw):
        if not raced["done"]:
            raced["done"] = True
            # a second writer commits to src mid-refresh (after the
            # pull, before the cursor advance)
            store.replace("src", _df(spark, [(1, "a", 5), (2, "b", 7)]))
        return real_merge(name, *a, **kw)

    store.merge = racing_merge
    assert store.refresh_mview("mv")["status"] == "applied"
    store.merge = real_merge
    # the racing commit is still pending (cursor pinned at the diffed
    # generation), and the next refresh applies it — never skipped
    assert store.refresh_mview("mv")["status"] == "applied"
    assert _rows(store) == {"a": (1, 5), "b": (1, 7)}
    assert store.refresh_mview("mv")["status"] == "noop"


def test_cursor_lost_while_applied_current_self_heals(spark):
    """ADVICE r7: a missing cursor file with the applied marker still
    current re-pins (status 'replayed') instead of raising a raw
    FileNotFoundError."""
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    _mv(store)
    os.remove(store._cursor_path("src", "__mv_mv"))
    assert store.refresh_mview("mv")["status"] == "replayed"
    assert store.refresh_mview("mv")["status"] == "noop"
    assert _rows(store) == {"a": (1, 1)}


def test_cursor_lost_with_pending_commits_reseeds(spark):
    """A missing cursor file with source commits pending falls into
    the reseed path (full recompute of the pinned generation)."""
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    _mv(store)
    store.replace("src", _df(spark, [(1, "a", 2), (2, "b", 3)]))
    os.remove(store._cursor_path("src", "__mv_mv"))
    assert store.refresh_mview("mv")["status"] == "reseeded"
    assert _rows(store) == {"a": (1, 2), "b": (1, 3)}
    assert store.refresh_mview("mv")["status"] == "noop"


def test_list_mviews(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 1)]))
    assert store.list_mviews() == []
    _mv(store)
    store.create_mview(
        "mv2",
        "src",
        group_by=["grp"],
        count_col="n",
        sums={},
        key_cols=["id"],
        compare_cols=["grp", "val"],
    )
    assert store.list_mviews() == ["mv", "mv2"]
    # a fresh instance over the same root sees them too
    again = TableStore(spark, store.root, {"src": SCHEMA}, bucketing=False)
    assert again.list_mviews() == ["mv", "mv2"]


# ---------------------------------------------------------------------------
# MIN/MAX aggregates (VERDICT r7 #6): incremental on inserts,
# delete-aware per-group recompute where the current extreme was
# retracted — incremental == recompute through every wave shape.
# ---------------------------------------------------------------------------


def _mv_mm(store):
    store.create_mview(
        "mm",
        "src",
        group_by=["grp"],
        count_col="n",
        sums={"total": "val"},
        mins={"lo": "val"},
        maxs={"hi": "val"},
        key_cols=["id"],
        compare_cols=["grp", "val"],
    )


def _mm_rows(store):
    return {
        r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in store.read("mm").collect()
    }


def _mm_recompute(store):
    return {
        r["grp"]: (r["n"], r["total"], r["lo"], r["hi"])
        for r in store._mv_compute(
            store.read("src"), store.mview_spec("mm")
        ).collect()
    }


def test_minmax_insert_only_is_incremental(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 5), (2, "a", 9)]))
    _mv_mm(store)
    assert _mm_rows(store) == {"a": (2, 14, 5, 9)}
    # inserts extend extremes via least/greatest — no recompute needed
    store.replace(
        "src", _df(spark, [(1, "a", 5), (2, "a", 9), (3, "a", 1), (4, "b", 7)])
    )
    assert store.refresh_mview("mm")["status"] == "applied"
    assert _mm_rows(store) == _mm_recompute(store) == {
        "a": (3, 15, 1, 9),
        "b": (1, 7, 7, 7),
    }


def test_minmax_retracted_extreme_recomputes_group(spark):
    store = _store(spark)
    store.replace(
        "src", _df(spark, [(1, "a", 5), (2, "a", 9), (3, "b", 2), (4, "b", 8)])
    )
    _mv_mm(store)
    # delete a's MIN holder and b's MAX holder; update nothing else
    store.replace("src", _df(spark, [(2, "a", 9), (3, "b", 2)]))
    store.refresh_mview("mm")
    assert _mm_rows(store) == _mm_recompute(store) == {
        "a": (1, 9, 9, 9),
        "b": (1, 2, 2, 2),
    }


def test_minmax_nonextreme_retraction_stays_incremental(spark):
    store = _store(spark)
    store.replace(
        "src", _df(spark, [(1, "a", 5), (2, "a", 9), (3, "a", 7)])
    )
    _mv_mm(store)
    store.replace("src", _df(spark, [(1, "a", 5), (2, "a", 9)]))
    store.refresh_mview("mm")
    assert _mm_rows(store) == {"a": (2, 14, 5, 9)}


def test_minmax_update_moves_extreme_value(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 5), (2, "a", 9)]))
    _mv_mm(store)
    # the min holder's value moves UP: pure count/sum deltas are zero
    # net for count, but the extreme must recompute to 7
    store.replace("src", _df(spark, [(1, "a", 7), (2, "a", 9)]))
    store.refresh_mview("mm")
    assert _mm_rows(store) == _mm_recompute(store) == {"a": (2, 16, 7, 9)}


def test_minmax_null_values_and_group_emptied(spark):
    store = _store(spark)
    store.replace(
        "src", _df(spark, [(1, "a", None), (2, "a", 4), (3, "b", 1)])
    )
    _mv_mm(store)
    assert _mm_rows(store) == {"a": (2, 4, 4, 4), "b": (1, 1, 1, 1)}
    # retract the last non-null of a (extremes -> NULL), empty b
    store.replace("src", _df(spark, [(1, "a", None)]))
    store.refresh_mview("mm")
    assert _mm_rows(store) == _mm_recompute(store) == {
        "a": (1, 0, None, None)
    }


def test_minmax_chain_matches_recompute(spark):
    store = _store(spark)
    store.replace("src", _df(spark, [(1, "a", 3), (2, "b", 6), (3, None, 9)]))
    _mv_mm(store)
    waves = [
        [(1, "a", 3), (2, "a", 6), (3, None, 9), (4, "c", -1)],  # group move
        [(1, "a", 10), (3, None, 2), (4, "c", -1)],  # extreme moves + delete
        [(5, "c", -5), (6, "c", 50), (1, "a", 10)],  # new extremes + empties
    ]
    for wave in waves:
        store.replace("src", _df(spark, wave))
        store.refresh_mview("mm")
        got = {
            (k,): v for k, v in _mm_rows(store).items()
        }
        want = {(k,): v for k, v in _mm_recompute(store).items()}
        assert got == want, wave


@settings(max_examples=10, deadline=None)
@given(_wave_chain())
def test_mv_minmax_refresh_equals_recompute_generatively(spark, chain):
    """MIN/MAX incremental == recompute for ANY base + wave sequence
    (extremes retracted, moved, duplicated, NULLed; groups emptied)."""
    base, waves = chain
    store = _store(spark)
    store.replace("src", _df(spark, base))
    _mv_mm(store)
    for wave in waves:
        store.replace("src", _df(spark, wave))
        store.refresh_mview("mm")
        got = {(k,): v for k, v in _mm_rows(store).items()}
        want = {(k,): v for k, v in _mm_recompute(store).items()}
        assert got == want
