"""Rename/drop schema evolution via column mapping (VERDICT r7 #8):
metadata-only renames and drops over epoch-stamped segments, with
time travel, CDC, appends across the boundary, clone sharing, and the
dropped-then-readded-name fence all pinned."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F, types as T

from file_db_spark.filedb.store import TableStore

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _store(spark, tag="cm"):
    root = tempfile.mkdtemp(prefix=f"{tag}_")
    return TableStore(spark, root, {"t": _SCHEMA}, bucketing=False)


def _df(spark, rows, schema=_SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_rename_is_metadata_only_and_uniform(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10), (2, "b", 20)]))
    st.append("t", _df(spark, [(3, "c", 30)]))
    seg_files_before = {
        f for f in os.listdir(st._dir("t")) if f.startswith(("gen-", "seg-"))
    }
    st.rename_column("t", "name", "label")
    # no data dir was touched
    assert {
        f for f in os.listdir(st._dir("t")) if f.startswith(("gen-", "seg-"))
    } == seg_files_before
    got = {r["id"]: r["label"] for r in st.read("t").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    assert "name" not in st.read("t").columns
    # writes after the rename use the new name; reads stay uniform
    st.append("t", _df(
        spark, [(4, "d", 40)],
        "id long, label string, v long",
    ))
    got = {r["id"]: r["label"] for r in st.read("t").collect()}
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}


def test_time_travel_and_cdc_across_rename_boundary(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    st.create_consumer("t", "sub")
    st.rename_column("t", "v", "value")
    st.replace("t", _df(
        spark, [(1, "a", 11), (2, "b", 22)],
        "id long, name string, value long",
    ))
    # time travel across the boundary presents CURRENT names (the
    # Delta column-mapping semantics)
    old = st.read_at("t", back=1)
    assert old.columns == ["id", "name", "value"]
    assert [tuple(r) for r in old.collect()] == [(1, "a", 10)]
    # CDC across the boundary: rename itself is invisible; the value
    # change and insert are the only ops
    delta = st.changes_since("t", "sub", ["id"], ["name", "value"])
    ops = {r["id"]: (r["op"], r["new_value"]) for r in delta.collect()}
    assert ops == {1: ("U", 11), 2: ("I", 22)}


def test_rename_alone_yields_empty_cdc_diff(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    st.create_consumer("t", "sub")
    st.rename_column("t", "v", "value")
    delta = st.changes_since("t", "sub", ["id"], ["name", "value"])
    assert delta.count() == 0


def test_chained_renames_resolve_through_epochs(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    st.rename_column("t", "v", "w")
    st.append("t", _df(spark, [(2, "b", 20)], "id long, name string, w long"))
    st.rename_column("t", "w", "x")
    st.append("t", _df(spark, [(3, "c", 30)], "id long, name string, x long"))
    got = {r["id"]: r["x"] for r in st.read("t").collect()}
    assert got == {1: 10, 2: 20, 3: 30}


def test_drop_then_readd_never_leaks_old_bytes(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10), (2, "b", 20)]))
    st.drop_column("t", "v")
    assert st.read("t").columns == ["id", "name"]
    # re-add a column under the SAME name: old segments must null-fill
    st.evolve(
        "t",
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("v", T.LongType()),
            ]
        ),
    )
    st.append("t", _df(spark, [(3, "c", 99)]))
    got = {r["id"]: r["v"] for r in st.read("t").collect()}
    assert got == {1: None, 2: None, 3: 99}


def test_guards(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    with pytest.raises(ValueError, match="no column"):
        st.rename_column("t", "zz", "y")
    with pytest.raises(ValueError, match="already exists"):
        st.rename_column("t", "v", "name")
    st.delete_where("t", "id = 99")
    with pytest.raises(ValueError, match="compact"):
        st.rename_column("t", "v", "w")
    st.compact("t", max_segments=0)
    st.rename_column("t", "v", "w")  # debt folded -> allowed
    # bucketed tables are refused
    from file_db_spark.filedb import schemas as _sch

    bt = TableStore(
        spark, tempfile.mkdtemp(prefix="cmb_"), {"file": _sch.FILE},
        bucketing=True,
    )
    with pytest.raises(ValueError, match="bucketed"):
        bt.rename_column("file", "name", "fname")


def test_fresh_instance_sees_renamed_schema(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    st.rename_column("t", "name", "label")
    # a new instance constructed with the STALE declared schema adopts
    # the persisted post-rename one (colmap tables: disk wins)
    again = TableStore(spark, st.root, {"t": _SCHEMA}, bucketing=False)
    assert again.read("t").columns == ["id", "label", "v"]
    assert [r["label"] for r in again.read("t").collect()] == ["a"]


def test_clone_shares_epoch_map(spark):
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    st.rename_column("t", "v", "value")
    st.clone("t", "t2")
    got = st.read("t2")
    assert got.columns == ["id", "name", "value"]
    assert [tuple(r) for r in got.collect()] == [(1, "a", 10)]
    # target renames diverge without touching the source
    st.rename_column("t2", "value", "v2")
    assert st.read("t2").columns == ["id", "name", "v2"]
    assert st.read("t").columns == ["id", "name", "value"]


def test_rename_refuses_columns_referenced_by_mviews(spark):
    """Review r8: a rename/drop a registered MV spec references would
    break every subsequent refresh — refuse with a pointer."""
    st = _store(spark)
    st.replace("t", _df(spark, [(1, "a", 10)]))
    st.create_mview(
        "rollup",
        "t",
        group_by=["name"],
        count_col="n",
        sums={"total": "v"},
        key_cols=["id"],
        compare_cols=["name", "v"],
    )
    with pytest.raises(ValueError, match="rollup"):
        st.rename_column("t", "v", "val")
    with pytest.raises(ValueError, match="rollup"):
        st.drop_column("t", "name")
