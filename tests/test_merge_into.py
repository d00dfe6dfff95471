"""TableStore.merge() — the general MERGE INTO primitive: clause
semantics, O5 change suppression, the O(changes) merge-on-read commit
shape, and its equivalence with merge.py's hand-built M1 upsert."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_db_spark.filedb import merge, schemas
from file_db_spark.filedb.store import TableStore

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

_NOW = datetime(2024, 7, 1)


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(lo, hi)], _SCHEMA
    )


def _store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "m"), {"t": _SCHEMA}, bucketing=False)


def test_merge_clauses_and_suppression(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.replace("t", _rows(spark, 0, 10))
    src = spark.createDataFrame(
        [
            (1, "n1", 999, False),   # changed -> update
            (2, "n2", 20, False),    # identical -> O5-suppressed
            (3, "n3", 30, True),     # tombstone -> delete
            (100, "new", 1, False),  # unmatched -> insert
        ],
        "id long, name string, v long, _del boolean",
    )
    m = st.merge(
        "t", src, ["id"],
        when_matched_update="all", when_not_matched_insert="all",
        when_matched_delete="s._del", changed_only=["name", "v"],
    )
    assert m == {"inserted": 1, "updated": 1, "deleted": 1}
    got = sorted((r["id"], r["v"]) for r in st.read("t").collect())
    want = sorted(
        [(i, i * 10) for i in range(10) if i not in (1, 3)] + [(1, 999), (100, 1)]
    )
    assert got == want
    # commit shape: base + one upsert segment, one deletion vector
    assert st.segment_count("t") == 2
    assert st.mor_debt("t") == {"filters": 0, "deletes": 1}


def test_merge_noop_commits_nothing(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.replace("t", _rows(spark, 0, 10))
    gens = len(st.generations("t"))
    m = st.merge("t", _rows(spark, 0, 10), ["id"], changed_only=["name", "v"])
    assert m == {"inserted": 0, "updated": 0, "deleted": 0}
    assert len(st.generations("t")) == gens  # an unchanged wave writes NOTHING


def test_merge_refuses_key_assignment(spark, tmp_path):
    st = _store(spark, tmp_path)
    with pytest.raises(ValueError, match="key column"):
        st.merge(
            "t", _rows(spark, 0, 1), ["id"],
            when_matched_update={"id": F.lit(0)},
        )


def test_merge_bucketed_is_incremental_and_keeps_layout(spark, tmp_path):
    """A bucketed target now merges O(changes): values identical, one
    merge-on-read wave recorded (bucket-aligned delta + DV, base
    hardlinked), bucket metadata still registered for shuffle-free
    joins — NOT a table rewrite."""
    st = TableStore(
        spark, str(tmp_path / "b"), {"file": schemas.FILE}, bucketing=True
    )
    from decimal import Decimal

    fcols = [f.name for f in schemas.FILE.fields]
    base = spark.createDataFrame(
        [
            (1, "a.txt", 10, Decimal("1.0"), _NOW, _NOW, _NOW, _NOW, _NOW),
            (2, "b.txt", 10, Decimal("2.0"), _NOW, _NOW, _NOW, _NOW, _NOW),
        ],
        schemas.FILE,
    )
    st.replace("file", base)
    src = spark.createDataFrame(
        [(2, "b.txt", 10, Decimal("5.0"), _NOW, _NOW, _NOW, _NOW, _NOW)],
        schemas.FILE,
    )
    m = st.merge(
        "file", src, ["id"],
        when_matched_update="all", when_not_matched_insert="all",
        changed_only=["size"],
    )
    assert m["updated"] == 1 and m["deleted"] == 0 and m["inserted"] == 0
    got = {r["id"]: float(r["size"]) for r in st.read("file").select("id", "size").collect()}
    assert got == {1: 1.0, 2: 5.0}
    debt = st.mor_debt("file")
    assert debt["deletes"] == 1 and debt["waves"] == 1  # MOR commit, no rewrite
    assert fcols  # schema intact


def test_m1_upsert_via_merge_equals_handbuilt(spark, tmp_path):
    """upsert_directories_into (store.merge with M1's clauses) lands
    the exact state merge_directories computes by hand — the engine's
    crawl-wave commit is a pure re-expression, not a semantic fork."""
    st = TableStore(
        spark, str(tmp_path / "d"), {"directory": schemas.DIRECTORY},
        bucketing=False,
    )
    t0 = datetime(2024, 6, 1)
    existing = spark.createDataFrame(
        [
            (1, "/a", t0, t0, t0, t0),
            (2, "/b", t0, t0, t0, t0),
            (3, "/c", t0, t0, t0, t0),
        ],
        schemas.DIRECTORY,
    )
    st.replace("directory", existing)
    t1 = datetime(2024, 6, 15)
    staged = spark.createDataFrame(
        [
            (2, "/b", t0, t1),   # mtime changed -> update
            (3, "/c", t0, t0),   # identical -> suppressed
            (9, "/new", t1, t1), # insert
        ],
        "id long, dir_path string, ctime timestamp, mtime timestamp",
    )
    hand = merge.merge_directories(
        existing, staged, spark.createDataFrame([], "dir_path string"), _NOW
    ).directory
    m = merge.upsert_directories_into(st, staged, _NOW)
    assert m == {"inserted": 1, "updated": 1, "deleted": 0}
    cols = [f.name for f in schemas.DIRECTORY.fields]
    got = sorted(tuple(r) for r in st.read("directory").select(*cols).collect())
    want = sorted(tuple(r) for r in hand.select(*cols).collect())
    assert got == want
    # and the commit was merge-on-read, not a rewrite
    assert st.segment_count("directory") == 2
    assert st.mor_debt("directory")["deletes"] == 1


def test_merge_after_schema_evolution(spark, tmp_path):
    """MERGE INTO composes with metadata-only schema evolution: after
    evolve() adds a nullable column, a merge may set it — old rows
    (written pre-evolution) read NULL there, updated/inserted rows
    carry values, and the delta commit shape is preserved."""
    st = _store(spark, tmp_path)
    st.replace("t", _rows(spark, 0, 5))
    wider = T.StructType(
        list(_SCHEMA.fields) + [T.StructField("tag", T.StringType(), True)]
    )
    st.evolve("t", wider)
    src = spark.createDataFrame(
        [(1, "n1", 999, "hot"), (100, "new", 1, "cold")],
        "id long, name string, v long, tag string",
    )
    m = st.merge(
        "t", src, ["id"],
        when_matched_update="all", when_not_matched_insert="all",
        changed_only=["name", "v", "tag"],
    )
    assert m == {"inserted": 1, "updated": 1, "deleted": 0}
    got = {r["id"]: (r["v"], r["tag"]) for r in st.read("t").collect()}
    assert got[1] == (999, "hot") and got[100] == (1, "cold")
    assert got[2] == (20, None)  # pre-evolution row null-fills
    assert st.segment_count("t") == 2  # still a delta commit
