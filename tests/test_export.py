"""Exactly-once shard export (filedb/export.py) contracts."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from file_db_spark.filedb import export


@pytest.fixture()
def data(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("bigint").alias("shard"),
        (F.col("id") % 13).cast("bigint").alias("n_tok"),
    )
    root = tempfile.mkdtemp(prefix="exp_")
    yield df, root
    shutil.rmtree(root, ignore_errors=True)


def test_write_then_noop(spark, data):
    df, root = data
    first = export.export_shards(df, root, 7)
    assert first["status"] == "written"
    again = export.export_shards(df, root, 7)
    assert again["status"] == "noop"
    assert again["fingerprint"] == first["fingerprint"]
    back = export.read_export(spark, root)
    assert back.count() == 1000
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == set(
        range(7)
    )


def test_one_file_per_shard_sorted(spark, data):
    df, root = data
    m = export.export_shards(df, root, 7, order_col="doc_id")
    ddir = os.path.join(root, m["data_dir"])
    for k in range(7):
        files = glob.glob(os.path.join(ddir, f"shard={k}", "*.parquet"))
        assert len(files) == 1, k
        ids = [r["doc_id"] for r in spark.read.parquet(files[0]).collect()]
        assert ids == sorted(ids)


def test_changed_input_reexports_and_cleans_old(spark, data):
    df, root = data
    first = export.export_shards(df, root, 7)
    df2 = df.where(F.col("doc_id") % 2 == 0)
    second = export.export_shards(df2, root, 7)
    assert second["status"] == "written"
    assert second["fingerprint"] != first["fingerprint"]
    assert export.read_export(spark, root).count() == 500
    # the superseded data dir is reclaimed
    assert not os.path.isdir(os.path.join(root, first["data_dir"]))


def test_manifest_counts_match(spark, data):
    df, root = data
    m = export.export_shards(df, root, 7)
    want = {
        str(r["shard"]): r["n"]
        for r in df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert m["shards"] == want


def test_crash_before_publish_is_recoverable(spark, data):
    df, root = data
    # simulate: a staged dir exists but no manifest was ever published
    fp_dir = os.path.join(root, "data-deadbeef")
    os.makedirs(fp_dir)
    with pytest.raises(FileNotFoundError):
        export.read_export(spark, root)
    m = export.export_shards(df, root, 7)
    assert m["status"] == "written"
    assert export.read_export(spark, root).count() == 1000


def test_fingerprint_sees_shard_assignment(spark, data):
    """ADVICE r7: same ids, different shard assignment must re-export
    (shard_col is part of the fingerprinted row content)."""
    df, root = data
    first = export.export_shards(df, root, 7)
    moved = df.withColumn(
        "shard", ((F.col("doc_id") + 1) % 7).cast("bigint")
    )
    second = export.export_shards(moved, root, 7)
    assert second["status"] == "written"
    assert second["fingerprint"] != first["fingerprint"]


def test_fingerprint_sees_n_shards(spark, data):
    """Same rows, different shard count must re-export (n_shards is
    folded into the fingerprint)."""
    df, root = data
    df5 = df.withColumn("shard", (F.col("doc_id") % 5).cast("bigint"))
    first = export.export_shards(df5, root, 5)
    second = export.export_shards(df5, root, 7)
    assert second["status"] == "written"
    assert second["fingerprint"] != first["fingerprint"]


def test_fingerprint_sees_payload_and_order_cols(spark, data):
    """A payload-only change (same ids, same shards) must re-export —
    the fingerprint hashes every exported column, not just the id."""
    df, root = data
    first = export.export_shards(df, root, 7, order_col="n_tok")
    bumped = df.withColumn("n_tok", F.col("n_tok") + 1)
    second = export.export_shards(bumped, root, 7, order_col="n_tok")
    assert second["status"] == "written"
    assert second["fingerprint"] != first["fingerprint"]


def test_fingerprint_duplicate_rows_do_not_cancel(spark, data):
    """{A, B, B} must not fingerprint like {A}: the hash combine is a
    modular SUM, not XOR, so duplicate-id pairs cannot cancel."""
    df, root = data
    a = df.where(F.col("doc_id") < 3)
    b = df.where(F.col("doc_id") == 5)
    small = a.unionAll(b).unionAll(b)  # A + B + B
    first = export.export_shards(small, root, 7)
    second = export.export_shards(a, root, 7)
    assert second["status"] == "written"
    assert second["fingerprint"] != first["fingerprint"]


def test_fingerprint_sees_layout_params(spark, data):
    """Review r8: same rows, same shard count, but a DIFFERENT
    order_col parameter must re-export — the requested in-shard sort
    is part of the published layout."""
    df, root = data
    first = export.export_shards(df, root, 7, order_col="doc_id")
    second = export.export_shards(df, root, 7, order_col="n_tok")
    assert second["status"] == "written"
    assert second["fingerprint"] != first["fingerprint"]
