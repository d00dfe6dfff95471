"""Cross-process commit safety (VERDICT r7 #5).

The per-(root, table) commit lock is a thread RLock PLUS an exclusive
flock on `<root>/_locks/<table>.lock`, so TWO OS PROCESSES writing one
store table serialize their read-base + commit sequences — the lost-
update window the in-process-only RLock left open. Two tests:

- a lock-primitive race: two spawned Python processes each do 150
  read-modify-write cycles on a shared counter file under
  _commit_lock; without the flock this loses ~half the increments.
- the real thing: two separate Spark driver processes (own JVMs) each
  append N waves to the SAME store table concurrently (start-gated so
  the loops actually overlap); every append must land — 2N segments,
  2N rows, N per writer.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _count_worker(root: str, counter: str, n: int) -> None:
    from file_db_spark.filedb.store import _commit_lock

    for _ in range(n):
        with _commit_lock(root, "t"):
            with open(counter) as fh:
                v = int(fh.read())
            with open(counter, "w") as fh:
                fh.write(str(v + 1))


def test_commit_lock_serializes_across_processes():
    root = tempfile.mkdtemp(prefix="mplock_")
    counter = os.path.join(root, "counter")
    with open(counter, "w") as fh:
        fh.write("0")
    ctx = mp.get_context("spawn")
    n = 150
    procs = [
        ctx.Process(target=_count_worker, args=(root, counter, n))
        for _ in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    with open(counter) as fh:
        assert int(fh.read()) == 2 * n


_WRITER = """
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, types as T
from file_db_spark.filedb.store import TableStore

spark = (
    SparkSession.builder.master("local[2]")
    .appName("mp-writer-{tag}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
schema = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("who", T.StringType())]
)
store = TableStore(spark, {root!r}, {{"t": schema}}, bucketing=False)
open(os.path.join({root!r}, "ready-{tag}"), "w").close()
while not os.path.exists(os.path.join({root!r}, "go")):
    time.sleep(0.05)
for i in range({n}):
    store.append(
        "t", spark.createDataFrame([({base} + i, "{tag}")], schema)
    )
spark.stop()
"""


def test_racing_appends_from_two_processes_all_land(spark):
    """Two engine processes on one store: every append from both must
    survive — no lost segment, no lost manifest entry."""
    from pyspark.sql import types as T

    from file_db_spark.filedb.store import TableStore

    root = tempfile.mkdtemp(prefix="mpstore_")
    n = 6
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _WRITER.format(repo=REPO, root=root, tag=tag, n=n, base=base),
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for tag, base in (("a", 0), ("b", 1000))
    ]
    deadline = time.time() + 180
    while time.time() < deadline and not all(
        os.path.exists(os.path.join(root, f"ready-{t}")) for t in ("a", "b")
    ):
        time.sleep(0.2)
    open(os.path.join(root, "go"), "w").close()
    for p in procs:
        assert p.wait(timeout=300) == 0
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("who", T.StringType()),
        ]
    )
    store = TableStore(spark, root, {"t": schema}, bucketing=False)
    rows = store.read("t").collect()
    assert len(rows) == 2 * n
    by_writer = {}
    for r in rows:
        by_writer.setdefault(r["who"], set()).add(r["id"])
    assert by_writer["a"] == set(range(n))
    assert by_writer["b"] == {1000 + i for i in range(n)}
    # every append is one manifest entry: none may have been lost to a
    # racing read-base+commit
    assert store.segment_count("t") == 2 * n
    # and the catalog pointer resolves the newest generation (json
    # intact — no torn concurrent catalog writes)
    cat = store._read_catalog()
    assert cat["tables"]["t"].startswith("gen-")
    json.dumps(cat)  # round-trippable


def test_lock_acquire_unwinds_on_flock_failure(monkeypatch):
    """Review r8: a failing flock must not leave the RLock held or let
    a retry run unlocked at depth 2."""
    import tempfile

    from file_db_spark.filedb import store as store_mod

    root = tempfile.mkdtemp(prefix="lockfail_")
    lk = store_mod._commit_lock(root, "t_failcase")

    calls = {"n": 0}
    real_flock = store_mod._fcntl.flock

    def failing_flock(fh, op):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected ENOLCK")
        return real_flock(fh, op)

    monkeypatch.setattr(store_mod._fcntl, "flock", failing_flock)
    try:
        with pytest.raises(OSError, match="ENOLCK"):
            lk.acquire()
        # fully unwound: depth 0, RLock free, retry takes the flock
        assert lk._depth == 0 and lk._fh is None
        with lk:
            assert lk._depth == 1 and lk._fh is not None
        assert lk._depth == 0 and lk._fh is None
    finally:
        monkeypatch.setattr(store_mod._fcntl, "flock", real_flock)


import pytest  # noqa: E402  (used by the test above)
