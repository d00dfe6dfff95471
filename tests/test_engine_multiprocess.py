"""Engine-level two-process claim race (VERDICT r9 #4).

Two separate Spark driver processes (own JVMs) run crawl waves over
ONE shared catalog root + ONE shared tree, start-gated so the waves
actually overlap. The claim section commits assigned_process_id under
the control table's flock, so the processes must claim DISJOINT
frontiers; the final catalog must equal a from-scratch single-process
crawl of the same tree (no lost dir, no duplicated file row)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CRAWLER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from file_db_spark.filedb.engine import Engine

spark = (
    SparkSession.builder.master("local[2]")
    .appName("mp-crawler-{pid}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
eng = Engine(spark, {catalog!r})
open(os.path.join({work!r}, "ready-{pid}"), "w").close()
while not os.path.exists(os.path.join({work!r}, "go")):
    time.sleep(0.05)
frontiers = []
while True:
    n = eng.crawl_once(limit=1, process_id={pid})
    if n == 0:
        break
    frontiers.append(list(eng.last_frontier))
with open(os.path.join({work!r}, "claims-{pid}.json"), "w") as fh:
    json.dump(frontiers, fh)
spark.stop()
"""


def _build_tree(root: str) -> list[str]:
    dirs = [root]
    for i in range(3):
        d = os.path.join(root, f"d{i}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
        with open(os.path.join(d, f"f{i}.txt"), "w") as fh:
            fh.write(f"content-{i}")
    with open(os.path.join(root, "top.txt"), "w") as fh:
        fh.write("top")
    return dirs


def test_two_engine_processes_claim_disjoint_frontiers(spark):
    from file_db_spark.filedb.engine import Engine

    work = tempfile.mkdtemp(prefix="mpengine_")
    tree = os.path.join(work, "tree")
    expected_dirs = set(_build_tree(tree))
    catalog = os.path.join(work, "catalog")

    # parent seeds the shared catalog (install + root) with its own
    # session, then two fresh driver processes race the waves
    seed = Engine(spark, catalog)
    seed.install()
    seed.add_root(tree)

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _CRAWLER.format(repo=REPO, catalog=catalog, work=work, pid=pid),
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for pid in (101, 102)
    ]
    deadline = time.time() + 240
    while time.time() < deadline and not all(
        os.path.exists(os.path.join(work, f"ready-{p}")) for p in (101, 102)
    ):
        time.sleep(0.2)
    open(os.path.join(work, "go"), "w").close()
    for p in procs:
        assert p.wait(timeout=600) == 0

    claims: dict[int, list[str]] = {}
    for pid in (101, 102):
        with open(os.path.join(work, f"claims-{pid}.json")) as fh:
            claims[pid] = [d for wave in json.load(fh) for d in wave]
    a, b = set(claims[101]), set(claims[102])
    # DISJOINT claim sets covering every directory exactly once
    assert a & b == set()
    assert a | b == expected_dirs
    assert len(claims[101]) + len(claims[102]) == len(expected_dirs)

    # catalog state identical to a serial single-process crawl
    serial = Engine(spark, os.path.join(work, "serial_catalog"))
    serial.install()
    serial.add_root(tree)
    while serial.crawl_once(limit=100):
        pass
    raced = Engine(spark, catalog)

    def dirset(eng):
        return {
            r["dir_path"] for r in eng.store.read("directory").collect()
        }

    def fileset(eng):
        return {
            (r["name"], r["dir_id"], str(r["size"]))
            for r in eng.store.read("file").collect()
        }

    assert dirset(raced) == dirset(serial) == expected_dirs
    assert fileset(raced) == fileset(serial)
    # hash schedule has no duplicated rows either
    hc = raced.store.read("hash_control").collect()
    assert len({r["file_id"] for r in hc}) == len(hc) == 4
