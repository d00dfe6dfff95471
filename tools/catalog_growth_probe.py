#!/usr/bin/env python
"""Catalog-growth scale probe for the crawl wave (VERDICT r9 #7).

crawl_bench doubles the TREE (wave and catalog grow together); this
probe holds the WAVE fixed and grows the CATALOG around it — the
direct measurement of the round-10 claim that a wave's cost tracks the
wave, not the catalog:

- the due-claim scan reads only control segments whose next_crawl zone
  range reaches the past (store.read_pruned);
- the M1 probe reads only directory segments intersecting the
  frontier's subtree hull;
- the M2 probe reads only `file` data files whose per-file dir_id
  zone/bloom digests can hold a frontier dir_id
  (store.read_bucketed_pruned — the round-10 addition);
- every commit is O(changes).

Method: for each scale in {1, 10, 100}, build a FRESH catalog root,
inflate it with `scale * base` synthetic not-due rows (directory +
file + directory_control committed in wave-sized batches, so zone maps
and per-file digests accumulate exactly as continuous crawl would lay
them down), then add ONE real tree and time its full crawl. Exponent
per decade = log10(t_100x / t_1x) / 2 — flat (~0) means the wave cost
is catalog-size-invariant.

Usage: python tools/catalog_growth_probe.py [--base-dirs 2000]
       [--files-per-dir 5] [--batches 10] [--tree-top 4 --tree-sub 4]
Prints ONE JSON line with per-scale walls, probe reports, and the
decade exponent.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import timedelta

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_tree(root: str, top: int, sub: int, files_per_leaf: int) -> int:
    n = 0
    for i in range(top):
        for j in range(sub):
            d = os.path.join(root, f"d{i:02d}", f"s{j:02d}")
            os.makedirs(d, exist_ok=True)
            for k in range(files_per_leaf):
                with open(os.path.join(d, f"f{k:03d}.bin"), "wb") as fh:
                    fh.write(b"x" * 64 + str((i, j, k)).encode())
                n += 1
    return n


def inflate_catalog(eng, spark, scale: int, base_dirs: int,
                    files_per_dir: int, batches: int, now) -> None:
    """Commit `scale * base_dirs` synthetic NOT-DUE dirs (+ files +
    control rows) in `batches * scale` wave-sized commits, through the
    same apply_changes path a crawl wave uses — so the catalog's
    segment/zone/digest layout is the one continuous crawl produces."""
    from pyspark.sql import functions as F

    far = now + timedelta(days=370)
    total = scale * base_dirs
    # commits scale with waves but are capped so the 100x build stays
    # minutes, not hours — compaction folds the chain every 20 batches
    # regardless, so the steady-state segment layout is the same
    n_batches = min(batches * scale, 60)
    per_batch = max(1, total // n_batches)
    for b in range(n_batches):
        lo = b * per_batch
        dirs = (
            spark.range(lo, lo + per_batch)
            .select(
                F.concat(F.lit("/syn/c"), (F.col("id") % 97).cast("string"),
                         F.lit("/d"), F.col("id").cast("string")).alias("dir_path")
            )
            .select(
                F.xxhash64("dir_path").alias("id"),
                "dir_path",
                F.lit(now).cast("timestamp").alias("ctime"),
                F.lit(now).cast("timestamp").alias("mtime"),
                F.lit(now).cast("timestamp").alias("inserted_on"),
                F.lit(now).cast("timestamp").alias("updated_on"),
            )
        )
        eng.store.apply_changes(
            "directory", ["dir_path"], inserts=dirs, zone_cols=["dir_path"]
        )
        files = (
            spark.range(lo * files_per_dir, (lo + per_batch) * files_per_dir)
            .select(
                F.concat(
                    F.lit("/syn/c"),
                    ((F.col("id") / files_per_dir).cast("long") % 97).cast("string"),
                    F.lit("/d"),
                    (F.col("id") / files_per_dir).cast("long").cast("string"),
                ).alias("dir_path"),
                F.concat(F.lit("f"), (F.col("id") % files_per_dir).cast("string"),
                         F.lit(".bin")).alias("name"),
            )
            .select(
                F.xxhash64("dir_path", "name").alias("id"),
                "name",
                F.xxhash64("dir_path").alias("dir_id"),
                F.lit("0.001").cast("decimal(18,6)").alias("size"),
                F.lit(now).cast("timestamp").alias("ctime"),
                F.lit(now).cast("timestamp").alias("mtime"),
                F.lit(now).cast("timestamp").alias("atime"),
                F.lit(now).cast("timestamp").alias("inserted_on"),
                F.lit(now).cast("timestamp").alias("updated_on"),
            )
        )
        eng.store.apply_changes("file", ["id"], inserts=files)
        control = dirs.select(
            "dir_path",
            F.col("id").alias("dir_id"),
            F.lit(files_per_dir).cast("int").alias("file_count"),
            F.lit(0).cast("int").alias("subdir_count"),
            F.lit(far).cast("timestamp").alias("next_crawl"),
            F.lit(86400).cast("int").alias("crawl_frequency"),
            F.lit(None).cast("int").alias("assigned_process_id"),
            F.lit(None).cast("timestamp").alias("process_assigned_on"),
            F.lit(now).cast("timestamp").alias("last_crawled"),
            F.lit(now).cast("timestamp").alias("last_active"),
            F.lit(False).alias("dir_missing"),
            F.lit(now).cast("timestamp").alias("inserted_on"),
        )
        eng.store.apply_changes(
            "directory_control",
            ["dir_path"],
            inserts=control,
            zone_cols=["dir_path", "next_crawl"],
        )
        # periodic maintenance, as run_until_idle would do
        if (b + 1) % 20 == 0:
            for t in ("directory", "directory_control", "file"):
                eng.store.compact(
                    t, max_segments=24, max_mor_debt=24,
                    zone_cols={
                        "directory": ["dir_path"],
                        "directory_control": ["dir_path", "next_crawl"],
                    }.get(t),
                )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-dirs", type=int, default=2000)
    ap.add_argument("--files-per-dir", type=int, default=5)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--tree-top", type=int, default=4)
    ap.add_argument("--tree-sub", type=int, default=4)
    ap.add_argument("--tree-files", type=int, default=6)
    ap.add_argument("--scales", type=str, default="1,10,100")
    args = ap.parse_args()

    from file_db_spark.filedb.engine import Engine
    from file_db_spark.filedb.engine import _utcnow
    from file_db_spark.session import get_spark

    spark = get_spark(app_name="catalog-growth-probe")
    work = tempfile.mkdtemp(prefix="catgrowth-")
    tree = os.path.join(work, "tree")
    n_tree_files = build_tree(tree, args.tree_top, args.tree_sub, args.tree_files)
    wave_dirs = 1 + args.tree_top + args.tree_top * args.tree_sub

    results: dict[str, dict] = {}
    try:
        for scale in [int(s) for s in args.scales.split(",")]:
            cat = os.path.join(work, f"catalog_{scale}x")
            eng = Engine(spark, cat)
            eng.install()
            now = _utcnow()
            t0 = time.perf_counter()
            inflate_catalog(
                eng, spark, scale, args.base_dirs, args.files_per_dir,
                args.batches, now,
            )
            t_inflate = time.perf_counter() - t0
            eng.add_root(tree)
            t0 = time.perf_counter()
            waves = 0
            while eng.crawl_once(limit=100000) > 0:
                waves += 1
            t_crawl = time.perf_counter() - t0
            results[f"{scale}x"] = {
                "catalog_dirs": scale * args.base_dirs + wave_dirs,
                "catalog_files": scale * args.base_dirs * args.files_per_dir
                + n_tree_files,
                "inflate_s": round(t_inflate, 2),
                "crawl_s": round(t_crawl, 2),
                "waves": waves,
                "claim_report": eng.last_claim_report,
                "dir_probe_report": eng.last_probe_report,
                "file_probe_report": eng.last_file_probe_report,
            }
            shutil.rmtree(cat, ignore_errors=True)
        scales = sorted(results, key=lambda s: int(s[:-1]))
        t_lo = results[scales[0]]["crawl_s"]
        t_hi = results[scales[-1]]["crawl_s"]
        decades = (
            __import__("math").log10(
                int(scales[-1][:-1]) / int(scales[0][:-1])
            )
        )
        exponent = (
            round(__import__("math").log10(t_hi / t_lo) / decades, 3)
            if t_lo > 0 and decades > 0
            else None
        )
        print(
            json.dumps(
                {
                    "metric": "crawl_catalog_growth",
                    "wave_dirs": wave_dirs,
                    "wave_files": n_tree_files,
                    "results": results,
                    "exponent_per_decade": exponent,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
