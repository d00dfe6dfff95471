"""Pipeline round-trip tests (SURVEY §5 item 3): crawl a real temp
tree -> assert catalog state; mutate the tree (add / remove / touch /
empty a dir) -> re-crawl -> assert snapshot-diff merge semantics
(M1-M4) including archive lineage and empty-update suppression; then
hash waves (S6+M4) and the flagship duplicate query on real digests."""

from __future__ import annotations

import hashlib
import os
import time

import pytest
from pyspark.sql import functions as F

from file_db_spark.filedb.engine import Engine


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "tree"
    (root / "sub1").mkdir(parents=True)
    (root / "sub2" / "nested").mkdir(parents=True)
    (root / "a.txt").write_text("alpha")
    (root / "sub1" / "b.txt").write_text("bravo")
    (root / "sub1" / "dup1.bin").write_bytes(b"same-content")
    (root / "sub2" / "dup2.bin").write_bytes(b"same-content")
    (root / "sub2" / "nested" / "c.txt").write_text("charlie")
    return root


def _mk_engine(spark, tmp_path) -> Engine:
    eng = Engine(spark, str(tmp_path / "catalog"))
    eng.install()
    return eng


def test_crawl_builds_catalog(spark, tmp_path, tree):
    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    eng.run_until_idle()

    dirs = {r["dir_path"] for r in eng.store.read("directory").collect()}
    assert dirs == {
        str(tree),
        str(tree / "sub1"),
        str(tree / "sub2"),
        str(tree / "sub2" / "nested"),
    }
    files = eng.store.read("file")
    names = {r["name"] for r in files.collect()}
    assert names == {"a.txt", "b.txt", "dup1.bin", "dup2.bin", "c.txt"}
    # size unit: MB = bytes/1e6 (File.py:35)
    a = files.where(F.col("name") == "a.txt").collect()[0]
    assert float(a["size"]) == pytest.approx(5 / 1e6)
    # every file hashed after run_until_idle
    assert eng.store.read("hash").count() == 5
    assert eng.store.read("hash_control").count() == 0


def test_real_digests_and_duplicate_search(spark, tmp_path, tree):
    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    eng.run_until_idle()

    h = {r["file_id"]: r for r in eng.store.read("hash").collect()}
    files = {r["name"]: r for r in eng.store.read("file").collect()}
    dup_id = files["dup1.bin"]["id"]
    expect_md5 = hashlib.md5(b"same-content").hexdigest()
    expect_sha1 = hashlib.sha1(b"same-content").hexdigest()
    assert h[dup_id]["md5_hash"] == expect_md5
    assert h[dup_id]["sha1_hash"] == expect_sha1

    report = eng.duplicate_report().collect()
    assert sorted(r["name"] for r in report) == ["dup1.bin", "dup2.bin"]
    assert all(r["duplicate_count"] == 2 for r in report)

    matches = eng.search_duplicate_file(str(tree / "sub1") + "/dup1.bin").collect()
    assert [m["name"] for m in matches] == ["dup2.bin"]


def test_recrawl_snapshot_diff(spark, tmp_path, tree):
    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    eng.run_until_idle()
    file_t0 = {r["name"]: r for r in eng.store.read("file").collect()}

    # mutate: add, remove, touch-with-new-content, vanish a subtree
    (tree / "new.txt").write_text("delta")
    (tree / "a.txt").unlink()
    time.sleep(0.02)
    (tree / "sub1" / "b.txt").write_text("bravo-changed!")
    os.utime(tree / "sub1" / "b.txt")
    import shutil

    shutil.rmtree(tree / "sub2" / "nested")

    # force everything due again, then recrawl
    control = eng.store.read("directory_control").withColumn(
        "next_crawl", F.expr("timestamp'2000-01-01 00:00:00'")
    )
    eng.store.replace("directory_control", control)
    eng.run_until_idle()

    file_t1 = {r["name"]: r for r in eng.store.read("file").collect()}
    assert "new.txt" in file_t1 and "a.txt" not in file_t1
    # changed file: content change -> new size/mtime, inserted_on kept (O5)
    assert file_t1["b.txt"]["inserted_on"] == file_t0["b.txt"]["inserted_on"]
    assert file_t1["b.txt"]["updated_on"] != file_t0["b.txt"]["updated_on"]
    assert float(file_t1["b.txt"]["size"]) == pytest.approx(14 / 1e6)
    # NOTE: dup1.bin also updates at t1 — hashing bumped its atime, and
    # the reference's change detection includes atime
    # (DirectoryCrawl.py:848-852). Empty-update suppression is asserted
    # on the third, genuinely-idle wave below.
    # vanished subtree: dir + its file gone, archived with lineage
    dirs = {r["dir_path"] for r in eng.store.read("directory").collect()}
    assert str(tree / "sub2" / "nested") not in dirs
    d_arch = eng.store.read("directory_archive").collect()
    assert any(r["dir_path"] == str(tree / "sub2" / "nested") for r in d_arch)
    f_arch = {r["name"] for r in eng.store.read("file_archive").collect()}
    assert {"a.txt", "c.txt"} <= f_arch
    arch_a = [
        r for r in eng.store.read("file_archive").collect() if r["name"] == "a.txt"
    ][0]
    assert arch_a["original_inserted_on"] == file_t0["a.txt"]["inserted_on"]
    assert arch_a["deleted_on"] is not None
    # rehash scheduled ONLY for the new/changed files, then drained
    assert eng.store.read("hash_control").count() == 0
    h = {r["file_id"]: r for r in eng.store.read("hash").collect()}
    assert h[file_t1["b.txt"]["id"]]["sha1_hash"] == hashlib.sha1(
        b"bravo-changed!"
    ).hexdigest()

    # third wave with zero filesystem changes: O5 empty-update
    # suppression -> rows untouched
    control = eng.store.read("directory_control").withColumn(
        "next_crawl", F.expr("timestamp'2000-01-01 00:00:00'")
    )
    eng.store.replace("directory_control", control)
    eng.run_until_idle()
    file_t2 = {r["name"]: r for r in eng.store.read("file").collect()}
    # (new.txt/b.txt were read by wave-2 hashing -> atime moved again;
    # dup1.bin was not re-read, so it must be untouched)
    assert file_t2["dup1.bin"]["updated_on"] == file_t1["dup1.bin"]["updated_on"]


def test_scheduler_claims_and_reset(spark, tmp_path, tree):
    from datetime import datetime

    from file_db_spark.filedb import scheduler

    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    control = eng.store.read("directory_control")
    now = datetime(2030, 1, 1)
    work, claimed = scheduler.get_dirs_to_crawl(control, now, limit=5, process_id=7)
    assert work.count() == 1  # only the root is known pre-crawl
    row = claimed.collect()[0]
    assert row["assigned_process_id"] == 7
    assert row["process_assigned_on"] is not None
    # M11 reset nulls the claim
    reset = scheduler.reset_claims(claimed).collect()[0]
    assert reset["assigned_process_id"] is None
    assert reset["process_assigned_on"] is None


def test_crawl_tree_wide_deep_dataframe_frontier(spark, tmp_path):
    """crawl_tree keeps the frontier executor-side: a wide level (64
    dirs) and a deep chain (6 levels) both crawl completely with the
    driver seeing only per-level emptiness probes — the listing must
    equal an os.walk of the same tree exactly."""
    from file_db_spark.filedb.scan import child_path, crawl_tree

    root = tmp_path / "wide"
    for i in range(64):
        d = root / f"w{i:03d}"
        d.mkdir(parents=True)
        (d / "f.txt").write_text(str(i))
    deep = root
    for j in range(6):
        deep = deep / f"d{j}"
    deep.mkdir(parents=True)
    (deep / "leaf.txt").write_text("x")

    listing = crawl_tree(spark, [str(root)]).persist()
    got = {
        (child_path(r["dir_path"], r["name"]), r["entry_type"])
        for r in listing.collect()
    }
    expected = set()
    for dirpath, dirnames, filenames in os.walk(root):
        for n in dirnames:
            expected.add((os.path.join(dirpath, n), "dir"))
        for n in filenames:
            expected.add((os.path.join(dirpath, n), "file"))
    assert got == expected
    assert len([r for r in listing.collect() if r["entry_type"] == "file"]) == 65
    listing.unpersist()


def test_archive_compaction_on_idle(spark, tmp_path, tree):
    """SURVEY §7 'compaction discipline': continuous delete waves
    accrete O(waves) archive append-segments; run_until_idle's idle
    edge folds the chain back to one snapshot once it passes the
    configured horizon (store.compact), preserving every archived
    row. Horizon=2 so four delete waves force at least one fold."""
    eng = _mk_engine(spark, tmp_path)
    eng.config["archive_compact_segments"] = 2
    eng.add_root(str(tree))
    eng.run_until_idle()

    doomed = ["a.txt", "sub1/b.txt", "sub1/dup1.bin", "sub2/dup2.bin"]
    folded = False
    for rel in doomed:
        (tree / rel).unlink()
        control = eng.store.read("directory_control").withColumn(
            "next_crawl", F.expr("timestamp'2000-01-01 00:00:00'")
        )
        eng.store.replace("directory_control", control)
        eng.run_until_idle()
        segs = eng.store.segment_count("file_archive")
        assert segs <= eng.config["archive_compact_segments"]
        folded = folded or segs == 1
    assert folded  # the chain crossed the horizon and was compacted

    f_arch = [r["name"] for r in eng.store.read("file_archive").collect()]
    assert sorted(f_arch) == ["a.txt", "b.txt", "dup1.bin", "dup2.bin"]


def test_dir_stats_mv_tracks_crawl_waves(spark, tmp_path, tree):
    """Engine-integrated g28 MV: the standing per-directory rollup is
    refreshed per crawl wave and always equals the straight recompute
    over the file table — including after a mutate-and-recrawl wave
    that deletes and adds files."""
    from pyspark.sql import functions as F

    def recompute(eng):
        return {
            r["dir_id"]: (r["n_files"], r["total_size"], r["min_size"], r["max_size"])
            for r in eng.store.read("file")
            .groupBy("dir_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_files"),
                F.coalesce(
                    F.sum("size"), F.lit(0).cast("decimal(18,6)")
                ).alias("total_size"),
                F.min("size").alias("min_size"),
                F.max("size").alias("max_size"),
            )
            .collect()
        }

    def mv(eng):
        return {
            r["dir_id"]: (r["n_files"], r["total_size"], r["min_size"], r["max_size"])
            for r in eng.dir_stats().collect()
        }

    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    eng.enable_dir_stats_mv()
    eng.run_until_idle()
    assert mv(eng) == recompute(eng)
    assert len(mv(eng)) > 0
    # mutate the tree: delete one file, grow another, add a new one
    victims = sorted(tree.rglob("*.txt"))
    victims[0].unlink()
    victims[1].write_text("much longer content than before" * 10)
    (tree / "fresh.txt").write_text("new arrival")
    import file_db_spark.filedb.engine as _e
    from datetime import timedelta

    later = _e._utcnow() + timedelta(days=2)
    eng.crawl_once(now=later, limit=100)
    while eng.crawl_once(now=later, limit=100):
        pass
    assert mv(eng) == recompute(eng)


def test_all_registered_mviews_refresh_per_wave(spark, tmp_path, tree):
    """ADVICE r7: the engine's crawl loop refreshes EVERY registered
    materialized view over an engine table (store.list_mviews), not
    just the built-in dir-stats rollup — a user-registered rollup must
    not silently go stale across waves."""
    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    eng.run_until_idle()
    eng.enable_dir_stats_mv()
    # a second, user-registered view over the same engine table
    eng.store.create_mview(
        "file_size_rollup",
        "file",
        group_by=["dir_id"],
        count_col="n",
        sums={"bytes": "size"},
        key_cols=["id"],
        compare_cols=["name", "dir_id", "size", "mtime"],
    )
    (tree / "fresh.txt").write_text("new arrival")
    import file_db_spark.filedb.engine as _e
    from datetime import timedelta

    later = _e._utcnow() + timedelta(days=2)
    while eng.crawl_once(now=later, limit=100):
        pass
    want = {
        r["dir_id"]: (r["n"], r["bytes"])
        for r in eng.store._mv_compute(
            eng.store.read("file"), eng.store.mview_spec("file_size_rollup")
        ).collect()
    }
    got = {
        r["dir_id"]: (r["n"], r["bytes"])
        for r in eng.store.read("file_size_rollup").collect()
    }
    assert got == want and len(got) > 0


def test_removal_wave_commits_o_changes(spark, tmp_path, tree):
    """Round-8 write-shape pin: a removal wave commits deletion
    vectors / delete-only MERGEs over the victim keys — never a
    rebuilt table. After deleting a subtree and recrawling, the hot
    tables carry merge-on-read debt (DVs / MOR waves) and the values
    still match the logical state (covered by the value assertions in
    test_recrawl_snapshot_diff; here we pin the COMMIT SHAPE)."""
    import shutil as _sh
    from datetime import timedelta

    import file_db_spark.filedb.engine as _e

    eng = _mk_engine(spark, tmp_path)
    eng.add_root(str(tree))
    while eng.crawl_once(limit=100):
        pass
    # snapshot file bytes before the removal wave
    _sh.rmtree(tree / "sub1")
    later = _e._utcnow() + timedelta(days=2)
    while eng.crawl_once(now=later, limit=100):
        pass
    st = eng.store
    # file + hash: bucketed MOR commits (waves of debt, no rewrite)
    assert st.mor_debt("file").get("waves", 0) >= 1
    # directory: manifest DV from the removal (plus merge waves)
    assert st.mor_debt("directory")["deletes"] >= 1
    assert st.mor_debt("directory_control")["deletes"] >= 1
    # and the catalog no longer lists the removed subtree
    assert (
        st.read("directory")
        .where(F.col("dir_path").startswith(str(tree / "sub1")))
        .count()
        == 0
    )
    assert st.read("file").where(F.col("name") == "b.txt").count() == 0
    # compaction folds all the debt back (the idle edge runs the same
    # call with the configured horizon; force the threshold here)
    assert st.compact("file", max_mor_debt=0) is True
    assert st.compact("directory", max_mor_debt=0) is True
    assert st.mor_debt("file") == {"filters": 0, "deletes": 0}
    assert st.mor_debt("directory")["deletes"] == 0
    assert st.read("file").where(F.col("name") == "b.txt").count() == 0
