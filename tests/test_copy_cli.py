"""S7 copy pipeline (pre-check / overwrite policy / post-verify) and
S8 shell dispatch tests."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from file_db_spark.filedb import copy as cp
from file_db_spark.filedb.cli import DISPLAY_ROW_CAP, FileDbShell
from file_db_spark.filedb.engine import Engine


def _empty_queue(spark):
    return spark.createDataFrame([], cp.COPY_FILE)


def test_copy_verify_and_overwrite_policies(spark, tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"payload")
    dst = tmp_path / "out" / "dst.bin"

    q = cp.queue_copy(spark, _empty_queue(spark), str(src), str(dst), verify=True)
    work, q = cp.claim_copy_jobs(q, datetime(2030, 1, 1), limit=10)
    res = cp.perform_copies(work).collect()
    assert len(res) == 1 and res[0]["success"] and res[0]["message"] == "ok"
    assert dst.read_bytes() == b"payload"
    # claim released nothing: job marked assigned
    assert q.where(F.col("assigned_on").isNotNull()).count() == 1

    # overwrite=n refuses an existing destination
    q2 = cp.queue_copy(spark, _empty_queue(spark), str(src), str(dst), overwrite="n")
    w2, _ = cp.claim_copy_jobs(q2, datetime(2030, 1, 2), limit=10)
    r2 = cp.perform_copies(w2).collect()[0]
    assert not r2["success"] and "overwrite=n" in r2["message"]

    # overwrite=s copies only when sizes differ
    src.write_bytes(b"longer payload!")
    q3 = cp.queue_copy(spark, _empty_queue(spark), str(src), str(dst), overwrite="s")
    w3, _ = cp.claim_copy_jobs(q3, datetime(2030, 1, 3), limit=10)
    r3 = cp.perform_copies(w3).collect()[0]
    assert r3["success"]
    assert dst.read_bytes() == b"longer payload!"

    # overwrite=h refuses when content hashes match
    q4 = cp.queue_copy(spark, _empty_queue(spark), str(src), str(dst), overwrite="h")
    w4, _ = cp.claim_copy_jobs(q4, datetime(2030, 1, 4), limit=10)
    r4 = cp.perform_copies(w4).collect()[0]
    assert not r4["success"] and "same sha1" in r4["message"]

    # move removes the source after a verified copy
    mv_dst = tmp_path / "moved.bin"
    q5 = cp.queue_copy(spark, _empty_queue(spark), str(src), str(mv_dst), move=True)
    w5, _ = cp.claim_copy_jobs(q5, datetime(2030, 1, 5), limit=10)
    r5 = cp.perform_copies(w5).collect()[0]
    assert r5["success"]
    assert mv_dst.exists() and not src.exists()


def test_missing_source_reports_failure(spark, tmp_path):
    q = cp.queue_copy(
        spark, _empty_queue(spark), str(tmp_path / "ghost"), str(tmp_path / "d")
    )
    w, _ = cp.claim_copy_jobs(q, datetime(2030, 1, 1), limit=10)
    r = cp.perform_copies(w).collect()[0]
    assert not r["success"] and r["message"] == "source missing"


def test_shell_dispatch(spark, tmp_path):
    tree = tmp_path / "shelltree"
    tree.mkdir()
    (tree / "hello.txt").write_text("hi")
    eng = Engine(spark, str(tmp_path / "cat"))
    eng.install()

    sh = FileDbShell(eng)
    assert "crawled" in sh.execute_input(f"scrape_dir {tree}")
    out = sh.execute_input("search hello*")
    assert "hello.txt" in out
    assert sh.execute_input("pwd") == "/"
    sh.execute_input(f"cd {tree}")
    assert sh.execute_input("pwd") == str(tree)
    assert "hello.txt" in sh.execute_input("ls")
    md = sh.execute_input(f"hash_file {tree / 'hello.txt'}")
    import hashlib

    assert hashlib.md5(b"hi").hexdigest() in md
    assert "next_crawl" in sh.execute_input("schedule")
    assert sh.execute_input("nonsense") == "unknown command: nonsense"
    assert sh.execute_input("exit") == "bye"
    assert DISPLAY_ROW_CAP == 50


def test_shell_dup_images(spark, tmp_path):
    """dup_images: the DuplicateImageBrowser plugin's report — two
    identical images above the size floor form one group; a tiny
    duplicate pair (below 10 KB) and a non-image pair are excluded."""
    tree = tmp_path / "imgtree"
    (tree / "a").mkdir(parents=True)
    (tree / "b").mkdir()
    big = b"\x89PNG" + b"x" * 20_000  # > 0.010 MB
    (tree / "a" / "pic1.png").write_bytes(big)
    (tree / "b" / "pic2.png").write_bytes(big)
    (tree / "a" / "tiny1.png").write_bytes(b"t")
    (tree / "b" / "tiny2.png").write_bytes(b"t")
    (tree / "a" / "doc1.txt").write_bytes(big)
    (tree / "b" / "doc2.txt").write_bytes(big)
    eng = Engine(spark, str(tmp_path / "imgcat"))
    eng.install()
    eng.add_root(str(tree))
    eng.run_until_idle()

    sh = FileDbShell(eng)
    out = sh.execute_input("dup_images")
    assert "pic1.png" in out and "pic2.png" in out
    assert "tiny1.png" not in out
    assert "doc1.txt" not in out

    from file_db_spark.filedb import search as s

    rows = s.duplicate_media_groups(eng.file_detail()).collect()
    assert {r["name"] for r in rows} == {"pic1.png", "pic2.png"}
    assert all(r["duplicate_count"] == 2 for r in rows)
