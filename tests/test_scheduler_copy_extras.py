"""S2 drive-seed claim, J12 copy-path resolution, M5 guarded upsert."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from file_db_spark.filedb import copy as cp
from file_db_spark.filedb import fixtures, merge, scheduler, views


def test_get_drives_to_crawl_anti_join(spark):
    drive = spark.createDataFrame(
        [(1, "C:\\"), (2, "/data"), (3, "/already")], "id long, dir_path string"
    )
    control = spark.createDataFrame([("/already",)], "dir_path string")
    got = scheduler.get_drives_to_crawl(drive, control)
    assert [r["dir_path"] for r in got.collect()] == ["/data", "C:\\"]


def test_resolve_copy_paths_coalesce(spark, sf_dir):
    d = fixtures.fixture_directory(spark, sf_dir)
    f = fixtures.fixture_file(spark, sf_dir)
    h = fixtures.fixture_hash(spark, sf_dir)
    fc = fixtures.fixture_file_category(spark)
    detail = views.vw_file_detail(d, f, h, fc)
    known = detail.limit(1).collect()[0]["full_path"]

    q = cp.queue_copy(spark, spark.createDataFrame([], cp.COPY_FILE), known, "/dst/a")
    q = cp.queue_copy(spark, q, "/not/in/catalog.bin", "/dst/b")
    work, _ = cp.claim_copy_jobs(q, datetime(2030, 1, 1), limit=10)
    res = {r["new_path"]: r for r in cp.resolve_copy_paths(work, detail).collect()}
    assert res["/dst/a"]["cat_file_id"] is not None        # catalog hit
    assert res["/dst/a"]["file_path"] == known
    assert res["/dst/b"]["cat_file_id"] is None            # fallback path
    assert res["/dst/b"]["file_path"] == "/not/in/catalog.bin"


def test_upsert_hash_guarded(spark, sf_dir):
    d = fixtures.fixture_directory(spark, sf_dir)
    f = fixtures.fixture_file(spark, sf_dir)
    h = fixtures.fixture_hash(spark, sf_dir)
    listing = views.vw_ll(d, f, h)
    now = datetime(2030, 6, 1)
    # file 11 is the orphan -> not in the listing (vw_ll inner join
    # drops it) -> the upsert is guarded out; its PRE-EXISTING fixture
    # hash row stays exactly as it was
    out = merge.upsert_hash(h, listing, 11, "aa", "bb", now)
    before = h.where(F.col("file_id") == 11).collect()
    after = out.where(F.col("file_id") == 11).collect()
    assert after == before
    assert after[0]["md5_hash"] != "aa"
    # file 9 exists but is unhashed (9 % 10 >= 7) -> inserted
    out = merge.upsert_hash(h, listing, 9, "aa", "bb", now)
    row = out.where(F.col("file_id") == 9).collect()[0]
    assert row["md5_hash"] == "aa" and row["sha1_hash"] == "bb"
    assert out.count() == h.count() + 1
