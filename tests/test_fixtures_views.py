"""Domain-fixture invariants (FIXTURES.md §A required rows) and view
semantics at sf0.001 — cheap structural checks that the oracle-backed
registry queries (c1-c12) rest on."""

from __future__ import annotations

from pyspark.sql import functions as F

from file_db_spark.filedb import fixtures, search, views


def _catalog(spark, sf_dir):
    return (
        fixtures.fixture_directory(spark, sf_dir),
        fixtures.fixture_file(spark, sf_dir),
        fixtures.fixture_hash(spark, sf_dir),
        fixtures.fixture_file_category(spark),
    )


def test_required_edge_rows(spark, sf_dir):
    d, f, h, _ = _catalog(spark, sf_dir)
    # duplicate (sha1,size) triple 12/212/412 - at sf0.001 only 12 may
    # exist; assert the group key machinery instead: every hashed,
    # sha1-bearing file's (sha1,size) group is consistent with dup_key
    hashed = f.join(h, f.id == h.file_id).where(F.col("sha1_hash").isNotNull())
    groups = hashed.groupBy("sha1_hash", "size").count()
    assert groups.count() > 0
    # md5-fallback pair: sha1 null, md5 equal, size equal (docs 6/16)
    fb = (
        f.join(h, f.id == h.file_id)
        .where(F.col("sha1_hash").isNull() & F.col("md5_hash").isNotNull())
        .groupBy("md5_hash", "size")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
    )
    assert fb.count() >= 1
    # orphan file: dir_id null, dropped by vw_ll's inner join
    assert f.where(F.col("dir_id").isNull()).count() == 1
    listing = views.vw_ll(d, f, h)
    assert listing.where(F.col("file_id") == 11).count() == 0
    # drive root present and its own parent
    root = listing.where((F.col("type") == "dir") & (F.col("full_path") == "C:\\"))
    assert root.count() == 1


def test_vw_ll_shape(spark, sf_dir):
    d, f, h, _ = _catalog(spark, sf_dir)
    listing = views.vw_ll(d, f, h)
    files = listing.where(F.col("type") == "file")
    n_files_with_dir = f.where(F.col("dir_id").isNotNull()).count()
    assert files.count() == n_files_with_dir
    # full_path quirk: backslash join regardless of family
    nix = files.where(F.col("dir_path").startswith("/corpus")).limit(1).collect()[0]
    assert "\\" in nix["full_path"]
    # unhashed files surface with null hash columns (left join)
    assert files.where(F.col("sha1_hash").isNull()).count() > 0


def test_dir_detail_counts(spark, sf_dir):
    d, f, _, _ = _catalog(spark, sf_dir)
    dd = {r["dir_path"]: r for r in views.dir_detail(d, f).collect()}
    # '/corpus' parents the 10 even-source dirs; no files of its own
    corpus = dd["/corpus"]
    assert corpus["file_count"] == 0
    assert corpus["subdir_count"] == 10
    # 'C:\' is its own parent (root quirk): counts C:\corpus only
    assert dd["C:\\"]["subdir_count"] == 1
    # every file with a dir lands in exactly one dir's file_count
    assert sum(r["file_count"] for r in dd.values()) == f.where(
        F.col("dir_id").isNotNull()
    ).count()


def test_duplicate_search_branches(spark, sf_dir):
    d, f, h, _ = _catalog(spark, sf_dir)
    listing = views.vw_ll(d, f, h)
    # needle 4 shares sha1 with 5 but sizes differ -> no match
    none = search.search_duplicate_files_by_id(listing, 4)
    assert none.count() == 0
    # needle 6 matches 16 through the md5-fallback branch
    fb = search.search_duplicate_files_by_id(listing, 6).collect()
    assert [r["file_id"] for r in fb] == [16]


def test_g8_compaction_plan_invariants(spark, sf_dir):
    """Bin packing: every file appears exactly once; compacted bins
    never exceed target + one file's worth (NFD property: a bin closes
    only when the running sum crosses the target); kept files are
    exactly those at/above target; bin stats agree with membership."""
    from collections import defaultdict

    from file_db_spark.operators.merge_queries import (
        COMPACT_TARGET_U,
        g8_compaction_plan,
    )

    rows = g8_compaction_plan(spark, sf_dir).collect()
    assert rows
    ids = [r["k1"] if "k1" in r else r["id"] for r in rows]
    assert len(ids) == len(set(ids))
    bins = defaultdict(list)
    for r in rows:
        if r["compact"]:
            assert r["size_u"] < COMPACT_TARGET_U
            bins[(r["dir_id"], r["bin"])].append(r)
        else:
            assert r["size_u"] >= COMPACT_TARGET_U
            assert r["bin"] == -1 and r["bin_n_files"] == 1
    assert bins  # fixture has small files
    for (_, _), members in bins.items():
        tot = sum(m["size_u"] for m in members)
        assert all(m["bin_total_u"] == tot for m in members)
        assert all(m["bin_n_files"] == len(members) for m in members)
        # NFD: a closed bin's total stays under target + its last file
        assert tot < COMPACT_TARGET_U + max(m["size_u"] for m in members)


def test_g9_subtree_rollup_invariants(spark, sf_dir):
    """Subtree totals dominate direct totals; a parent's subtree total
    equals its direct files plus its cataloged children's subtrees."""
    from file_db_spark.operators.merge_queries import g9_subtree_rollup

    rows = {r["dir_path"]: r for r in g9_subtree_rollup(spark, sf_dir).collect()}
    assert rows
    from file_db_spark.functions.paths import basepath  # noqa: F401 (column fn)

    def parent(p):
        import re

        s = re.sub(r"(.)[/\\][^/\\]+$", r"\1", p)
        return s + "\\" if s.endswith(":") else s

    for p, r in rows.items():
        assert r["n_sub"] >= r["n_direct"]
        assert r["size_sub_u"] >= r["size_direct_u"]
        # recompute each dir's subtree from direct + children subtrees
        kids = [q for q in rows if q != p and parent(q) == p]
        assert r["n_sub"] == r["n_direct"] + sum(rows[k]["n_sub"] for k in kids)
        assert r["size_sub_u"] == r["size_direct_u"] + sum(
            rows[k]["size_sub_u"] for k in kids
        )
    assert any(r["n_sub"] > r["n_direct"] for r in rows.values())


def test_g10_integrity_audit_truthful(spark, sf_dir):
    """Every check emits a summary row (zeros included); summary counts
    equal independently recomputed violation counts; the fixture's
    deliberate orphan and metadata gaps are caught."""
    from file_db_spark.operators.merge_queries import g10_integrity_audit

    rows = g10_integrity_audit(spark, sf_dir).collect()
    summaries = {r["chk"]: r["n"] for r in rows if r["part"] == "summary"}
    assert set(summaries) == {
        "orphan_file", "dangling_hash", "missing_parent",
        "null_size", "null_ctime", "hash_backlog",
    }
    details = {}
    for r in rows:
        if r["part"] == "violation":
            details.setdefault(r["chk"], []).append(r)
    for chk, n in summaries.items():
        got = len(details.get(chk, []))
        assert got == min(n, 100)  # detail cap
    assert summaries["orphan_file"] == 1  # the /orphan/nowhere file
    assert summaries["dangling_hash"] == 0 and summaries["missing_parent"] == 0
    assert summaries["null_ctime"] > 0 and summaries["hash_backlog"] > 0


def _dup_dir_listing(spark):
    """Synthetic vw_ll-shaped listing exercising every J6-dir branch:
    dirs A and B have identical content multisets (incl. a repeated
    key), C differs only by count, D shares one file with A."""
    rows = [
        # type, full_path, file_id, name, dir_id, size, md5, sha1, dir_path
        ("file", "/a/f1", 1, "f1", 1, 10.0, "m1", "s1", "/a"),
        ("file", "/a/f2", 2, "f2", 1, 10.0, "m1", "s1", "/a"),  # repeated key
        ("file", "/a/f3", 3, "f3", 1, 20.0, "m3", None, "/a"),  # md5 fallback
        ("file", "/b/g1", 4, "g1", 2, 10.0, "m1", "s1", "/b"),
        ("file", "/b/g2", 5, "g2", 2, 10.0, "m1", "s1", "/b"),
        ("file", "/b/g3", 6, "g3", 2, 20.0, "m3", None, "/b"),
        ("file", "/c/h1", 7, "h1", 3, 10.0, "m1", "s1", "/c"),  # count differs
        ("file", "/c/h3", 8, "h3", 3, 20.0, "m3", None, "/c"),
        ("file", "/d/f1", 9, "f1", 4, 99.0, "m9", "s9", "/d"),  # name match only
        ("dir", "/a", None, "a", 0, None, None, None, "/"),
    ]
    return spark.createDataFrame(
        rows,
        "type string, full_path string, file_id bigint, name string, "
        "dir_id bigint, size double, md5_hash string, sha1_hash string, "
        "dir_path string",
    )


def test_search_duplicate_dir_branches(spark):
    ll = _dup_dir_listing(spark)
    got = {r["full_path"] for r in search.search_duplicate_dir(ll, "/a").collect()}
    # self rows + sha1+size matches in /b,/c + md5-fallback matches
    assert got == {
        "/a/f1", "/a/f2", "/a/f3",
        "/b/g1", "/b/g2", "/b/g3",
        "/c/h1", "/c/h3",
    }
    # name matching pulls in /d/f1 (same name, different content)
    with_names = {
        r["full_path"]
        for r in search.search_duplicate_dir(
            ll, "/a", name_match_files=True
        ).collect()
    }
    assert with_names == got | {"/d/f1"}
    # hash matching off, name on: self rows + name matches only
    names_only = {
        r["full_path"]
        for r in search.search_duplicate_dir(
            ll, "/a", hash_match_files=False, name_match_files=True
        ).collect()
    }
    assert names_only == {"/a/f1", "/a/f2", "/a/f3", "/d/f1"}
    # dir rows never leak into the result
    assert all(r["type"] == "file" for r in search.search_duplicate_dir(ll, "/a").collect())


def test_search_duplicate_dir_on_fixtures(spark, sf_dir):
    d, f, h, _ = _catalog(spark, sf_dir)
    listing = views.vw_ll(d, f, h)
    out = search.search_duplicate_dir(listing, "/corpus/src2").collect()
    needle_paths = {
        r["full_path"]
        for r in listing.where(
            (F.col("type") == "file") & (F.col("dir_path") == "/corpus/src2")
        ).collect()
    }
    got_paths = {r["full_path"] for r in out}
    # the f.id = n.id clause: every needle row is in the result
    assert needle_paths <= got_paths
    # no duplicates in the distinct result
    assert len(out) == len(got_paths)


def test_duplicate_dir_contents_multiset(spark):
    ll = _dup_dir_listing(spark)
    rep = {r["dir_path"]: r for r in search.duplicate_dir_contents(ll).collect()}
    # A == B (identical multisets, repeated key preserved); C differs by count
    assert rep["/a"]["content_fingerprint"] == rep["/b"]["content_fingerprint"]
    assert rep["/a"]["n_dirs_sharing"] == 2
    assert rep["/b"]["n_dirs_sharing"] == 2
    assert rep["/c"]["content_fingerprint"] != rep["/a"]["content_fingerprint"]
    assert rep["/c"]["n_dirs_sharing"] == 1
    assert rep["/a"]["file_count"] == 3
    # dir rows are not fingerprinted
    assert "/" not in rep
