"""Property/parametrized tests for the scalar path library (SURVEY §5
item 4): F1-F9 + F13/F14 against the reference's regex semantics
(FileDbDAL/SQLUtil.py:14-212, API/Util.py:14-168) on win + nix paths,
drive roots, trailing slashes, dotless names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_db_spark.functions import paths as P


def _col_eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


BASEPATH_CASES = [
    ("C:\\Windows\\calc.exe", "C:\\Windows"),
    ("C:\\Windows", "C:\\"),           # drive root re-gains backslash
    ("C:\\", "C:\\"),                  # root is its own parent
    ("/home/user/file.txt", "/home/user"),
    ("/home", "/home"),                # leading slash kept (lookbehind)
    ("/a/b/c", "/a/b"),
    ("relative/x", "relative"),
]


@pytest.mark.parametrize("path,expect", BASEPATH_CASES)
def test_basepath(spark, path, expect):
    assert _col_eval(spark, P.basepath(F.lit(path))) == expect


BASENAME_CASES = [
    ("C:\\Windows\\calc.exe", "calc.exe"),
    ("/home/user/file.txt", "file.txt"),
    ("/home", "/home"),               # no splittable separator -> whole
    ("C:\\", ""),                     # ref regex consumes the whole root
    ("a\\b/c", "c"),
]


@pytest.mark.parametrize("path,expect", BASENAME_CASES)
def test_basename(spark, path, expect):
    assert _col_eval(spark, P.basename(F.lit(path))) == expect


EXTENSION_CASES = [
    ("calc.EXE", "exe"),
    ("archive.tar.gz", "gz"),
    ("README", "readme"),             # dotless -> whole lowered name (F3 quirk)
    ("we%ird_7.t_t", "t_t"),
]


@pytest.mark.parametrize("name,expect", EXTENSION_CASES)
def test_extension(spark, name, expect):
    assert _col_eval(spark, P.extension(F.lit(name))) == expect


def test_unit_converters_decimal_vs_binary(spark):
    # F5 decimal units target the MB storage unit; F6 binary display
    # units use 1024 — the reference's intentional base mismatch.
    assert _col_eval(spark, P.kb(2000.0)) == 2.0
    assert _col_eval(spark, P.gb(1.0)) == 1000.0
    assert _col_eval(spark, P.tb(1.0)) == 1_000_000.0
    assert _col_eval(spark, P.to_gb(1.0)) == 1024.0
    assert _col_eval(spark, P.to_tb(1.0)) == 1024.0**2


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("/a/b/", "/a/b"),
        ("/a/b///", "/a/b"),
        ("C:\\", "C:"),       # optional-group quirk: ref strips the root
                              # slash too (SQLUtil.py:165 '([^:])?')
        ("  /x/ ", "/x"),
        ("C:\\data\\", "C:\\data"),
    ],
)
def test_strip_trailing_slashes(raw, expect):
    assert P.strip_trailing_slashes(raw) == expect


@pytest.mark.parametrize(
    "pat,expect",
    [
        ("*.txt", "%.txt"),
        ("doc_1*", "doc\\_1%"),
        ("a?c", "a_c"),
        ("100%", "100\\%"),
        ("w\\x", "w\\\\x"),
    ],
)
def test_wildcard_rewrite(pat, expect):
    assert P.sql_path_parse_wildcard_search(pat) == expect


def test_wildcard_rewrite_matches_like(spark):
    # the rewritten pattern must treat literal _ and % as literals
    df = spark.createDataFrame(
        [("doc_1.txt",), ("docX1.txt",), ("doc_12.txt",)], "name string"
    )
    pat = P.sql_path_parse_wildcard_search("doc_1*")
    got = sorted(r["name"] for r in df.where(F.col("name").like(pat)).collect())
    assert got == ["doc_1.txt", "doc_12.txt"]  # docX1 must NOT match


@pytest.mark.parametrize(
    "path,expect",
    [
        ("/usr/bin", "nix"),
        ("C:\\Windows", "win"),
        ("relative/unix/like", "nix?"),
        ("relative\\win\\like", "win?"),
        ("ambiguous", ""),
        ("", ""),
    ],
)
def test_path_os(path, expect):
    assert P.path_os(path) == expect


def test_path_join_sniffs_separator():
    assert P.path_join("C:\\a", "b") == "C:\\a\\b"
    assert P.path_join("/a", "b", "c") == "/a/b/c"
    assert P.path_join("solo") == "solo"


@pytest.mark.parametrize(
    "val,expect",
    [("true", True), ("Y", False), ("y", True), ("1", True), ("no", False), (None, False)],
)
def test_input_parse_bool(val, expect):
    assert P.input_parse_bool(val) is expect


def test_sanitize_order_by():
    cols = ["name", "size"]
    assert P.sql_sanitize_order_by("name desc, size", cols) == [
        ("name", "desc"),
        ("size", "asc"),
    ]
    # injection-ish and unknown columns are dropped, not errored
    assert P.sql_sanitize_order_by("name; drop table x, evil", cols) == []
