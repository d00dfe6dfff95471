r"""Search API (SURVEY.md §2.3 J5-J7, §2.2 P1-P5; reference
FileDbDAL/Search.py:71-345 and readme.md:26-36).

The reference's search functions contain documented bugs (`f.id` vs
`file_id`, Search.py:272; `type` on a view without it, API/Search.py:35)
— per SURVEY §4 these implement the DOCUMENTED INTENT: match by id,
then hash+size with SHA1-preferred/MD5-fallback, then name.

Every function takes DataFrames in and returns a DataFrame (the
idiomatic "set-returning function"), accepting scalar-or-list probe
arguments normalized to lists (the reference's overload convention,
FileDbDAL/Directory.py:196-358).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.paths import (
    basename,
    basepath,
    sql_path_parse_exact_search,
    sql_path_parse_wildcard_search,
)

__all__ = [
    "search_file",
    "search_dir",
    "search_full_path",
    "search_file_suffix",
    "search_duplicate_file",
    "search_duplicate_files_by_id",
    "duplicate_groups",
    "file_path_exists",
    "dir_path_exists",
]


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple, set)):
        return list(x)
    return [x]


def search_file(listing: DataFrame, name_pattern: str) -> DataFrame:
    """P3/J7 (FileDbDAL/Search.py:157-186): wildcard search over file
    names; OS wildcards (*?) rewritten to SQL LIKE with escaping (F8)."""
    pat = sql_path_parse_wildcard_search(name_pattern)
    return listing.where(
        (F.col("type") == "file") & F.col("name").like(pat)
    )


def search_dir(listing: DataFrame, name_pattern: str) -> DataFrame:
    """FileDbDAL/Search.py:189-218: wildcard search over directory
    basenames."""
    pat = sql_path_parse_wildcard_search(name_pattern)
    return listing.where((F.col("type") == "dir") & F.col("name").like(pat))


def search_file_suffix(listing: DataFrame, suffix: str) -> DataFrame:
    """F10 suffix search (the reference accelerates this with a
    reverse(name) expression index, FileDbDAL/File.py:215,224; columnar
    scan + endswith needs no index — at catalog scale a stored
    reverse(name) sort key would enable skipping)."""
    return listing.where(
        (F.col("type") == "file") & F.col("name").endswith(suffix)
    )


def search_full_path(
    spark: SparkSession, listing: DataFrame, full_paths: Sequence[str] | str
) -> DataFrame:
    """J7 array-probe join (FileDbDAL/Search.py:125-154): probe rows by
    (dir_path = basepath(p), name = basename(p)); tiny probe set ->
    broadcast."""
    paths = [sql_path_parse_exact_search(p) for p in _as_list(full_paths)]
    probes = spark.createDataFrame([(p,) for p in paths], "probe_path string").select(
        "probe_path",
        basepath("probe_path").alias("p_dir"),
        basename("probe_path").alias("p_name"),
    )
    return listing.join(
        F.broadcast(probes),
        (F.col("dir_path") == F.col("p_dir")) & (F.col("name") == F.col("p_name")),
    ).drop("p_dir", "p_name")


def file_path_exists(listing: DataFrame, full_path: str) -> bool:
    """P2 (FileDbDAL/File.py:249-261): exact file-path probe."""
    p = sql_path_parse_exact_search(full_path)
    return (
        listing.where(
            (F.col("type") == "file")
            & (F.col("dir_path") == basepath(F.lit(p)))
            & (F.col("name") == basename(F.lit(p)))
        ).limit(1).count()
        > 0
    )


def dir_path_exists(directory: DataFrame, dir_path: str) -> bool:
    """P1 (FileDbDAL/Directory.py:181-193): exact dir-path probe on the
    unique key."""
    p = sql_path_parse_exact_search(dir_path)
    return directory.where(F.col("dir_path") == p).limit(1).count() > 0


def _duplicates_of(files: DataFrame, needle: DataFrame) -> DataFrame:
    """Core duplicate matcher (readme.md:26-36; FileDbDAL/Search.py:
    249-295 documented intent): match by content hash AND size — SHA1
    when the needle has one, MD5 fallback otherwise — or by exact name;
    exclude the needle row itself.

    Shape: needles are a handful of rows -> broadcast; each branch is an
    equi-join (sha1+size / md5+size / name), unioned + dedup — the
    OR-join decomposition (SURVEY §4), never a nested-loop join."""
    by_sha1 = files.join(
        F.broadcast(needle),
        (F.col("sha1_hash") == F.col("n_sha1")) & (F.col("size") == F.col("n_size")),
    )
    by_md5 = files.join(
        F.broadcast(needle.where(F.col("n_sha1").isNull())),
        (F.col("md5_hash") == F.col("n_md5")) & (F.col("size") == F.col("n_size")),
    )
    by_name = files.join(F.broadcast(needle), F.col("name") == F.col("n_name"))
    out_cols = ["n_file_id", "type", "full_path", "file_id", "name", "dir_id",
                "size", "md5_hash", "sha1_hash", "dir_path"]
    return (
        by_sha1.unionByName(by_md5, allowMissingColumns=False)
        .unionByName(by_name)
        .where(F.col("file_id") != F.col("n_file_id"))
        .select(*out_cols)
        .distinct()
    )


def _needle_cols(files: DataFrame) -> DataFrame:
    return files.select(
        F.col("file_id").alias("n_file_id"),
        F.col("name").alias("n_name"),
        F.col("size").alias("n_size"),
        F.col("md5_hash").alias("n_md5"),
        F.col("sha1_hash").alias("n_sha1"),
    )


def search_duplicate_file(listing: DataFrame, full_path: str) -> DataFrame:
    """Flagship duplicate search by path (readme.md:26-36)."""
    p = sql_path_parse_exact_search(full_path)
    files = listing.where(F.col("type") == "file")
    needle = _needle_cols(
        files.where(
            (F.col("dir_path") == basepath(F.lit(p)))
            & (F.col("name") == basename(F.lit(p)))
        )
    )
    return _duplicates_of(files, needle).drop("n_file_id")


def search_duplicate_files_by_id(
    listing: DataFrame, file_ids: Sequence[int] | int
) -> DataFrame:
    """Duplicate search, id overload (the reference's int/int[] overload
    convention): returns matches tagged with the needle's file id as
    `needle_file_id`."""
    files = listing.where(F.col("type") == "file")
    needle = _needle_cols(
        files.where(F.col("file_id").isin(*[int(i) for i in _as_list(file_ids)]))
    )
    return _duplicates_of(files, needle).withColumnRenamed("n_file_id", "needle_file_id")


def duplicate_groups(listing: DataFrame, min_count: int = 2) -> DataFrame:
    """J5/A2 done the idiomatic Spark way (SURVEY §2.5): tag every file
    whose (sha1_hash, size) group has >= min_count members via a window
    count — one shuffle, no self-join."""
    from pyspark.sql.window import Window

    files = listing.where(
        (F.col("type") == "file") & F.col("sha1_hash").isNotNull() & F.col("size").isNotNull()
    )
    w = Window.partitionBy("sha1_hash", "size")
    return (
        files.withColumn("duplicate_count", F.count("*").over(w))
        .where(F.col("duplicate_count") >= min_count)
        .select(
            "full_path", "file_id", "name", "dir_id", "size",
            "sha1_hash", "duplicate_count",
        )
    )
