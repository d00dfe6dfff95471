"""Derived catalog relations (SURVEY.md §1.1 "the real query model"):

- vw_ll            files ∪ dirs as one directory-listing relation
                   (FileDbDAL/SQLUtil.py:223-248)
- vw_file_detail   file ⋈ directory ⟕ hash ⟕ file_category
                   (FileDbDAL/SQLUtil.py:252-266)
- dir_detail       per-directory aggregate (FileDbDAL/SQLUtil.py:269-286)
- vwf_dir_contents / vwf_directory_activity parameterized views
                   (FileDbDAL/SQLUtil.py:295-339, 360-383)

All are functions (DataFrame in -> DataFrame out) so they compose with
any catalog source: fixtures, the real crawl output, or stored tables.

Scale notes: `directory` and `file_category` are dimension-sized next
to `file`/`hash` -> broadcast; the file⋈hash join shuffles on file_id.
Replicated quirk: full_path joins with a BACKSLASH regardless of path
family (reference SQL path_join, FileDbDAL/SQLUtil.py:64-74).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.paths import basename, basepath, extension, path_join_col

__all__ = [
    "vw_ll",
    "vw_file_detail",
    "dir_detail",
    "vwf_dir_contents",
    "vwf_directory_activity",
]


def _dim(dim: DataFrame, broadcast: bool) -> DataFrame:
    """Optionally broadcast-hint a dimension side. Call sites default
    to True (the historical plan); the engine passes the stats-driven
    decision (planner.should_broadcast over ANALYZE stats) so the hint
    stops being a hardcoded assumption that breaks the day the
    dimension outgrows the executors."""
    return F.broadcast(dim) if broadcast else dim


def vw_ll(
    directory: DataFrame,
    file: DataFrame,
    hash_df: DataFrame,
    broadcast_dirs: bool = True,
) -> DataFrame:
    """Union listing (FileDbDAL/SQLUtil.py:223-248): file branch is
    file ⋈ directory ⟕ hash; dir branch self-joins each directory to its
    parent (parent.dir_path = basepath(dir_path), J4) — drive roots are
    their own parent (basepath('C:\\')='C:\\', replicated quirk).
    `broadcast_dirs` is the stats-driven strategy switch (see _dim)."""
    d = directory.alias("d")
    f = file.alias("f")
    h = hash_df.alias("h")
    files = (
        f.join(_dim(d, broadcast_dirs), F.col("f.dir_id") == F.col("d.id"))
        .join(h, F.col("h.file_id") == F.col("f.id"), "left")
        .select(
            F.lit("file").alias("type"),
            path_join_col(F.col("d.dir_path"), F.col("f.name")).alias("full_path"),
            F.col("f.id").alias("file_id"),
            F.col("f.name").alias("name"),
            F.col("f.dir_id").alias("dir_id"),
            F.col("f.size").alias("size"),
            F.col("f.ctime").alias("ctime"),
            F.col("f.mtime").alias("mtime"),
            F.col("f.atime").alias("atime"),
            F.col("h.md5_hash").alias("md5_hash"),
            F.col("h.sha1_hash").alias("sha1_hash"),
            F.col("d.dir_path").alias("dir_path"),
        )
    )
    child = directory.alias("c")
    parent = directory.alias("p")
    dirs = (
        child.join(
            _dim(parent, broadcast_dirs),
            basepath(F.col("c.dir_path")) == F.col("p.dir_path"),
        )
        .select(
            F.lit("dir").alias("type"),
            F.col("c.dir_path").alias("full_path"),
            F.lit(None).cast("long").alias("file_id"),
            basename(F.col("c.dir_path")).alias("name"),
            F.col("p.id").alias("dir_id"),
            F.lit(None).cast("decimal(18,6)").alias("size"),
            F.col("c.ctime").alias("ctime"),
            F.col("c.mtime").alias("mtime"),
            F.lit(None).cast("timestamp").alias("atime"),
            F.lit(None).cast("string").alias("md5_hash"),
            F.lit(None).cast("string").alias("sha1_hash"),
            basepath(F.col("c.dir_path")).alias("dir_path"),
        )
    )
    return files.unionByName(dirs)


def vw_file_detail(
    directory: DataFrame,
    file: DataFrame,
    hash_df: DataFrame,
    file_category: DataFrame,
    broadcast_dirs: bool = True,
) -> DataFrame:
    """file ⋈ directory ⟕ hash ⟕ file_category on the derived extension
    key (FileDbDAL/SQLUtil.py:252-266; J3 expression join materialized
    as a column so it stays a broadcast equi-join). file_category is a
    true constant dimension (extension lookup) and always broadcasts;
    `directory` follows the stats-driven switch (see _dim)."""
    d = directory.alias("d")
    f = file.alias("f")
    h = hash_df.alias("h")
    fc = file_category.alias("fc")
    return (
        f.withColumn("ext", extension(F.col("name")))
        .join(_dim(d, broadcast_dirs), F.col("dir_id") == F.col("d.id"))
        .join(h, F.col("h.file_id") == F.col("f.id"), "left")
        .join(F.broadcast(fc), F.col("ext") == F.col("fc.extension"), "left")
        .select(
            F.col("f.id").alias("file_id"),
            F.col("f.name").alias("name"),
            path_join_col(F.col("d.dir_path"), F.col("f.name")).alias("full_path"),
            F.col("f.dir_id").alias("dir_id"),
            F.col("d.dir_path").alias("dir_path"),
            F.col("f.size").alias("size"),
            F.col("f.ctime").alias("ctime"),
            F.col("f.mtime").alias("mtime"),
            F.col("f.atime").alias("atime"),
            F.col("h.md5_hash").alias("md5_hash"),
            F.col("h.sha1_hash").alias("sha1_hash"),
            F.col("fc.category").alias("category"),
        )
    )


def dir_detail(directory: DataFrame, file: DataFrame) -> DataFrame:
    """Per-directory rollup (FileDbDAL/SQLUtil.py:269-286): subdir count,
    file count, total size, min/max file ctime/mtime. Implemented as two
    independent sub-aggregations joined back (no file×subdir fanout —
    the idiomatic set-based form of the reference's intent; also the
    scale-safe one: each agg shuffles once on its own key)."""
    subdirs = (
        directory.select(basepath("dir_path").alias("parent_path"))
        .groupBy("parent_path")
        .agg(F.count("*").alias("subdir_count"))
    )
    files = (
        file.groupBy("dir_id")
        .agg(
            F.count("*").alias("file_count"),
            F.sum(F.coalesce(F.col("size"), F.lit(0).cast("decimal(18,6)"))).alias(
                "total_size"
            ),
            F.min("ctime").alias("min_file_ctime"),
            F.max("ctime").alias("max_file_ctime"),
            F.min("mtime").alias("min_file_mtime"),
            F.max("mtime").alias("max_file_mtime"),
        )
    )
    d = directory.alias("d")
    return (
        d.join(F.broadcast(subdirs), F.col("d.dir_path") == F.col("parent_path"), "left")
        .join(files, F.col("d.id") == files.dir_id, "left")
        .select(
            F.col("d.id").alias("dir_id"),
            F.col("d.dir_path").alias("dir_path"),
            # a directory is its own parent at the root (basepath quirk):
            # do not count it as its own subdir
            F.coalesce(
                F.when(
                    basepath(F.col("d.dir_path")) == F.col("d.dir_path"),
                    F.col("subdir_count") - 1,
                ).otherwise(F.col("subdir_count")),
                F.lit(0),
            ).cast("bigint").alias("subdir_count"),
            F.coalesce(F.col("file_count"), F.lit(0)).cast("bigint").alias("file_count"),
            F.coalesce(
                F.col("total_size"), F.lit(0).cast("decimal(18,6)")
            ).cast("decimal(28,6)").alias("total_size"),
            "min_file_ctime",
            "max_file_ctime",
            "min_file_mtime",
            "max_file_mtime",
        )
    )


def vwf_dir_contents(
    directory: DataFrame,
    file: DataFrame,
    hash_df: DataFrame,
    dir_ids: Sequence[int],
) -> DataFrame:
    """Parameterized listing of specific directories
    (FileDbDAL/SQLUtil.py:295-339): vw_ll restricted to dir_id IN ids."""
    listing = vw_ll(directory, file, hash_df)
    return listing.where(F.col("dir_id").isin(*[int(i) for i in dir_ids]))


def vwf_directory_activity(file: DataFrame, dir_ids: Sequence[int]) -> DataFrame:
    """Min/max content activity per directory
    (FileDbDAL/SQLUtil.py:360-383)."""
    return (
        file.where(F.col("dir_id").isin(*[int(i) for i in dir_ids]))
        .groupBy("dir_id")
        .agg(
            F.min("ctime").alias("min_ctime"),
            F.max("ctime").alias("max_ctime"),
            F.min("mtime").alias("min_mtime"),
            F.max("mtime").alias("max_mtime"),
        )
    )
