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

from ..localframe import local_df

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
    "search_duplicate_dir",
    "duplicate_dir_contents",
    "duplicate_groups",
    "duplicate_media_groups",
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
    probes = local_df(spark, [(p,) for p in paths], "probe_path string").select(
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


def search_duplicate_dir(
    listing: DataFrame,
    dir_path: str,
    hash_match_files: bool = True,
    name_match_files: bool = False,
) -> DataFrame:
    """J6 directory variant (FileDbDAL/Search.py:298-345): the needle is
    EVERY file at `dir_path`; return the catalog files that duplicate any
    of them — "which folders hold copies of this folder's files?".

    Reference semantics, per the SURVEY §4 documented-intent rulings
    shared with the file form:

    - the `f.id = n.id` clause ("at least return the files at the given
      path") keeps the needle's own rows in the result — unlike
      `search_duplicate_file`, the dir form does NOT exclude self rows;
    - hash match = SHA1-preferred / MD5-fallback keyed on the needle
      (`n.sha1_hash IS NULL` -> try md5), ANDed with size equality;
    - `_name_match_files` compares file names only (the reference's
      flag name and comments scope the match to files; dir rows carry
      NULL file_id/size/hashes and never satisfy the other branches).

    Shape: the needle is one directory's listing (small) -> broadcast;
    each OR branch is a separate broadcast equi-join, unioned + distinct
    — the same OR-join decomposition as `_duplicates_of`, never a
    nested-loop join. At catalog scale the probe side stays a metadata
    lookup; the catalog side is an equi-join on (sha1, size) which AQE
    plans as broadcast because the needle is tiny.
    """
    p = sql_path_parse_exact_search(dir_path)
    files = listing.where(F.col("type") == "file")
    needle_rows = files.where(F.col("dir_path") == p)
    needle = _needle_cols(needle_rows)

    out_cols = [c for c in files.columns]
    branches = [needle_rows.select(*out_cols)]  # f.id = n.id: the dir's own files
    if hash_match_files:
        by_sha1 = files.join(
            F.broadcast(needle.where(F.col("n_sha1").isNotNull())),
            (F.col("sha1_hash") == F.col("n_sha1"))
            & (F.col("size") == F.col("n_size")),
        )
        by_md5 = files.join(
            F.broadcast(needle.where(F.col("n_sha1").isNull())),
            (F.col("md5_hash") == F.col("n_md5"))
            & (F.col("size") == F.col("n_size")),
        )
        branches += [by_sha1.select(*out_cols), by_md5.select(*out_cols)]
    if name_match_files:
        by_name = files.join(F.broadcast(needle), F.col("name") == F.col("n_name"))
        branches.append(by_name.select(*out_cols))

    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.distinct()


def duplicate_dir_contents(listing: DataFrame) -> DataFrame:
    """The scale-correct "identical directory contents" report — the
    aggregate form the reference TODOs at FileDbDAL/Search.py:305-307
    (`_num_of_files_match` + hash match ≙ "dirs with identical
    contents").

    Per directory, fingerprint the MULTISET of file content keys
    (sha1-preferred, md5 fallback, name as the unhashed sentinel — the
    same preference ladder as the search functions — each paired with
    size), then count directories sharing each fingerprint. Two dirs
    share a fingerprint iff their content multisets are identical.
    Each content key is md5-hashed BEFORE the sort+join so raw names
    containing the '|' joiner or ':' separator cannot make two
    different multisets collide into one digest input (every element
    is a fixed-width hex token).

    Shape: one groupBy(dir) building a sorted-array digest + one window
    count over the 1-row-per-dir result — O(files) with map-side
    partial aggregation, no pairwise dir×dir join anywhere. At 100 TB
    this is the only formulation that works: the quadratic needle-join
    form degenerates when every dir is a needle, while the fingerprint
    groupBy stays a single shuffle keyed by dir and a second keyed by
    the 32-char digest.
    """
    from pyspark.sql.window import Window

    files = listing.where(F.col("type") == "file")
    content_key = F.concat_ws(
        ":",
        F.coalesce(
            F.col("sha1_hash"),
            F.concat(F.lit("m:"), F.col("md5_hash")),
            F.concat(F.lit("n:"), F.col("name")),
        ),
        F.coalesce(F.col("size").cast("string"), F.lit("~")),
    )
    per_dir = (
        files.select("dir_id", "dir_path", F.md5(content_key).alias("ck"))
        .groupBy("dir_id", "dir_path")
        .agg(
            F.count("*").alias("file_count"),
            F.md5(F.array_join(F.sort_array(F.collect_list("ck")), "|")).alias(
                "content_fingerprint"
            ),
        )
    )
    w = Window.partitionBy("content_fingerprint")
    return per_dir.select(
        "dir_id",
        "dir_path",
        F.col("file_count").cast("bigint").alias("file_count"),
        "content_fingerprint",
        F.count("*").over(w).cast("bigint").alias("n_dirs_sharing"),
    )


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


#: the reference plugin's image extension set
#: (Plugins/DuplicateImageBrowser/DuplicateImageBrowser.py:41)
IMAGE_EXTENSIONS = ("jpg", "jpeg", "png", "bmp", "gif", "tiff", "webp")


def duplicate_media_groups(
    file_detail: DataFrame,
    dir_like: str = "%",
    min_size_mb: float = 0.010,
    extensions: Sequence[str] = IMAGE_EXTENSIONS,
    limit: int = 1000,
) -> DataFrame:
    """The DuplicateImageBrowser plugin's query (the reference's only
    GUI plugin, Plugins/DuplicateImageBrowser/DuplicateImageBrowser.py:
    28-56) as a set-returning function: duplicate (sha1_hash, size)
    groups over `vw_file_detail`, restricted to a dir_path LIKE
    pattern, a minimum size (MB) and an extension list, joined back to
    their member files and ordered by hash for group-wise display.

    Documented-intent rulings: the reference CTE omits HAVING count>1
    (every hash would render as a "duplicate group") and its display
    loop drops each hash's FIRST file (the `last_hash` seeding bug) —
    this implements the plugin's stated purpose: only groups with
    >= 2 members, all member files kept. Extensions are a parameter
    (the plugin hardcodes images; the CLI front-end passes
    IMAGE_EXTENSIONS).

    Shape: one (sha1, size) window count over the filtered detail view
    — the c9/J5 idiom, no self-join — then ORDER BY ... LIMIT for the
    browser page. At catalog scale the extension + size filters ride
    the scan; the window shuffles only the filtered slice."""
    from pyspark.sql.window import Window

    ext = F.lower(F.regexp_replace(F.col("name"), r"^.+\.", ""))
    files = file_detail.where(
        F.col("dir_path").like(dir_like)
        & (F.col("size") > min_size_mb)
        & F.col("sha1_hash").isNotNull()
        & ext.isin(*[e.lower() for e in extensions])
    )
    w = Window.partitionBy("sha1_hash", "size")
    return (
        files.withColumn("duplicate_count", F.count("*").over(w).cast("bigint"))
        .where(F.col("duplicate_count") >= 2)
        .select(
            "sha1_hash", "size", "duplicate_count",
            "full_path", "name", "ctime", "mtime",
        )
        .orderBy("sha1_hash", "full_path")
        .limit(limit)
    )
