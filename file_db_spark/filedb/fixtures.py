r"""Deterministic domain fixtures (FIXTURES.md §A): derive the file_db
catalog tables — directory / file / hash / file_category — from the
driver's `documents` table with logic expressible IDENTICALLY in Spark
and DuckDB SQL, so every catalog view and search query gets a full
value-hash oracle.

Edge cases baked in (FIXTURES.md "required rows"):
- duplicate (sha1,size) groups of 3 and 2 across dirs (dup_key = doc_id
  % 200 drives both hash and size, so groups are consistent);
- doc 4/5: same sha1, different size (must NOT match the flagship);
- doc 6/16: sha1 NULL both sides, equal md5+size (MD5-fallback branch
  — both ids must satisfy the doc_id%10<7 hashed-subset condition);
- doc 8/9: same name in different dirs (name-match branch);
- dotless names (doc_id%10==0), names containing % _ * . (doc_id%37==0);
- both '/' and 'C:\' path families; drive root 'C:\' in directory;
- doc 11 is an orphan: its dir_path is excluded from `directory`;
- doc 1 size NULL, doc 2 size 0, doc 3 size > 1 GB;
- ~30% of files unhashed (doc_id%10>=7); sha1 NULL ~15% (doc_id%20>=17);
  md5 NULL (doc_id%10==3 among hashed).

`sha1_hash` carries a sha256 hex digest (DuckDB has no sha1; what the
tests need is *a* strong content hash with the reference's null/fallback
semantics, not the SHA-1 algorithm itself — the real scan path in
hashing.py computes true MD5+SHA1 per FileHandler/HashFile.py:6-51).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F

from ..catalog import load_table
from ..localframe import local_df

__all__ = [
    "fixture_file",
    "fixture_directory",
    "fixture_hash",
    "fixture_file_category",
    "FIXTURE_CTES",
]

# Derived-catalog cache: the fixture tables are deterministic functions
# of (session, sf_dir), and a dozen registry queries each need all
# three — re-deriving them per query repeats the distinct/row_number/
# join stages for identical 20-row/500-row results. This is the
# single-process analog of materializing the catalog tables once (the
# real engine's store.py does exactly that with parquet generations).
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _cached(spark: SparkSession, sf_dir: str, name: str, build) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        # Eager localCheckpoint, not persist: the fixture tables feed
        # DOZENS of registry queries per session (consumer depth >> 2,
        # the b645979 rule), and classic PySpark re-ANALYZES the full
        # logical plan of every persisted subtree on each DataFrame op
        # that references it — measured 1.9 s of driver-side plan
        # building for g2's 8-part union alone. As RDD leaves the
        # fixtures cost each consumer O(1) analysis. They are tiny
        # (20-500 rows) derived catalog tables, re-derived per session;
        # at cluster scale this is "materialize the catalog tables
        # once" (store.py does it with parquet generations).
        df = build().localCheckpoint(eager=True)
        _CACHE[key] = df
    return df


def _lit_ts(s: str) -> Column:
    return F.expr(f"timestamp'{s}'")


def _file_paths(d: DataFrame) -> DataFrame:
    """documents -> (doc_id, name, dir_path, dup_key) — the shared base."""
    doc = F.col("doc_id")
    name = (
        F.when(doc.isin(8, 9), F.lit("same_name.txt"))
        .when(doc % 37 == 0, F.concat(F.lit("we%ird_"), doc.cast("string"), F.lit(".t_t")))
        .when(doc % 10 == 0, F.concat(F.lit("doc_"), doc.cast("string")))
        .otherwise(F.concat(F.lit("doc_"), doc.cast("string"), F.lit(".txt")))
    )
    dir_path = (
        F.when(doc == 11, F.lit("/orphan/nowhere"))
        .when(doc % 2 == 0, F.concat(F.lit("/corpus/"), F.col("source")))
        .otherwise(F.concat(F.lit("C:\\corpus\\"), F.col("source")))
    )
    return d.select(
        "doc_id",
        name.alias("name"),
        dir_path.alias("dir_path"),
        (doc % 200).alias("dup_key"),
    )


def fixture_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """directory fixture: distinct file dirs (minus the orphan's) plus
    parent roots; id = row_number over binary-ordered dir_path (same
    default collation in Spark and DuckDB). Cached+persisted per
    (session, sf_dir) — ~21 rows referenced by fixture_file AND every
    view side of a catalog query; the global row_number is
    fixture-only (the real engine's ids are deterministic hashes,
    never a global sort)."""
    return _cached(spark, sf_dir, "directory", lambda: _build_directory(spark, sf_dir))


def _build_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    file_dirs = _file_paths(d).select("dir_path").where(
        F.col("dir_path") != "/orphan/nowhere"
    )
    roots = local_df(spark, 
        [("/corpus",), ("C:\\corpus",), ("C:\\",)], "dir_path string"
    )
    # id = 1-based rank in dir_path order over the ~21-row dir set.
    # Computed via coalesce(1) + sortWithinPartitions +
    # monotonically_increasing_id (0..n-1 on the single partition)
    # instead of an unpartitioned row_number window, so the fixture
    # doesn't spam every driver/bench log with 'WindowExec: No
    # Partition Defined' — keeping that warning meaningful for real
    # regressions. Equivalent to ROW_NUMBER() OVER (ORDER BY dir_path).
    dirs = (
        file_dirs.unionByName(roots)
        .distinct()
        .coalesce(1)
        .sortWithinPartitions("dir_path")
    )
    return dirs.select(
        (F.monotonically_increasing_id() + 1).cast("long").alias("id"),
        "dir_path",
        F.when(F.length("dir_path") % 5 < 2, F.lit(None).cast("timestamp"))
        .otherwise(_lit_ts("2023-12-31 00:00:00"))
        .alias("ctime"),
        _lit_ts("2023-12-31 00:00:00").alias("mtime"),
        _lit_ts("2024-06-01 00:00:00").alias("inserted_on"),
        _lit_ts("2024-06-02 00:00:00").alias("updated_on"),
    )


def fixture_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """file fixture; size in MB decimal(18,6) (FileDbDAL/File.py:35
    unit quirk), dir_id resolved by dir_path (orphan -> NULL).
    Cached+persisted per (session, sf_dir)."""
    return _cached(spark, sf_dir, "file", lambda: _build_file(spark, sf_dir))


def _build_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = _file_paths(d)
    doc = F.col("doc_id")
    size = (
        F.when(doc == 1, F.lit(None))
        .when(doc == 2, F.lit("0"))
        .when(doc == 3, F.lit("2000.5"))
        .when(doc == 4, F.lit("0.004"))
        .when(doc == 5, F.lit("0.005"))
        .when(doc.isin(6, 16), F.lit("0.006"))
        .otherwise(
            F.col("dup_key").cast("decimal(18,3)")
            * F.lit("0.001").cast("decimal(4,3)")
        )
        .cast("decimal(18,6)")
    )
    mtime = _lit_ts("2024-01-01 00:00:00") + F.expr(
        "make_interval(0, 0, 0, 0, cast(doc_id % 720 as int), 0, 0)"
    )
    dirs = fixture_directory(spark, sf_dir).select(
        F.col("id").alias("dir_id"), F.col("dir_path").alias("dp")
    )
    return (
        base.withColumn("size", size)
        .withColumn("mtime", mtime)
        .join(F.broadcast(dirs), F.col("dir_path") == F.col("dp"), "left")
        .select(
            doc.alias("id"),
            "name",
            "dir_id",
            "size",
            F.when(doc % 5 < 2, F.lit(None).cast("timestamp"))
            .otherwise(F.col("mtime") - F.expr("INTERVAL 1 HOUR"))
            .alias("ctime"),
            "mtime",
            (F.col("mtime") + F.expr("INTERVAL 1 HOUR")).alias("atime"),
            _lit_ts("2024-06-01 00:00:00").alias("inserted_on"),
            _lit_ts("2024-06-02 00:00:00").alias("updated_on"),
        )
    )


def fixture_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash fixture for ~70% of files, with the reference's null
    semantics (sha1 null -> MD5 fallback branch, Search.py:280-284).
    Cached+persisted per (session, sf_dir)."""
    return _cached(spark, sf_dir, "hash", lambda: _build_hash(spark, sf_dir))


def _build_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    hash_key = (
        F.when(doc.isin(4, 5), F.lit("collide"))
        .when(doc.isin(6, 16), F.lit("fallback"))
        .otherwise((doc % 200).cast("string"))
    )
    sha1_null = ((doc % 20) >= 17) | doc.isin(6, 16)
    md5_null = (doc % 10) == 3
    return (
        d.where(doc % 10 < 7)
        .select(
            doc.alias("id"),
            doc.alias("file_id"),
            F.when(md5_null, F.lit(None)).otherwise(F.md5(hash_key)).alias("md5_hash"),
            _lit_ts("2024-06-03 00:00:00").alias("md5_hash_time"),
            F.when(sha1_null, F.lit(None))
            .otherwise(F.sha2(hash_key, 256))
            .alias("sha1_hash"),
            _lit_ts("2024-06-03 00:00:00").alias("sha1_hash_time"),
        )
    )


def fixture_file_category(spark: SparkSession) -> DataFrame:
    """extension -> category dimension (FileDbDAL/File.py:191-198)."""
    return local_df(spark, 
        [("txt", "document"), ("t_t", "weird"), ("jpg", "image"), ("exe", "executable")],
        "extension string, category string",
    )


# ---------------------------------------------------------------------------
# The same derivation as DuckDB CTEs — prepended to every catalog oracle.
# Keep CASE branch order identical to the Column logic above.
# ---------------------------------------------------------------------------
FIXTURE_CTES = r"""
fx_base AS (
  SELECT doc_id,
         CASE WHEN doc_id IN (8, 9) THEN 'same_name.txt'
              WHEN doc_id % 37 = 0 THEN 'we%ird_' || CAST(doc_id AS VARCHAR) || '.t_t'
              WHEN doc_id % 10 = 0 THEN 'doc_' || CAST(doc_id AS VARCHAR)
              ELSE 'doc_' || CAST(doc_id AS VARCHAR) || '.txt' END AS name,
         CASE WHEN doc_id = 11 THEN '/orphan/nowhere'
              WHEN doc_id % 2 = 0 THEN '/corpus/' || source
              ELSE 'C:\corpus\' || source END AS dir_path,
         doc_id % 200 AS dup_key
  FROM documents
),
fx_directory AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY dir_path) AS BIGINT) AS id, dir_path,
         CASE WHEN length(dir_path) % 5 < 2 THEN NULL
              ELSE TIMESTAMP '2023-12-31' END AS ctime,
         TIMESTAMP '2023-12-31' AS mtime,
         TIMESTAMP '2024-06-01' AS inserted_on,
         TIMESTAMP '2024-06-02' AS updated_on
  FROM (
    SELECT DISTINCT dir_path FROM fx_base WHERE dir_path <> '/orphan/nowhere'
    UNION SELECT '/corpus' UNION SELECT 'C:\corpus' UNION SELECT 'C:\'
  )
),
fx_file AS (
  SELECT b.doc_id AS id, b.name, dd.id AS dir_id,
         CAST(CASE WHEN b.doc_id = 1 THEN NULL
              WHEN b.doc_id = 2 THEN '0'
              WHEN b.doc_id = 3 THEN '2000.5'
              WHEN b.doc_id = 4 THEN '0.004'
              WHEN b.doc_id = 5 THEN '0.005'
              WHEN b.doc_id IN (6, 16) THEN '0.006'
              ELSE CAST(CAST(b.dup_key AS DECIMAL(18,3)) * CAST('0.001' AS DECIMAL(4,3)) AS VARCHAR)
              END AS DECIMAL(18,6)) AS size,
         CASE WHEN b.doc_id % 5 < 2 THEN NULL
              ELSE TIMESTAMP '2024-01-01' + (b.doc_id % 720) * INTERVAL 1 HOUR - INTERVAL 1 HOUR
              END AS ctime,
         TIMESTAMP '2024-01-01' + (b.doc_id % 720) * INTERVAL 1 HOUR AS mtime,
         TIMESTAMP '2024-01-01' + (b.doc_id % 720) * INTERVAL 1 HOUR + INTERVAL 1 HOUR AS atime,
         TIMESTAMP '2024-06-01' AS inserted_on,
         TIMESTAMP '2024-06-02' AS updated_on
  FROM fx_base b LEFT JOIN fx_directory dd ON b.dir_path = dd.dir_path
),
fx_hash AS (
  SELECT doc_id AS id, doc_id AS file_id,
         CASE WHEN doc_id % 10 = 3 THEN NULL ELSE md5(hash_key) END AS md5_hash,
         TIMESTAMP '2024-06-03' AS md5_hash_time,
         CASE WHEN (doc_id % 20 >= 17) OR doc_id IN (6, 16) THEN NULL
              ELSE sha256(hash_key) END AS sha1_hash,
         TIMESTAMP '2024-06-03' AS sha1_hash_time
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id IN (4, 5) THEN 'collide'
                WHEN doc_id IN (6, 16) THEN 'fallback'
                ELSE CAST(doc_id % 200 AS VARCHAR) END AS hash_key
    FROM documents WHERE doc_id % 10 < 7
  )
),
fx_file_category AS (
  SELECT * FROM (VALUES ('txt', 'document'), ('t_t', 'weird'),
                        ('jpg', 'image'), ('exe', 'executable'))
              AS t(extension, category)
)
"""
