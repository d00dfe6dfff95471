"""Catalog table schemas (SURVEY.md §1.1) as explicit StructTypes.

Tiers (reference DDL cited per table):
- entity:   directory, file, hash, file_category, drive
- archive:  directory_archive, file_archive
- control:  directory_control, hash_control, removal queues, copy queue

Conventions replicated from the reference:
- file.size is DECIMAL(18,6) **megabytes** = bytes/1e6
  (FileDbDAL/File.py:35) — a documented quirk the oracle depends on.
- timestamps are naive (session tz pinned UTC).
- `file` has PK (name, dir_id) plus surrogate `id` referenced by
  hash.file_id (FileDbDAL/File.py:114-128); ids here are deterministic
  xxhash64(dir_path, name) so they survive re-crawls without an
  identity column (SURVEY §7 "upsert identity").
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "DIRECTORY",
    "FILE",
    "HASH",
    "FILE_CATEGORY",
    "DRIVE",
    "DIRECTORY_ARCHIVE",
    "FILE_ARCHIVE",
    "DIRECTORY_CONTROL",
    "HASH_CONTROL",
]


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


_TS = T.TimestampType()
_LONG = T.LongType()
_STR = T.StringType()
_SIZE = T.DecimalType(18, 6)  # MB = bytes/1e6 (FileDbDAL/File.py:35)

# FileDbDAL/Directory.py:90-101
DIRECTORY = _s(
    ("id", _LONG),
    ("dir_path", _STR),
    ("ctime", _TS),
    ("mtime", _TS),
    ("inserted_on", _TS),
    ("updated_on", _TS),
)

# FileDbDAL/File.py:114-128
FILE = _s(
    ("id", _LONG),
    ("name", _STR),
    ("dir_id", _LONG),
    ("size", _SIZE),
    ("ctime", _TS),
    ("mtime", _TS),
    ("atime", _TS),
    ("inserted_on", _TS),
    ("updated_on", _TS),
)

# FileDbDAL/Hash.py:61-72
HASH = _s(
    ("id", _LONG),
    ("file_id", _LONG),
    ("md5_hash", _STR),
    ("md5_hash_time", _TS),
    ("sha1_hash", _STR),
    ("sha1_hash_time", _TS),
)

# FileDbDAL/File.py:191-198
FILE_CATEGORY = _s(("extension", _STR), ("category", _STR))

# FileDbDAL/DirectoryCrawl.py:512-522
DRIVE = _s(("id", _LONG), ("dir_path", _STR), ("inserted_on", _TS))

# FileDbDAL/Directory.py:108-121 — soft-delete history with lineage
DIRECTORY_ARCHIVE = _s(
    ("id", _LONG),
    ("dir_path", _STR),
    ("ctime", _TS),
    ("mtime", _TS),
    ("original_inserted_on", _TS),
    ("original_updated_on", _TS),
    ("deleted_on", _TS),
)

# FileDbDAL/File.py:135-151
FILE_ARCHIVE = _s(
    ("id", _LONG),
    ("name", _STR),
    ("dir_id", _LONG),
    ("size", _SIZE),
    ("ctime", _TS),
    ("mtime", _TS),
    ("atime", _TS),
    ("original_inserted_on", _TS),
    ("original_updated_on", _TS),
    ("deleted_on", _TS),
)

# FileDbDAL/DirectoryCrawl.py:528-545
DIRECTORY_CONTROL = _s(
    ("dir_path", _STR),
    ("dir_id", _LONG),
    ("file_count", T.IntegerType()),
    ("subdir_count", T.IntegerType()),
    ("next_crawl", _TS),
    ("crawl_frequency", T.IntegerType()),  # seconds
    ("assigned_process_id", T.IntegerType()),
    ("process_assigned_on", _TS),
    ("last_crawled", _TS),
    ("last_active", _TS),
    ("dir_missing", T.BooleanType()),
    ("inserted_on", _TS),
)

# FileDbDAL/DirectoryCrawl.py:551-562, plus `full_path`: the work
# queue carries the path the hash wave will open, denormalized at
# schedule time (merge_files knows it from the staged listing). The
# reference re-derives paths by probing its file/directory PK B-trees
# per claimed row; at catalog scale the denormalized column is what
# lets a hash wave run with ZERO reads of `file`/`directory`
# (engine.hash_once). Nullable: rows scheduled before the column
# existed resolve through the legacy catalog join.
HASH_CONTROL = _s(
    ("file_id", _LONG),
    ("mtime", _TS),
    ("file_size", _SIZE),
    ("process_assigned_on", _TS),
    ("file_missing", T.BooleanType()),
    ("inserted_on", _TS),
    ("full_path", _STR),
)
