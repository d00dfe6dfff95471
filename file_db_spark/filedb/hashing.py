"""S6 file-content hashing source (SURVEY.md §2.1): MD5 + SHA1 computed
in ONE chunked pass per file (8192-byte buffer), the semantics of
FileHandler/HashFile.py:6-51.

Shape: `mapInPandas` over (file_id, full_path) batches — executor-side
file IO, Arrow-batched metadata transfer, nothing but ids/paths/digests
crosses the driver. Hashing is IO-bound; parallelism is per-partition
(the reference's hash workers, Server/__init__.py:436-469). The work
queue ordering (smallest-first, T2) is applied by the scheduler before
this source runs.

A vanished/unreadable file yields file_missing=true (the reference sets
hash_control.file_missing, FileDbDAL/DirectoryCrawl.py:551-562)."""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterable, Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["HASH_SCHEMA", "BUFFER_SIZE", "hash_files"]

#: 8 KiB chunk size — FileHandler/HashFile.py:9 (buffer_size = 128*64)
BUFFER_SIZE = 128 * 64

HASH_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType()),
        T.StructField("md5_hash", T.StringType()),
        T.StructField("sha1_hash", T.StringType()),
        T.StructField("hashed_on", T.TimestampType()),
        T.StructField("file_missing", T.BooleanType()),
    ]
)


def _hash_one(path: str) -> tuple[str, str] | None:
    md5 = hashlib.md5()
    sha1 = hashlib.sha1()
    try:
        with open(path, "rb") as fh:
            while True:
                chunk = fh.read(BUFFER_SIZE)
                if not chunk:
                    break
                md5.update(chunk)
                sha1.update(chunk)
    except OSError:
        return None
    return md5.hexdigest(), sha1.hexdigest()


def hash_files(work: DataFrame) -> DataFrame:
    """Hash every (file_id, full_path) row of `work`; returns
    HASH_SCHEMA rows. Repartition `work` upstream to spread IO."""
    import pandas as pd

    def hash_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fid, path in zip(pdf["file_id"], pdf["full_path"]):
                digests = _hash_one(path) if isinstance(path, str) else None
                now = datetime.now(tz=timezone.utc).replace(tzinfo=None)
                if digests is None:
                    out.append((int(fid), None, None, now, True))
                else:
                    out.append((int(fid), digests[0], digests[1], now, False))
            yield pd.DataFrame(
                out, columns=[f.name for f in HASH_SCHEMA.fields]
            )

    return work.select("file_id", "full_path").mapInPandas(hash_batches, HASH_SCHEMA)


def hash_file_local(path: str) -> tuple[str, str] | None:
    """Driver-side single-file hash (the CLI `hash_file` command path,
    CLI/__init__.py:110-117). Returns (md5, sha1) or None if unreadable."""
    if not os.path.isfile(path):
        return None
    return _hash_one(path)
