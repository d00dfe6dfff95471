"""S7/M12 file copy pipeline (SURVEY.md §2.1, §2.9): queue copy jobs,
claim them FIFO, execute with pre-checks and post-verification.

Reference semantics (FileHandler/CopyFile.py:32-111, FileHandler.py:
104-165 — note the reference's M12 SQL is an untested path with
non-Postgres `ifnull`, SURVEY §4; this implements the documented
intent):
- pre-check: source exists; destination collision honors the overwrite
  policy: 'y' always, 'n' never, 's' only if sizes differ, 'h' only if
  SHA1s differ (one char, FileHandler.py:51);
- copy via shutil.copy2 (metadata-preserving);
- post-verify: size match, then SHA1 match when verify=True;
- results recorded per job (success + message), queue drained FIFO in
  bounded batches (T3).

Execution shape: jobs are claimed driver-side (tiny control table),
the copies run executor-side via mapInPandas over the claimed batch —
the reference's copy worker processes, distributed."""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterable, Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import _hash_one
from ..localframe import local_df

__all__ = [
    "COPY_FILE",
    "COPY_RESULT",
    "queue_copy",
    "claim_copy_jobs",
    "resolve_copy_paths",
    "perform_copies",
]

COPY_FILE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("new_path", T.StringType()),
        T.StructField("overwrite", T.StringType()),  # y/n/s/h (char(1))
        T.StructField("verify", T.BooleanType()),
        T.StructField("move", T.BooleanType()),
        T.StructField("assigned_on", T.TimestampType()),
        T.StructField("inserted_on", T.TimestampType()),
    ]
)

COPY_RESULT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("new_path", T.StringType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("message", T.StringType()),
        T.StructField("completed_on", T.TimestampType()),
    ]
)


def queue_copy(
    spark: SparkSession,
    queue: DataFrame,
    file_path: str,
    new_path: str,
    overwrite: str = "n",
    verify: bool = True,
    move: bool = False,
    now: datetime | None = None,
) -> DataFrame:
    """Append a copy job (FileHandler.py:42-82 queue semantics)."""
    now = now or datetime.now(tz=timezone.utc).replace(tzinfo=None)
    row = local_df(spark, 
        [(None, file_path, new_path, overwrite, verify, move, None, now)], COPY_FILE
    ).withColumn("id", F.xxhash64("file_path", "new_path", "inserted_on"))
    return queue.unionByName(row)


def claim_copy_jobs(
    queue: DataFrame, now: datetime, limit: int = 100
) -> tuple[DataFrame, DataFrame]:
    """M12: claim up to `limit` unassigned jobs FIFO (ORDER BY
    inserted_on LIMIT, T3). Returns (work, new_queue)."""
    nowc = F.lit(now).cast("timestamp")
    work = (
        queue.where(F.col("assigned_on").isNull())
        .orderBy(F.col("inserted_on").asc(), F.col("id").asc())
        .limit(limit)
    )
    claimed = work.select("id").withColumn("claimed", F.lit(True))
    new_queue = (
        queue.join(F.broadcast(claimed), "id", "left")
        .withColumn(
            "assigned_on",
            F.when(F.col("claimed"), nowc).otherwise(F.col("assigned_on")),
        )
        .drop("claimed")
    )
    return work, new_queue


def resolve_copy_paths(work: DataFrame, file_detail: DataFrame) -> DataFrame:
    """J12: resolve queued jobs against the catalog — copy_file ⟕
    vw_file_detail on the source path with
    coalesce(catalog_path, queued_path) (FileHandler.py:144-162). Jobs
    whose source is cataloged gain its canonical full_path; uncataloged
    sources fall back to the queued literal path."""
    fd = file_detail.select(
        F.col("full_path").alias("cat_path"), F.col("file_id").alias("cat_file_id")
    )
    return (
        work.join(fd, work.file_path == fd.cat_path, "left")
        .withColumn("file_path", F.coalesce(F.col("cat_path"), F.col("file_path")))
        .drop("cat_path")
    )


def _copy_one(src: str, dst: str, overwrite: str, verify: bool, move: bool) -> tuple[bool, str]:
    if not os.path.isfile(src):
        return False, "source missing"
    if os.path.exists(dst):
        if overwrite == "n":
            return False, "destination exists (overwrite=n)"
        if overwrite == "s" and os.path.getsize(dst) == os.path.getsize(src):
            return False, "destination exists with same size (overwrite=s)"
        if overwrite == "h":
            hs, hd = _hash_one(src), _hash_one(dst)
            if hs and hd and hs[1] == hd[1]:
                return False, "destination exists with same sha1 (overwrite=h)"
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    try:
        shutil.copy2(src, dst)
    except OSError as exc:
        return False, f"copy failed: {exc}"
    if os.path.getsize(dst) != os.path.getsize(src):
        return False, "post-check failed: size mismatch"
    if verify:
        hs, hd = _hash_one(src), _hash_one(dst)
        if not hs or not hd or hs[1] != hd[1]:
            return False, "post-check failed: sha1 mismatch"
    if move:
        try:
            os.remove(src)
        except OSError as exc:
            return True, f"copied but source removal failed: {exc}"
    return True, "ok"


def perform_copies(work: DataFrame) -> DataFrame:
    """Execute claimed jobs executor-side; returns COPY_RESULT rows."""
    import pandas as pd

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                ok, msg = _copy_one(
                    r.file_path, r.new_path, r.overwrite or "n",
                    bool(r.verify), bool(r.move),
                )
                out.append(
                    (
                        int(r.id), r.file_path, r.new_path, ok, msg,
                        datetime.now(tz=timezone.utc).replace(tzinfo=None),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in COPY_RESULT.fields])

    cols = ["id", "file_path", "new_path", "overwrite", "verify", "move"]
    return work.select(*cols).mapInPandas(run, COPY_RESULT)
