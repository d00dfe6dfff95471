"""Scheduler (SURVEY.md §2.6 T1/T2, §2.9 M9-M11, §4 O7/O8): priority
work claiming over the control tables.

Reference semantics:
- T1 get_dirs_to_crawl     DirectoryCrawl.py:641-687 — due dirs ranked
  by hours-overdue + round(file_count/100) + round(subdir_count/100),
  ordered ASCENDING (the written semantics — replicated quirk, §4),
  LIMIT n, then claimed (assigned_process_id + process_assigned_on).
- T2 get_files_to_hash     DirectoryCrawl.py:705-718 — smallest first.
- M9 schedule_subdirectories  DirectoryCrawl.py:1048-1076 (implements
  the intended semantics of the never-defined name install.py:71 calls).
- M11 reset                SQLUtil.py:407-441 — null all claims.

Claims are a control-table recompute (join + conditional update), not
an in-place UPDATE...RETURNING: Spark tasks own partitions natively,
so the claim columns exist for schedule-view parity and crash hygiene,
not correctness (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "get_dirs_to_crawl",
    "get_drives_to_crawl",
    "get_files_to_hash",
    "control_seed_rows",
    "seed_control_for_dirs",
    "reset_claims",
]


def get_drives_to_crawl(drive: DataFrame, control: DataFrame, limit: int = 10) -> DataFrame:
    """S2/J11: crawl roots not yet under schedule control — drive LEFT
    ANTI control (the reference's LEFT JOIN ... WHERE dc IS NULL idiom,
    DirectoryCrawl.py:424-450), ordered, limited."""
    return (
        drive.join(control.select("dir_path"), "dir_path", "left_anti")
        .orderBy(F.col("dir_path").asc())
        .limit(limit)
        .select("id", "dir_path")
    )


def get_dirs_to_crawl(
    control: DataFrame, now, limit: int = 10, process_id: int = 1,
    full_rows: bool = False, stale_after_s: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """T1: pick + claim up to `limit` due directories. Returns
    (claimed_work, new_control). Global top-k compiles to
    TakeOrderedAndProject — no full sort at scale. `full_rows=True`
    returns every control column on the claimed rows (plus
    priority_score) — what the engine's O(changes) control commit
    needs, so it never re-reads the control table to recover the
    claimed rows' state. `control` may be a zone-pruned superset read
    (store.read_pruned on next_crawl <= now): the due filter applies
    here, so the claim set is unchanged while the scan tracks the DUE
    segments, not the catalog (VERDICT r8 #3).

    `stale_after_s`: claims older than this many seconds count as
    FREE — the lease-expiry complement to the engine's committed
    claims (a process that died holding a claim stops blocking its
    dirs after the lease; the reference's only recovery is the manual
    M11 reset, kept as Engine.reset_claims). None = no expiry (the
    reference's literal semantics — suites/oracles use this)."""
    nowc = F.lit(now).cast("timestamp")
    free = F.col("assigned_process_id").isNull()
    if stale_after_s is not None:
        free = free | (
            F.col("process_assigned_on")
            < nowc - F.make_interval(secs=F.lit(int(stale_after_s)))
        )
    due = control.where((F.col("next_crawl") <= nowc) & free)
    score = (
        (nowc.cast("long") - F.col("next_crawl").cast("long")) / 3600.0
        + F.round(F.col("file_count") / 100)
        + F.round(F.col("subdir_count") / 100)
    )
    out_cols = (
        [*control.columns, "priority_score"]
        if full_rows
        else ["dir_path", "dir_id", "priority_score"]
    )
    work = (
        due.withColumn("priority_score", score)
        .orderBy(F.col("priority_score").asc(), F.col("dir_path").asc())
        .limit(limit)
        .select(*out_cols)
    )
    claimed = work.select("dir_path").withColumn("claimed", F.lit(True))
    new_control = (
        control.join(F.broadcast(claimed), "dir_path", "left")
        .withColumn(
            "assigned_process_id",
            F.when(F.col("claimed"), F.lit(process_id)).otherwise(
                F.col("assigned_process_id")
            ),
        )
        .withColumn(
            "process_assigned_on",
            F.when(F.col("claimed"), nowc).otherwise(F.col("process_assigned_on")),
        )
        .drop("claimed")
    )
    return work, new_control


def get_files_to_hash(
    hash_control: DataFrame, now, limit: int = 5000, process_id: int = 1,
    full_rows: bool = False, stale_after_s: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """T2: claim the smallest unclaimed files first (hash cheapest
    first, DirectoryCrawl.py:714-718). Returns (work, new_control).
    When the control frame carries `full_path` (the store's schema
    does), the claim returns it too — the hash wave then opens files
    without any catalog resolve. `full_rows=True` returns every
    control column (the engine's committed-claim input);
    `stale_after_s` frees claims older than the lease, exactly as in
    get_dirs_to_crawl (None = the reference's no-expiry semantics)."""
    nowc = F.lit(now).cast("timestamp")
    free = F.col("process_assigned_on").isNull()
    if stale_after_s is not None:
        free = free | (
            F.col("process_assigned_on")
            < nowc - F.make_interval(secs=F.lit(int(stale_after_s)))
        )
    extra = ["full_path"] if "full_path" in hash_control.columns else []
    out_cols = (
        list(hash_control.columns)
        if full_rows
        else ["file_id", "file_size", *extra]
    )
    work = (
        hash_control.where(free & ~F.coalesce("file_missing", F.lit(False)))
        .orderBy(F.col("file_size").asc(), F.col("file_id").asc())
        .limit(limit)
        .select(*out_cols)
    )
    claimed = work.select("file_id").withColumn("claimed", F.lit(True))
    new_control = (
        hash_control.join(F.broadcast(claimed), "file_id", "left")
        .withColumn(
            "process_assigned_on",
            F.when(F.col("claimed"), nowc).otherwise(F.col("process_assigned_on")),
        )
        .drop("claimed")
    )
    return work, new_control


def control_seed_rows(
    existing_dir_paths: DataFrame,
    new_dirs: DataFrame,
    now,
    crawl_frequency: int = 86_400,
) -> DataFrame:
    """The SEED ROWS of M9 alone (full control schema), for callers
    that commit O(changes) through store.apply_changes instead of
    rebuilding the control table: new dirs absent from
    `existing_dir_paths` (a one-column projection of the control
    table) become due-immediately control rows."""
    nowc = F.lit(now).cast("timestamp")
    return (
        new_dirs.select(F.col("dir_path"), F.col("id").alias("dir_id"))
        .join(existing_dir_paths.select("dir_path"), "dir_path", "left_anti")
        .select(
            "dir_path",
            "dir_id",
            F.lit(None).cast("int").alias("file_count"),
            F.lit(None).cast("int").alias("subdir_count"),
            nowc.alias("next_crawl"),
            F.lit(crawl_frequency).cast("int").alias("crawl_frequency"),
            F.lit(None).cast("int").alias("assigned_process_id"),
            F.lit(None).cast("timestamp").alias("process_assigned_on"),
            F.lit(None).cast("timestamp").alias("last_crawled"),
            F.lit(None).cast("timestamp").alias("last_active"),
            F.lit(False).alias("dir_missing"),
            nowc.alias("inserted_on"),
        )
    )


def seed_control_for_dirs(
    control: DataFrame, new_dirs: DataFrame, now, crawl_frequency: int = 86_400
) -> DataFrame:
    """M9: insert-if-absent control rows for newly discovered dirs —
    due immediately (next_crawl = now), default frequency 1 day
    (DirectoryCrawl.py:536,1048-1076)."""
    return control.unionByName(
        control_seed_rows(control, new_dirs, now, crawl_frequency)
    )


def reset_claims(control: DataFrame) -> DataFrame:
    """M11 crash recovery: null out all claims (idempotent restart)."""
    return control.withColumn(
        "assigned_process_id", F.lit(None).cast("int")
    ).withColumn("process_assigned_on", F.lit(None).cast("timestamp"))
