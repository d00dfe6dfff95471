"""Continuous crawl driver (SURVEY.md §2.10 micro-batching): the
reference's server loop (Server/__init__.py:228-505 — 9 processes,
queues, 5-second flush timers) expressed as a rate-source stream whose
foreachBatch tick runs one crawl wave + one hash wave.

Why a stream and not a while-loop: checkpointed triggers give restart
semantics for free (O10 — the reference resets claims on startup
instead), rate limiting is declarative, and the same foreachBatch
functions run unchanged under any trigger (processingTime='5 seconds'
to mirror the reference's db_dump_interval, or availableNow for
drain-and-stop).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..filedb.engine import Engine

__all__ = ["continuous_crawl"]


def continuous_crawl(
    spark: SparkSession,
    engine: Engine,
    interval: str = "5 seconds",
    crawl_limit: int = 100,
    hash_limit: int = 5000,
    checkpoint: str | None = None,
) -> StreamingQuery:
    """Start the continuous crawl: every trigger tick claims due dirs
    (T1), scans+merges (S1+M1-M3), then claims and hashes files
    (T2+S6+M4). Returns the StreamingQuery (stop() to shut down)."""
    ticks = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def tick(_batch_df, _batch_id: int) -> None:
        engine.crawl_once(limit=crawl_limit)
        engine.hash_once(limit=hash_limit)

    writer = (
        ticks.writeStream.foreachBatch(tick)
        .trigger(processingTime=interval)
        .queryName("file_db_continuous_crawl")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
