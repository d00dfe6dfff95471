"""SparkSession factory tuned for both local testing and cluster scale.

Design notes (100 TB stance):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join demotion/promotion replace hand-tuned
  partition counts when the data is 1000x bigger than the test SF.
- Session timezone pinned UTC so timestamp semantics are deterministic
  and match the DuckDB oracle (naive timestamps).
- Arrow enabled for all pandas interchange (Pandas UDFs, toPandas).
- ``spark.sql.shuffle.partitions`` defaults to 32 locally; on a real
  cluster AQE coalesces from a deliberately high initial number, so we
  set the initial partition count high and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "file_db_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        # Testdata events.parquet stores INT64 TIMESTAMP(NANOS), which
        # Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos
        # as long; catalog.load_table converts to timestamp exactly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- adaptive execution: the scale story ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # InferFiltersFromGenerate copies the exploded-array expression
        # into an inferred `size(arr)>0 AND isnotnull(arr)` filter that
        # predicate-pushdown then re-expands BELOW the projections that
        # staged the array — the whole tokenize->shingle pipeline runs
        # ~3x per row (measured 28.9s -> 1.3s on the contamination
        # probe at sf0.1). Every explode in this engine is over a
        # provably non-empty array (shingle/band builders emit a
        # fallback element), so the inferred filter can never prune a
        # row and is pure re-computation; exclude the rule.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Spark 4.1 writes + verifies a checksum sidecar for every
        # checkpoint file (state-store deltas included) through a
        # future pool the task must await; thread dumps during the s8
        # join stage show every task parked in
        # ChecksumCheckpointFileManager.awaitResult. The sidecars only
        # detect bit-rot inside a checkpoint dir — redundant under
        # fsynced atomic renames — and cost ~2x per stateful batch;
        # re-enable on object stores via SPARK_GRAFT_CKPT_CHECKSUM.
        .config(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled",
            os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM", "false"),
        )
        # --- python interchange is always Arrow ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # The default generated-class cache holds 100 entries; one store
        # MERGE/refresh pipeline alone compiles >100 distinct codegen
        # units, so consecutive waves thrash the cache and recompile
        # every unit each run (measured: g28/g30/g33 each lose 1-2 s/run
        # to Janino at any data scale — compile cost is per plan shape,
        # not per byte). 4096 entries keeps a long-lived session's
        # working set compiled at a fixed few-MB driver cost.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        # broadcast dims aggressively; AQE converts sort-merge to broadcast
        # at runtime when a side turns out small post-filter.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet scan sizing: 128 MiB splits keep task count sane at 100 TB
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Long-lived sessions accumulate shuffle files, broadcast
        # blocks and checkpoint RDDs whose cleanup rides ContextCleaner
        # weak references — which only enqueue on a JVM GC, and a
        # driver heap sized for headroom may not full-GC for hours
        # (the default periodic GC is 30min). A 5-minute forced GC
        # bounds that metadata (measured: the 87-query bench session
        # re-timed its fixed headline set ~8% faster after a System.gc
        # reclaimed 11 dead checkpoint RDDs).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "5min"),
        )
        # quieter local runs
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
