"""Stats-driven physical planning (the cost-based half of ANALYZE).

g13/g14 give the engine ANALYZE statistics; this module is where they
change PLANS instead of just being reported: join strategy (broadcast
vs shuffle) and skew handling (j13-style salting) are chosen from the
persisted table stats (`TableStore.analyze` → `_STATS-<t>.json`,
metadata-only to consult — no Spark job runs to make a planning
decision), not hardcoded per call site.

Why not trust Spark's own estimator: Spark sizes a scan from file
bytes, which the store's merge-on-read reads (scoped filters, deletion
vectors, multi-segment manifests) systematically over- or under-count;
and the engine API paths previously pinned `F.broadcast` hints that
silently become wrong the day a dimension outgrows the executors (a
10^9-directory catalog OOMs a broadcast that was written for 10^4).
The stats file records what the table actually held at ANALYZE time;
the planner applies the same thresholds a cluster operator would:

- dimension estimated under `BROADCAST_MAX_BYTES` → broadcast hint;
- over it (or `n_rows` over `BROADCAST_MAX_ROWS`) → no hint, shuffle
  (AQE may still locally convert);
- a join key whose hottest value holds more than `SKEW_SHARE` of the
  fact side → salted join (j13 pattern: replicate the dim SALT ways,
  spread the hot key across SALT reducers) — the skew AQE can't fix,
  because one giant key-group is one partition however you split.

Strategy flips are plan-pinned in tests/test_planner.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BROADCAST_MAX_BYTES",
    "BROADCAST_MAX_ROWS",
    "SKEW_SHARE",
    "should_broadcast",
    "skewed_keys",
    "plan_join",
]

#: Spark's own autoBroadcastJoinThreshold default (10 MB) — the hint
#: budget a driver/executor comfortably replicates.
BROADCAST_MAX_BYTES = 10 * 1024 * 1024
#: hard row cap regardless of width (hash-relation build cost)
BROADCAST_MAX_ROWS = 4_000_000
#: hottest-key share of the fact side that triggers salting
SKEW_SHARE = 0.20
#: salt fan-out for the skewed path
SALT = 8


def should_broadcast(
    stats: dict | None,
    threshold_bytes: int = BROADCAST_MAX_BYTES,
    max_rows: int = BROADCAST_MAX_ROWS,
    default: bool = True,
) -> bool:
    """Decide the dimension-side strategy from persisted ANALYZE
    stats. No stats → `default` (an un-analyzed table keeps the
    call site's historical behavior; analyze() is cheap and the
    engine refreshes on its idle edge)."""
    if not stats:
        return default
    if int(stats.get("n_rows", 0)) > max_rows:
        return False
    return int(stats.get("bytes_est", 0)) <= threshold_bytes


def skewed_keys(
    stats: dict | None, key: str, share: float = SKEW_SHARE
) -> bool:
    """True when ANALYZE's skew profile (a7 machinery: top-key counts)
    says `key`'s hottest value exceeds `share` of the table."""
    if not stats:
        return False
    prof = (stats.get("skew") or {}).get(key)
    return prof is not None and float(prof.get("max_share", 0.0)) >= share


def plan_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    dim_stats: dict | None = None,
    fact_stats: dict | None = None,
    default_broadcast: bool = True,
) -> tuple[DataFrame, str]:
    """Equi-join `fact` with `dim` using the stats-chosen physical
    strategy; returns (joined, strategy) with strategy in
    {'broadcast', 'shuffle', 'salted'} so call sites and tests can pin
    the decision. Values are identical across strategies — this
    chooses HOW, never WHAT."""
    if should_broadcast(dim_stats, default=default_broadcast):
        return (
            fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], how),
            "broadcast",
        )
    if skewed_keys(fact_stats, fact_key):
        # j13: spread the hot key across SALT reducers — fact rows get
        # a row-level salt (rand is fine: any assignment is correct,
        # salting changes distribution, never membership), the dim
        # replicates SALT ways via a broadcast cross join
        spark = fact.sparkSession
        salts = spark.range(SALT).select(F.col("id").alias("__salt"))
        f = fact.withColumn(
            "__salt", (F.rand(42) * SALT).cast("long")
        )
        d = dim.crossJoin(F.broadcast(salts))
        joined = f.join(
            d,
            (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
            how,
        ).drop("__salt")
        return joined, "salted"
    return fact.join(dim, fact[fact_key] == dim[dim_key], how), "shuffle"
