"""Streaming operators surfaced in the driver-graded registry.

Both entries carry full DuckDB value-hash oracles: trigger(availableNow)
over a static source is exactly one micro-batch, so the drained result
IS its batch aggregate (see ORACLES below). Stream-vs-batch equality is
additionally pinned in tests/test_streaming.py.

Each entry drains the stream into a uniquely-named memory sink and
returns the result as a batch DataFrame, so the driver can count/hash
it like any other query.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..streaming import events_stream as es

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _drain(stream_df: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    return es.run_to_memory(
        stream_df, f"{prefix}_{uuid.uuid4().hex[:8]}", output_mode=output_mode
    )


def s1_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming e1: watermarked 1-hour tumbling windows drained with
    availableNow (complete mode, so the final open window is emitted;
    equals e1_tumbling_window — pinned in tests)."""
    src = es.events_source(spark, sf_dir)
    return _drain(es.tumbling_counts(src), "s1", "complete")


def s2_stream_spend_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running purchase totals + threshold alert level; final emit per
    user equals the batch aggregate — pinned in tests."""
    src = es.events_source(spark, sf_dir)
    return _drain(es.user_spend_monitor(src), "s2", "update")


def s3_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming e5: 1-hour windows sliding every 30 minutes over
    purchases, drained in complete mode (each event contributes to
    exactly 2 epoch-aligned windows)."""
    src = es.events_source(spark, sf_dir)
    return _drain(es.sliding_purchases(src), "s3", "complete")


def s4_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming e4: watermark-bounded keyed dedup
    (dropDuplicates on (user_id, event_type)), drained and projected to
    the key set. The projection is what makes the result deterministic:
    WHICH first event survives depends on arrival order inside the
    micro-batch, but the surviving KEY SET is exactly the distinct
    keys."""
    src = es.events_source(spark, sf_dir)
    return _drain(es.stateful_dedup(src), "s4", "append").select(
        "user_id", "event_type"
    )


def s5_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming e2: native session windows (30-minute gap) per user,
    drained in complete mode — state-merged sessionization."""
    src = es.events_source(spark, sf_dir)
    return _drain(es.session_counts(src), "s5", "complete")


QUERIES["s1_stream_tumbling"] = s1_stream_tumbling
QUERIES["s2_stream_spend_monitor"] = s2_stream_spend_monitor
QUERIES["s3_stream_sliding"] = s3_stream_sliding
QUERIES["s4_stream_dedup"] = s4_stream_dedup
QUERIES["s5_stream_sessions"] = s5_stream_sessions

# The drained streams ARE deterministic batch results (availableNow over
# a static source = exactly one micro-batch): s1 in complete mode equals
# the batch tumbling aggregation, s2's single final emit per user equals
# the batch per-user rollup — so both get full value-hash oracles, not
# just rows-only checks. (Stream-vs-batch equality is ALSO pinned in
# tests/test_streaming.py; this makes the driver's gate see it too.)
ORACLES["s1_stream_tumbling"] = """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """
ORACLES["s2_stream_spend_monitor"] = """
    SELECT user_id, COUNT(*) AS n_purchases,
           SUM(COALESCE(value, 0)) AS total_spend,
           CAST(FLOOR(SUM(COALESCE(value, 0)) / 500.0) AS BIGINT) AS alert_level
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    """
# Sliding windows are epoch-aligned with slide 30 min: each event falls
# in exactly windowDuration/slide = 2 windows (its 30-min floor and the
# one 30 min earlier).
ORACLES["s3_stream_sliding"] = """
    WITH ev AS (
      SELECT date_trunc('hour', ts)
             + CASE WHEN EXTRACT(minute FROM ts) >= 30
                    THEN INTERVAL '30 minutes' ELSE INTERVAL '0 minutes' END AS floor30,
             value
      FROM events WHERE event_type = 'purchase'
    ), wins AS (
      SELECT floor30 - INTERVAL '30 minutes' * k AS window_start, value
      FROM ev, unnest([0, 1]) AS t(k)
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM wins GROUP BY 1
    """
ORACLES["s4_stream_dedup"] = """
    SELECT DISTINCT user_id, event_type FROM events
    """
# session_window merges [ts, ts+gap) intervals: a gap of EXACTLY 30
# minutes starts a new session (closed-open windows don't overlap) —
# note >= in the break condition, vs > in the batch e2 oracle whose
# lag/cumsum convention differs on exact-boundary ties.
ORACLES["s5_stream_sessions"] = """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                     >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM flagged
    )
    SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP) AS session_end,
           user_id, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """
