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


QUERIES["s1_stream_tumbling"] = s1_stream_tumbling
QUERIES["s2_stream_spend_monitor"] = s2_stream_spend_monitor

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
