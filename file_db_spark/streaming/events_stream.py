"""Streaming event analytics (SURVEY.md §2.10 "new capability, no
reference analog"): the streaming builds of operators/events.py e1/e4/e5
— same logical transformations, declared over an unbounded source with
watermarks bounding state.

Usage shape:
    src = events_source(spark, sf_dir)          # file stream over the
                                                # events parquet
    q = (tumbling_counts(src)
         .writeStream.outputMode('append')
         .trigger(availableNow=True)
         .format('memory').queryName('t').start())

State story at scale: the 10-minute watermark bounds every window /
dedup state store; late rows beyond it are dropped (the batch oracle
sees all rows, so tests compare on availableNow over a static dir where
nothing is late). Session analytics use session_window (native state
merge) instead of the batch lag/cumsum idiom.
"""

from __future__ import annotations

import contextlib
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "EVENTS_SCHEMA",
    "events_source",
    "tumbling_counts",
    "sliding_purchases",
    "stateful_dedup",
    "user_spend_monitor",
    "session_counts",
    "run_to_memory",
    "stream_shuffle",
]

# ---------------------------------------------------------------------------
# State-store width control. A stateful streaming operator opens one
# state-store provider per shuffle partition (a stream-stream join opens
# FOUR), and every provider acquisition serializes through the global
# StateStore.loadedProviders lock with a synchronous coordinator RPC —
# measured as 30/32 executor threads BLOCKED in getStateStoreProvider
# during s8's join stage. State partitions should therefore track STATE
# VOLUME, not the batch shuffle width: at bench scale the stores hold
# KBs, so the default of 8 keeps full correctness while cutting provider
# round-trips 4x. Production (large state) raises SPARK_GRAFT_STREAM_SHUFFLE.
# The override is scoped + refcounted so concurrent suite members
# compose; Structured Streaming clones the session (and its conf) when a
# query starts, so the pinned width travels with the query.
# ---------------------------------------------------------------------------
_SHUF_KEY = "spark.sql.shuffle.partitions"
_STREAM_SHUF_LOCK = threading.Lock()
_STREAM_SHUF_DEPTH = 0
_STREAM_SHUF_PREV: str | None = None


@contextlib.contextmanager
def stream_shuffle(spark: SparkSession):
    """Scope ``spark.sql.shuffle.partitions`` to the streaming
    state-store width (``$SPARK_GRAFT_STREAM_SHUFFLE``, default 8) while
    a streaming query starts and drains. Reentrant across threads: the
    first entry saves the batch width, the last exit restores it."""
    global _STREAM_SHUF_DEPTH, _STREAM_SHUF_PREV
    n = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    with _STREAM_SHUF_LOCK:
        if _STREAM_SHUF_DEPTH == 0:
            _STREAM_SHUF_PREV = spark.conf.get(_SHUF_KEY)
            spark.conf.set(_SHUF_KEY, n)
        _STREAM_SHUF_DEPTH += 1
    try:
        yield
    finally:
        with _STREAM_SHUF_LOCK:
            _STREAM_SHUF_DEPTH -= 1
            if _STREAM_SHUF_DEPTH == 0 and _STREAM_SHUF_PREV is not None:
                spark.conf.set(_SHUF_KEY, _STREAM_SHUF_PREV)

#: events.parquet schema: ts arrives as TIMESTAMP(MICROS, not
#: UTC-adjusted) -> TIMESTAMP_NTZ; events_source casts it to a
#: session-UTC TIMESTAMP to match the batch path (catalog.load_table).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_source(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream over the events parquet — the standing-query analog
    of the batch scan. maxFilesPerTrigger is the backpressure knob (the
    reference's queue caps, config.json:24-29)."""
    from ..catalog import ensure_confs

    ensure_confs(spark)  # session timezone must be UTC for the NTZ cast
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file-stream source wants a directory; select the events
    # parquet out of the shared sf_dir with a glob
    df = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming e1: watermarked 1-hour tumbling window counts/sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
        )
    )


def sliding_purchases(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming e5: 1-hour window sliding every 30 minutes."""
    return (
        events.where(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_purchases", "total_value")
    )


def stateful_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming e4: keyed dedup with watermark-bounded state —
    dropDuplicates on (user_id, event_type) emits each key's first
    event; state for keys older than the watermark is evicted."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming e2: native session windows with a 30-minute gap —
    state-merged sessionization (the batch form is the lag/cumsum
    idiom; session_window is its streaming-native equivalent)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain a streaming DataFrame with trigger(availableNow) into an
    in-memory table and return it as a batch DataFrame (test/dev sink;
    production sinks are parquet/kafka foreachBatch).

    Append mode only emits windows the watermark has closed — the final
    window of a drained static source stays open, so use
    output_mode='complete' when comparing an aggregation against its
    batch oracle."""
    spark = stream_df.sparkSession
    with stream_shuffle(spark):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .trigger(availableNow=True)
            .format("memory")
            .queryName(name)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def user_spend_monitor(
    events: DataFrame, threshold: float = 500.0, watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running purchase totals with a derived alert level — how many
    multiples of `threshold` the user's cumulative spend has crossed.
    This is the shape Spark's built-in windows can't express: state is
    a running scalar per key, emitted on every update, independent of
    event-time windows.

    State story at scale: one (count, cents) pair per user in the state
    store — O(distinct users) memory, partitioned by the groupBy key;
    Arrow-batched transfer only for the updated keys each trigger.

    Determinism: spend accumulates in EXACT integer cents (the values
    are true 2-decimal amounts, so round(v*100) is exact and
    rounding-mode-proof), never in floats — a float running sum is
    association-order-sensitive AND the alert threshold is a hard
    integer boundary a one-ulp difference could flip.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, n_purchases long, total_spend double, alert_level long"
    )
    state_schema = "n long, cents long"
    threshold_cents = int(round(threshold * 100))

    def update(key, pdfs, state):
        import pandas as pd

        n, cents = state.get() if state.exists else (0, 0)
        for pdf in pdfs:
            vals = pdf["value"].fillna(0.0).astype("float64")
            n += len(pdf)
            cents += int((vals * 100.0).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_purchases": n,
                    "total_spend": cents / 100.0,
                    "alert_level": cents // threshold_cents,
                }
            ]
        )

    return (
        events.where(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: documents.parquet schema (streaming file source needs it declared)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_source(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream over the documents parquet — the ingestion side of
    the streaming near-dup admission pipeline (s6)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)


def purchase_click_join(
    purchases_src: DataFrame,
    clicks_src: DataFrame,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join (streaming e7 candidate form): for
    each purchase, the clicks by the same user in the 5 minutes before
    it. Both sides are watermarked so the join state is bounded — a
    click can only match purchases up to 5 minutes ahead, so once the
    purchase watermark passes c_ts + 5min the click is evicted (Spark
    derives the eviction bound from the time-range predicate). Inner
    joins emit eagerly on match, so an availableNow drain over a static
    source equals the batch interval join exactly.

    `how="leftOuter"` keeps unmatched purchases: their NULL-extended
    rows emit once the watermark passes the purchase's match horizon
    (no click that could still arrive can pair with it) — the
    attribution-pipeline form, where 'purchase with no preceding
    click' is itself the signal (s18 drives and certifies this path).

    Scale: state is O(events inside the watermark+interval horizon) per
    user — the streaming replacement for re-running e7's binned batch
    join over an ever-growing table."""
    clicks = (
        clicks_src.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        purchases_src.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user AND c_ts > p_ts - INTERVAL 5 MINUTES AND c_ts <= p_ts"
        ),
        how,
    )
    return joined.select("purchase_id", "user_id", "click_id")
