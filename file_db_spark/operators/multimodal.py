"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas
functions via mapInPandas.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic STUB (`_fake_decode`) — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and is what
matters at 100 TB: mapInPandas streams Arrow batches, never
materializes a partition, and the binary payload never crosses the
driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_q(
    "m1_binary_meta",
    """
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, lang AS media_lang
    FROM documents
    """,
)
def m1_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length of the (utf-8) payload —
    the `binary` column pattern with typed metadata alongside."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.col("lang").alias("media_lang"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB image decode. Real deployments plug PIL/ffmpeg here; the
    container has no codecs, so derive deterministic fake dimensions
    and a mean-intensity from the payload bytes. NOT a real decoder."""
    w = 64 + (len(payload) % 512)
    h = 64 + (sum(payload[:16]) % 512 if payload else 0)
    mean = (sum(payload[:256]) / max(1, min(len(payload), 256))) / 255.0
    return w, h, mean


def m2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature-extract over binary payloads with
    mapInPandas (Arrow-batched). The documents' utf-8 bytes stand in
    for image payloads; the decode kernel is a deterministic stub.
    Rows-only correctness check (no SQL analog of the kernel)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_intensity": [f[2] for f in feats],
                }
            )

    return d.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


QUERIES["m2_decode_features"] = m2_decode_features


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def m3_resize(spark: SparkSession, sf_dir: str, target: int = 32) -> DataFrame:
    """Multimodal resize over binary payloads (mapInPandas): emit a
    fixed-budget thumbnail per payload. The resample kernel is a
    deterministic STUB (stride-sampled bytes — a real deployment plugs
    PIL.Image.resize here); the Spark plumbing — binary in, binary out,
    Arrow batches, no driver materialization — is the real pattern.
    Rows-only check."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, thumbs = [], [], []
            for p in pdf["payload"]:
                b = bytes(p)
                stride = max(1, len(b) // (target * target))
                thumbs.append(b[:: stride][: target * target])
                out_w.append(target)
                out_h.append(target)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "thumb": thumbs,
                }
            )

    return d.mapInPandas(resize_batches, schema=_RESIZE_SCHEMA)


def _m3_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry projection of m3_resize: the binary thumb surfaces as
    an md5 digest (the pandas bridges disagree on raw-binary repr under
    the driver's hash normalization — bytes vs bytearray — so the
    VALUE check rides the digest; the raw bytes stay pinned exactly in
    tests/test_pipeline_ops.py and the binary API is m3_resize itself).
    The oracle recomputes the stride-sample from the ASCII corpus and
    digests the same bytes — full value verification for the resize
    plumbing."""
    import pyspark.sql.functions as F

    return m3_resize(spark, sf_dir).select(
        "doc_id", "out_width", "out_height", F.md5("thumb").alias("thumb_md5")
    )


QUERIES["m3_resize"] = _m3_registry


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def m4_frame_sample(
    spark: SparkSession, sf_dir: str, frame_bytes: int = 1024, every: int = 4
) -> DataFrame:
    """Multimodal frame sampling (1:N explode): treat each payload as a
    'video' of fixed-size frames, keep every `every`-th frame with its
    offset and a feature. Kernel is a STUB (a real deployment plugs
    ffmpeg/pyav keyframe extraction); the shape — one input row fanning
    out to N output rows inside mapInPandas, offsets preserved for
    random access — is the production pattern. Rows-only check."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n = max(1, (len(b) + frame_bytes - 1) // frame_bytes)
                for i in range(0, n, every):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    mean = (sum(chunk) / max(1, len(chunk))) / 255.0
                    rows.append((int(doc_id), i, i * frame_bytes, mean))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_offset", "frame_mean"]
            )

    return d.mapInPandas(frames, schema=_FRAME_SCHEMA)


QUERIES["m4_frame_sample"] = m4_frame_sample


# --- Oracles for the stub kernels -------------------------------------
#
# The decode kernels are deterministic byte arithmetic over the payload
# and the corpus is pure ASCII at every SF (verified: strlen == length
# for all docs), so ord(substr(text, i, 1)) IS the payload byte and
# DuckDB can mirror each kernel exactly. These oracles don't make the
# stubs real decoders — they prove the mapInPandas plumbing (schema,
# Arrow round-trip, 1:N fan-out, binary output) is byte-exact, which is
# precisely what a rows-only check can't see.

#: sum of payload bytes [lo, lo+cnt) as a DuckDB expression (0 if empty)
def _byte_sum(lo: str, cnt: str) -> str:
    return (
        f"COALESCE(list_sum(list_transform(range({lo} + 1, {lo} + {cnt} + 1),"
        f" j -> ord(substr(text, j, 1)))), 0)"
    )


ORACLES["m2_decode_features"] = f"""
    WITH b AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n FROM documents
    )
    SELECT doc_id, n AS n_bytes,
           CAST(64 + (n % 512) AS INTEGER) AS width,
           CAST(64 + ({_byte_sum("0", "least(n, 16)")} % 512) AS INTEGER) AS height,
           CAST({_byte_sum("0", "least(n, 256)")} AS DOUBLE)
             / greatest(1, least(n, 256)) / 255.0 AS mean_intensity
    FROM b
    """

ORACLES["m3_resize"] = """
    WITH b AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len,
             greatest(1, CAST(strlen(text) AS BIGINT) // 1024) AS stride
      FROM documents
    ), s AS (
      SELECT doc_id, text, stride,
             least(1024, (len + stride - 1) // stride) AS n_out
      FROM b
    )
    SELECT doc_id, CAST(32 AS INTEGER) AS out_width,
           CAST(32 AS INTEGER) AS out_height,
           md5(array_to_string(
             list_transform(range(0, n_out),
                            i -> substr(text, CAST(1 + i * stride AS BIGINT), 1)),
             '')) AS thumb_md5
    FROM s
    """

ORACLES["m4_frame_sample"] = f"""
    WITH b AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len,
             greatest(1, CAST(ceil(strlen(text) / 1024.0) AS BIGINT)) AS nf
      FROM documents
    ), fr AS (
      SELECT doc_id, text, CAST(i AS INTEGER) AS frame_no,
             CAST(i * 1024 AS BIGINT) AS frame_offset,
             least(len - i * 1024, 1024) AS chunk_len
      FROM b, unnest(range(0, nf, 4)) AS t(i)
    )
    SELECT doc_id, frame_no, frame_offset,
           CASE WHEN chunk_len > 0
                THEN CAST({_byte_sum("frame_offset", "chunk_len")} AS DOUBLE)
                     / chunk_len / 255.0
                ELSE 0.0 END AS frame_mean
    FROM fr
    """
