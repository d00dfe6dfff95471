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


# ---------------------------------------------------------------------------
# m5: PERCEPTUAL-HASH near-dup over binary payloads — dedup for the
# image/video modality. A real deployment computes aHash/pHash from
# decoded pixels (PIL + DCT); the container has no codecs, so the
# intensity grid is derived from payload bytes by the same STUB
# convention as m2-m4 — the pipeline AFTER the kernel (banded hash,
# hot-bucket cap, candidate equi-join, exact Hamming verify, per-doc
# best-match profile) is the real production shape and is what the
# oracle certifies bit-exactly.
# ---------------------------------------------------------------------------

PHASH_BANDS = 4  # 4 x 16-bit bands over the 64-bit hash
PHASH_BAND_BITS = 16
PHASH_MAX_BUCKET = 100  # hot-band cap (the x4/x5/v8 pattern)
PHASH_MAX_HAM = 3  # near-dup threshold; d <= 3 => some band equal (pigeonhole)

_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("b0", T.LongType()),
        T.StructField("b1", T.LongType()),
        T.StructField("b2", T.LongType()),
        T.StructField("b3", T.LongType()),
    ]
)


def _phash_bands(payload: bytes) -> list[int]:
    """STUB aHash: 64-cell byte-chunk intensity grid; bit k set iff
    chunk k's mean >= the whole payload's mean, compared with exact
    integer cross-multiplication (no float), packed into 4 x 16-bit
    band integers. Deterministic byte arithmetic — mirrored exactly by
    the DuckDB oracle."""
    n = len(payload)
    total = sum(payload)
    bands = [0] * PHASH_BANDS
    for k in range(64):
        lo = (k * n) // 64
        hi = ((k + 1) * n) // 64
        bit = 1 if sum(payload[lo:hi]) * n >= total * (hi - lo) else 0
        bands[k // PHASH_BAND_BITS] |= bit << (k % PHASH_BAND_BITS)
    return bands


def m5_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perceptual-hash profile + near-dup verdict: the
    banded 64-bit hash, how many band-collision candidates the doc has,
    its best (minimum-Hamming) candidate and that distance, and the
    is_neardup bit (Hamming <= PHASH_MAX_HAM; d <= 3 cannot escape all
    four 16-bit bands, so band collision is a complete candidate
    generator at the threshold).

    Scale: the hash kernel is Arrow-batched mapInPandas riding the
    payload scan (bytes never leave the executor); candidates are a
    capped band equi-join (never all-pairs — boilerplate/empty-payload
    bands hit the PHASH_MAX_BUCKET cap); verification is integer XOR
    popcount on 4 small ints per candidate pair; the profile is one
    doc-keyed aggregation. The same pipeline dedups billions of images
    once the kernel is a real decoder."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), *_phash_bands(bytes(p)))
                for doc_id, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "b0", "b1", "b2", "b3"])

    hashed = d.mapInPandas(hash_batches, schema=_PHASH_SCHEMA)
    from pyspark.sql.window import Window

    bands = hashed.select(
        "doc_id", F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("t", "bv")
    )
    w_b = Window.partitionBy("t", "bv")
    capped = (
        bands.withColumn("bn", F.count("*").over(w_b))
        .filter(F.col("bn") <= PHASH_MAX_BUCKET)
        .drop("bn")
    )
    l, r = capped.alias("l"), capped.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    xa = hashed.select(
        F.col("doc_id").alias("a"),
        *[F.col(c).alias(f"{c}a") for c in ("b0", "b1", "b2", "b3")],
    )
    xb = hashed.select(
        F.col("doc_id").alias("b"),
        *[F.col(c).alias(f"{c}b") for c in ("b0", "b1", "b2", "b3")],
    )
    ham_expr = sum(
        F.bit_count(F.col(f"{c}a").bitwiseXOR(F.col(f"{c}b")))
        for c in ("b0", "b1", "b2", "b3")
    )
    ham = (
        cand.join(xa, "a")
        .join(xb, "b")
        .select("a", "b", ham_expr.cast("bigint").alias("hamming"))
    )
    sym = ham.select(
        F.col("a").alias("doc_id"), F.col("b").alias("other"), "hamming"
    ).unionByName(
        ham.select(F.col("b").alias("doc_id"), F.col("a").alias("other"), "hamming")
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.asc("hamming"), F.asc("other"))
    best = (
        sym.withColumn("rn", F.row_number().over(w_best))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_candidates"),
            F.min("hamming").alias("min_hamming"),
            F.max(F.when(F.col("rn") == 1, F.col("other"))).alias("best_match"),
        )
    )
    return (
        hashed.join(best, "doc_id", "left")
        .select(
            "doc_id",
            "b0",
            "b1",
            "b2",
            "b3",
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias("n_candidates"),
            F.coalesce("min_hamming", F.lit(-1)).cast("bigint").alias("min_hamming"),
            F.coalesce("best_match", F.lit(-1)).cast("bigint").alias("best_match"),
            (
                F.coalesce("min_hamming", F.lit(999)) <= PHASH_MAX_HAM
            ).cast("bigint").alias("is_neardup"),
        )
    )


QUERIES["m5_phash_neardup"] = m5_phash_neardup

ORACLES["m5_phash_neardup"] = f"""
    WITH b AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n,
             {_byte_sum("0", "strlen(text)")} AS total
      FROM documents
    ), bits AS (
      SELECT doc_id, k,
             CASE WHEN ({_byte_sum("CAST((k * n) // 64 AS BIGINT)",
                                   "((k + 1) * n) // 64 - (k * n) // 64")}) * n
                  >= total * (((k + 1) * n) // 64 - (k * n) // 64)
                  THEN 1 ELSE 0 END AS bit
      FROM b, unnest(range(0, 64)) AS t(k)
    ), bandvals AS (
      SELECT doc_id, CAST(k // {PHASH_BAND_BITS} AS INTEGER) AS t,
             CAST(SUM(bit * (1 << (k % {PHASH_BAND_BITS}))) AS BIGINT) AS bv
      FROM bits GROUP BY doc_id, k // {PHASH_BAND_BITS}
    ), hashed AS (
      SELECT doc_id,
             MAX(CASE WHEN t = 0 THEN bv END) AS b0,
             MAX(CASE WHEN t = 1 THEN bv END) AS b1,
             MAX(CASE WHEN t = 2 THEN bv END) AS b2,
             MAX(CASE WHEN t = 3 THEN bv END) AS b3
      FROM bandvals GROUP BY doc_id
    ), capped AS (
      SELECT doc_id, t, bv FROM bandvals
      QUALIFY COUNT(*) OVER (PARTITION BY t, bv) <= {PHASH_MAX_BUCKET}
    ), cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM capped l JOIN capped r
        ON l.t = r.t AND l.bv = r.bv AND l.doc_id < r.doc_id
    ), ham AS (
      SELECT c.a, c.b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3)) AS BIGINT) AS hamming
      FROM cand c JOIN hashed x ON x.doc_id = c.a JOIN hashed y ON y.doc_id = c.b
    ), sym AS (
      SELECT a AS doc_id, b AS other, hamming FROM ham
      UNION ALL
      SELECT b, a, hamming FROM ham
    ), best AS (
      SELECT doc_id, COUNT(*) AS n_candidates, MIN(hamming) AS min_hamming,
             MAX(CASE WHEN rn = 1 THEN other END) AS best_match
      FROM (
        SELECT doc_id, other, hamming,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY hamming ASC, other ASC
               ) AS rn
        FROM sym
      ) GROUP BY doc_id
    )
    SELECT h.doc_id, h.b0, h.b1, h.b2, h.b3,
           CAST(COALESCE(s.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(s.min_hamming, -1) AS BIGINT) AS min_hamming,
           CAST(COALESCE(s.best_match, -1) AS BIGINT) AS best_match,
           CAST(COALESCE(s.min_hamming, 999) <= {PHASH_MAX_HAM} AS BIGINT) AS is_neardup
    FROM hashed h LEFT JOIN best s ON s.doc_id = h.doc_id
    """


# ---------------------------------------------------------------------------
# m6: AUDIO-modality frame energy / silence analysis — the audio
# counterpart of m2/m4: treat the binary payload as fixed-rate PCM,
# compute per-frame energy, flag silence, and report voice-activity
# ratio + lead/tail trim points (the preprocessing every speech
# pipeline runs before feature extraction). The "PCM decode" is the
# same STUB convention as m2-m5 (payload bytes as unsigned samples;
# a real deployment plugs ffmpeg/soundfile here); every statistic
# downstream of the stub is exact integer math the oracle mirrors.
# ---------------------------------------------------------------------------

#: samples (bytes) per analysis frame
M6_FRAME = 256
#: a frame is silent when its mean-square deviation from the 128
#: midpoint is below this (integer threshold, engine-exact)
M6_SIL_MS = 900

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_silent", T.LongType()),
        T.StructField("voice_ratio", T.DoubleType()),
        T.StructField("lead_trim_frames", T.LongType()),
        T.StructField("tail_keep_frames", T.LongType()),
        T.StructField("total_energy", T.LongType()),
    ]
)


def m6_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame-energy profile per payload: {M6_FRAME}-sample frames,
    per-frame integer energy sum((s-128)^2), silence = mean-square <
    {M6_SIL_MS}, voice_ratio = voiced/total frames (one IEEE division),
    lead/tail trim = first/last voiced frame. Arrow-batched mapInPandas
    with a numpy reduceat kernel — integer-exact, so the DuckDB oracle
    reproduces every column bit-for-bit (full value verification for an
    'audio' pipeline, not rows-only).

    Scale: one corpus scan, per-row kernel work linear in payload
    bytes, zero shuffles — the aggregate rides the map stage."""
    import numpy as np

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def analyze(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                n = int(b.size)
                nf = max(1, -(-n // M6_FRAME))
                dev2 = (b - 128) ** 2
                if n == 0:
                    ms = np.zeros(1, dtype=np.int64)
                    energies = np.zeros(1, dtype=np.int64)
                    lens = np.ones(1, dtype=np.int64)
                else:
                    idx = np.arange(0, n, M6_FRAME)
                    energies = np.add.reduceat(dev2, idx)
                    lens = np.minimum(n - idx, M6_FRAME)
                    # integer mean-square per frame (floor division,
                    # mirrored by // in the oracle)
                    ms = energies // lens
                voiced = ms >= M6_SIL_MS
                n_sil = int(nf - voiced.sum())
                first_v = int(np.argmax(voiced)) if voiced.any() else nf
                last_v = (
                    int(nf - 1 - np.argmax(voiced[::-1])) + 1 if voiced.any() else 0
                )
                rows.append(
                    (
                        int(doc_id),
                        n,
                        nf,
                        n_sil,
                        float(nf - n_sil) / nf,
                        first_v,
                        last_v,
                        int(energies.sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in _AUDIO_SCHEMA.fields],
            )

    return d.mapInPandas(analyze, schema=_AUDIO_SCHEMA)


QUERIES["m6_audio_energy"] = m6_audio_energy


def _m6_frame_energy(lo: str, cnt: str) -> str:
    return (
        f"COALESCE(list_sum(list_transform(range({lo} + 1, {lo} + {cnt} + 1),"
        f" j -> (ord(substr(text, j, 1)) - 128) * (ord(substr(text, j, 1)) - 128))), 0)"
    )


ORACLES["m6_audio_energy"] = f"""
    WITH b AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS n,
             greatest(1, CAST(ceil(strlen(text) / {M6_FRAME}.0) AS BIGINT)) AS nf
      FROM documents
    ), fr AS (
      SELECT doc_id, n, nf, CAST(i AS BIGINT) AS frame_no,
             CASE WHEN n = 0 THEN 0
                  ELSE {_m6_frame_energy(f"i * {M6_FRAME}", f"least(n - i * {M6_FRAME}, {M6_FRAME})")}
             END AS energy,
             CASE WHEN n = 0 THEN 1
                  ELSE least(n - i * {M6_FRAME}, {M6_FRAME}) END AS chunk_len
      FROM b, unnest(range(0, nf)) AS t(i)
    ), flagged AS (
      SELECT *, (energy // chunk_len >= {M6_SIL_MS}) AS voiced FROM fr
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(MAX(nf) AS BIGINT) AS n_frames,
           CAST(SUM(CASE WHEN voiced THEN 0 ELSE 1 END) AS BIGINT) AS n_silent,
           CAST(SUM(CASE WHEN voiced THEN 1 ELSE 0 END) AS DOUBLE) / MAX(nf)
             AS voice_ratio,
           CAST(COALESCE(MIN(CASE WHEN voiced THEN frame_no END), MAX(nf)) AS BIGINT)
             AS lead_trim_frames,
           CAST(COALESCE(MAX(CASE WHEN voiced THEN frame_no END) + 1, 0) AS BIGINT)
             AS tail_keep_frames,
           CAST(SUM(energy) AS BIGINT) AS total_energy
    FROM flagged GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# m7: VIDEO scene-change detection — segment each payload's frame
# sequence at intensity discontinuities (the shot-boundary heuristic
# every video pipeline runs before per-scene sampling). Frame decode is
# the stub convention (payload bytes as intensities); the segmentation
# downstream — frame-diff, cut threshold, cumulative scene ids, per-
# scene/per-doc rollups — is the real production shape and is what the
# oracle certifies bit-exactly.
# ---------------------------------------------------------------------------

#: bytes per frame (documents are short; 64 gives 1-9 frames each)
M7_FRAME = 64
#: |mean(frame) - mean(prev)| above this is a scene cut
M7_CUT = 0.02

_M7_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)


def _m7_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_no, frame_mean) for EVERY {M7_FRAME}-byte frame —
    Arrow-batched kernel; the mean is integer byte-sum / len / 255.0
    exactly as m2/m4 (oracle-mirrorable)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, means = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                n = len(b)
                nf = max(1, -(-n // M7_FRAME))
                for i in range(nf):
                    chunk = b[i * M7_FRAME : (i + 1) * M7_FRAME]
                    ids.append(int(doc_id))
                    nos.append(i)
                    means.append(
                        (sum(chunk) / len(chunk) / 255.0) if chunk else 0.0
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_mean": means}
            )

    return d.mapInPandas(gen, schema=_M7_FRAME_SCHEMA)


def m7_scene_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary segmentation per payload: frame-mean diffs over a
    doc-keyed ordered window, cut where |diff| > {M7_CUT}, scene ids by
    cumulative cut count (the e2 sessionization idiom on frames), then
    the per-doc profile: frame/scene counts, longest scene, first cut.

    Scale: the kernel is one Arrow map pass; segmentation is two
    doc-keyed windows and two keyed aggregates — partitions are
    frame-sequence-sized, never global."""
    from pyspark.sql.window import Window

    frames = _m7_frames(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    diff = F.abs(F.col("frame_mean") - F.lag("frame_mean").over(w))
    cut = (
        frames.withColumn("is_cut", (diff > M7_CUT).cast("int"))
        .withColumn("is_cut", F.coalesce("is_cut", F.lit(0)))
        .withColumn("scene", F.sum("is_cut").over(w_run))
    )
    scenes = cut.groupBy("doc_id", "scene").agg(
        F.count("*").cast("bigint").alias("scene_frames")
    )
    per_doc = cut.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        (F.max("scene") + 1).cast("bigint").alias("n_scenes"),
        F.min(F.when(F.col("is_cut") == 1, F.col("frame_no")))
        .cast("bigint")
        .alias("first_cut_frame"),
    )
    longest = scenes.groupBy("doc_id").agg(
        F.max("scene_frames").alias("longest_scene_frames")
    )
    return per_doc.join(longest, "doc_id").select(
        "doc_id",
        "n_frames",
        "n_scenes",
        F.coalesce("first_cut_frame", F.lit(-1)).cast("bigint").alias(
            "first_cut_frame"
        ),
        "longest_scene_frames",
    )


QUERIES["m7_scene_detection"] = m7_scene_detection


def _m7_frame_sum(lo: str, cnt: str) -> str:
    return (
        f"COALESCE(list_sum(list_transform(range({lo} + 1, {lo} + {cnt} + 1),"
        f" j -> ord(substr(text, j, 1)))), 0)"
    )


ORACLES["m7_scene_detection"] = f"""
    WITH b AS (
      SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len,
             greatest(1, CAST(ceil(strlen(text) / {M7_FRAME}.0) AS BIGINT)) AS nf
      FROM documents
    ), fr AS (
      SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
             CASE WHEN len = 0 THEN 0
                  ELSE least(len - i * {M7_FRAME}, {M7_FRAME}) END AS cl,
             CASE WHEN len = 0 THEN 0
                  ELSE {_m7_frame_sum(f"i * {M7_FRAME}", f"least(len - i * {M7_FRAME}, {M7_FRAME})")}
             END AS fsum
      FROM b, unnest(range(0, nf)) AS t(i)
    ), means AS (
      SELECT doc_id, frame_no,
             CASE WHEN cl > 0 THEN CAST(fsum AS DOUBLE) / cl / 255.0
                  ELSE 0.0 END AS m
      FROM fr
    ), cuts AS (
      SELECT doc_id, frame_no,
             CASE WHEN abs(m - LAG(m) OVER (PARTITION BY doc_id ORDER BY frame_no))
                       > {M7_CUT} THEN 1 ELSE 0 END AS is_cut
      FROM means
    ), scened AS (
      SELECT doc_id, frame_no, is_cut,
             SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene
      FROM cuts
    ), scene_sizes AS (
      SELECT doc_id, scene, CAST(COUNT(*) AS BIGINT) AS scene_frames
      FROM scened GROUP BY doc_id, scene
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MAX(s.scene) + 1 AS BIGINT) AS n_scenes,
           CAST(COALESCE(MIN(CASE WHEN s.is_cut = 1 THEN s.frame_no END), -1)
             AS BIGINT) AS first_cut_frame,
           CAST(MAX(z.mx) AS BIGINT) AS longest_scene_frames
    FROM scened s
    JOIN (SELECT doc_id, MAX(scene_frames) AS mx FROM scene_sizes GROUP BY doc_id) z
      ON z.doc_id = s.doc_id
    GROUP BY s.doc_id
    """


#: magic-byte table for m8: (doc_id % 5) synthesizes the container
#: header; sniffing must recover it from the BYTES, not the metadata
_M8_MAGICS = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FFE0", "image/jpeg"),
    ("474946383961", "image/gif"),
    ("52494646", "audio/wav"),
    ("", "text/plain"),  # bare payload, no container header
]
#: sniff rules: hex prefix -> type (checked in order; JPEG sniffs on
#: the 3-byte FFD8FF family, not the full APP0 marker)
_M8_SNIFF = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946", "image/gif"),
    ("52494646", "audio/wav"),
]


@_q(
    "m8_content_sniff",
    f"""
    WITH payloads AS (
      SELECT doc_id,
             CASE doc_id % 5
               {' '.join(f"WHEN {i} THEN unhex('{m}') || encode(text)" for i, (m, _t) in enumerate(_M8_MAGICS) if m)}
               ELSE encode(text) END AS payload,
             CASE WHEN doc_id % 17 = 0 THEN 'image/png'
                  ELSE CASE doc_id % 5
                    {' '.join(f"WHEN {i} THEN '{t}'" for i, (_m, t) in enumerate(_M8_MAGICS))}
                  END END AS declared_type
      FROM documents
    ),
    sniffed AS (
      SELECT doc_id, declared_type,
             CAST(octet_length(payload) AS BIGINT) AS n_bytes,
             CASE
               {' '.join(f"WHEN substring(hex(payload), 1, {len(p)}) = '{p}' THEN '{t}'" for p, t in _M8_SNIFF)}
               ELSE 'text/plain' END AS sniffed_type
      FROM payloads
    )
    SELECT doc_id, declared_type, sniffed_type, n_bytes,
           (declared_type = sniffed_type) AS type_match
    FROM sniffed
    """,
)
def m8_content_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte content-type sniffing over opaque binary payloads —
    what a crawl ingestion pipeline runs on every fetched object,
    because declared metadata lies (here doc_id % 17 rows claim PNG
    regardless of their bytes). Payloads are synthesized as real
    BINARY columns (container magic + utf-8 body; the container has no
    media files, the magic table is the real part); sniffing reads the
    FIRST 8 BYTES of the binary (binary substring, then hex) and maps
    prefixes through the PNG/JPEG/GIF/RIFF table, never touching the
    metadata. Output per object: declared vs sniffed type and the
    mismatch flag the quarantine path keys on (g17's expectations
    would gate on `type_match`).

    Scale: pure codegen Column exprs, zero shuffle, zero Python — and
    the sniff reads 8 bytes per object regardless of payload size, so
    the plan's cost is the scan itself. The oracle hexes then slices
    (DuckDB can't substring BLOBs); byte-identical result."""
    d = load_table(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    body = F.encode("text", "utf-8")
    payload = F.lit(None).cast("binary")
    magic_expr = None
    for i, (m, _t) in enumerate(_M8_MAGICS):
        branch = (
            F.concat(F.unhex(F.lit(m)), body) if m else body
        )
        magic_expr = (
            F.when(doc % 5 == i, branch)
            if magic_expr is None
            else magic_expr.when(doc % 5 == i, branch)
        )
    declared = F.when(doc % 17 == 0, F.lit("image/png"))
    for i, (_m, t) in enumerate(_M8_MAGICS):
        declared = declared.when(doc % 5 == i, F.lit(t))
    head_hex = F.hex(F.substring(magic_expr, 1, 8))
    sniffed = None
    for p, t in _M8_SNIFF:
        cond = head_hex.startswith(p)
        sniffed = (
            F.when(cond, F.lit(t)) if sniffed is None else sniffed.when(cond, F.lit(t))
        )
    sniffed = sniffed.otherwise(F.lit("text/plain"))
    out = d.select(
        "doc_id",
        declared.alias("declared_type"),
        F.octet_length(magic_expr).cast("bigint").alias("n_bytes"),
        sniffed.alias("sniffed_type"),
    )
    return out.select(
        "doc_id",
        "declared_type",
        "sniffed_type",
        "n_bytes",
        (F.col("declared_type") == F.col("sniffed_type")).alias("type_match"),
    )
