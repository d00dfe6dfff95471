"""The portable (cross-engine) hash family behind x4/x5/d5: the oracle
gate proves full-query parity with DuckDB; these pin the primitive-level
invariants — base-hash parity on adversarial strings, signature ranges,
and the LSH contract (identical inputs collide, signature similarity
tracks set similarity).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from file_db_spark.functions.text import (
    DUCKDB_BASE_HASH,
    MINHASH_PERMS,
    PORTABLE_PRIME,
    SIMHASH_PERMS,
    portable_base_hash,
    portable_fingerprint60,
    portable_minhash_from_hashes,
    portable_shingle_hashes,
    portable_simhash_bands,
)

ADVERSARIAL = [
    "",
    " ",
    "a",
    "the quick brown fox",
    "0",
    "ÿ unicode ü",
    "a" * 500,
    "tab\there",
    "line\nbreak",
]


def test_base_hash_matches_duckdb(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_base_hash(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in ADVERSARIAL:
        want = con.execute(
            "SELECT " + DUCKDB_BASE_HASH.format(s="?"), [s]
        ).fetchone()[0]
        assert got[s] == want, s


def test_perm_constants_are_valid():
    for a, b in MINHASH_PERMS + SIMHASH_PERMS:
        assert 1 <= a < PORTABLE_PRIME
        assert 0 <= b < PORTABLE_PRIME
        # ANSI-safe: worst-case a*h + b stays under 2^63.
        assert a * (PORTABLE_PRIME - 1) + b < 2**63
    # distinct permutations (no accidental LCG collision)
    assert len(set(MINHASH_PERMS)) == len(MINHASH_PERMS)
    assert len(set(SIMHASH_PERMS)) == len(SIMHASH_PERMS)


def test_minhash_signature_contract(spark):
    rows = [
        (1, ["a b c", "b c d", "c d e"]),
        (2, ["a b c", "b c d", "c d e"]),  # identical set -> identical sig
        (3, ["a b c", "b c d", "x y z"]),  # 2/4 overlap with 1
        (4, ["p q r", "q r s", "r s t"]),  # disjoint from 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    sigs = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id",
            portable_minhash_from_hashes(
                portable_shingle_hashes(F.col("shingles"))
            ).alias("sig"),
        ).collect()
    }
    assert all(len(s) == 32 for s in sigs.values())
    assert all(0 <= v < PORTABLE_PRIME for s in sigs.values() for v in s)
    assert sigs[1] == sigs[2]

    def match(a, b):
        return sum(x == y for x, y in zip(a, b))

    # overlap ordering: same set > partial overlap > disjoint
    assert match(sigs[1], sigs[2]) == 32
    assert match(sigs[1], sigs[3]) > match(sigs[1], sigs[4])


def test_simhash_bands_contract(spark):
    rows = [
        (1, ["a b", "b c", "c d", "d e"]),
        (2, ["a b", "b c", "c d", "d e"]),  # identical -> same bands
        (3, ["zz yy", "yy xx", "xx ww", "ww vv"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    bands = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id",
            portable_simhash_bands(
                portable_shingle_hashes(F.col("shingles"))
            ).alias("b"),
        ).collect()
    }
    assert all(len(b) == 4 for b in bands.values())
    assert all(0 <= v < 2**16 for b in bands.values() for v in b)
    assert bands[1] == bands[2]
    assert bands[1] != bands[3]


def test_fingerprint60_range_and_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", portable_fingerprint60("text").alias("fp")
        ).collect()
    }
    # normalization folds case/punct/whitespace -> same fingerprint
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    assert all(0 <= v < 2**60 for v in fps.values())


def _docs_dir(spark, tmp_path, rows):
    import os

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    return out


def test_x4_bucket_cap_fires(spark, tmp_path):
    """MAX_LSH_BUCKET drops degenerate buckets: mass-duplicated docs
    share every band, so above the cap they generate NO candidate pairs
    (the quadratic-blowup guard), while below the cap they all pair."""
    from file_db_spark.operators.dedup import MAX_LSH_BUCKET, x4_minhash_lsh

    text = "the quick brown fox jumps over the lazy dog again and again"
    over = _docs_dir(
        spark,
        tmp_path / "over",
        [(i, text) for i in range(MAX_LSH_BUCKET + 10)],
    )
    assert x4_minhash_lsh(spark, over).count() == 0

    n_small = 12
    small = _docs_dir(
        spark, tmp_path / "small", [(i, text) for i in range(n_small)]
    )
    # all-identical docs below the cap: every unordered pair survives
    assert x4_minhash_lsh(spark, small).count() == n_small * (n_small - 1) // 2


def test_base_hash_matches_duckdb_randomized(spark):
    """Parity sweep over 200 deterministic pseudo-random ASCII strings
    (printable chars incl. quotes/backslashes, lengths 0-80) — one
    Spark job, one DuckDB pass, byte-for-byte agreement."""
    import random
    import string

    rng = random.Random(20260813)
    alphabet = string.ascii_letters + string.digits + string.punctuation + " \t"
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 81)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "i long, s string")
    got = {
        r["i"]: r["h"]
        for r in df.select("i", portable_base_hash(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strs)))
    want = dict(
        con.execute("SELECT i, " + DUCKDB_BASE_HASH.format(s="s") + " FROM t").fetchall()
    )
    assert got == want


def test_xxhash64_fast_path_contract(spark):
    """The engine-internal xxhash64 family (the non-portable fast path)
    keeps the same structural contract as the portable one: 32-long
    signatures, identical inputs -> identical signatures, banded keys."""
    from file_db_spark.functions.text import (
        lsh_bands,
        minhash_signature,
        simhash64,
    )

    rows = [(1, ["a b", "b c"]), (2, ["a b", "b c"]), (3, ["x y", "y z"])]
    df = spark.createDataFrame(rows, "doc_id long, shingles array<string>")
    out = {
        r["doc_id"]: (r["sig"], r["sh"], r["bands"])
        for r in df.select(
            "doc_id",
            minhash_signature(F.col("shingles")).alias("sig"),
            simhash64(F.col("shingles")).alias("sh"),
            lsh_bands(minhash_signature(F.col("shingles")), bands=8, rows=4).alias(
                "bands"
            ),
        ).collect()
    }
    assert len(out[1][0]) == 32 and out[1][0] == out[2][0]
    # permutations must be genuinely distinct functions — the regression
    # here was `lambda h, i=i` binding i to the element index, collapsing
    # all 32 permutations into one (1-distinct degenerate signature)
    assert len(set(out[1][0])) > 1
    assert out[1][1] == out[2][1] and out[1][1] != out[3][1]
    assert len(out[1][2]) == 8 and out[1][2] == out[2][2]
