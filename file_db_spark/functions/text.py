"""Text-analysis scalar library for the training-data pipeline operators
(tokenization, language-ID heuristic, quality scoring, fingerprinting,
shingling/MinHash building blocks).

Everything is native Column expressions — no Python UDFs — so the hot
path stays inside whole-stage codegen and scales to 100 TB of text.
MinHash uses xxhash64 (JVM intrinsic) with per-permutation seeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "token_count",
    "word_shingles",
    "word_shingles_from_tokens",
    "char_ngrams",
    "quality_features",
    "fingerprint64",
    "shingle_hashes",
    "minhash_from_hashes",
    "minhash_signature",
    "lsh_bands",
    "simhash64",
    "simhash64_from_hashes",
]

_WS = r"\s+"
_NON_ALNUM = "[^a-z0-9 ]"


def normalize_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace.
    The canonical form used by dedup fingerprints."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, _NON_ALNUM, " ")
    c = F.regexp_replace(c, _WS, " ")
    return F.trim(c)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the raw text (empty string -> empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), _WS), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Array of n-word shingles from an ALREADY-MATERIALIZED token-array
    column (distinct). Documents shorter than n words yield a single
    whole-text shingle so they still participate in dedup.

    `toks` must be a real column (AttributeReference), not an inline
    expression: higher-order-function lambdas capture their closure by
    expression, so an inline `tokens(...)` here would re-run the whole
    regex/split pipeline once per shingle index (measured 16s -> 0.5s
    at sf0.1). Stage with `.select(tokens(...).alias("toks"))` first."""
    cnt = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(0), cnt - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(cnt >= n, shingled).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Array of n-word shingles over the normalized text (distinct).
    Convenience composition — in hot paths, stage the token array as its
    own column and use word_shingles_from_tokens (see its docstring)."""
    return word_shingles_from_tokens(tokens(normalize_text(col)), n)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Array of distinct character n-grams of the normalized text."""
    norm = normalize_text(col)
    ln = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), ln - n + 1), lambda i: F.substring(norm, i, n)
    )
    return F.array_distinct(F.when(ln >= n, grams).otherwise(F.array(norm)))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Heuristic quality features (Gopher/C4-style cheap signals):
    token count, mean word length, alpha ratio, punctuation ratio,
    stopword ratio. Returns a dict of named Columns."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    alpha_chars = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    stop = F.array([F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    mean_word_len = F.when(n_tok > 0, (n_char - (n_tok - 1)) / n_tok).otherwise(
        F.lit(0.0)
    )
    return {
        "n_tokens": n_tok,
        "n_chars": n_char,
        "mean_word_len": mean_word_len.cast("double"),
        "alpha_ratio": F.when(n_char > 0, alpha_chars / n_char).otherwise(0.0).cast("double"),
        "punct_ratio": F.when(n_char > 0, punct_chars / n_char).otherwise(0.0).cast("double"),
        "stopword_ratio": F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0).cast("double"),
    }


_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on with as "
    "at by from not no"
).split()


def fingerprint64(col: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint of the normalized text."""
    return F.xxhash64(normalize_text(col))


def shingle_hashes(shingles: Column) -> Column:
    """xxhash64 of each shingle — hash the strings ONCE, then derive all
    MinHash permutations from the longs. Materialize this as its own
    column (withColumn) before calling minhash_from_hashes so the string
    hashing isn't re-evaluated per permutation."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def minhash_from_hashes(hashes: Column, num_perm: int = 32) -> Column:
    """MinHash signature from pre-hashed shingles: each permutation is
    xxhash64 over the fixed-width long with a distinct seed — O(shingles)
    string hashes total + num_perm cheap long re-hashes per shingle,
    instead of num_perm full string hashes per shingle (~3x on the sf0.1
    bench). Integer multiply-shift would be cheaper still but ANSI mode
    (Spark 4 default) rejects the deliberate overflow. All JVM-side."""
    return F.array(
        *[
            F.array_min(F.transform(hashes, lambda h, i=i: F.xxhash64(h, F.lit(i))))
            for i in range(num_perm)
        ]
    )


def minhash_signature(shingles: Column, num_perm: int = 32) -> Column:
    """MinHash signature straight from a shingle array (convenience;
    prefer the shingle_hashes -> minhash_from_hashes split in hot paths
    so the base hashing is a materialized column)."""
    return minhash_from_hashes(shingle_hashes(shingles), num_perm)


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Slice a MinHash signature into `bands` bands of `rows` values and
    hash each band -> array<struct<band:int, bucket:long>> for exploding
    into the banded candidate join."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(",", *[
                    F.element_at(signature, b * rows + r + 1).cast("string")
                    for r in range(rows)
                ])).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def simhash64_from_hashes(hashes: Column) -> Column:
    """64-bit SimHash from an ALREADY-MATERIALIZED array<long> of
    shingle hashes (see shingle_hashes): for each bit, sum +1/-1 votes
    by that bit of each shingle's hash, take the sign. The 64 per-bit
    aggregations reuse the same hash array — pass a real column, not an
    inline expression, or each bit re-hashes every shingle (64x)."""

    def bit(i: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for i in range(64):
        out = out.bitwiseOR(F.shiftleft(bit(i), i))
    return out


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash over a shingle array (convenience composition —
    in hot paths stage shingle_hashes as a column first and use
    simhash64_from_hashes)."""
    return simhash64_from_hashes(shingle_hashes(shingles))
