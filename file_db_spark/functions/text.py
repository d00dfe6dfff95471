"""Text-analysis scalar library for the training-data pipeline operators
(tokenization, language-ID heuristic, quality scoring, fingerprinting,
shingling/MinHash building blocks).

Everything is native Column expressions — no Python UDFs — so the hot
path stays inside whole-stage codegen and scales to 100 TB of text.
Two hash families: the PORTABLE family (md5-derived universal hashing,
bit-identical in DuckDB — what the oracle-verified registry queries
use) and the xxhash64 fast path (JVM intrinsic, ~cheaper per string —
for engine-internal pipelines that never need SQL parity).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "portable_hash60",
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
    "PORTABLE_PRIME",
    "MINHASH_PERMS",
    "SIMHASH_PERMS",
    "portable_fingerprint60",
    "portable_shingle_hashes",
    "portable_minhash_from_hashes",
    "portable_lsh_bands",
    "portable_simhash_bands",
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


#: BPE-ish pre-tokenizer pattern (GPT-2-style, lookahead-free so Java
#: regex and DuckDB RE2 count identically — parity verified corpus-wide
#: at sf0.01): contraction suffix | space?+letter run | space?+digit
#: run | space?+punctuation run. Leading spaces merge into the token;
#: bare whitespace runs are not tokens.
BPE_TOKEN_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """Subword-boundary token count: the pre-tokenization step every
    BPE tokenizer applies before merges, which upper-bounds merge count
    and is the standard cheap budget estimator."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


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
    # n unrolled element_at lookups instead of slice(): slice allocates
    # an intermediate array per position, element_at reads in place —
    # measured ~20% faster end-to-end on the x4 signature pipeline
    shingled = F.transform(
        F.sequence(F.lit(0), cnt - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
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

    def perm(i: int):
        # closure factory, NOT a default arg: pyspark counts defaulted
        # params in the lambda arity, so `lambda h, i=i:` binds i to the
        # ELEMENT INDEX (2-arg HOF form) and every permutation collapses
        # to the same expression — a degenerate 1-distinct signature
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(hashes, perm(i))) for i in range(num_perm)]
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


# ---------------------------------------------------------------------------
# Portable (cross-engine) hash family
#
# xxhash64 is a JVM intrinsic DuckDB doesn't implement, so the queries
# built on it can only get a rows-only correctness check. This family
# trades it for md5 (RFC-identical in every engine) + a universal-hash
# permutation h_i(x) = (A_i*x + B_i) mod P over the md5-derived base
# value — every step is exact 64-bit integer arithmetic both engines
# agree on, so MinHash/SimHash/fingerprint queries become fully
# hash-verifiable against a DuckDB oracle. Cost is comparable to the
# xxhash64 path: ONE md5 per shingle, then num_perm cheap integer ops
# (vs num_perm xxhash64 re-hashes).

#: Mersenne prime 2^31 - 1: keeps A*h + B < 2^63, so ANSI mode (Spark 4
#: default) never sees an overflow, and DuckDB BIGINT math is identical.
PORTABLE_PRIME = 2147483647


def _perm_constants(n: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (A, B) pairs for the universal-hash permutations —
    a fixed-seed LCG so Spark Columns and generated oracle SQL embed the
    exact same constants (no RNG libraries, reproducible forever)."""
    state, out = seed, []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (PORTABLE_PRIME - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % PORTABLE_PRIME
        out.append((a, b))
    return out


MINHASH_PERMS = _perm_constants(32, seed=0x5EED)
SIMHASH_PERMS = _perm_constants(64, seed=0xC0FFEE)
#: count-min sketch row hashes (d rows) over the same universal family
CMS_PERMS = _perm_constants(4, seed=0xCA15)

#: d33 hashed-linear-classifier weight family (1 perm): the pseudo
#: "trained" weight for feature bucket b is ((b+1)*A + B) mod P - P//2.
CLS_PERMS = _perm_constants(1, seed=0xD33)
#: feature-hash bucket count for the d33 classifier
CLS_BUCKETS = 4096

#: Bloom-filter hash family (k=3) over the same portable base hash;
#: positions are ((base*a + b) % PORTABLE_PRIME) % BLOOM_M on both
#: engines. BLOOM_M is a power of two purely for familiarity — the
#: modulus chain keeps positions uniform regardless.
BLOOM_PERMS = _perm_constants(3, seed=0xB10F)
BLOOM_M = 65536

#: DuckDB expression template for the portable base hash of a string
#: expression {s}: first 32 bits of md5, reduced mod P.
DUCKDB_BASE_HASH = (
    "(CAST(('0x' || substr(md5({s}), 1, 8)) AS BIGINT) % " + str(PORTABLE_PRIME) + ")"
)


def portable_base_hash(s: Column) -> Column:
    """First 32 bits of md5(s) mod P — the cross-engine base hash.
    Verified equal to DUCKDB_BASE_HASH for ASCII and empty strings."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % PORTABLE_PRIME


def portable_hash60(s: Column) -> Column:
    """60-bit integer hash of an arbitrary string column (first 15 md5
    hex chars) — the wide cross-engine hash for sketches that need more
    than the 31-bit base hash (HLL bucket+rho split). DuckDB twin:
    ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def portable_fingerprint60(col: Column | str) -> Column:
    """60-bit integer fingerprint of the normalized text (first 15 md5
    hex chars). Oracle-portable sibling of fingerprint64 (xxhash64),
    which engine-internal paths keep for speed."""
    return F.conv(F.substring(F.md5(normalize_text(col)), 1, 15), 16, 10).cast("long")


def portable_shingle_hashes(shingles: Column) -> Column:
    """Portable base hash of each shingle (array<long>, values in
    [0, P)). Materialize as a real column before deriving permutations
    (HOF lambdas capture by expression — see word_shingles_from_tokens)."""
    return F.transform(shingles, portable_base_hash)


def portable_minhash_from_hashes(hashes: Column, num_perm: int = 32) -> Column:
    """MinHash signature via the (A*h + B) mod P universal family over
    pre-computed portable base hashes. Bit-identical to the generated
    DuckDB oracle CTE (see operators/dedup.py)."""
    def perm(a: int, b: int):
        # closure factory, NOT default args: pyspark counts defaulted
        # params in the lambda arity and would reject a 3-arg lambda
        return lambda h: (h * F.lit(a) + F.lit(b)) % PORTABLE_PRIME

    return F.array(
        *[
            F.array_min(F.transform(hashes, perm(a, b)))
            for (a, b) in MINHASH_PERMS[:num_perm]
        ]
    )


def portable_lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Band keys as a portable integer fold over the band's signature
    values: key = fold(k -> (k*31 + m) mod P). Integer shuffle keys are
    cheaper than concatenated strings, and both engines compute the
    identical fold -> array<struct<band:int, key:long>>."""

    def band_key(b: int) -> Column:
        key = F.element_at(signature, b * rows + 1)
        for r in range(1, rows):
            key = (key * 31 + F.element_at(signature, b * rows + r + 1)) % PORTABLE_PRIME
        return key

    return F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_key(b).alias("key"))
            for b in range(bands)
        ]
    )


def portable_simhash_bands(hashes: Column, bands: int = 4, bits_per_band: int = 16) -> Column:
    """SimHash as `bands` integers of `bits_per_band` bits each, from
    portable base hashes: bit j votes +1/-1 by parity of the j-th
    universal permutation, sign of the sum sets the bit. Band-valued
    (not one 64-bit long) so band equality AND hamming distance are
    exact integer ops in both engines. Returns array<long> of length
    `bands`."""

    def bit(j: int) -> Column:
        a, b = SIMHASH_PERMS[j]
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(((h * F.lit(a) + F.lit(b)) % PORTABLE_PRIME) % 2 == 1, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))

    def band(k: int) -> Column:
        out = F.lit(0).cast("long")
        for r in range(bits_per_band):
            out = out + F.shiftleft(bit(k * bits_per_band + r), r)
        return out

    return F.array(*[band(k) for k in range(bands)])


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash over a shingle array (convenience composition —
    in hot paths stage shingle_hashes as a column first and use
    simhash64_from_hashes)."""
    return simhash64_from_hashes(shingle_hashes(shingles))
