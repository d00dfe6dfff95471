"""Semantic tests for the training-pipeline operators added in round 2:
d9 repetition signals, d10 sequence packing, x9 contamination. The
oracle gate (tools/check.py) proves value parity with DuckDB; these
pin the *invariants* that make the operators correct at any scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_db_spark.operators.dedup import x9_contamination
from file_db_spark.operators.textops import (
    _HEX_BUCKET,
    _SEQ_LEN,
    d9_repetition_quality,
    d10_seq_packing,
)


def test_d9_fraction_bounds(spark, sf_dir):
    df = d9_repetition_quality(spark, sf_dir)
    bad = df.where(
        (F.col("rep_unigram_frac") < 0)
        | (F.col("rep_unigram_frac") > 1)
        | (F.col("rep_bigram_frac") < 0)
        | (F.col("rep_bigram_frac") > 1)
        | (F.col("adjacent_repeat_frac") < 0)
        | (F.col("adjacent_repeat_frac") > 1)
    ).count()
    assert bad == 0
    # Flag is exactly the bigram threshold, no drift between columns.
    assert (
        df.where(F.col("is_repetitive") != (F.col("rep_bigram_frac") > 0.1)).count()
        == 0
    )


def test_d9_known_values(spark):
    rows = [(1, "a a a a"), (2, "w x y z"), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("t")
    # Route through the same column pipeline by monkey-building a tiny
    # frame: reuse the operator's internals via a temp parquet dir.
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r["doc_id"]: r.asDict()
            for r in d9_repetition_quality(spark, tmp).collect()
        }
    # "a a a a": 4 tokens, 3 repeated unigrams, 3 bigrams all "a a"
    # (2 repeated), 3 adjacent equal pairs.
    assert out[1]["n_tokens"] == 4
    assert out[1]["rep_unigram_frac"] == 0.75
    assert abs(out[1]["rep_bigram_frac"] - 2 / 3) < 1e-12
    assert out[1]["adjacent_repeat_frac"] == 1.0
    assert out[1]["is_repetitive"]
    # All-distinct doc: every signal zero.
    assert out[2]["rep_unigram_frac"] == 0.0
    assert out[2]["rep_bigram_frac"] == 0.0
    assert not out[2]["is_repetitive"]
    # Single token: guarded divisions, zero everywhere.
    assert out[3]["n_tokens"] == 1
    assert out[3]["rep_bigram_frac"] == 0.0


def test_d10_packing_invariants(spark, sf_dir):
    df = d10_seq_packing(spark, sf_dir).persist()
    try:
        # Offsets live inside a sequence; seq ids start at 0 per bucket.
        assert df.where((F.col("seq_offset") < 0) | (F.col("seq_offset") >= _SEQ_LEN)).count() == 0
        firsts = df.groupBy("pack_bucket").agg(F.min("seq_id").alias("m"))
        assert firsts.where(F.col("m") != 0).count() == 0
        # Within a bucket, seq_id is non-decreasing in doc_id order and
        # never skips more than the largest doc can span.
        from pyspark.sql.window import Window

        w = Window.partitionBy("pack_bucket").orderBy("doc_id")
        lagged = df.withColumn("prev_seq", F.lag("seq_id").over(w))
        assert lagged.where(F.col("prev_seq") > F.col("seq_id")).count() == 0
        # Token conservation: total packed tokens == total corpus tokens.
        from file_db_spark.catalog import load_table

        d = load_table(spark, sf_dir, "documents")
        corpus = d.select(
            F.sum(F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")).alias("s")
        ).collect()[0]["s"]
        packed = df.agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
        assert packed == corpus
    finally:
        df.unpersist()


def test_x9_only_train_docs_flagged(spark, sf_dir):
    from file_db_spark.catalog import load_table

    out = x9_contamination(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HEX_BUCKET).alias("bucket")
    )
    joined = out.join(docs, "doc_id")
    # Contamination reports train-split docs only, with positive overlap.
    assert joined.where(F.col("bucket") >= 950).count() == 0
    assert out.where(F.col("n_overlap") <= 0).count() == 0


def test_m3_thumb_bytes_exact(spark, sf_dir):
    """m3's binary thumbnail pinned against the kernel spec computed
    independently in Python (its DuckDB oracle is withheld on purpose:
    the pandas bridges disagree on binary repr, so the byte-exactness
    proof lives here instead)."""
    from file_db_spark.catalog import load_table
    from file_db_spark.operators.multimodal import m3_resize

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    out = m3_resize(spark, sf_dir).collect()
    assert len(out) == len(docs)
    target = 32
    for r in out:
        b = docs[r["doc_id"]].encode("utf-8")
        stride = max(1, len(b) // (target * target))
        assert bytes(r["thumb"]) == b[::stride][: target * target]
        assert r["out_width"] == target and r["out_height"] == target


def test_d21_hll_error_bound(spark, sf_dir):
    # HLL with m=256 has ~6.5% std err; 3 sigma + small-N slack. The
    # estimate must also be >0 and the register sum within its exact-
    # representation bound (m * 2^RHO_MAX).
    from file_db_spark.operators.textops import _HLL_EMPTY_TERM, _HLL_M, d21_hll_distinct

    rows = d21_hll_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.register_sum <= _HLL_M * _HLL_EMPTY_TERM
        assert r.n_hll > 0
        # generous bound: 3x the 1.04/sqrt(m) std error + 2 absolute
        assert abs(r.n_hll - r.n_exact) <= 0.2 * r.n_exact + 2


def test_d22_cms_one_sided(spark, sf_dir):
    # count-min never underestimates, and with only ~31 distinct terms
    # vs 2048 cells, collisions are rare -> estimates stay close.
    from file_db_spark.operators.textops import d22_cms_heavy_hitters

    rows = d22_cms_heavy_hitters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.true_count


def test_d35_gopher_rules_flags(spark, sf_dir):
    """keep must equal the conjunction of the per-rule flags, and the
    word-count rule must genuinely split the fixture corpus."""
    from file_db_spark.operators.textops import d35_gopher_rules

    rows = d35_gopher_rules(spark, sf_dir).collect()
    assert rows
    flags = [
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_bullet_lines",
        "r_ellipsis_lines",
        "r_alpha_words",
        "r_stopwords",
    ]
    for r in rows:
        assert r["keep"] == int(all(r[f] == 1 for f in flags))
        assert r["r_word_count"] == int(50 <= r["n_words"] <= 100000)
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)  # both outcomes exercised


def test_m5_phash_profile_consistency(spark, sf_dir):
    """Perceptual-hash near-dup profile: kernel/band bounds, no-candidate
    sentinels move together, candidate symmetry (each undirected pair
    contributes one candidate to BOTH endpoints)."""
    from file_db_spark.operators.multimodal import (
        PHASH_MAX_HAM,
        _phash_bands,
        m5_phash_neardup,
    )

    rows = m5_phash_neardup(spark, sf_dir).collect()
    assert rows
    import duckdb

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    for r in rows:
        for b in ("b0", "b1", "b2", "b3"):
            assert 0 <= r[b] <= 0xFFFF
        no_cand = r["n_candidates"] == 0
        assert no_cand == (r["min_hamming"] == -1) == (r["best_match"] == -1)
        assert r["is_neardup"] == int(0 <= r["min_hamming"] <= PHASH_MAX_HAM)
        # Spark kernel == driver-side recomputation of the same bytes
        want = _phash_bands(docs[r["doc_id"]].encode())
        assert [r["b0"], r["b1"], r["b2"], r["b3"]] == want
    assert sum(r["n_candidates"] for r in rows) % 2 == 0


def test_d36_kn_distribution_sums_to_one(spark, sf_dir):
    """Kneser-Ney sanity: for any context word a, summing the scored
    P_KN(b|a) over the whole continuation vocabulary must give 1 —
    the discount mass exactly re-spent. Recomputed in pure Python from
    the same corpus counts, plus spot agreement with the operator."""
    import math
    import re
    from collections import Counter, defaultdict

    import duckdb

    from file_db_spark.operators.textops import KN_DISCOUNT, d36_kneser_ney_lm

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    cb: Counter = Counter()
    for _, text in docs:
        w = [t for t in re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip().split(" ") if t]
        for i in range(len(w) - 1):
            cb[(w[i], w[i + 1])] += 1
    c_a: Counter = Counter()
    n1p_a: Counter = Counter()
    n1p_b: Counter = Counter()
    for (a, b), c in cb.items():
        c_a[a] += c
        n1p_a[a] += 1
        n1p_b[b] += 1
    n_bb = len(cb)
    vocab_b = list(n1p_b)
    conts = defaultdict(set)
    for (a, b) in cb:
        conts[a].add(b)
    for a in sorted(c_a)[:5]:
        total = 0.0
        for b in vocab_b:
            c = cb.get((a, b), 0)
            total += max(c - KN_DISCOUNT, 0) / c_a[a] + (
                KN_DISCOUNT * n1p_a[a] / c_a[a]
            ) * (n1p_b[b] / n_bb)
        assert abs(total - 1.0) < 1e-9, (a, total)
    # spot-check one doc's avg logprob against the operator
    rows = {r["doc_id"]: r for r in d36_kneser_ney_lm(spark, sf_dir).collect()}
    doc_id, text = docs[0]
    w = [t for t in re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip().split(" ") if t]
    lps = []
    for i in range(len(w) - 1):
        a, b = w[i], w[i + 1]
        p = (cb[(a, b)] - KN_DISCOUNT) / c_a[a] + (
            KN_DISCOUNT * n1p_a[a] / c_a[a]
        ) * (n1p_b[b] / n_bb)
        lps.append(math.log(p))
    assert abs(rows[doc_id]["avg_logprob_kn"] - sum(lps) / len(lps)) < 1e-5


def test_d37_family_split_consistency(spark, sf_dir):
    """No family straddles a split boundary; the naive d6 split is
    reproduced faithfully; leaky families are real (members whose
    naive splits differ) and the fixture corpus contains at least one."""
    from collections import defaultdict

    from file_db_spark.operators.textops import d37_leakage_safe_split

    rows = d37_leakage_safe_split(spark, sf_dir).collect()
    fams = defaultdict(list)
    for r in rows:
        fams[r["family_key"]].append(r)
    leaky_seen = 0
    for members in fams.values():
        assert len({m["split"] for m in members}) == 1  # never straddles
        naive = {m["naive_split"] for m in members}
        leaky = members[0]["family_leaky"]
        assert all(m["family_leaky"] == leaky for m in members)
        assert leaky == int(len(naive) > 1)
        assert all(m["family_members"] == len(members) for m in members)
        for m in members:
            assert m["moved"] == int(m["split"] != m["naive_split"])
        leaky_seen += leaky
    assert leaky_seen > 0  # the operator's reason to exist, exercised


def test_d38_bm25_agrees_with_reference_formula(spark, sf_dir):
    """BM25 scores recomputed independently in pure Python (rank-1 doc
    and full ordering) must match the operator."""
    import math
    import re
    from collections import Counter

    import duckdb

    from file_db_spark.operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        d38_bm25_search,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks = {
        did: [t for t in re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ", tx.lower())).strip().split(" ") if t]
        for did, tx in docs
    }
    n_docs = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n_docs
    df = Counter(t for w in toks.values() for t in set(w) if t in BM25_QUERY)
    scores = {}
    for did, w in toks.items():
        c = Counter(w)
        s = 0.0
        for t in BM25_QUERY:
            tf = c.get(t, 0)
            if not tf:
                continue
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(w) / avgdl)
            )
        scores[did] = round(s, 6)
    want = sorted(
        ((s, d) for d, s in scores.items() if s > 0), key=lambda x: (-x[0], x[1])
    )[:20]
    rows = sorted(d38_bm25_search(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert [(r["bm25"], r["doc_id"]) for r in rows] == [
        (round(s, 6), d) for s, d in want
    ]


def test_d39_dsir_enriches_target_domain(spark, sf_dir):
    """The point of importance resampling: the selected slice must look
    more like the target domain (lang='en') than the raw corpus does.
    Also pins the contract: TOPN rows, contiguous ranks, weights
    non-increasing in rank order."""
    from file_db_spark.catalog import load_table
    from file_db_spark.operators.textops import DSIR_TOPN, d39_dsir_sampling

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    lang = {r["doc_id"]: r["lang"] for r in d}
    base_rate = sum(1 for v in lang.values() if v == "en") / len(lang)

    rows = sorted(d39_dsir_sampling(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert len(rows) == min(DSIR_TOPN, len(lang))
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["log_w"] >= b["log_w"]
    sel_rate = sum(1 for r in rows if lang[r["doc_id"]] == "en") / len(rows)
    assert sel_rate > base_rate


def test_e14_markov_transitions_are_probabilities(spark, sf_dir):
    """Transition rows: p in (0, 1], per-type ranks contiguous from 1
    and ordered by (n desc, next_type asc); per-type p sums to <= 1
    (top-3 of the full successor distribution)."""
    from file_db_spark.operators.events import e14_markov_transitions

    rows = e14_markov_transitions(spark, sf_dir).collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["n"] > b["n"] or (
                a["n"] == b["n"] and a["next_type"] < b["next_type"]
            )
        assert sum(r["p"] for r in rs) <= 1.0 + 1e-12


def test_d40_unimax_waterfill_invariants(spark, sf_dir):
    from file_db_spark.operators.textops import (
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_EPOCH_CAP,
        d40_unimax_mix,
    )

    rows = d40_unimax_mix(spark, sf_dir).collect()
    total = sum(r["avail_tokens"] for r in rows)
    budget = total * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN
    # budget conservation: allocations spend exactly the budget (the
    # waterline split is exact up to fp on the even shares)
    assert abs(sum(r["alloc_tokens"] for r in rows) - budget) < 1e-6 * budget
    for r in rows:
        # the epoch cap binds everywhere
        assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-9
        assert r["cap_tokens"] == UNIMAX_EPOCH_CAP * r["avail_tokens"]
        assert 0.0 < r["budget_share"] <= 1.0
    # waterfill shape: languages at full cap are exactly the small ones —
    # every capped language is no larger than every uncapped one
    capped = [r["avail_tokens"] for r in rows if r["alloc_tokens"] == r["cap_tokens"]]
    uncapped = [r["avail_tokens"] for r in rows if r["alloc_tokens"] < r["cap_tokens"]]
    if capped and uncapped:
        assert max(capped) <= min(uncapped)


def test_x26_soft_weights_sum_to_one_per_family(spark, sf_dir):
    from file_db_spark.operators.dedup import x26_soft_dedup_weights

    df = x26_soft_dedup_weights(spark, sf_dir)
    # per-family weight mass is exactly 1 (family_size * 1/family_size)
    bad = (
        df.groupBy("family_id")
        .agg(F.sum("weight").alias("w"), F.count("*").alias("n"))
        .where(F.abs(F.col("w") - 1.0) > 1e-9)
        .count()
    )
    assert bad == 0
    # every document appears exactly once
    from file_db_spark.catalog import load_table

    assert df.count() == load_table(spark, sf_dir, "documents").count()
    assert df.where(F.col("weight") * F.col("family_size") != 1.0).count() == 0


def test_e15_rfm_scores_and_segments(spark, sf_dir):
    from file_db_spark.operators.events import e15_rfm_segments

    df = e15_rfm_segments(spark, sf_dir)
    for c in ("r_score", "f_score", "m_score"):
        assert df.where((F.col(c) < 1) | (F.col(c) > 4)).count() == 0
    # segment rules are a function of the scores, total coverage
    assert df.where(F.col("segment").isNull()).count() == 0
    mism = df.where(
        (
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3) & (F.col("m_score") >= 3)
        )
        != (F.col("segment") == "champion")
    ).count()
    assert mism == 0
    # recency anchored at the max: at least one user has recency 0
    assert df.where(F.col("recency_days") == 0).count() >= 1


def test_d41_fertility_bounds(spark, sf_dir):
    from file_db_spark.operators.textops import d41_tokenizer_fertility

    rows = d41_tokenizer_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # BPE pre-tokenization splits at least at whitespace boundaries
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] > 0
        assert r["total_bpe_tokens"] >= r["total_words"]


def test_m6_audio_invariants(spark, sf_dir):
    from file_db_spark.operators.multimodal import M6_FRAME, m6_audio_energy

    rows = m6_audio_energy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        nf_expected = max(1, -(-r["n_samples"] // M6_FRAME))
        assert r["n_frames"] == nf_expected
        assert 0 <= r["n_silent"] <= r["n_frames"]
        voiced = r["n_frames"] - r["n_silent"]
        assert abs(r["voice_ratio"] - voiced / r["n_frames"]) < 1e-12
        # trim window sandwiches the voiced region (empty when silent)
        if voiced:
            assert 0 <= r["lead_trim_frames"] < r["tail_keep_frames"] <= r["n_frames"]
        else:
            assert r["lead_trim_frames"] == r["n_frames"]
            assert r["tail_keep_frames"] == 0
        assert r["total_energy"] >= 0


def test_e18_histogram_quantile_error_bound(spark, sf_dir):
    """The estimate lands in the same bucket as the order statistic at
    the target rank (the sketch's actual guarantee — the CONTINUOUS
    quantile can sit buckets away when the tail is sparse, since it
    interpolates toward the next order statistic), and err == est -
    exact."""
    import math

    from file_db_spark.operators.events import E18_BUCKETS, e18_histogram_quantiles
    from file_db_spark.catalog import load_table

    rows = e18_histogram_quantiles(spark, sf_dir).collect()
    assert rows
    vals: dict = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(r["event_type"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    for r in rows:
        v = vals[r["event_type"]]
        lo, hi = v[0], v[-1]
        width = (hi - lo) / E18_BUCKETS

        def bucket(x):
            return min(E18_BUCKETS - 1, max(0, int((x - lo) * E18_BUCKETS / (hi - lo))))

        v_rank = v[math.floor((len(v) - 1) * r["q"])]
        assert lo <= r["est"] <= hi + 1e-9
        assert abs(bucket(r["est"]) - bucket(v_rank)) <= 1
        assert abs(r["err"] - (r["est"] - r["exact_q"])) < 1e-12


def test_x28_planner_s_curve_shape(spark, sf_dir):
    """More bands (fewer rows/band) never lowers expected detections at
    a fixed budget, j50 decreases with bands, and the x4 configuration
    (8x4) detects most true pairs."""
    from file_db_spark.operators.dedup import x28_lsh_planner

    rows = sorted(
        x28_lsh_planner(spark, sf_dir).collect(), key=lambda r: r["bands"]
    )
    assert [r["bands"] * r["rows_per_band"] for r in rows] == [32] * len(rows)
    for a, b in zip(rows, rows[1:]):
        assert b["exp_tp"] >= a["exp_tp"] - 1e-9
        assert b["j50"] < a["j50"]
    x4cfg = next(r for r in rows if r["bands"] == 8)
    assert x4cfg["n_true"] == 0 or x4cfg["exp_tp"] >= 0.9 * x4cfg["n_true"]


def test_m7_scene_invariants(spark, sf_dir):
    from file_db_spark.operators.multimodal import M7_FRAME, m7_scene_detection
    from file_db_spark.catalog import load_table

    rows = {r["doc_id"]: r for r in m7_scene_detection(spark, sf_dir).collect()}
    lens = {
        r["doc_id"]: len(r["text"].encode("utf-8"))
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    cuts_somewhere = 0
    for doc_id, r in rows.items():
        assert r["n_frames"] == max(1, -(-lens[doc_id] // M7_FRAME))
        assert 1 <= r["n_scenes"] <= r["n_frames"]
        assert r["longest_scene_frames"] >= -(-r["n_frames"] // r["n_scenes"])
        if r["n_scenes"] > 1:
            cuts_somewhere += 1
            assert 1 <= r["first_cut_frame"] < r["n_frames"]
        else:
            assert r["first_cut_frame"] == -1
    assert cuts_somewhere > 0


def test_d43_zipf_slope_is_negative_and_sane(spark, sf_dir):
    from file_db_spark.operators.textops import d43_zipf_fit

    rows = d43_zipf_fit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_terms"] > 10
        # frequencies decay with rank: strictly negative slope, in the
        # band natural-language corpora produce
        assert -3.0 < r["zipf_slope"] < -0.05
        assert r["zipf_intercept"] > 0


def test_d44_confusion_is_consistent(spark, sf_dir):
    from file_db_spark.operators.textops import d44_langid_eval

    rows = d44_langid_eval(spark, sf_dir).collect()
    cells = {(r["actual"], r["predicted"]): r["n"] for r in rows if r["row_type"] == "cell"}
    cls = {r["actual"]: r for r in rows if r["row_type"] == "class"}
    total = sum(cells.values())
    assert total > 0
    for c in ("en", "other"):
        tp = cells.get((c, c), 0)
        fp = sum(n for (a, p), n in cells.items() if p == c and a != c)
        fn = sum(n for (a, p), n in cells.items() if a == c and p != c)
        assert cls[c]["n"] == tp
        if tp + fp:
            assert abs(cls[c]["precision"] - tp / (tp + fp)) < 1e-12
        if tp + fn:
            assert abs(cls[c]["recall"] - tp / (tp + fn)) < 1e-12


def test_corpus_pure_ascii_invariant(spark):
    """The m1-m7 oracles address CHARACTERS (ord/substr/strlen) while
    the Spark kernels process UTF-8 BYTES; their parity rests on the
    documented pure-ASCII corpus invariant (multimodal.py oracle note).
    Guard it loudly at every SF present so a non-ASCII fixture fails
    here instead of silently producing divergent 'bit-exact' results."""
    import os

    from file_db_spark.catalog import load_table

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        d = load_table(spark, sf_dir, "documents")
        n_bad = d.where(
            F.length("text") != F.octet_length("text")
        ).count()
        assert n_bad == 0, f"{sf}: {n_bad} non-ASCII documents break m6/m7 oracle parity"


def test_d45_redaction_complete_and_counted(spark, sf_dir):
    """After redaction no pattern may match the output text, every
    synthetic-PII stratum is detected on schedule, and clean docs pass
    through with text unchanged (hash of original == redacted)."""
    from file_db_spark.operators.textops import d45_pii_redaction

    rows = d45_pii_redaction(spark, sf_dir).collect()
    assert rows
    for r in rows:
        did = r["doc_id"]
        assert (r["n_emails"] >= 1) == (did % 7 == 0)
        assert (r["n_phones"] >= 1) == (did % 11 == 0)
        assert (r["n_ips"] >= 1) == (did % 13 == 0)
        assert (r["n_cards"] >= 1) == (did % 17 == 0)
    # The operator returns only the redaction hash; every detected
    # doc's hash must differ from the clean-text hash (something was
    # replaced) and every clean doc's must equal it (pass-through).
    from pyspark.sql import functions as SF

    from file_db_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", SF.md5("text").alias("clean_hash")
    )
    joined = {
        r["doc_id"]: r
        for r in d45_pii_redaction(spark, sf_dir).join(d, "doc_id").collect()
    }
    for did, r in joined.items():
        has_pii = any((did % m == 0) for m in (7, 11, 13, 17))
        assert (r["redacted_hash"] != r["clean_hash"]) == has_pii
