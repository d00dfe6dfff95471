"""Physical-plan regression tests: the scale story of every headline
operator is a claim about the PLAN (what shuffles, what broadcasts,
what reaches the scan) — these pin it so a refactor can't silently
regress a scan-riding filter into a shuffle or a broadcast join into a
sort-merge join. Value correctness is the oracle gate's job; plan shape
is this file's.
"""

from __future__ import annotations

import re

from file_db_spark import operators as ops


def _plan(spark, sf_dir, name: str) -> str:
    return ops.ALL_QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    return len(
        re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )


def test_a1_single_shuffle_with_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "a1_pricing_summary")
    # partial agg map-side, one shuffle on the group key, filter pushed
    # into the parquet scan
    assert _shuffles(plan) == 1
    assert "PushedFilters" in plan and "PushedFilters: []" not in plan


def test_j1_dim_side_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "j1_broadcast_equi_join")
    assert "BroadcastHashJoin" in plan
    # never a sort-merge join of fact vs dim
    assert "SortMergeJoin" not in plan


def test_d8_filter_rides_the_scan(spark, sf_dir):
    # deterministic sampling is a pure filter: NO exchange of any kind —
    # at 100 TB this plan touches each input split exactly once
    plan = _plan(spark, sf_dir, "d8_stratified_sample")
    assert _shuffles(plan) == 0
    assert "BroadcastExchange" not in plan


def test_x1_exact_dedup_one_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "x1_exact_dedup")
    assert _shuffles(plan) == 1


def test_x9_test_grams_broadcast(spark, sf_dir):
    # the held-out split's gram set broadcasts; the corpus-side probe is
    # a map-side hash join (corpus shuffles only for the final count)
    plan = _plan(spark, sf_dir, "x9_contamination")
    assert "BroadcastHashJoin" in plan
    assert _shuffles(plan) <= 2


def test_d13_funnel_single_pass(spark, sf_dir):
    # one corpus scan: content-hash window shuffle + global single-row
    # agg; a UNION-per-stage implementation would triple the scan count
    plan = _plan(spark, sf_dir, "d13_clean_funnel")
    assert _shuffles(plan) <= 2
    assert plan.count("FileScan") == 1


def test_x7_components_lineage_truncated(spark, sf_dir):
    # each label-propagation round localCheckpoints, so the final plan
    # must be a shallow scan of the checkpointed table — NOT a
    # 20-round-deep union/agg tree (unbounded lineage = re-analysis
    # cost per round and full-chain recompute on executor loss)
    df = ops.ALL_QUERIES["x7_dup_components"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().numberedTreeString()
    assert len(plan.splitlines()) <= 5
    assert "LogicalRDD" in plan


def test_d12_vocab_topk_is_take_ordered(spark, sf_dir):
    # the top-K must be TakeOrderedAndProject (per-partition heap-k +
    # 200-row merge), NEVER a single-partition window over the whole
    # vocab table; the rank window sits above the 200-row limit
    plan = _plan(spark, sf_dir, "d12_vocab_topk")
    assert "TakeOrderedAndProject" in plan
    # only the distinct-count agg shuffles; no SinglePartition exchange
    assert _shuffles(plan) == 2
    assert "Exchange SinglePartition" not in plan
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    take_pos = plan.find("TakeOrderedAndProject")
    assert agg_pos != -1 and win_pos != -1
    # executedPlan prints top-down: Window above TakeOrdered above agg
    assert win_pos < take_pos < agg_pos


def test_e6_asof_is_join_free(spark, sf_dir):
    # the as-of join is the union+window formulation: ONE shuffle on
    # user_id, no join operator at all (no range-join blowup to exist)
    plan = _plan(spark, sf_dir, "e6_asof_join")
    assert "Join" not in plan
    assert "Window" in plan
    assert _shuffles(plan) == 1


def test_e7_range_join_is_binned_equi_join(spark, sf_dir):
    # the interval join must plan as a hash equi-join on (user, bin) —
    # never a nested-loop/cartesian theta join
    plan = _plan(spark, sf_dir, "e7_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_x4_signature_table_reused(spark, sf_dir):
    # the minhash signature table is persisted and reused by the band
    # builder and both rejoin sides — the plan must read the cached
    # table, not recompute the tokenize->shingle->hash pipeline 3x
    plan = _plan(spark, sf_dir, "x4_minhash_lsh")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_w3_single_window_exchange(spark, sf_dir):
    # every window function shares one (partitionBy, orderBy) spec ->
    # exactly one shuffle on o_custkey feeds them all
    plan = _plan(spark, sf_dir, "w3_window_suite")
    assert _shuffles(plan) == 1
    assert "Exchange SinglePartition" not in plan


def test_d18_one_shard_exchange(spark, sf_dir):
    # shard + in-shard rank: one hash exchange on the shard key, never
    # a global (single-partition) sort
    plan = _plan(spark, sf_dir, "d18_shard_export")
    assert _shuffles(plan) == 1
    assert "Exchange SinglePartition" not in plan


def test_x13_no_cartesian_chunk_join(spark, sf_dir):
    # chunk df attaches via an equi-join on chunk_hash (uniform md5
    # key); the whole pipeline is hash exchanges only
    plan = _plan(spark, sf_dir, "x13_chunk_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_d19_vocab_join_not_single_partition(spark, sf_dir):
    # df attaches by shuffle equi-join on term (vocab too big to
    # broadcast at scale); only the 1-row corpus count broadcasts
    plan = _plan(spark, sf_dir, "d19_tfidf_keywords")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # the 1-row n_docs aggregate


def test_v5_stage1_reads_quantized_codes(spark, sf_dir):
    # stage 1 must score the int8 code column (map-side vs broadcast
    # queries); the only window partitions by query_id
    plan = _plan(spark, sf_dir, "v5_sq_rerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "Exchange SinglePartition" not in plan


#: broadcast joins with a non-equi condition (id != id against a tiny
#: broadcast side) legitimately plan as BroadcastNestedLoopJoin — the
#: loop side is the broadcast few-row table, not data x data
_BNLJ_OK = {
    "v1_knn_bruteforce",
    "v3_ivf_topk",
    "v5_sq_rerank",
    "v346_ivf_kmeans",
    # d23's corpus-total is a broadcast 1-row cross join (the scalar
    # denominator of the q distribution)
    "dq6_term_sketches",
    "d23_source_divergence",
    # d19's corpus doc count is a broadcast 1-row cross join (the idf
    # numerator); dq4 carries d19
    "d19_tfidf_keywords",
    "dq4_corpus_reports",
    # d26's MIN-rate normalizer is a broadcast 1-row cross join; dq2
    # carries d26
    "d26_temperature_mix",
    "dq2_split_sample",
    "j13_salted_join",  # salt-explode dimension is a literal range table
    "rq2_join_suite",  # carries j13 (same literal salt-range cross join)
    "a18_top_supplier",  # broadcast 1-row MAX revenue (d19 scalar pattern)
    "a25_important_stock",  # broadcast 1-row stock-value total (a16 pattern)
    # x19's vertex-count normalizer is a broadcast 1-row cross join
    # (the d19 pattern); x710 carries x19
    "x19_pagerank",
    "x710_components_survivors",
    # d32 consumes the d30 trained chain (broadcast 1-row chosen-merge
    # pair per round); dq6 carries both
    "d32_bpe_encode",
    # M7 subtree deletion: dir_path-startsWith-root semi-join against the
    # broadcast vanished-roots list (few rows per wave); prefix matching
    # is inherently non-equi and the loop side is the tiny broadcast
    "g2_hash_lifecycle",
    # e15's recency anchor + quartile cutoffs are broadcast 1-row cross
    # joins; e812 carries e15
    "e15_rfm_segments",
    "e812_rollup_pivot",
    # d40's waterfill rank/cum terms come from a broadcast |langs|-row
    # theta self-join plus the 1-row budget/waterline tables (dq2)
    "d40_unimax_mix",
    # v15's candidate stage is the v1 broadcast-query scan; v16 routes
    # against broadcast coarse/PQ codebooks (both carried by v346)
    "v15_mmr_rerank",
    "v16_ivf_pq_residual",
    # serve half of v16: same broadcast-codebook query fan-out against
    # the persisted index artifacts
    "v16_serve",
    "v20_pq_index_add",
    "a16_dormant_accounts",
    # g11's z-key extent, g12/g14's part-stat rows and g14's merged
    # sketch are broadcast 1-row cross joins (the d19 pattern); g3456
    # carries them
    "g3456_control_suite",
}


def test_graded_registry_no_cartesian_sweep(spark, sf_dir):
    # every driver-graded plan: no data x data cartesian, and nested-
    # loop joins only where the loop side is a broadcast few-row table
    import __spark_entry__ as entrymod

    bad: dict[str, str] = {}
    for name in entrymod.queries():
        try:
            plan = _plan(spark, sf_dir, name)
        except Exception:
            continue  # streaming/stateful entries build their own runs
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_OK:
            bad[name] = "BroadcastNestedLoopJoin"
    assert not bad, bad


def test_d21_hll_single_chain(spark, sf_dir):
    # one aggregation chain: (source,term) distinct -> (source,bucket)
    # registers (+ per-bucket counts) -> (source) estimate. ONE corpus
    # scan, keyed exchanges only, no join and no window anywhere
    plan = _plan(spark, sf_dir, "d21_hll_distinct")
    assert plan.count("FileScan parquet") == 1
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan
    assert "Window" not in plan


def test_d22_cms_take_ordered_and_broadcast_probe(spark, sf_dir):
    # candidates come from TakeOrderedAndProject (heap-k), the sketch
    # probe is a broadcast join against the 2048-cell table, and no
    # single-partition exchange exists anywhere
    plan = _plan(spark, sf_dir, "d22_cms_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "Exchange SinglePartition" not in plan


def test_v6_kmeans_broadcast_rounds(spark, sf_dir):
    # every Lloyd round broadcasts the k x dim centroid table (a few
    # KB); assignment is a vec_id-keyed window, never a global one
    plan = _plan(spark, sf_dir, "v6_kmeans_refine")
    assert plan.count("BroadcastExchange") >= 2  # one per iteration
    assert "Exchange SinglePartition" not in plan
    assert "SortMergeJoin" not in plan


def test_d24_bpe_pairs_takeordered_single_scan(spark, sf_dir):
    # top-K via heap (TakeOrderedAndProject), never a global vocab
    # window; pairs counted over the distinct-word table -> ONE corpus scan
    plan = _plan(spark, sf_dir, "d24_bpe_pair_stats")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("FileScan parquet") == 1


def test_d25_lm_trained_counts_cached(spark, sf_dir):
    # the trained bigram-count table is persisted and read from cache by
    # BOTH the context derivation and the scoring join — neither may
    # re-explode the corpus (the cached subtree's own scan prints inside
    # each InMemoryTableScan node, so FileScan counts are not meaningful
    # here; the cache reads are the invariant)
    df = ops.ALL_QUERIES["d25_lm_quality"](spark, sf_dir)
    df.count()  # materialize the persist
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_d26_temperature_mix_broadcast_rates(spark, sf_dir):
    # per-source rates broadcast onto the scan-riding projection; the
    # doc-sized side never shuffles on source
    plan = _plan(spark, sf_dir, "d26_temperature_mix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_v7_pq_adc_broadcast_lookups(spark, sf_dir):
    # training centroids and the Q x M x K query distance table are
    # broadcast; ADC scoring is equi-join code lookups — never a
    # cartesian or a data x data sort-merge join
    plan = _plan(spark, sf_dir, "v7_pq_adc")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_f2_sql_body_functions_stay_jvm_side(spark, sf_dir):
    # SQL-body functions must inline into the plan (Catalyst) — never a
    # Python UDF evaluation node
    plan = _plan(spark, sf_dir, "f2_sql_surface")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert _shuffles(plan) == 0


def test_d28_global_rank_without_global_window(spark, sf_dir):
    # the total-order rank must come from RangePartitioning + keyed
    # windows, never a single-partition funnel of the corpus
    plan = _plan(spark, sf_dir, "d28_curriculum_order")
    assert "rangepartitioning" in plan
    assert "Exchange SinglePartition" not in plan


def test_d30_bpe_training_plan_shape(spark, sf_dir):
    # iterative rounds run over PERSISTED word tables (InMemoryTableScan
    # present — parquet re-read only builds the first cache; the
    # rendered plan repeats cached lineage so a raw scan count would
    # over-count), chosen pairs join broadcast (1-row tables), and no
    # data x data cartesian anywhere
    plan = _plan(spark, sf_dir, "d30_bpe_train")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_g7_partition_pruning_plan(spark, sf_dir, tmp_path):
    # the single-day predicate must prune at partition-directory level:
    # PartitionFilters non-empty, and the pruned scan reads exactly one
    # day's files (selected partitions are visible in the plan text)
    import pyspark.sql.functions as F

    from file_db_spark.catalog import load_table

    root = str(tmp_path / "events_by_day")
    e = load_table(spark, sf_dir, "events")
    (
        e.select("event_id", "ts", "event_type", "value",
                 F.col("ts").cast("date").alias("day"))
        .write.mode("overwrite").partitionBy("day").parquet(root)
    )
    pruned = spark.read.parquet(root).filter(F.col("day") == F.to_date(F.lit("2024-01-15")))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "day" in plan.split("PartitionFilters:")[1][:200]
    # metadata-level pruning: the files actually opened by the pruned
    # query all come from the one selected partition directory, a
    # fraction of the full 30-day store
    full_files = {
        r[0] for r in spark.read.parquet(root)
        .select(F.input_file_name()).distinct().collect()
    }
    read_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert read_files and len(read_files) < len(full_files)
    assert all("day=2024-01-15" in f for f in read_files)
