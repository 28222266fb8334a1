"""Physical-plan regression tests: the plans we audited and want to KEEP.

A correctness-green query can still silently regress to a bad plan (lost
broadcast, dropped pushdown, full sort instead of top-k). These assertions
pin the load-bearing plan features at fixture scale.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "revenue_per_product",
        "orders_per_product_month",
        "inventory_status",
        "most_sold_per_category",
        "customer_order_enrichment",
    ],
)
def test_dim_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_filters_reach_parquet_scan(spark):
    # Q2's p_size predicate and Q5's key predicate must be in PushedFilters.
    assert "PushedFilters: [IsNotNull(p_size), LessThan(p_size,10)]" in _plan(
        spark, "low_stock"
    )
    plan = _plan(spark, "inventory_status")
    assert "EqualTo(p_partkey,1)" in plan
    # and the key filter crosses the outer join into the lineitem scan
    assert "EqualTo(l_partkey,1)" in plan


def test_aggregates_are_two_phase(spark):
    plan = _plan(spark, "revenue_per_product")
    assert "partial_sum" in plan, "map-side partial aggregation missing"


def test_global_topk_avoids_full_sort(spark):
    plan = _plan(spark, "top_revenue_orders")
    assert "TakeOrderedAndProject" in plan, "LIMIT degraded to a full global sort"


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in _plan(spark, "exists_semi_join")
    assert "LeftAnti" in _plan(spark, "anti_join_new_keys")


def test_latest_event_aggregates_before_shuffle(spark):
    """Argmax-by-agg must keep its map-side partial max (the whole point
    vs the window form: one row per (partition, key) crosses the wire)."""
    plan = _plan(spark, "latest_event_per_user")
    assert "partial_max" in plan
    assert "Window" not in plan


def test_gapfill_grid_sides_broadcast(spark):
    """The calendar × user grid must broadcast; a shuffled cross join of
    the grid would dominate at scale."""
    plan = _plan(spark, "daily_user_activity_gapfilled")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_outlier_stats_join_broadcasts(spark):
    plan = _plan(spark, "event_value_outliers")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_tfidf_df_relation_broadcasts(spark):
    plan = _plan(spark, "tfidf_top_terms")
    assert "BroadcastHashJoin" in plan, "df(term) relation lost its broadcast"


def test_curation_pipeline_single_wide_shuffle(spark):
    """Dedup → gate → sample must stay one shuffle (the fingerprint
    groupBy): gate and sample are post-aggregation projections."""
    plan = _plan(spark, "curation_pipeline_documents")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 hash exchange, saw {n_exchanges}"


def test_simhash_candidates_are_banded_not_all_pairs(spark):
    """The signature self-join must stay an equi-join on (chunk_idx,
    chunk_val) — pigeonhole banding. A cartesian/BNLJ here is the O(N²)
    popcount comparison that cannot survive corpus scale."""
    # retired from the registry in round 10 (evidence carried by the
    # md5-replay sibling) but still the production path — pin via the
    # function, not the driver surface
    from data_ingestion_pipeline_spark.operators import llm_data

    df = llm_data.simhash_near_dup_documents(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), "banded equi-join missing from simhash plan"


def test_minhash_candidates_are_banded_not_all_pairs(spark):
    """Same banding guarantee for MinHash-LSH candidate generation."""
    from data_ingestion_pipeline_spark.operators import llm_data

    df = llm_data.minhash_near_dup_documents(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corpus_mixture_is_map_only_and_prunes_text(spark):
    """Hash-based mixture sampling must stay a shuffle-free map-side filter
    that never reads the text column."""
    plan = _plan(spark, "corpus_mixture_documents")
    assert "Exchange hashpartitioning" not in plan
    assert "text" not in plan.split("ReadSchema:")[-1]


def test_pack_documents_single_window_shuffle(spark):
    plan = _plan(spark, "pack_documents_context_windows")
    assert plan.count("Exchange hashpartitioning") == 1


def test_knn_graph_no_cartesian(spark):
    """The B×B block grid must replicate via broadcast joins, never a
    cartesian/BNLJ of the vector relation against itself."""
    plan = _plan(spark, "knn_graph_embeddings")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontamination_benchmark_side_broadcasts(spark):
    """The benchmark shingle set must be the broadcast side — the corpus is
    the big side at scale and must never shuffle on the shingle key."""
    plan = _plan(spark, "decontaminate_documents")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_embedding_lsh_candidates_carry_ids_not_vectors(spark):
    """The banding self-join must exchange only (id, band, bucket) rows —
    vectors re-attach after the distinct. A vector-carrying exchange shows
    up as the array column inside the hashpartitioning exchange subtree."""
    df = entrymod.queries()["embedding_lsh_verified_near_dup"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "_v" not in keys, f"vector column in a shuffle key: {keys}"


def test_zorder_box_predicates_push_down(spark):
    """Both dimensions of the 2-D box must reach the parquet scan as pushed
    filters over the z-ordered layout."""
    plan = _plan(spark, "zorder_clustered_orders")
    pushed = plan.split("PushedFilters")[1].split("ReadSchema")[0]
    # the rendered filter list truncates, so pin the leading entries
    assert "GreaterThanOrEqual(o_custkey,100)" in pushed
    assert "IsNotNull(o_orderdate)" in pushed


def test_scd2_no_cartesian_and_one_batch_join(spark):
    plan = _plan(spark, "scd2_customer_dimension")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_rollup_reaggregates_partials_two_phase(spark):
    plan = _plan(spark, "daily_rollup_from_hourly_events")
    # both levels are hash aggregates; no sort-based fallback
    assert plan.count("HashAggregate") >= 4  # partial+final at each level


def test_multitable_ann_plan_shape(spark):
    """The multi-table LSH candidate path must be hash joins end to end
    (broadcast query index, id re-attach) — never a cartesian/NL join —
    and the top-k per query must stay a ranking window, not a global sort."""
    plan = _plan(spark, "ann_lsh_topk_embeddings")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_vocab_topv_avoids_full_sort(spark):
    plan = _plan(spark, "build_vocab_documents")
    assert "TakeOrderedAndProject" in plan, "top-V degraded to a full sort"
    assert "partial_count" in plan or "partial_sum" in plan


def test_bloom_probe_runs_before_verify_join(spark):
    """The Bloom probe must be a scan-side filter (ArrowEvalPython below
    the verify join), so corpus shingles are pruned before any join."""
    plan = _plan(spark, "bloom_decontaminate_documents")
    assert "ArrowEvalPython" in plan
    # the only joins are broadcast-hash (verify vs bench shingles)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_shard_shuffle_window_is_partitioned(spark):
    """The within-shard rank must be a PARTITIONED window — a global
    (single-partition) window would serialize the corpus through one task."""
    df = entrymod.queries()["shard_shuffle_documents"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # partition spec present: hashpartitioning on shard feeds the window
    assert "hashpartitioning(shard" in plan


def test_fuzzy_pairs_is_blocked_equi_join(spark):
    """Entity matching must join on the blocking key — a cartesian or
    nested-loop pair enumeration is the scale-killer blocking exists to
    prevent."""
    plan = _plan(spark, "fuzzy_part_name_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" in plan


def test_markov_windows_are_user_partitioned(spark):
    """The bigram lead() must partition by user — a global order-by window
    would funnel the whole event stream through one task."""
    plan = _plan(spark, "markov_event_transitions")
    assert "hashpartitioning(user_id" in plan


def test_interpolation_windows_are_user_partitioned(spark):
    plan = _plan(spark, "interpolated_daily_user_value")
    assert "hashpartitioning(user_id" in plan
    assert "CartesianProduct" not in plan


def test_scd2_asof_dim_broadcasts(spark):
    plan = _plan(spark, "scd2_asof_lookup")
    assert "BroadcastHashJoin" in plan, "as-of dim join lost its broadcast"
    assert "CartesianProduct" not in plan


def test_kmeans_centroids_broadcast_no_cartesian(spark):
    plan = _plan(spark, "kmeans_assign_embeddings")
    assert "BroadcastHashJoin" in plan, "centroid side must broadcast"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_lateral_topn_plans_as_partitioned_rank(spark):
    # the correlated LATERAL LIMIT must decorrelate to a window rank, never
    # re-scan orders per customer row
    plan = _plan(spark, "lateral_topn_orders_per_customer")
    assert "Window" in plan, "LATERAL did not decorrelate to a window rank"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_grouping_sets_single_expand(spark):
    plan = _plan(spark, "grouping_sets_revenue")
    assert plan.count("Expand") >= 1, "grouping sets should plan one Expand"
    assert "partial_" in plan, "two-phase aggregation lost under Expand"


def test_pagerank_iterations_reuse_checkpointed_edges(spark):
    # the loop-invariant edge+degree join is checkpointed: iterations must
    # scan the RDD, not re-run the basket self-join (no parquet scan of
    # lineitem may appear in the iterated plan)
    plan = _plan(spark, "pagerank_copurchase_parts")
    assert "Scan ExistingRDD" in plan, "edges lost their checkpoint"
    assert "lineitem" not in plan, "an iteration re-reads the raw table"


def test_weighted_sample_is_topk_not_full_sort(spark):
    plan = _plan(spark, "weighted_sample_documents")
    assert "CartesianProduct" not in plan


def test_weighted_sample_top50_is_take_ordered(spark):
    plan = _plan(spark, "weighted_sample_documents")
    assert "TakeOrderedAndProject" in plan, (
        "weighted-sample top-50 degraded to a global window sort"
    )


def test_fuzzy_block_join_spreads_on_block_key(spark):
    plan = _plan(spark, "fuzzy_part_name_pairs")
    assert "hashpartitioning(p_size" in plan, (
        "levenshtein block join lost its explicit key spread"
    )


def test_pagerank_self_join_copartitioned(spark):
    plan = _plan(spark, "pagerank_copurchase_parts")
    assert "Scan ExistingRDD" in plan  # checkpointed loop-invariant edges


def _unpartitioned_window_count(plan: str) -> int:
    """Count WindowExec nodes whose partition spec is empty.

    Physical-plan text renders ``Window [funcs], [partSpec], [orderSpec]``
    (3 top-level bracket groups) when both are present. With 2 groups the
    second is EITHER a partition spec (unordered window — fine) or an
    order spec (unpartitioned window — the single-partition scale-killer);
    order specs are recognizable by their ASC/DESC direction markers.
    """
    import re

    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow \[", line)
        if not m:
            continue
        depth, groups, buf = 0, [], ""
        for ch in line[m.start():]:
            if ch == "[":
                if depth == 0:
                    buf = ""
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(buf)
            elif depth > 0:
                buf += ch
        if len(groups) < 2 or (
            len(groups) == 2
            and (" ASC" in groups[1] or " DESC" in groups[1])
        ):
            n += 1
    return n


@pytest.mark.parametrize(
    "name, limit",
    [
        ("zipf_fit_tokens", "limit=1000"),
        ("top_bigram_collocations_documents", "limit=20"),
        ("rake_keywords_documents", "limit=15"),
    ],
)
def test_rank_windows_cut_before_ranking(spark, name, limit):
    """The round-4 verdict's limit-then-rank fix: the top-K cut must be a
    TakeOrderedAndProject BEFORE the ranking window, and no window in the
    plan may run with an empty partition spec (the K-row rank window rides
    a constant-valued non-foldable key)."""
    plan = _plan(spark, name)
    assert "TakeOrderedAndProject" in plan and limit in plan, (
        f"{name} lost its pre-rank top-k cut"
    )
    assert _unpartitioned_window_count(plan) == 0, (
        f"{name} has a partition-less window (single-partition global sort)"
    )


def test_encoding_advisor_runs_are_partition_local(spark):
    """Run-length profiling must never global-sort the fact table: range
    partition on the layout key, chunk-local lag windows, and a tiny
    boundary stitch — evaluated once (stack unpivot), not per column."""
    plan = _plan(spark, "encoding_advisor_orders")
    assert plan.count("rangepartitioning(o_orderkey") == 1, (
        "profile scan subtree duplicated or range partitioning lost"
    )
    assert "hashpartitioning(pid" in plan, "chunk-local window lost"
    assert _unpartitioned_window_count(plan) == 0, (
        "encoding advisor regressed to an unpartitioned full-table window"
    )


def test_heaps_law_cumulatives_are_chunk_stitched(spark):
    """The corpus-grain cumulative (cum_tokens, cum_vocab) series must run
    as range-partitioned chunk-local windows + the ≤chunks-row offset
    stitch — never a bare Window.orderBy(doc_id) single-partition sort of
    the doc-grain relation (round-5 verdict item 2). The range exchange
    itself runs inside the (lazy) localCheckpoint (round-8 verdict ask #4
    moved the pin off the CacheManager), so the visible plan scans an
    ExistingRDD; the stitch evidence is the pid-partitioned windows and
    the zero-unpartitioned-window census."""
    plan = _plan(spark, "heaps_law_fit_documents")
    assert "hashpartitioning(pid" in plan, "heaps chunk-local windows lost"
    assert "ExistingRDD" in plan, (
        "heaps chunk pin lost (range exchange no longer checkpointed)"
    )
    assert _unpartitioned_window_count(plan) == 0, (
        "heaps regressed to an unpartitioned corpus-grain window"
    )


def test_rfm_approx_has_no_window(spark):
    """The approx RFM twin must score against broadcast approx-quantile
    boundaries — no ntile, no window, no sort-for-window anywhere in the
    plan (round-5 verdict item 4)."""
    import re

    plan = _plan(spark, "rfm_segments_customers_approx")
    assert "Window" not in plan, "approx RFM grew a window"
    assert not re.search(r"\bntile\(", plan), (
        "approx RFM regressed to ntile scoring"
    )
    assert "BroadcastExchange" in plan, "boundary broadcast lost"


def test_brute_force_topk_is_two_phase(spark):
    """topk_cosine_batch must rank in two phases — a local window keyed by
    (spark_partition_id, query) then the per-query global window over ≤k·P
    survivors — and never a partition-less window (the foldable-literal
    query_id degradation observed on the PQ gate).

    Since r11 the recall gates pin their brute/ann inputs with a lazy
    localCheckpoint (each pipeline runs once instead of per count branch),
    so the composed gate plan no longer *contains* the top-k subtree — and
    the checkpoint boundary also stops gate-side constant folding from
    reaching into it. The property therefore lives on the standalone
    subtree plan the gates pin: assert it there (plus one composed,
    unpinned consumer, hard_negative_mining)."""
    from data_ingestion_pipeline_spark.operators.llm_data import (
        _ann_query_batch,
    )
    from data_ingestion_pipeline_spark.similarity.brute_force import (
        topk_cosine_batch,
    )
    from data_ingestion_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    for k in (10, 20):
        plan = (
            topk_cosine_batch(emb, _ann_query_batch(emb), k=k)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SPARK_PARTITION_ID" in plan, "local top-k phase lost"
        assert _unpartitioned_window_count(plan) == 0, (
            "partition-less ranking window over the scored corpus"
        )
    plan = _plan(spark, "hard_negative_mining_embeddings")
    assert "SPARK_PARTITION_ID" in plan, "local top-k phase lost"
    assert _unpartitioned_window_count(plan) == 0, (
        "hard_negative_mining has a partition-less ranking window"
    )


def test_pca_covariance_is_arrow_kernel(spark):
    """The PCA/whitening covariance pass must be the mapInArrow X^T·X
    partial kernel — one 2080-row block per batch, no posexplode and no
    self-join on vec_id anywhere in the subtree (round-5 verdict item 3:
    the old shape shuffled 2×N×64 rows and fanned codegen out 2080×)."""
    from data_ingestion_pipeline_spark.operators.mlprep_checks import (
        _cov_partials,
    )
    from data_ingestion_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = (
        _cov_partials(emb, [0.0] * 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan, "covariance kernel lost"
    for node in ("Join", "Generate", "Exchange"):
        assert node not in plan, (
            f"covariance subtree grew a {node} — the whole pass must be "
            "one shuffle-free Arrow map over the scan"
        )


def test_vocab_coverage_broadcasts_vocab_and_cuts_topv(spark):
    plan = _plan(spark, "vocab_coverage_documents")
    assert "TakeOrderedAndProject" in plan, "vocab cut degraded to a full sort"
    assert "BroadcastHashJoin" in plan, "vocab membership join lost its broadcast"
    assert "CartesianProduct" not in plan


def test_winnowing_pairs_join_on_fingerprint_hash(spark):
    """The pair step must be an equi-join on the fingerprint hash (the
    LSH band-join shape) — never a nested-loop pair enumeration."""
    plan = _plan(spark, "winnowing_near_copy_pairs_documents")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "hashpartitioning(fp" in plan or "BroadcastHashJoin" in plan


def test_mcv_stats_single_scan_and_partitioned_rank(spark):
    plan = _plan(spark, "mcv_stats_orders")
    # one melt scan of orders for the counts side (plus the count(*) side)
    assert plan.count("Scan parquet") <= 2
    assert "hashpartitioning(column_name" in plan, "MCV rank window unpartitioned"


def test_table_changes_single_key_join(spark):
    plan = _plan(spark, "table_changes_versions")
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin FullOuter") + plan.count(
        "ShuffledHashJoin FullOuter"
    ) >= 1 or "FullOuter" in plan


def test_checksum_is_one_scan_one_agg(spark):
    plan = _plan(spark, "table_checksum_orders")
    assert "partial" in plan, "checksum lost its map-side partial aggregation"
    assert "Exchange SinglePartition" in plan  # the final 1-row merge only
    assert plan.count("Scan parquet") == 1


def test_ivfpq_no_cartesian_and_broadcast_probes(spark):
    # called via the exported function (the registry name retired in
    # round 11 — rows-only endgame); the plan contract is unchanged
    from data_ingestion_pipeline_spark.operators.llm_data import (
        ann_ivfpq_topk_embeddings,
    )

    df = ann_ivfpq_topk_embeddings(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "probe/refine joins lost broadcast"


def test_bm25_topk_is_take_ordered_and_broadcasts_df(spark):
    """BM25's top-20 cut must be TakeOrderedAndProject (never a global rank
    window over the scored corpus) and the ≤5-row df relation must ride a
    broadcast join back onto tf."""
    plan = _plan(spark, "bm25_search_documents")
    assert "TakeOrderedAndProject" in plan, "bm25 lost its pre-rank top-k cut"
    assert "BroadcastHashJoin" in plan, "bm25 df join lost its broadcast"
    assert _unpartitioned_window_count(plan) == 0, (
        "bm25 has a partition-less window"
    )


def test_cdc_chunk_windows_are_doc_partitioned(spark):
    """CDC chunk-id running sums must partition by doc — a content-defined
    chunker that global-sorts the token stream would be a scale-killer."""
    plan = _plan(spark, "cdc_chunk_dedup_documents")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" in plan, "chunk window lost doc partitioning"
    assert _unpartitioned_window_count(plan) == 0


def test_l_diversity_windows_are_qi_partitioned(spark):
    plan = _plan(spark, "l_diversity_report_events")
    assert _unpartitioned_window_count(plan) == 0, (
        "l-diversity group-total window lost its QI partitioning"
    )


def test_fk_inclusion_audit_uses_anti_joins_on_distinct_keys(spark):
    """Each containment check must be a left-anti join over DISTINCT child
    keys (aggregate-then-join) — the raw fact table must never be the join
    probe side."""
    plan = _plan(spark, "fk_inclusion_audit")
    assert "LeftAnti" in plan, "fk audit lost its anti-join shape"
    assert "CartesianProduct" not in plan


def test_tpch_q1_is_one_scan_pushed_cutoff(spark):
    """Q1 must stay the scan-agg yardstick: one lineitem scan, shipdate
    cutoff pushed to the parquet reader, no joins of any kind."""
    plan = _plan(spark, "tpch_q1_pricing_summary")
    assert plan.count("Scan parquet") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan
    assert "Join" not in plan


def test_tpch_q3_takeordered_head(spark):
    """Q3's top-10 must be a bounded TakeOrdered, never a global sort of
    the per-order aggregate."""
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q5_all_dims_broadcast_no_cartesian(spark):
    """Q5's six-table join must close entirely through broadcast hash
    joins at fixture scale (every dim side is bounded) — the two-column
    supplier condition must not degrade to a nested loop."""
    plan = _plan(spark, "tpch_q5_local_supplier_volume")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_tpch_q10_dims_join_after_aggregate(spark):
    """Q10's customer/nation payload must attach to the per-customer
    AGGREGATE (broadcast side), not ride the orders-lineitem fact shuffle:
    the aggregate over o_custkey sits below the dim broadcast join."""
    plan = _plan(spark, "tpch_q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # c_name must not appear in any shuffle exchange output (it only
    # exists above the broadcast join over the aggregate)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "c_name" not in line


def test_tpch_customer_broadcast_is_size_gated(spark):
    """Round-7 verdict ask #4: the filtered-customer build sides in
    Q3/Q5/Q8 must broadcast only while Catalyst's estimate fits the
    session ceiling. Under the default threshold the hint fires (plan
    shows BroadcastHashJoin); with the ceiling forced below the dimension
    size the SAME code path must yield a sort-merge/shuffled-hash join —
    and the same rows."""
    from data_ingestion_pipeline_spark.plans.join_strategies import (
        broadcast_if_small,
        plan_size_estimate,
    )

    baseline = _plan(spark, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in baseline
    expected = {
        tuple(r)
        for r in entrymod.queries()["tpch_q3_shipping_priority"](
            spark, SF_SMOKE
        ).collect()
    }

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try:
        df = entrymod.queries()["tpch_q3_shipping_priority"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
            "gate failed open: customer side still broadcast above ceiling"
        )
        assert {tuple(r) for r in df.collect()} == expected, (
            "join strategy changed the result"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # unit surface: explicit thresholds override the session ceiling
    from data_ingestion_pipeline_spark.sources.catalog import load_table

    dim = load_table(spark, SF_SMOKE, "customer").select("c_custkey")
    assert plan_size_estimate(dim) > 0
    hinted = broadcast_if_small(dim, threshold_bytes=1 << 40)
    unhinted = broadcast_if_small(dim, threshold_bytes=1)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()


def test_tpch_q21_double_correlation_is_semi_plus_anti(spark):
    """Q21's EXISTS + NOT-EXISTS double correlation must plan as a
    left-semi plus a left-anti join against the checkpointed order-grain
    relation — never a cartesian, never a window."""
    plan = _plan(spark, "tpch_q21_shaped_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan, "shared lines relation no longer pinned"
    assert "TakeOrderedAndProject" in plan  # top-100, not a global sort


def test_tpch_q2_min_cost_is_aggregate_join_back(spark):
    """Q2's correlated scalar-min must run as aggregate + equality
    join-back on the checkpointed pair-grain relation — no window over
    the fact table, no cartesian."""
    plan = _plan(spark, "tpch_q2_shaped_min_cost_supplier")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "ExistingRDD" in plan, "pair_cost pin lost"
    assert "TakeOrderedAndProject" in plan


def test_tpch_q13_zero_order_customers_survive(spark, sf_dir):
    """Q13 must keep zero-order customers (the left-outer's whole point):
    the c_count = 0 bucket exists and equals customers minus distinct
    order-holders under the priority filter."""
    from data_ingestion_pipeline_spark import registry

    plan = _plan(spark, "tpch_q13_customer_distribution")
    assert "LeftOuter" in plan
    rows = {
        r.c_count: r.custdist
        for r in registry._REGISTRY["tpch_q13_customer_distribution"][0](
            spark, sf_dir
        ).collect()
    }
    from data_ingestion_pipeline_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    n_cust = load_table(spark, sf_dir, "customer").count()
    holders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows.get(0, 0) == n_cust - holders


def test_daily_helper_pin_contract(spark):
    """r11 batch-6 pin contract for the shared ``_daily`` helper: the
    by_type=False variant is localCheckpoint-pinned (its ~21 daily-series
    consumers must read ONE materialized day-grain relation, never replay
    the corpus aggregation per branch), while the by_type=True variant
    keeps its parquet lineage so a caller's event_type filter can still
    push down to the scan."""
    from data_ingestion_pipeline_spark.operators.timeseries_checks import _daily

    pinned = _daily(spark, SF_SMOKE, by_type=False)
    p = pinned._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in p and "Scan parquet" not in p

    unpinned = _daily(spark, SF_SMOKE, by_type=True)
    u = unpinned._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in u and "Scan ExistingRDD" not in u


def test_duplicated_subtree_pins_hold(spark):
    """r11 batch-6: the census offenders' final plans must stay free of
    replayed corpus scans — each pinned relation shows up as an RDD scan
    and the parquet scans that remain are the by-design direct reads
    (markov's empirical-share pass, dunn's tie pass)."""
    for name, max_scans in [
        ("adamic_adar_link_prediction_parts", 0),
        ("friedman_test_event_type_values", 0),
        ("markov_stationary_event_types", 1),
        ("dunn_posthoc_event_values", 1),
        ("cochrans_q_event_types_users", 0),
        ("item_item_cosine_topk_parts", 0),
        ("isotonic_calibration_documents", 0),
    ]:
        plan = _plan(spark, name)
        n_scans = plan.count("Scan parquet")
        assert n_scans <= max_scans, (
            f"{name}: {n_scans} parquet scans in the final plan "
            f"(expected <= {max_scans}) — a batch-6 pin was dropped"
        )
        assert "Scan ExistingRDD" in plan, f"{name} lost its pin"
