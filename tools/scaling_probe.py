"""Empirical scaling probe: time representative operators at sf0.1 and at
a synthetic 4x corpus, and report the wall-clock ratio against the 4x
ideal.

The fixtures top out at sf0.1, but the grading question is "does the plan
survive a scale-up?" — so this script manufactures one: each probed table
is unioned with itself 4x under key offsets (documents get fresh doc_ids,
orders/lineitem fresh orderkeys; dimension tables are copied verbatim so
join fanout per dim key is preserved). A plan that is linear in the input
should cost ~4x; a plan hiding a super-linear step (single-partition sort,
all-pairs join, per-key quadratic blowup) shows up as a much larger ratio.

Usage: python tools/scaling_probe.py [mult] [query ...]
Writes one JSON line per query: {"q": ..., "base_s": ..., "scaled_s": ...,
"ratio": ..., "mult": 4}.

This is a diagnostic, not part of the driver contract; results from the
round-5 run are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/spark_graft_scaled"

# (query name, tables it reads)
PROBES = [
    ("encoding_advisor_orders", ["orders"]),
    ("mcv_stats_orders", ["orders"]),
    ("zipf_fit_tokens", ["documents"]),
    ("build_vocab_documents", ["documents"]),
    ("gopher_repetition_documents", ["documents"]),
    ("winnowing_fingerprints_documents", ["documents"]),
    ("dsir_importance_documents", ["documents"]),
    ("exact_dedup_documents", ["documents"]),
    ("revenue_per_product", ["lineitem", "part"]),
    ("table_checksum_orders", ["orders"]),
    # round-5 chunk-stitch / blocked-join plans: the probes that would
    # expose a hidden single-partition sort or quadratic pair blowup
    ("ks_test_purchase_view", ["events"]),
    ("ks_by_event_type_bh", ["events"]),
    ("t_closeness_report_events", ["events"]),
    ("pareto_frontier_parts", ["part"]),
    ("compaction_plan_orders", ["orders"]),
    ("fellegi_sunter_linkage_parts", ["part"]),
    ("hybrid_search_rrf_documents", ["documents"]),
    ("pca_power_iteration_embeddings", ["embeddings"]),
    # session additions: map-CPU bootstrap, Arrow MG kernel, pair-machinery
    # rollup, bin-table isotonic, fold-state forecasting
    ("poisson_bootstrap_ci_orders", ["orders"]),
    ("misra_gries_heavy_hitters_events", ["events"]),
    ("cross_source_overlap_matrix", ["documents"]),
    ("isotonic_calibration_documents", ["documents"]),
    ("holt_winters_seasonal_daily", ["events"]),
    ("embedding_int8_quantization_report", ["embeddings"]),
    # round-6 additions: relational power iteration and the replanned
    # chunk-stitched Heaps cumulative (round-5 verdict items 2 and 8)
    ("markov_stationary_event_types", ["events"]),
    ("heaps_law_fit_documents", ["documents"]),
    # round-6 phase 2: the audited iterative-graph / gate tail — key-offset
    # replication preserves per-order fanout, so edges grow linearly and a
    # linear plan should probe ~mult
    ("pagerank_copurchase_parts", ["lineitem"]),
    ("triangle_count_copurchase", ["lineitem"]),
    ("khop_reach_copurchase", ["lineitem"]),
    ("kmeans_lloyd_embeddings", ["embeddings"]),
    ("embedding_lsh_pair_recall_embeddings", ["embeddings"]),
    ("canonical_entities_parts", ["part"]),
    ("embedding_lsh_near_dup", ["embeddings"]),
    # round-7: the TPC-H multi-join shapes (orderkeys offset in lockstep so
    # the orders⋈lineitem fanout is preserved), plus the two new stats
    # queries whose windows/heads must NOT grow with the fact table
    ("tpch_q1_pricing_summary", ["lineitem"]),
    ("tpch_q3_shipping_priority", ["orders", "lineitem", "customer"]),
    (
        "tpch_q5_local_supplier_volume",
        ["orders", "lineitem", "customer", "supplier", "nation", "region"],
    ),
    (
        "tpch_q8_market_share",
        ["orders", "lineitem", "customer", "supplier", "nation", "region", "part"],
    ),
    ("tpch_q10_returned_items", ["orders", "lineitem", "customer", "nation"]),
    ("gini_lorenz_customer_spend", ["orders"]),
    ("cooks_distance_price_quantity", ["lineitem"]),
    # round-8 (r7 verdict ask #5): the two r7 corpus-grain chunk-stitch
    # shapes with no probe datapoint — excision's inverted-index window
    # rewrite and the BPE merge-chain encode
    ("exact_substring_excision_documents", ["documents"]),
    ("bpe_encode_documents", ["documents"]),
    # round-8 additions: the completion-tier TPC-H shapes with genuinely
    # new plan structure (dual-role nation pair filter; order-grain HAVING
    # aggregate; scalar-threshold + anti-join dormancy) and the PII
    # regex-scan rewrite. q16 is deliberately NOT probed: offset
    # replication preserves (l_partkey, l_suppkey), so its pair-distinct
    # collapses replicas and the probe would trivially flatline.
    (
        "tpch_q7_volume_shipping",
        ["orders", "lineitem", "customer", "supplier", "nation"],
    ),
    ("tpch_q18_large_volume_customers", ["orders", "lineitem", "customer"]),
    ("tpch_q22_shaped_dormant_customers", ["orders", "customer"]),
    ("pii_redact_documents", ["documents"]),
    # round-8 extension trio: the truncation eval scans a 16x corpus per
    # width (probe-informative); the DPP join's fact side replicates under
    # orderkey offsets while the year-partition count stays fixed.
    # growth_accounting_daily_users is deliberately NOT probed: events
    # replicate with user_id verbatim, so its (user, day) distinct
    # collapses replicas and the probe would trivially flatline — its plan
    # (per-user lag/lead window over one distinct shuffle) is the same
    # family the sessionize/funnel probes already cover.
    ("matryoshka_truncation_recall_embeddings", ["embeddings"]),
    ("dpp_ship_year_join_orders", ["orders", "lineitem"]),
    # round-9 (r8 verdict ask #6): the round-8 analytic tiers without a
    # probe datapoint. item_item's basket self-join pair grain grows
    # linearly under orderkey offsets (l_partkey verbatim preserves basket
    # composition); silhouette is O(n·k) with k fixed. logrank/msprt: the
    # user/day result grains do NOT grow under replication (user_id/ts
    # verbatim) — the probe's job there is to confirm the events scan +
    # first aggregate stay linear and the bounded-grain windows stay
    # bounded, same class as the gini_lorenz probe.
    ("item_item_cosine_topk_parts", ["lineitem"]),
    ("simplified_silhouette_embeddings", ["embeddings"]),
    ("logrank_test_retention_arms", ["events"]),
    ("msprt_always_valid_ab_daily", ["events"]),
    # round-9 TPC-H completion: q21's semi+anti double correlation and
    # q13's left-outer grow linearly under orderkey offsets (order
    # composition preserved); q9 is the 5-way dim-broadcast fact join; q2's
    # pair grain is fixed under replication (l_partkey/l_suppkey verbatim)
    # so its probe reads on the 16x scan + first aggregate. q11/q17/q20
    # are not probed: their inner aggregates share q2's fixed pair/part
    # grain AND their plans add nothing beyond the probed q15/q17-family
    # scalar-broadcast epilogue.
    (
        "tpch_q21_shaped_waiting_suppliers",
        ["orders", "lineitem", "supplier", "nation", "region"],
    ),
    ("tpch_q13_customer_distribution", ["orders", "customer"]),
    (
        "tpch_q9_shaped_product_type_profit",
        ["orders", "lineitem", "part", "supplier", "nation"],
    ),
    (
        "tpch_q2_shaped_min_cost_supplier",
        ["lineitem", "part", "supplier", "nation", "region"],
    ),
    # round-9 perplexity filter: doc-bigram grain and the corpus model both
    # grow linearly under doc_id offsets (replicated docs inflate counts,
    # vocabulary stays fixed)
    ("bigram_perplexity_documents", ["documents"]),
    # round-9 continuation: HITS/k-core — orderkey offsets replicate orders
    # with identical cust/part composition, so the DISTINCT edge sets stay
    # ~fixed and the probe reads on the 16x edge-build scan + aggregates
    # (the logrank/gini class); k-core's support>=2 prune additionally
    # admits more pairs as support inflates. PQ-ADC: the corpus (and the
    # encode matmul volume) grows 16x, stride adjusts. The md5-replay
    # dedup probes carry the embedding_lsh_near_dup caveat: offset
    # replicas are EXACT copies, so every replica group collides in all
    # bands and verified pairs grow ~replica² — super-linear output by
    # construction, the probe reads on signature build staying linear.
    ("hits_authorities_parts", ["orders", "lineitem"]),
    ("kcore_peel_copurchase_parts", ["lineitem"]),
    ("ann_pq_sample_adc_topk_embeddings", ["embeddings"]),
    ("minhash_md5_replay_near_dup_documents", ["documents"]),
    ("simhash_md5_replay_near_dup_documents", ["documents"]),
    # textrank: doc_id offsets replicate the corpus — bigram counts inflate
    # 16x over the SAME fixed vocabulary (edge set unchanged, weights x16,
    # w/S ratios identical), so the probe reads on the one corpus-∝
    # adjacency pass staying linear; iteration cost is vocabulary-sized.
    ("textrank_terms_documents", ["documents"]),
    # MI/absorbing-chain: the result grains are |types|-bounded (35-cell
    # contingency, |types|^2 transition matrix) and do NOT grow under
    # event_id-offset replication — the probes read on the events scan
    # (MI) and the per-user lead() pass (absorbing) staying linear, the
    # logrank/msprt class.
    ("mutual_information_event_dow", ["events"]),
    ("absorbing_expected_steps_to_purchase", ["events"]),
    # F-S linkage: p_partkey offsets GROW the catalog, so p_size blocks
    # grow with the multiplier and the blocked pair grain is quadratic in
    # block size by construction (mult² pairs) — probe at 4× like
    # canonical_entities' pre-replan readings; the documented scale
    # mitigation is banded blocking + sampled u's, not a bigger block scan.
    ("fellegi_sunter_part_linkage", ["part"]),
    # jackknife: user grain grows only via new events per user (event_id
    # offsets keep user_id verbatim) — the probe reads on the two
    # hash-aggregation passes staying linear; replicate relations are
    # user-grain, output is 2 rows.
    ("jackknife_ratio_metric_ab", ["events"]),
    ("eb_shrunk_purchase_rate_users", ["events"]),
    # mann-kendall: day grain is calendar-bounded (event_id offsets keep
    # ts verbatim), so the day-pair join is fixed-size and the probe reads
    # on the daily aggregation scan.
    ("mann_kendall_daily_trend", ["events"]),
    # round-10 additions. KW/cliffs: event_id offsets keep value verbatim,
    # so the distinct-value grain is FIXED and per-value counts inflate —
    # the probe reads on the events scan + fixed-size stitch staying
    # linear. McNemar: user grain fixed (user_id verbatim), probe reads on
    # the one events scan.
    ("kruskal_wallis_event_values", ["events"]),
    ("cliffs_delta_purchase_view", ["events"]),
    ("mcnemar_weekday_weekend_purchase", ["events"]),
    # leakage-safe split: doc_id offsets REPLICATE the corpus — replicas
    # are exact copies so the pair graph inherits the md5-replay caveat
    # (replica groups collide everywhere, pairs ~replica²); probe at 4x.
    ("leakage_safe_split_documents", ["documents"]),
    # IVF-PQ sample replay: dense 16x corpus, stride adjusts; encode
    # matmul volume grows 16x, probed-cell candidates grow ~16x.
    ("ann_ivfpq_sample_adc_topk_embeddings", ["embeddings"]),
    # keyed merge: stored+batch both 16x; the partial path's win is
    # layout-dependent (hash buckets + uniform keys -> all touched), so
    # this probes the scan/dedup/anti-join staying linear, not the link
    # trick (stream_bench measures that under locality).
    ("merge_upsert_keyed_events", ["events"]),
    # removal attribution / poisson GLM: result grains are |types|- and
    # calendar-bounded; probes read on the lead()/daily aggregation scans.
    ("markov_removal_attribution_events", ["events"]),
    ("poisson_glm_daily_trend", ["events"]),
    # ALS: orderkey offsets grow the ratings grain ~16x (same parts,
    # more customers x parts cells); each half-iteration's join+agg must
    # stay linear in that grain.
    ("als_rank1_part_factors", ["orders", "lineitem"]),
    # round-10 continuation. cox/cmh/qini/shapley: user-and-duration
    # result grains are FIXED under event_id offsets (user_id/ts
    # verbatim) — probes read on the user-grain aggregation scans staying
    # linear, the logrank/msprt class. poisson_dispersion is deliberately
    # NOT probed: calendar-bounded daily grain, the identical class as
    # the probed binseg scan.
    ("cox_ph_retention_arms", ["events"]),
    ("shapley_attribution_events", ["events"]),
    ("cmh_test_arm_purchase_by_cohort", ["events"]),
    ("qini_uplift_curve_users", ["events"]),
    ("binseg_changepoint_daily", ["events"]),
    # huber: three IRLS passes + two percentile passes over a 16x fact
    # projection — THE probe for the claim that iteration cost is linear
    # in the corpus with a fixed iteration count.
    ("huber_regression_price_quantity", ["lineitem"]),
    # fisher: n = |orders| grows 16x, so the distributed ln-factorial
    # prefix (blocked two-phase scan) and the ~16x support join both
    # grow linearly — THE probe for the lfact-table claim.
    ("fisher_exact_region_priority_orders",
     ["orders", "customer", "nation", "region"]),
    # lpa/assortativity: orderkey offsets keep the DISTINCT edge set
    # ~fixed (the hits/kcore caveat) — probes read on the 16x edge-build
    # scan + degree aggregates staying linear.
    ("label_propagation_communities_parts", ["lineitem"]),
    ("degree_assortativity_copurchase_parts", ["lineitem"]),
    # jl: corpus x m projection grain and the chain pairs both grow 16x.
    ("jl_projection_distortion_embeddings", ["embeddings"]),
    # chao1: doc_id offsets replicate the corpus — trigram TYPE grain is
    # fixed while instance counts inflate 16x; probe reads on the gram
    # explode + type aggregation staying linear.
    ("chao1_trigram_richness_documents", ["documents"]),
    # nelson_aalen / markov_entropy_rate / lad_regression are deliberately
    # NOT probed: NA shares the probed cox/logrank grain class (bounded
    # duration grain, user-grain scan), entropy rate shares the probed
    # markov_stationary class (|types|-bounded iteration over one lead()
    # pass), and LAD shares the probed huber class (same per-iteration
    # fact-scan fold, minus the percentile passes).
    # round-11 (r10 verdict ask #6): the final continuation tier probed
    # explicitly so the 16x ledger is complete — all bounded day/user/
    # brand grains over single scans, expected ~1x.
    ("tost_equivalence_ab_value", ["events"]),
    ("jarque_bera_daily_values", ["events"]),
    ("ljung_box_daily_values", ["events"]),
    ("runs_test_daily_values", ["events"]),
    ("newey_west_daily_trend", ["events"]),
    ("hhi_brand_concentration_by_category", ["lineitem", "part"]),
    ("bowker_symmetry_event_transitions", ["events"]),
    ("periodogram_daily_events", ["events"]),
    ("theil_atkinson_customer_spend", ["orders"]),
    ("partial_corr_purchase_view_daily", ["events"]),
    # round-11 additions, probed proactively in-round: day/user/value-grain
    # tests (expected ~1x), the stitched JT cumulative, the oriented-census
    # transitivity, and the linear embedding readouts. nn1_label_accuracy
    # is probed at 4x separately — it is the EXACT blocked-BLAS kNN
    # verifier (O(N^2) by construction; the ANN family is the scale path),
    # so its ratio reads on the kernel's quadratic contract, not a plan
    # accident.
    ("dunn_posthoc_event_values", ["events"]),
    ("moods_median_test_event_values", ["events"]),
    ("friedman_test_event_type_values", ["events"]),
    ("cochrans_q_event_types_users", ["events"]),
    ("jonckheere_terpstra_priority_price", ["orders"]),
    ("pacf_daily_values", ["events"]),
    ("ccf_purchase_view_daily", ["events"]),
    ("granger_lag1_view_to_purchase_daily", ["events"]),
    ("chow_test_daily_midpoint", ["events"]),
    ("randomization_test_ab_value", ["events"]),
    ("hodges_lehmann_purchase_view_daily", ["events"]),
    ("transitivity_copurchase_parts", ["lineitem"]),
    ("nmi_ivf_cells_labels_embeddings", ["embeddings"]),
    ("nn1_label_accuracy_embeddings", ["embeddings"]),
    ("welch_anova_event_values", ["events"]),
    ("bartlett_test_event_values", ["events"]),
    ("breusch_pagan_price_quantity", ["lineitem"]),
    ("cohens_kappa_quality_flags_documents", ["documents"]),
    ("brunner_munzel_purchase_view", ["events"]),
    ("cramer_von_mises_purchase_view", ["events"]),
    ("gmm2_em_daily_values", ["events"]),
    ("pettitt_changepoint_daily", ["events"]),
    ("rmst_user_retention", ["events"]),
    ("anderson_darling_purchase_view", ["events"]),
    ("wasserstein_purchase_view", ["events"]),
    ("energy_distance_purchase_view", ["events"]),
    ("goodman_kruskal_priority_price_orders", ["orders"]),
    ("wilcoxon_signed_rank_purchase_view_daily", ["events"]),
    ("cochran_armitage_trend_priority_orders", ["orders"]),
    ("adf_test_daily_values", ["events"]),
    ("breusch_godfrey_daily_trend", ["events"]),
    ("white_test_price_quantity", ["orders", "lineitem"]),
    ("kmv_distinct_users_events", ["events"]),
    ("ams_f2_user_activity_events", ["events"]),
    ("binned_range_join_orders_bands", ["orders"]),
    ("brier_decomposition_documents", ["documents"]),
    ("hosmer_lemeshow_documents", ["documents"]),
    ("fleming_harrington_test_retention_arms", ["events"]),
    ("life_table_retention", ["events"]),
    ("permutation_entropy_daily_values", ["events"]),
    ("bartels_rank_test_daily_values", ["events"]),
    ("cox_stuart_trend_daily", ["events"]),
    ("theils_u_event_type_dow", ["events"]),
    ("local_clustering_topk_parts", ["orders", "lineitem"]),
    ("hurst_rs_daily_values", ["events"]),
    ("esd_outliers_daily", ["events"]),
    ("transfer_entropy_view_purchase_daily", ["events"]),
    ("croston_intermittent_demand_part", ["orders", "lineitem"]),
    ("theta_method_forecast_daily", ["events"]),
    ("spectral_entropy_daily_events", ["events"]),
    ("seasonal_mann_kendall_daily", ["events"]),
    ("kendalls_w_weekday_event_types", ["events"]),
    ("dagostino_k2_daily_values", ["events"]),
    ("zone_map_skip_report_orders", ["orders"]),
    ("ansari_bradley_purchase_view", ["events"]),
    ("competing_risks_cif_retention", ["events"]),
    ("bloom_index_probe_orders", ["orders"]),
    ("near_dup_threshold_sweep_documents", ["documents"]),
    ("ann_ivf_nprobe_sweep_embeddings", ["embeddings"]),
    ("hotelling_t2_weekpart_daily", ["events"]),
    ("mahalanobis_outliers_lineitem", ["orders", "lineitem"]),
    ("cronbach_alpha_event_types_users", ["events"]),
    ("odds_ratio_ci_priority_status_orders", ["orders"]),
    ("canonical_correlation_daily", ["events"]),
    ("quade_test_event_type_values", ["events"]),
    ("box_m_test_weekpart_daily", ["events"]),
    ("mardia_normality_daily", ["events"]),
    ("greenwood_km_ci_retention", ["events"]),
    ("siegel_slope_daily_trend", ["events"]),
    ("cochrane_orcutt_daily_trend", ["events"]),
    ("cusum_squares_daily", ["events"]),
    ("variance_ratio_daily", ["events"]),
    ("turning_points_daily", ["events"]),
]

KEY_OFFSETS = {
    "documents": ("doc_id", 10_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
    "events": ("event_id", 1_000_000_000),
    # None offset = DENSE replication (offset by the base count): the ANN
    # sample-ADC replays assert dense 0-based vec_ids (their stride CTEs
    # depend on it), and a dense id space is what a real embedding corpus
    # has — a 1e9 gap would probe an id layout production never sees
    "embeddings": ("vec_id", None),
    # part is the FACT side for the skyline/linkage probes — replicating
    # under a key offset grows the catalog (and its (brand,size) blocks)
    # rather than duplicating identical rows
    "part": ("p_partkey", 100_000_000),
}


def build_scaled(spark, tables: set[str], mult: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SCALED, exist_ok=True)
    for t in sorted(tables):
        out = os.path.join(SCALED, f"{t}.parquet")
        if os.path.exists(out):
            continue
        df = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        if t in KEY_OFFSETS:
            key, off = KEY_OFFSETS[t]
            if off is None:
                off = df.count()
            parts = [
                df.withColumn(key, F.col(key) + F.lit(i * off))
                for i in range(mult)
            ]
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        else:  # dimension: copy verbatim
            scaled = df
        scaled.write.mode("overwrite").parquet(out)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from data_ingestion_pipeline_spark.session import get_spark

    spark = get_spark("scaling-probe")
    qs = entrymod.queries()
    probes = [p for p in PROBES if not names or p[0] in names]
    needed = {t for _, ts in probes for t in ts}
    shutil.rmtree(SCALED, ignore_errors=True)
    build_scaled(spark, needed, mult)

    def best_of(fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        return best

    for name, _tables in probes:
        q = qs[name]
        base_s = best_of(lambda: q(spark, BASE))
        scaled_s = best_of(lambda: q(spark, SCALED))
        print(
            json.dumps(
                {
                    "q": name,
                    "base_s": round(base_s, 3),
                    "scaled_s": round(scaled_s, 3),
                    "ratio": round(scaled_s / base_s, 2),
                    "mult": mult,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
