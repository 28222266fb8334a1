"""Attribute WindowExec "No Partition Defined" warnings to queries.

A single-partition window is fine on a bounded relation (day series,
value-grouped stats, dimension-sized reports, ≤k-row limit-then-rank
tails) and a scale-killer on a corpus-sized one — and Catalyst can create
one SILENTLY by folding a constant partition key out of a window spec
(found live on the PQ recall gate, fixed in topk_cosine_batch). This tool
re-runs a check_oracle sweep log through a per-query warn counter so each
round's audit is one command instead of an ad-hoc grep.

Usage:
    python tools/check_oracle.py <sf_dir> 2>&1 | tee sweep.log
    python tools/warn_census.py sweep.log

Every reported query must be either on the documented bounded-relation
list below or investigated. Round-6 audit: 19 bounded + 1 real (fixed).
"""

from __future__ import annotations

import re
import sys

# Queries whose single-partition windows run over bounded relations, each
# audited (round 6): calendar/day series, value-grouped stats, dimension-
# sized ntile reports, ≤10-row limit-then-rank tails.
DOCUMENTED_BOUNDED = {
    # round-11 additions (all audited): calendar-bounded daily windows
    # (the ljung_box class) and ≤(cells×labels) margin windows
    "pacf_daily_values",  # day-series index + one-row DL algebra
    "ccf_purchase_view_daily",  # common-day index, ±3 lag join
    "granger_lag1_view_to_purchase_daily",  # day index, lag-1 join
    "chow_test_daily_midpoint",  # day index (pinned; 2 bounded consumers)
    "nmi_ivf_cells_labels_embeddings",  # ≤16×labels margin windows
    "rfm_segments_customers",  # per-customer ntile (dimension; approx twin registered)
    "spearman_daily_purchase_view",  # day-series value groups
    "kaplan_meier_conversion_events",  # integer-day risk table
    "approx_distinct_users_trailing7d",  # day series
    "abc_classification_parts",  # parts dimension; total order IS the semantics
    "brand_share_of_revenue",  # brand dimension
    "longest_streak_users",  # 10-row limit-then-rank tail
    "js_divergence_event_types_weekpart",  # event-type dimension
    "language_rebalance_plan",  # language dimension
    "benford_digit_test_orders",  # 9 digits
    "rolling_corr_purchase_view_14d",  # day series
    "customer_spend_deciles",  # documented trade; approx twin registered
    "value_drift_weekday_weekend",  # fixed buckets
    "mann_whitney_purchase_view_values",  # value-grouped (bounded domain)
    "key_skew_report_events",  # aggregated key table
    "auc_lang_by_length_documents",  # value-grouped (n_chars domain)
    "cramers_v_event_type_dow",  # 35-cell contingency
    "chi_square_event_dow",  # 35-cell contingency
    "mutual_information_event_dow",  # same 35-cell contingency aggregate
    "equidepth_histogram_orders",  # documented trade; approx sibling registered
    "kendall_tau_daily_purchase_view",  # day-series value groups
    # round-7 additions — each window runs over a post-limit head or a
    # dimension-sized aggregate, never the fact table
    "gini_lorenz_customer_spend",  # per-customer ntile/rank (dimension; same trade as customer_spend_deciles)
    "hill_tail_index_orders",  # 101-row order-statistics head
    "kneser_ney_bigram_documents",  # rank over the 100-row top head
    "skipgram_pmi_documents",  # rank over the 100-row top head
    "negative_sampling_table_documents",  # rank/cum_p over the 200-row top head
    # round-8 additions — duration/day-grain cumulative windows, bounded
    # by the corpus hour/day span by construction (docstrings state it)
    "kaplan_meier_user_retention",  # hour-grain risk table
    "logrank_test_retention_arms",  # hour-grain at-risk windows
    "msprt_always_valid_ab_daily",  # day-grain cumulative moments
    # round-10 additions
    "poisson_glm_daily_trend",  # calendar-bounded daily grain (rn index)
    # round-10 continuation — duration/day/dimension-grain windows only
    "cox_ph_retention_arms",  # hour-grain at-risk windows (log-rank grain)
    "nelson_aalen_hazard_retention",  # hour-grain at-risk + cumulative hazard
    "binseg_changepoint_daily",  # calendar-bounded daily prefix sums + argmax head
    "qini_uplift_curve_users",  # user-dimension ntile (the customer_spend_deciles trade) + 10-row cumulative
    "shapley_attribution_events",  # channel-taxonomy bit map (<=C rows)
    "fisher_exact_region_priority_orders",  # block-offset scan over n/65536 blocks
    "poisson_dispersion_daily",  # calendar-bounded daily grain
    "periodogram_daily_events",  # calendar-bounded daily index + trig grain
    "ljung_box_daily_values",  # calendar-bounded daily index (lag join)
    "runs_test_daily_values",  # calendar-bounded daily lag/sign windows
    "newey_west_daily_trend",  # calendar-bounded daily index + lag join
    # -- round-11 continuation additions (this session), each audited --
    "competing_risks_cif_retention",  # duration grain <= corpus hour span
    "rmst_user_retention",  # duration grain <= corpus hour span
    "fleming_harrington_test_retention_arms",  # duration grain (logrank class)
    "life_table_retention",  # interval grain <= span/6h
    "pettitt_changepoint_daily",  # calendar-bounded daily grain
    "bartels_rank_test_daily_values",  # value+day grain (rank construction)
    "wilcoxon_signed_rank_purchase_view_daily",  # |d|-grain <= day count
    "ansari_bradley_purchase_view",  # value-grain (mann-whitney class)
    "theils_u_event_type_dow",  # 35-cell contingency windows
    "spectral_entropy_daily_events",  # day x K<=14 trig grain
    "transfer_entropy_view_purchase_daily",  # day grain + 8-cell windows
    "ann_ivf_nprobe_sweep_embeddings",  # 5-row sweep + queriesxk windows
    "adf_test_daily_values",  # calendar-bounded daily lag windows
    "breusch_godfrey_daily_trend",  # calendar-bounded daily lag windows
    "permutation_entropy_daily_values",  # daily lead windows + <=6 patterns
    "cox_stuart_trend_daily",  # daily row_number (bounded)
    "hurst_rs_daily_values",  # day grain; (size,block) windows are keyed
    "esd_outliers_daily",  # 3 bounded day-grain passes
    "theta_method_forecast_daily",  # daily grain + single-row fold
    "dagostino_k2_daily_values",  # daily grain fold
    "seasonal_mann_kendall_daily",  # within-season day-grain pairs
    "kendalls_w_weekday_event_types",  # 35-cell judge windows
    "anderson_darling_purchase_view",  # stitched value-grain (CvM class)
    "wasserstein_purchase_view",  # stitched value-grain + bounds lead
    "energy_distance_purchase_view",  # stitched value-grain
    "canonical_correlation_daily",  # daily grain fold
    "hotelling_t2_weekpart_daily",  # daily grain fold
    "near_dup_threshold_sweep_documents",  # pair relation windows (bounded)
    "box_m_test_weekpart_daily",  # daily grain fold
    "mardia_normality_daily",  # calendar-bounded day-pair relation
    "quade_test_event_type_values",  # 35-cell + 7-range windows
    "greenwood_km_ci_retention",  # duration grain <= corpus hour span
    "siegel_slope_daily_trend",  # day-grain pair medians (bounded)
    "cochrane_orcutt_daily_trend",  # daily lag windows (bounded)
    "cusum_squares_daily",  # daily cumulative windows (bounded)
    "variance_ratio_daily",  # daily lag windows (bounded)
    "turning_points_daily",  # daily lead windows (bounded)
}


def census(path: str) -> tuple[dict[str, int], int]:
    """Per-query warn counts, plus trailing warns attributable to no query.

    Counter RESETS at the sweep-start banner so session-warmup warns (or
    anything logged before the first per-query line) are not charged to
    query #1; warns after the last result line are returned as
    ``unattributed`` rather than silently dropped.
    """
    out: dict[str, int] = {}
    warns = 0
    # Match EVERY per-query result line check_oracle prints — OK, FAIL,
    # ERROR, and the rows-only check — else a warn emitted by an
    # ERROR/rows-only query would be mis-attributed to the NEXT query.
    result = re.compile(r"\s+(\w+): (OK|FAIL|ERROR|rows-only)")
    for line in open(path, errors="replace"):
        if "== sweep start ==" in line:
            warns = 0
            continue
        if "No Partition Defined for Window" in line:
            warns += 1
        m = result.match(line)
        if m:
            if warns:
                out[m.group(1)] = warns
            warns = 0
    return out, warns


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "sweep.log"
    out, trailing = census(path)
    unexplained = []
    for name, n in sorted(out.items(), key=lambda kv: -kv[1]):
        tag = "bounded" if name in DOCUMENTED_BOUNDED else "INVESTIGATE"
        if tag == "INVESTIGATE":
            unexplained.append(name)
        print(f"{n:4d}  {tag:12s} {name}")
    print(
        f"\n{len(out)} queries emit single-partition-window warns; "
        f"{len(unexplained)} not on the documented bounded list"
    )
    if trailing:
        print(f"{trailing:4d}  unattributed (after last result line)")
    if unexplained:
        print("INVESTIGATE:", ", ".join(unexplained))
    return 1 if unexplained else 0


if __name__ == "__main__":
    sys.exit(main())
