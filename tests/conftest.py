from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from k_means_map_reduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


# ---- test tiers (round-3 verdict item 3) -------------------------------
# smoke:         < 3 min, at least one test from every test module — the
#                end-of-round "is everything wired" check.
# parity:        the full DuckDB-parity sweep (test_oracle_parity.py),
#                ~520 params; deselect with -m "not parity".
# parity_sample: the riskiest oracles only (iterative/approximate/portable-
#                hash families) at the driver's sf0.01.
# Recipe documented in README.md §Testing.

_SMOKE = {
    "test_bloom_no_false_negatives",
    "test_events_ts_unit_sniff",
    "test_events_ts_epoch_sanity",
    "test_exact_dedup_drops_duplicates",
    "test_pagerank_query_shape_and_determinism",
    "test_native_deterministic",
    "test_zorder_write_roundtrip_lossless",
    "test_memo_evicts_lru_and_unpersists",
    "test_operator_caches_are_bounded_memos",
    "test_stub_codec_deterministic",
    "test_driver_rotation_ordering",
    "test_attribution_last_touch_window_and_tie",
    "test_filter_pushdown_q1",
    "test_codegen_present_everywhere",
    "test_histogram_degenerate_all_equal",
    "test_dq_checks_clean_dataset",
    "test_centroids_txt_roundtrip",
    "test_parquet_csv_roundtrip",
    "test_kmv_estimate_bounds",
    "test_tumbling_stream_equals_batch",
    "test_cms_stream_replayed_epoch_is_skipped",
    "test_streaming_query_runs",
    "test_asof_matches_naive_definition",
    "test_lang_id_on_real_samples",
    "test_negative_pairs_shape",
    "test_publish_state_atomic_swap_and_epoch_marker",
    "test_task_retry_recovers_injected_failure",
}

# one representative param from the big parameterized families, so the
# smoke tier touches test_timezone.py and test_oracle_parity.py too
_SMOKE_PARAMS = {
    "test_parity_under_tokyo_session[events_tumbling_hourly]",
    "test_oracle_parity[q1]",
    "test_oracle_parity[kmeans_lloyd_oracled]",
}

# r14 (verdict item 1): the full suite outgrew the driver's verify budget
# (r13: tests_ok=false, output truncated at ~96% with zero failures — pure
# runtime). Tests with call time > ~8 s on the r14 box are tiered out of the
# DEFAULT run (pytest.ini addopts = -m "not parity and not slow"); the full
# sweep (including these and the oracle-parity battery) stays the builder's
# pre-commit gate: python -m pytest tests/ -q -m "slow or not slow".
_SLOW = {
    "test_full_outer_join_stream_completes_both_outer_sets",  # 30.7s
    "test_streaming_equals_running_mean_on_separated_blobs",  # 24.9s
    "test_stats_battery_degenerate_constant_balances",  # 24.3s
    "test_left_outer_join_stream_flushes_all_unmatched_views",  # 20.1s
    "test_r11_statistic_bounds",  # 17.2s
    "test_zorder_interleave_matches_python",  # 16.4s
    "test_decay_forgets_old_batches",  # 15.2s
    "test_converged_fixed_point",  # 14.0s
    "test_token_count_matches_python",  # 14.0s
    "test_pmh_signature_agg_matches_python",  # 13.4s
    "test_task_retry_recovers_injected_failure",  # 12.7s (stays in smoke)
    "test_word_count_matches_python",  # 12.3s
    "test_unrolled_vector_math_bitwise_equals_fold",  # 11.7s
    "test_punct_ratio_bounds",  # 11.3s
    "test_salted_aggregate_property",  # 9.4s
    "test_session_conversion_census_consistent",  # 8.8s
    "test_bloom_never_false_negative_property",  # 8.8s
    "test_embedding_ann_recall_vs_bruteforce_corpus",  # 8.0s
    "test_pca_power_iteration_matches_numpy",  # 8.0s
}
# the streaming params of the plan/udf sweeps each replay availableNow
# micro-batches (9-22 s apiece); the batch params stay in the default tier
_SLOW_PARAM_PREFIXES = (
    ("test_no_python_row_udf", "streaming_"),
    ("test_parity_under_tokyo_session", "streaming_left_outer_join"),
    ("test_parity_under_tokyo_session", "streaming_full_outer_join"),
)

# Riskiest oracle families: iterative loops, approximate algorithms made
# portable, recursive SQL, HOF-heavy dedup — the ones most likely to drift
# cross-engine (mirrors the round-3 judge's sampled-parity set).
_PARITY_SAMPLE = {
    "kmeans_lloyd_oracled",
    "kmeans_elbow_wssse",
    "graph_pagerank_exact",
    "graph_bfs_distances",
    "graph_triangle_count",
    "embedding_pca_oracled",
    "dedup_minhash_portable_pairs",
    "text_simhash_signatures",
    "sim_ann_ivf_oracled",
    "text_bm25_search",
    "sql_recursive_hierarchy_levels",
    "market_basket_pairs",
    "streaming_tumbling_hourly_vs_batch",
    "streaming_cms_heavy_hitters_vs_batch",
    "sketch_cms_heavy_hitters",
    "attribution_time_decay",
    "events_session_windows_dynamic_gap",
    "stats_multiple_regression",
    "ml_prefixspan_patterns",
    "timeseries_holt_smoothing_daily",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        param = item.name[len(base) + 1 : -1] if "[" in item.name else ""
        if "test_oracle_parity" in str(item.fspath):
            item.add_marker(pytest.mark.parity)
            if base == "test_oracle_parity" and param:
                if param in _PARITY_SAMPLE:
                    item.add_marker(pytest.mark.parity_sample)
        elif base in _SMOKE:
            item.add_marker(pytest.mark.smoke)
        if item.name in _SMOKE_PARAMS:
            item.add_marker(pytest.mark.smoke)
        if base in _SLOW or any(
            base == b and param.startswith(p)
            for b, p in _SLOW_PARAM_PREFIXES
        ):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kmmr-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_DIR_ORACLE
