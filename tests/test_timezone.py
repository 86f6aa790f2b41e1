"""Non-UTC session probe: the TIMESTAMP_NTZ discipline must keep every
date/window-sensitive oracled query bit-identical to DuckDB regardless of
the Spark session timezone (DuckDB has no session-timezone dependence for
naive timestamps; if any query leaked an instant-semantics TIMESTAMP, a
Tokyo session would shift its values by 9 hours and fail the hash compare).
"""

from __future__ import annotations

import pytest

from k_means_map_reduce_spark.oracle import compare_query

DATE_SENSITIVE = [
    "q1_pricing_summary",
    "scalar_date_funcs",
    "scalar_date_arithmetic",
    "events_tumbling_hourly",
    "events_session_windows",
    "timeseries_gap_fill_hourly",
    "join_asof_event_last_order",
    "q12_shipping_lateness",
    # streaming twins: event time is an instant TIMESTAMP (watermarks reject
    # NTZ), window labels re-rendered in UTC via _fmt_utc, wire strings
    # parsed as NTZ — all three must hold under a shifted session
    "streaming_tumbling_hourly_vs_batch",
    "streaming_tumbling_hourly_jsonl_vs_batch",
    "streaming_session_windows_vs_batch",
    "streaming_sliding_1h_30m_vs_batch",
    "streaming_interval_join_vs_batch",
    "streaming_dedup_vs_batch",
    "streaming_user_stats_vs_batch",
    # to_date over TIMESTAMP_NTZ must not consult the session zone
    "events_rolling_7d_distinct_users",
    # NTZ end-to-end through a foreachBatch maintenance loop
    "streaming_incremental_rollup_vs_batch",
    "streaming_hist_quantiles_vs_batch",
    # interval arithmetic + date_format over NTZ
    "events_window_funnel_stages",
    # round-3 third-session ts-sensitive additions: unix_micros differences
    # (shift-invariant), day-partitioned sweep line, RANGE frames in micros
    "attribution_last_touch",
    "attribution_linear_multitouch",
    "events_peak_concurrency_daily",
    "join_asof_nearest_order",
    "events_dow_seasonality",
    "events_anomaly_daily_zscore",
    # round-3 fourth-pass ts-sensitive additions: LOCF integral (unix_micros
    # diffs + day labels), day-grain CUSUM/decomposition/Holt series, and
    # the per-(user,day) PrefixSpan sequences
    "events_time_weighted_avg_daily",
    "events_cusum_changepoint",
    "timeseries_holt_smoothing_daily",
    "timeseries_classical_decomposition",
    "ml_prefixspan_patterns",
    "attribution_time_decay",
    "events_rolling_median_7d",
    "sql_pipe_syntax_pricing",
    "timeseries_dft_periodogram",
    "events_markov_entropy_rate",
    "events_runs_test_daily",
    # hour() over TIMESTAMP_NTZ must not consult the session zone
    "ds_q90_am_pm_ratio",
    # unix_micros RANGE frames (shift-invariant) + encoded first/last touch
    "attribution_position_based",
    "events_burst_rate_topk",
    # round-9 trajectory/path additions: day-grain walk rollups
    # (date_trunc over NTZ), unix_micros stay durations (shift-invariant
    # differences), datediff epoch days (tz-free on NTZ)
    "geo_stay_points",
    "geo_polyline_length_daily",
    "events_signup_next3_paths",
    "events_conversion_lag_histogram",
    "ds_q89_rolling_brand_deviation",
    "ds_q66_monthly_nation_pivot",
    "geo_od_matrix_topk",
    "geo_colocation_pairs_topk",
    "ds_q25_return_repurchase_chain",
    # round-10 ts-sensitive additions: the streaming conversion-lag twin
    # (UTC wall-day via convert_timezone), week-epoch yoy compare on the
    # 1990 epoch, McNemar's era split (year() over NTZ), seasonal-naive
    # epoch-day shift, q54 month indices, q88 half-hour NTZ bands,
    # drawdown day labels
    "streaming_conversion_lag_vs_batch",
    "stats_mcnemar_era_activity",
    "timeseries_seasonal_naive_error",
    "timeseries_max_drawdown_daily",
    "ds_q54_post_anchor_revenue_bands",
    "ds_q88_halfhour_band_census",
    "ds_q11_two_channel_yoy_winners",
    "geo_radius_of_gyration",
    "geo_jump_length_histogram",
    # round-10 continuation: KM day-grain survival (NTZ datediff + global
    # horizon), the session-window conversion twin (instant event time,
    # closed-session islands), walk-ordered MSD windows, per-day runs test
    "events_kaplan_meier_conversion",
    "streaming_session_conversion_vs_batch",
    "geo_mean_squared_displacement",
    "stats_runs_above_median_by_segment",
    # round-11 ts-sensitive additions: survival day grids (NTZ datediff),
    # epoch-day daily-revenue series, walk-cell hour buckets (NTZ hour),
    # the chronologically-staged EWMA twin (UTC wire strings)
    "events_logrank_signup_cohorts",
    "events_nelson_aalen_hazard",
    "timeseries_ljung_box_daily",
    "timeseries_variance_ratio",
    "timeseries_hurst_rescaled_range",
    "finance_sharpe_sortino_daily",
    "timeseries_changepoint_binseg",
    "stats_hodges_lehmann_shift",
    "geo_location_entropy",
    "geo_home_work_commute",
    "streaming_ewma_per_user_vs_batch",
    # wave 3/4 ts-sensitive: day-series tests, session bounce islands,
    # transition ordering
    "timeseries_cusum_page_alarms",
    "stats_runs_up_down_daily",
    "events_bounce_rate_daily",
    "stats_bowker_symmetry_transitions",
    # continuation wave: KM-grid day arithmetic, per-day walk windows
    "events_rmst_conversion",
    "events_fleming_harrington_logrank",
    "geo_straightness_index",
    # round-12 ts-sensitive addition: the Gehan weight rides the same
    # NTZ day grid as the other log-rank members
    "events_gehan_wilcoxon_logrank",
    # round-13: the ACF/PACF table rides the same epoch-day daily-revenue
    # series as Ljung-Box; the left-outer join twin routes wire strings
    # through the session zone on read and back to UTC strings on output
    "timeseries_acf_pacf_table",
    "streaming_left_outer_join_vs_batch",
    "streaming_full_outer_join_vs_batch",
]


@pytest.mark.parametrize("name", DATE_SENSITIVE)
def test_parity_under_tokyo_session(spark, oracle_sf_dir, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        r = compare_query(spark, name, oracle_sf_dir)
        assert r.ok, f"{name} under Asia/Tokyo: {r.detail}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# Queries whose span arithmetic must also survive a DST-transitioning zone
# (Asia/Tokyo is fixed-offset, so shift-invariant differences pass there
# even when routed through the session zone — round-9 ADVICE). New York
# jumps an hour twice a year; a min/max span crossing a transition would
# diverge +-60 min unless computed NTZ-safely.
DST_SENSITIVE = [
    "geo_stay_points",
    "geo_polyline_length_daily",
    "events_conversion_lag_histogram",
    "geo_od_matrix_topk",
    "geo_colocation_pairs_topk",
    # KM's day grid and the censoring horizon are pure NTZ datediffs
    "events_kaplan_meier_conversion",
    # r11: the log-rank/NA grids share KM's construction; home/work hour
    # buckets are NTZ wall-clock fields
    "events_logrank_signup_cohorts",
    "events_nelson_aalen_hazard",
    "geo_home_work_commute",
    # r12: same day-grid construction
    "events_gehan_wilcoxon_logrank",
]


@pytest.mark.parametrize("name", DST_SENSITIVE)
def test_parity_under_new_york_session(spark, oracle_sf_dir, name):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        r = compare_query(spark, name, oracle_sf_dir)
        assert r.ok, f"{name} under America/New_York: {r.detail}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
