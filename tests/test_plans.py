"""Explain-plan assertions: the scale contract, checked per query.

- No BatchEvalPython anywhere (row-at-a-time Python = off the codegen path).
- Filter pushdown reaches the parquet scan where a query filters scan columns.
- Column pruning: scans read only needed columns.
- Intended broadcasts actually broadcast.
"""

from __future__ import annotations

import pytest

from k_means_map_reduce_spark.registry import QUERIES
from k_means_map_reduce_spark.plans import plan_report
from k_means_map_reduce_spark.sources import load_table

# Queries whose lazy plan is a pure DataFrame expression (k-means & LSH
# queries run driver-side loops / MLlib fits eagerly, so they're exercised
# functionally elsewhere).
LAZY_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_left_outer_customer_orders",
    "join_semi_customers_with_big_orders",
    "join_anti_customers_without_orders",
    "join_theta_price_above_retail",
    "agg_global_stats",
    "agg_rollup_nation_segment",
    "agg_cube_status_priority",
    "topk_expensive_orders",
    "distinct_flag_status",
    "window_topk_parts_per_brand",
    "window_rank_customers_by_balance",
    "window_running_spend_per_customer",
    "window_lag_lead_user_events",
    "set_union_all_building_rich",
    "set_union_distinct_building_rich",
    "set_intersect_building_rich",
    "set_except_building_rich",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_json_funcs",
    "events_tumbling_hourly",
    "events_sliding_1h_30m",
    "events_session_windows",
    "events_type_value_distribution",
    "text_stats_per_doc",
    "text_stats_by_lang",
    "text_fingerprint",
    "text_lang_id",
    "text_ngram_profile",
    "dedup_exact",
    "dedup_ngram_jaccard_pairs",
    "sim_cosine_topk",
    "sim_norms_by_label",
]


@pytest.mark.parametrize("name", LAZY_QUERIES)
def test_no_python_row_udf(spark, sf_dir, name):
    r = plan_report(QUERIES[name](spark, sf_dir))
    assert not r.has_python_row_udf, f"{name} uses a row-at-a-time Python UDF"


def test_filter_pushdown_q1(spark, sf_dir):
    r = plan_report(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert r.pushed_filters, "l_shipdate filter not pushed to parquet scan"


def test_column_pruning_q1(spark, sf_dir):
    r = plan_report(QUERIES["q1_pricing_summary"](spark, sf_dir))
    assert r.read_schemas, "no ReadSchema in plan"
    schema = r.read_schemas[0]
    assert "l_orderkey" not in schema, f"q1 reads unneeded columns: {schema}"
    assert "l_quantity" in schema


def test_broadcasts_in_q5(spark, sf_dir):
    r = plan_report(QUERIES["q5_local_supplier_volume"](spark, sf_dir))
    assert r.broadcast_joins >= 3, (
        f"q5 should broadcast supplier/nation/region, saw {r.broadcast_joins}:\n"
        + r.text
    )


def test_codegen_present_everywhere(spark, sf_dir):
    # sim_cosine_topk is excluded: array higher-order functions (aggregate/
    # zip_with) are CodegenFallback — JVM interpreted, still no Python.
    for name in ["q1_pricing_summary", "text_stats_per_doc", "scalar_math_funcs"]:
        r = plan_report(QUERIES[name](spark, sf_dir), execute=True)
        assert r.n_codegen_stages >= 1, f"{name} has no WholeStageCodegen span"


def test_theta_join_is_broadcast(spark, sf_dir):
    r = plan_report(QUERIES["join_theta_price_above_retail"](spark, sf_dir))
    assert r.broadcast_joins >= 1 and r.sortmerge_joins == 0, (
        "theta join should broadcast part, not sort-merge:\n" + r.text
    )


def test_scan_pruning_single_column(spark, sf_dir):
    """Projecting 1 column must read 1 column (ReadSchema check)."""
    df = load_table(spark, sf_dir, "lineitem").select("l_quantity")
    r = plan_report(df)
    assert r.read_schemas and r.read_schemas[0] == "struct<l_quantity:double>", (
        r.read_schemas
    )
