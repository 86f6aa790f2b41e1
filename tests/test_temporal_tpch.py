"""Semantic + plan tests for the temporal joins and extended TPC-H shapes.

The DuckDB oracle already proves value parity (test_oracle_parity); these
tests pin down the properties the oracle can't see: the as-of union-sort
implementation agrees with the naive definition, the band join finds exactly
the pairs the predicate defines, and the plans use the join strategies the
docstrings promise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_map_reduce_spark.plans import plan_report
from k_means_map_reduce_spark.registry import QUERIES
from k_means_map_reduce_spark.sources import load_table


def test_asof_matches_naive_definition(spark, sf_dir):
    """Union-sort as-of ≡ join+filter+argmax (the definition, quadratic)."""
    got = QUERIES["join_asof_event_last_order"](spark, sf_dir)
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    naive = (
        e.join(o, (e.user_id == o.o_custkey) & (e.ts >= o.o_orderdate), "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(
            F.max_by("o_orderkey", "o_orderdate").alias("last_orderkey"),
            F.max_by("o_totalprice", "o_orderdate").alias("last_totalprice"),
        )
    )
    assert got.count() == e.count()
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_asof_single_shuffle_no_fanout(spark, sf_dir):
    """The as-of plan must not contain any join operator at all — the whole
    match happens in one windowed pass over the unioned streams."""
    r = plan_report(QUERIES["join_asof_event_last_order"](spark, sf_dir))
    assert r.sortmerge_joins == 0 and r.broadcast_joins == 0, r.text
    assert "Window" in r.text


def test_band_join_pairs_satisfy_predicate(spark, sf_dir):
    rows = QUERIES["join_band_event_pairs"](spark, sf_dir).collect()
    assert rows, "band join found no pairs at this SF"
    for row in rows:
        assert row.event_a < row.event_b
        assert abs(row.micros_apart) <= 300 * 1_000_000


def test_band_join_no_cartesian(spark, sf_dir):
    r = plan_report(QUERIES["join_band_event_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in r.text, r.text


def test_rollup_grains_are_consistent(spark, sf_dir):
    """Each grain must re-aggregate to the same totals as the finest grain."""
    df = QUERIES["events_time_rollup_grains"](spark, sf_dir).cache()
    by = {
        g: df.where(F.col("grain") == g)
        .agg(F.sum("n_events").alias("n"))
        .collect()[0]["n"]
        for g in ("hour", "day", "total")
    }
    assert by["hour"] == by["day"] == by["total"]


def test_q7_broadcasts_dimensions(spark, sf_dir):
    r = plan_report(QUERIES["q7_volume_shipping"](spark, sf_dir))
    assert r.broadcast_joins >= 4, (
        f"q7 should broadcast supplier/customer/nation×2, saw {r.broadcast_joins}"
    )


def test_q8_broadcasts_dimensions(spark, sf_dir):
    r = plan_report(QUERIES["q8_market_share"](spark, sf_dir))
    assert r.broadcast_joins >= 5, (
        f"q8 should broadcast part/supplier/customer/nation×2/region, saw {r.broadcast_joins}"
    )


def test_q18_threshold_filters(spark, sf_dir):
    rows = QUERIES["q18_large_volume_customers"](spark, sf_dir).collect()
    assert rows
    assert all(row.sum_qty > 260 for row in rows)


def test_embedding_cosine_pairs_bounded(spark, sf_dir):
    rows = QUERIES["dedup_embedding_cosine_pairs"](spark, sf_dir).collect()
    assert rows
    for row in rows:
        assert 0.4 <= row.sim <= 1.0
        assert row.vec_a < row.vec_b
