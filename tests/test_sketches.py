"""Sketch accuracy bounds vs exact (oracled) answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_map_reduce_spark.registry import QUERIES
from k_means_map_reduce_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, oracle_sf_dir):
    """The query now emits exact counts + within-bound flags (the
    determinize-and-oracle recipe); the flags ARE the 5% error assertion,
    and the exact counts are cross-checked against an independent
    countDistinct so a broken exact path can't vacuously pass."""
    l = load_table(spark, oracle_sf_dir, "lineitem")
    exact = l.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).collect()[0]
    row = QUERIES["approx_distinct_counts"](spark, oracle_sf_dir).collect()[0]
    assert (row["exact_orders"], row["exact_parts"], row["exact_supps"]) == (
        exact["o"], exact["p"], exact["s"],
    )
    assert row["orders_within_bound"] and row["parts_within_bound"] and (
        row["supps_within_bound"]
    ), dict(row.asDict())


def test_approx_percentile_close_to_exact(spark, oracle_sf_dir):
    """Rank-bound flags per flag must be TRUE, and the per-flag row counts
    must match an independent groupBy count (so the check ran over the
    whole fact, not a truncated join)."""
    l = load_table(spark, oracle_sf_dir, "lineitem")
    exact_n = {
        r["l_returnflag"]: r["n"]
        for r in l.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    rows = QUERIES["approx_percentiles"](spark, oracle_sf_dir).collect()
    assert {r["l_returnflag"] for r in rows} == set(exact_n)
    for r in rows:
        assert r["n"] == exact_n[r["l_returnflag"]]
        assert r["median_rank_ok"] and r["p95_rank_ok"], dict(r.asDict())


def test_hll_merge_soundness_and_error(spark, oracle_sf_dir):
    """The query now embeds the soundness contract (determinize-and-oracle):
    merge_matches_direct proves daily-union == direct-monthly sketch, and
    est_within_bound proves <5% error vs exact. Assert every flag TRUE and
    cross-check the embedded exact counts against an independent
    countDistinct so a broken exact path can't vacuously pass."""
    from pyspark.sql import functions as F
    from k_means_map_reduce_spark.sources import load_table

    rows = QUERIES["hll_users_daily_merge_monthly"](spark, oracle_sf_dir).collect()
    assert rows, "no months"
    e = load_table(spark, oracle_sf_dir, "events")
    indep = {
        str(r["month"]): r["exact"]
        for r in e.select(
            F.date_trunc("month", F.to_date("ts")).cast("date").alias("month"),
            "user_id",
        )
        .groupBy("month")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert {str(r["month"]) for r in rows} == set(indep)
    for r in rows:
        assert r["merge_matches_direct"], dict(r.asDict())
        assert r["est_within_bound"], dict(r.asDict())
        assert r["exact_monthly_users"] == indep[str(r["month"])]
        assert r["n_days"] >= 1


def test_hll_rollup_grains_union_soundness(spark, oracle_sf_dir):
    """Every grain row must carry TRUE union-soundness and error-bound
    flags; the embedded exacts must match an independent recomputation at
    month/total grain and the grains must be complete."""
    from pyspark.sql import functions as F
    from k_means_map_reduce_spark.sources import load_table

    rows = QUERIES["hll_users_rollup_grains"](spark, oracle_sf_dir).collect()
    grains = {r["grain"] for r in rows}
    assert grains == {"day", "month", "total"}
    for r in rows:
        assert r["est_within_bound"], dict(r.asDict())
        assert r["union_matches_direct"], dict(r.asDict())

    e = load_table(spark, oracle_sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id")
    got = {(r["grain"], r["bucket"]): r["exact_users"] for r in rows}
    total = du.agg(F.countDistinct("user_id").alias("n")).first()["n"]
    assert got[("total", "all")] == total
    for r in du.groupBy(
        F.date_trunc("month", "day").cast("date").alias("m")
    ).agg(F.countDistinct("user_id").alias("n")).collect():
        assert got[("month", str(r["m"]))] == r["n"], r


def test_hll_rolling_7d_vs_exact(spark, oracle_sf_dir):
    """Per-day bound flags TRUE, <=7 sketches merged per day, and the
    embedded exact trailing-7d distincts must equal the independent exact
    query events_rolling_7d_distinct_users."""
    est = {
        r["day"]: r
        for r in QUERIES["hll_rolling_7d_users"](spark, oracle_sf_dir).collect()
    }
    exact = {
        r["day"]: r["users_7d"]
        for r in QUERIES["events_rolling_7d_distinct_users"](
            spark, oracle_sf_dir
        ).collect()
    }
    assert set(est) == set(exact)
    for day, r in est.items():
        assert 1 <= r["n_days_merged"] <= 7
        assert r["est_within_bound"], dict(r.asDict())
        assert r["exact_users_7d"] == exact[day], (day, r["exact_users_7d"], exact[day])


def test_cms_one_sided_error_and_coverage(spark, oracle_sf_dir):
    """CMS never underestimates (est >= exact), and with depth=4 x width=256
    over ~150 keys the top-20 estimates should sit close to exact counts
    (collision inflation bounded: width >> keys => expected overshoot
    e*N/w per row, min over 4 rows tightens it further)."""
    from k_means_map_reduce_spark.sources import load_table

    n_events = load_table(spark, oracle_sf_dir, "events").count()
    rows = QUERIES["sketch_cms_heavy_hitters"](spark, oracle_sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est_count"] >= r["exact_count"], r
        # CMS error is ADDITIVE, not relative: est <= exact + eps*N with
        # eps = e/width per row, and the min over depth=4 rows makes
        # exceeding even one row's bound vanishingly unlikely.
        assert r["est_count"] <= r["exact_count"] + (3 * n_events) / 256, r


def test_kmv_estimate_bounds(spark, oracle_sf_dir):
    """KMV with k=32 has relative std error ~1/sqrt(k-1) ~ 18%; assert a
    3-sigma bound, exactness below k, and that the merged ALL row >= any
    single type's exact count."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["sketch_kmv_distinct_users"](spark, oracle_sf_dir).collect()
    }
    assert "ALL" in rows
    for t, r in rows.items():
        if r["exact_distinct"] <= 32:
            assert r["est_distinct"] == float(r["exact_distinct"]), r
        else:
            rel = abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
            assert rel < 0.55, (t, r)
    assert rows["ALL"]["exact_distinct"] >= max(
        r["exact_distinct"] for t, r in rows.items() if t != "ALL"
    )
