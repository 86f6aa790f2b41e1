"""Sketch accuracy bounds vs exact (oracled) answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_map_reduce_spark.registry import QUERIES
from k_means_map_reduce_spark.sources import load_table


def test_approx_distinct_within_rsd(spark, oracle_sf_dir):
    l = load_table(spark, oracle_sf_dir, "lineitem")
    exact = l.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).collect()[0]
    approx = QUERIES["approx_distinct_counts"](spark, oracle_sf_dir).collect()[0]
    for a, e in [
        (approx["approx_orders"], exact["o"]),
        (approx["approx_parts"], exact["p"]),
        (approx["approx_supps"], exact["s"]),
    ]:
        assert abs(a - e) / e < 0.05, f"approx {a} vs exact {e}"


def test_approx_percentile_close_to_exact(spark, oracle_sf_dir):
    l = load_table(spark, oracle_sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["m"], r["p"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("m"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p"),
        )
        .collect()
    }
    approx = {
        r["l_returnflag"]: (r["approx_median"], r["approx_p95"])
        for r in QUERIES["approx_percentiles"](spark, oracle_sf_dir).collect()
    }
    for flag, (em, ep) in exact.items():
        am, ap = approx[flag]
        assert abs(am - em) / em < 0.02
        assert abs(ap - ep) / ep < 0.02
