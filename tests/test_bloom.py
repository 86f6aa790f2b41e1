"""Bloom-filtered semi-join: exactness, FPR bound, and plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from k_means_map_reduce_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_words,
)
from k_means_map_reduce_spark.plans.checks import plan_report
from k_means_map_reduce_spark.registry import QUERIES
from k_means_map_reduce_spark.sources import load_table


def test_bloom_no_false_negatives(spark):
    """Every inserted key must probe positive — the exactness precondition."""
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom_words(keys, "k", num_bits=1 << 13)
    hits = keys.where(bloom_might_contain(F.col("k"), words)).count()
    assert hits == 500


def test_bloom_false_positive_rate_bound(spark):
    """FPR on a disjoint probe set stays within ~2x the theoretical
    (1 - e^{-kn/m})^k for n=500 keys, m=2^13 bits, k=5."""
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom_words(keys, "k", num_bits=1 << 13)
    # Probe keys structurally disjoint from the inserted arithmetic sequence.
    probes = spark.range(0, 20000).select((F.col("id") * 7 + 4).alias("k"))
    fp = probes.where(bloom_might_contain(F.col("k"), words)).count()
    n, m, k = 500, 1 << 13, 5
    theoretical = (1 - math.exp(-k * n / m)) ** k
    assert fp / 20000 <= max(2 * theoretical, 0.02), (fp / 20000, theoretical)


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    """The bloom path must be EXACT: identical rows to the unfiltered
    left-semi join (false positives removed by the join, no false negs)."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 8000)
    orders = load_table(spark, sf_dir, "orders")
    got = {
        r["o_orderkey"]
        for r in bloom_semi_join(orders, cust, "o_custkey", "c_custkey")
        .select("o_orderkey")
        .collect()
    }
    want = {
        r["o_orderkey"]
        for r in orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"], "left_semi"
        )
        .select("o_orderkey")
        .collect()
    }
    assert got == want and len(want) > 0


def test_bloom_probe_pushed_below_shuffle(spark, sf_dir):
    """The membership probe must sit in a Filter BELOW the semi-join's
    exchange (prune-then-shuffle is the whole point), and the join must be
    the hinted shuffled hash join, not a broadcast."""
    df = QUERIES["bloom_semi_join_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "LeftSemi" in plan, plan[:2000]
    join_at = plan.index("ShuffledHashJoin")
    assert "xxhash64" in plan[join_at:], "bloom probe filter not below the join"
    r = plan_report(df)
    assert not r.has_python_row_udf


def test_bloom_words_memo_keys_by_sf_dir(spark):
    """The memoized filter words MUST track the sf_dir: reusing one dir's
    words for another's key set would introduce false NEGATIVES (keys
    absent from the stale filter get wrongly pruned before the exact
    join) — a correctness bug, not a perf one. Run the query on two dirs
    in one session and check each against its own plain semi-join."""
    from k_means_map_reduce_spark.sources import load_table
    from pyspark.sql import functions as F

    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = {r["o_orderkey"] for r in QUERIES["bloom_semi_join_orders"](spark, d).collect()}
        cust = load_table(spark, d, "customer").where(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
        )
        orders = load_table(spark, d, "orders")
        want = {
            r["o_orderkey"]
            for r in orders.join(
                cust, orders["o_custkey"] == cust["c_custkey"], "left_semi"
            ).collect()
        }
        assert got == want, f"bloom words aliased across sf_dirs at {d}"
