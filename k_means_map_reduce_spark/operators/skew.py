"""Skew-mitigation utilities (SURVEY.md 'hard parts': skewed keys at scale).

Two standard remedies, expressed as reusable DataFrame transforms:

1. ``salted_aggregate`` — two-phase aggregation: salt the group key with a
   random suffix, partially aggregate (spreads one hot key over N reducers),
   then aggregate the partials. For algebraic aggregates (count/sum/min/max)
   the result is EXACTLY the plain aggregation — tests assert equality.

2. AQE skew-join splitting is enabled in session.py
   (spark.sql.adaptive.skewJoin.enabled): oversized shuffle partitions are
   split at runtime. salting remains for aggregations and for joins whose
   skew AQE can't see (e.g. broadcast-ineligible dimension explosion).

Note Spark's map-side partial aggregation already absorbs *moderate* skew;
salting matters when a single key's partials overflow the reduce task (think
the empty-string document hash owning 1% of 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    aggs: output_name -> (input_col, fn) with fn in {count,sum,min,max}.
    Phase 1 groups by (group_cols + salt) — the hot key fans out over
    n_salts reduce partitions; phase 2 merges partials with the algebraic
    combiner (count→sum of counts, sum→sum, min→min, max→max).
    """
    combiners = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    firsts = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (_col, fn) in aggs.items():
        if fn not in combiners:
            raise ValueError(f"{name}: {fn} is not algebraic; cannot salt")

    salted = df.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    phase1 = salted.groupBy(*group_cols, "_salt").agg(
        *[firsts[fn](c).alias(name) for name, (c, fn) in aggs.items()]
    )
    phase2 = phase1.groupBy(*group_cols).agg(
        *[combiners[fn](name).alias(name) for name, (_c, fn) in aggs.items()]
    )
    return phase2


def salted_join_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, Column]:
    """Prepare a skew-safe equi-join: salt the big side's key randomly and
    replicate the small side across all salts. Join on (key, salt); the hot
    key's rows spread over n_salts tasks. Returns (big', small', condition).
    """
    big_salted = big.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    cond = (big_salted[key] == small_rep[key]) & (
        big_salted["_salt"] == small_rep["_salt"]
    )
    return big_salted, small_rep, cond


from pyspark.sql import SparkSession  # noqa: E402

from ..registry import query  # noqa: E402
from ..sources import load_table  # noqa: E402


@query(
    "skew_salted_event_type_stats",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      ROUND(MAX(value), 6) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation path as a driver-checked query: per-event-type
    stats computed through ``salted_aggregate`` — event_type is the
    textbook hot key (5 distinct values across the whole stream, so a
    plain groupBy funnels ~20% of ALL rows into each of 5 reduce tasks no
    matter how many executors exist). Salting fans each type over 16
    partial groups first; the merge then combines 5x16 partials.

    Exactness: counts and maxes are trivially salt-invariant; the value sum
    is salted as DECIMAL(18,6), so re-associating partials cannot change
    the result (the float-determinism contract extends through the
    two-phase plan). The oracle is the direct one-phase aggregation —
    equality IS the correctness claim for the rewrite.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.lit(1).alias("one"),
        F.round("value", 6).cast("decimal(18,6)").alias("dv"),
        "value",
    )
    res = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": ("one", "count"),
            "total_value": ("dv", "sum"),
            "max_value": ("value", "max"),
        },
        n_salts=16,
    )
    return res.select(
        "event_type",
        "n",
        F.col("total_value").cast("double").alias("total_value"),
        F.round("max_value", 6).alias("max_value"),
    )
