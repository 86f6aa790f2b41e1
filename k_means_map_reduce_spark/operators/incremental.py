"""Incremental aggregate maintenance (materialized-view upkeep).

The 100 TB problem: a daily rollup over an append-mostly fact should cost
O(|new batch|) per refresh, not a full recompute. For additive aggregates
(sum/count — and anything expressible over them: avg, ratios), maintenance
is: aggregate the BATCH, then combine with the existing state on the group
key. Only state rows whose keys appear in the batch change, so the combine
splits the state with a broadcast semi/anti join on the (small) batch key
set and re-aggregates just `touched ∪ batch_agg` — the untouched majority
of the state is passed through untouched (and with a partitioned state
table, never rewritten: copy-on-write via sources/sinks.merge_upsert).

`incremental_daily_rollup` registers the whole protocol as an ORACLED
query: it replays the fact in 4 deterministic batches through the
maintenance path, and DuckDB recomputes the same rollup in one shot — the
incremental path must land bit-identical to the direct aggregate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from ._util import dsum, sql_dsum


_KEYS = ["day", "user_id"]


def _agg_batch(batch: DataFrame) -> DataFrame:
    """Per-batch partial state: decimal sums keep later combines exact
    (decimal addition is associative — double addition is not)."""
    return batch.select(
        F.to_date("ts").alias("day"), "user_id", "value"
    ).groupBy(*_KEYS).agg(
        F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def combine_additive(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a batch's partial aggregate into the maintained state.

    Broadcast the delta's key set; state rows not in it survive verbatim
    (no shuffle — at scale: no rewrite), the touched slice re-aggregates
    with the delta."""
    delta_keys = delta.select(*_KEYS).distinct()
    untouched = state.join(F.broadcast(delta_keys), _KEYS, "left_anti")
    touched = state.join(F.broadcast(delta_keys), _KEYS, "left_semi")
    merged = (
        touched.unionByName(delta)
        .groupBy(*_KEYS)
        .agg(
            F.sum("sum_value").alias("sum_value"),
            F.sum("n_events").alias("n_events"),
        )
    )
    return untouched.unionByName(merged)


@query(
    "incremental_daily_rollup",
    oracle=f"""
    SELECT
      CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      user_id,
      {sql_dsum('value')} AS sum_value,
      COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, user) rollup maintained through 4 incremental refreshes.

    The fact is split into 4 deterministic batches (event_id % 4 — stands
    in for 4 ingest cycles); each folds into the state via
    combine_additive. The result must equal DuckDB's one-shot aggregate
    bit-for-bit: incremental maintenance may never drift from recompute.
    """
    e = load_table(spark, sf_dir, "events")
    batches = [e.where(F.col("event_id") % 4 == i) for i in range(4)]
    # Persist each fold's state: a real refresh loop MATERIALIZES state
    # between cycles (parquet/table) — and lazily, every fold would
    # re-derive the prior state twice (anti + semi branch), doubling the
    # recomputed subtree per refresh.
    state = reduce(
        lambda st, d: combine_additive(st, d).persist(),
        (_agg_batch(b) for b in batches[1:]),
        _agg_batch(batches[0]).persist(),
    )
    return state.select(
        F.col("day").cast("string").alias("day"),
        "user_id",
        F.col("sum_value").cast("double").alias("sum_value"),
        "n_events",
    )


@query(
    "incremental_scd2_dimension",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    ),
    v2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 11 = 0 THEN 'MIGRATED'
                  ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN ROUND(c_acctbal + 100.0, 2)
                  ELSE c_acctbal END AS c_acctbal
      FROM customer
    ),
    changed AS (
      SELECT v1.c_custkey
      FROM v1 JOIN v2 USING (c_custkey)
      WHERE v1.c_mktsegment != v2.c_mktsegment
         OR v1.c_acctbal != v2.c_acctbal
    )
    SELECT c_custkey, c_mktsegment, c_acctbal,
           '2024-01-01' AS valid_from, '2024-02-01' AS valid_to,
           FALSE AS is_current
    FROM v1 WHERE c_custkey IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           '2024-02-01', '9999-12-31', TRUE
    FROM v2 WHERE c_custkey IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           '2024-01-01', '9999-12-31', TRUE
    FROM v1 WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
    """,
)
def incremental_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build: given yesterday's dimension
    snapshot (v1) and today's source extract (v2, derived
    deterministically — segment migration for custkey%11, balance posting
    for custkey%7), emit the versioned dimension: changed keys get their
    old row CLOSED (valid_to = load date) plus a new open row; unchanged
    keys keep one open row. This is the warehouse-standard history
    mechanism behind join_scd2_order_segment's as-of lookups.

    Scale shape: change detection is one key-partitioned join comparing
    attribute values (at scale, fingerprints — see snapshot_diff_orders;
    here fields compare directly so the oracle is trivially identical);
    the three output branches are projections of the two snapshots
    semi/anti-joined against the small changed-key set — no row ever
    shuffles more than once, and history grows only by the change rate.
    """
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    v2 = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 11 == 0, "MIGRATED")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(
            F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    n2 = v2.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg2"),
        F.col("c_acctbal").alias("bal2"),
    )
    changed = (
        v1.join(n2, F.col("c_custkey") == F.col("k"))
        .where(
            (F.col("c_mktsegment") != F.col("seg2"))
            | (F.col("c_acctbal") != F.col("bal2"))
        )
        .select("c_custkey")
    )
    closed = v1.join(changed, "c_custkey").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit("2024-02-01").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = v2.join(changed, "c_custkey").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-02-01").alias("valid_from"),
        F.lit("9999-12-31").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    unchanged = v1.join(changed, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit("9999-12-31").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionAll(opened).unionAll(unchanged)
