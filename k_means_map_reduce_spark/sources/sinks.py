"""Sinks: parquet/csv/json writers + bucketed tables for co-located joins.

The reference's sinks are per-reducer text files re-parsed by the next stage
(/root/reference/reducer.py:68-73, mapper.py:72-84). Spark equivalents are
one-liners; what's worth real code is the 100 TB layout decision:

- ``write_partitioned``: hive-style partition directories → partition
  pruning at read time (a filter on the partition column never touches
  other directories).
- ``write_bucketed``: pre-shuffled, bucket-by-key tables. Two tables
  bucketed by the same key into the same bucket count join WITHOUT a
  shuffle — the decisive layout for repeated fact-fact joins at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout; readers prune on partition_cols."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    Joins/aggregations keyed on bucket_col between tables with identical
    bucketing skip the exchange entirely (SortMergeJoin with zero shuffle) —
    verified by tests/test_sinks.py asserting no Exchange in the plan.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
