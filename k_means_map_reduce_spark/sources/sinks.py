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


def merge_upsert(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """MERGE/upsert semantics without a table format: updates win on key
    collision, unmatched base rows survive, new keys append.

    The Delta/Iceberg MERGE INTO pattern reduced to its relational core —
    a keyed anti-join + union:
        result = updates ∪ (base ⟂ updates on key)
    Copy-on-write at scale: only partitions containing touched keys need
    rewriting when combined with write_partitioned (partition-prune the
    anti-join on the partition column). The anti-join shuffles just the
    keys of base against the (usually much smaller, broadcastable) update
    set; no window, no row_number.
    """
    from pyspark.sql import functions as F

    surviving = base.join(F.broadcast(updates.select(*key_cols)), key_cols, "left_anti")
    return surviving.unionByName(updates)


def merge_upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """Copy-on-write MERGE into an existing parquet dataset.

    Reads the current snapshot WITH ITS OWN schema, merges, writes to a
    sibling staging dir, then swaps — the write never reads from the
    directory it is replacing (Spark cannot overwrite an input in-flight).
    The swap is a filesystem rename: atomic on POSIX/HDFS; object stores
    would use a manifest commit instead (what table formats exist for).
    """
    import os
    import shutil
    import uuid

    base = spark.read.parquet(path)
    merged = merge_upsert(base, updates, key_cols)
    staging = f"{path}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
