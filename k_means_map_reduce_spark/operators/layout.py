"""Data-layout operators: Z-order clustering for multi-dimensional skipping.

See functions/zorder.py for the key construction. `zorder_write` is the
write-side entry (repartitionByRange on the key + sortWithinPartitions →
every parquet file covers a small Z-curve segment, so min/max row-group
stats stay tight on BOTH dimensions); `events_zorder_keys` registers the
key computation itself as an oracled query (DuckDB recomputes the exact
interleave), which pins the bit-level layout contract cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table
from ..functions.zorder import (
    interleave_bits_sql,
    rank32_sql,
    zorder_key,
)


def zorder_write(
    df: DataFrame, path: str, x_col: str, y_col: str, num_files: int = 8
) -> None:
    """Write df parquet-clustered along the (x_col, y_col) Z-curve.

    One cheap agg for global bounds, one range-partitioning shuffle on the
    key (range, not hash: neighboring curve segments land in the same file),
    an in-partition sort so row groups inside each file stay tight too.
    At 100 TB this is the OPTIMIZE ZORDER pass run after ingest; bounds come
    from table stats instead of the agg."""
    b = df.agg(
        F.min(x_col).alias("xlo"),
        F.max(x_col).alias("xhi"),
        F.min(y_col).alias("ylo"),
        F.max(y_col).alias("yhi"),
    )
    keyed = df.crossJoin(F.broadcast(b)).withColumn(
        "_zkey",
        zorder_key(
            F.col(x_col), F.col("xlo"), F.col("xhi"),
            F.col(y_col), F.col("ylo"), F.col("yhi"),
        ),
    ).drop("xlo", "xhi", "ylo", "yhi")
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


@query(
    "events_zorder_keys",
    oracle=f"""
    WITH b AS (
      SELECT MIN(user_id) AS xlo, MAX(user_id) AS xhi,
             MIN(value) AS ylo, MAX(value) AS yhi
      FROM events
    ),
    ranked AS (
      SELECT e.event_id,
             {rank32_sql('e.user_id', 'b.xlo', 'b.xhi')} AS rx,
             {rank32_sql('e.value', 'b.ylo', 'b.yhi')} AS ry
      FROM events e CROSS JOIN b
    )
    SELECT event_id, {interleave_bits_sql('rx', 'ry')} AS zkey
    FROM ranked
    """,
)
def events_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key per event over (user_id, value) — the clustering key
    `zorder_write` sorts by, hash-compared bit-for-bit against DuckDB's
    recomputation (64 unrolled shift/mask terms must agree exactly)."""
    e = load_table(spark, sf_dir, "events")
    b = e.agg(
        F.min("user_id").alias("xlo"),
        F.max("user_id").alias("xhi"),
        F.min("value").alias("ylo"),
        F.max("value").alias("yhi"),
    )
    return (
        e.crossJoin(F.broadcast(b))
        .select(
            "event_id",
            zorder_key(
                F.col("user_id"), F.col("xlo"), F.col("xhi"),
                F.col("value"), F.col("ylo"), F.col("yhi"),
            ).alias("zkey"),
        )
    )
