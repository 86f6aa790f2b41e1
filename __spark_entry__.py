"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``k_means_map_reduce_spark/``; this module only
wires it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from k_means_map_reduce_spark.registry import QUERIES, ORACLES  # noqa: E402
from k_means_map_reduce_spark.kmeans import kmeans_mllib  # noqa: E402
from k_means_map_reduce_spark.sources import load_table  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: K-Means over embeddings (the reference's one query),
    N-dimensional, via MLlib. Returns (cluster_id, size, center)."""
    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    return kmeans_mllib(emb, vec_col="embedding", k=8, max_iter=20, tol=1e-6, seed=42)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
