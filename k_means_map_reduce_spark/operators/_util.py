"""Shared helpers for oracle-exact aggregation.

Cross-engine float determinism (registry docstring): double sums are computed
as DECIMAL(18,4) sums (exact, order-insensitive) cast back to double, and
averages as that exact sum divided by the count (IEEE division of identical
operands is deterministic). This makes Spark and DuckDB bit-identical without
relying on either engine's summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str) -> Column:
    """Exact decimal sum of a double column, returned as double.

    ROUND(x, 6) first: the test data's doubles carry ≤6 decimal digits (prices
    ×2dp, rates ×2dp), so their products are exactly representable at scale 6
    and never sit near a rounding tie — both engines round to the identical
    decimal, and the decimal sum is exact and order-insensitive. (Scale 4
    fails: products land exactly on .00005 ties, where Spark rounds on the
    exact binary expansion but DuckDB rounds in double arithmetic.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c, 6).cast("decimal(18,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of dsum."""
    return f"CAST(SUM(CAST(ROUND(({expr}), 6) AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB mirror of davg."""
    return f"{sql_dsum(expr)} / COUNT({expr})"
