"""Vector math as Catalyst Column expressions (no Python UDFs).

The reference computes Euclidean distance row-at-a-time in interpreted Python,
hard-coded to 2-D (/root/reference/mapper.py:26-30, master.py:90-94). These
are the N-dimensional equivalents as SQL higher-order functions: they run
JVM-side inside whole-stage codegen, so distance math on a billion rows never
crosses the Python boundary.

All functions accept array<float>/array<double> columns; floats are cast to
double before accumulating so results are precision-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def sq_euclidean(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (what K-Means minimizes; avoids the sqrt)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
