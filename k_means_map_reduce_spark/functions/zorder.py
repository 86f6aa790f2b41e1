"""Z-order (Morton) interleave for multi-dimensional data clustering.

Why this exists at 100 TB: parquet readers skip row groups via min/max
stats, but a sort on (a, b) only clusters a — filters on b alone skip
nothing. Writing files ordered by the bit-interleave of both columns keeps
BOTH min/max ranges narrow in every file, so selective filters on either
dimension (or both) prune most row groups. This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain deterministic column so
any `df.repartitionByRange(zkey).sortWithinPartitions(zkey).write` gets the
clustering with zero new machinery.

Everything is a codegen expression (shiftright/&/shiftleft unrolled over 32
bits) and fully deterministic, so the same key is recomputable by DuckDB —
`zorder_key_sql` emits the equivalent SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BITS = 31  # bits kept per dimension (2 dims -> 62-bit key; bit 63 stays
# clear because DuckDB's signed << raises on sign-bit overflow)


def _rank32(col: Column, lo: Column, hi: Column) -> Column:
    """Normalize a value into [0, 2^32) given its min/max — rank-free linear
    scaling (exact enough for clustering; ties only widen ranges, never
    corrupt results)."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col - lo).cast("double") / span).otherwise(F.lit(0.0))
    scaled = F.least(
        F.floor(frac * F.lit(float(1 << _BITS))).cast("long"),
        F.lit((1 << _BITS) - 1),
    )
    return F.greatest(scaled, F.lit(0).cast("long"))


def interleave_bits(x: Column, y: Column) -> Column:
    """Morton-interleave two 32-bit values: bit i of x -> bit 2i, bit i of
    y -> bit 2i+1. Unrolled to 64 codegen terms — constant-folded into one
    whole-stage-codegen projection, no UDF."""
    out = F.lit(0).cast("long")
    for i in range(_BITS):
        out = out.bitwiseOR(
            F.call_function(
                "shiftleft",
                F.call_function("shiftright", x, F.lit(i)).bitwiseAND(F.lit(1).cast("long")),
                F.lit(2 * i),
            )
        ).bitwiseOR(
            F.call_function(
                "shiftleft",
                F.call_function("shiftright", y, F.lit(i)).bitwiseAND(F.lit(1).cast("long")),
                F.lit(2 * i + 1),
            )
        )
    return out


def zorder_key(x: Column, x_lo: Column, x_hi: Column, y: Column, y_lo: Column, y_hi: Column) -> Column:
    """Z-order key for two numeric columns given their global bounds
    (compute bounds with one cheap agg, or read them from table stats)."""
    return interleave_bits(_rank32(x, x_lo, x_hi), _rank32(y, y_lo, y_hi))


def interleave_bits_sql(x: str, y: str) -> str:
    """DuckDB SQL equivalent of interleave_bits (for oracles)."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def rank32_sql(col: str, lo: str, hi: str) -> str:
    """DuckDB SQL equivalent of _rank32."""
    span = f"(CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE))"
    frac = f"(CASE WHEN {span} > 0 THEN (CAST({col} AS DOUBLE) - CAST({lo} AS DOUBLE)) / {span} ELSE 0.0 END)"
    scaled = f"LEAST(CAST(floor({frac} * {float(1 << _BITS)}) AS BIGINT), {(1 << _BITS) - 1})"
    return f"GREATEST({scaled}, 0)"
