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

# Dimension to unroll into a flat codegen expression chain, for OPT-IN call
# sites (r13 optimization round). Spark's higher-order functions
# (aggregate/zip_with) are CodegenFallback: the lambda is interpreted PER
# ELEMENT, so a fold over a 64-dim vector is far slower than the same
# arithmetic inside whole-stage codegen. For a known dim we can emit the
# identical computation as an element_at expression chain. BIT-IDENTICAL by
# construction: the chain starts from the same `0.0` literal and adds terms
# in the same left-associated order as the fold — every IEEE addition is the
# same operation on the same values (Catalyst does not reassociate double
# arithmetic and only constant-folds all-literal subtrees, so `0.0 + t1`
# survives as written). Inputs with any other length (or NULL arrays — size
# returns NULL, the guard is not satisfied) take the original fold branch.
#
# Why OPT-IN and not the default: the unrolled tree is ~130 expression nodes
# per dot (vs ~10 for the fold), and MEASURED driver-side planning cost
# grows superlinearly with it — an unrolled cosine_similarity (3 chains + a
# duplicated-denominator CASE WHEN) added ~1.9 s of per-run planning time,
# dwarfing the execution win for every consumer whose pair count is small.
# The unroll pays only where pair volume is large (ml_knn_label_confusion:
# ~1M pairs/run); everywhere else the fold stays (guide §1.2: fix the
# algorithm where the time actually is).
UNROLL_DIM = 64  # the embeddings dim across all SFs (checked in tests)


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def _chain_sum(terms) -> Column:
    """((0.0 + t1) + t2) + ... — the exact addition sequence of
    F.aggregate(_, lit(0.0), (acc, x) -> acc + x)."""
    acc = F.lit(0.0)
    for t in terms:
        acc = acc + t
    return acc


def _with_unrolled(fold: Column, guard_arrays: list[Column], term) -> Column:
    """Wrap `fold` with a size-guarded unrolled fast path for UNROLL_DIM.

    `term(i)` yields the i-th (1-indexed) element term; element_at is only
    evaluated under the size guard, so ANSI out-of-bounds errors cannot
    fire on the fallback path.
    """
    guard = None
    for arr in guard_arrays:
        g = F.size(arr) == UNROLL_DIM
        guard = g if guard is None else (guard & g)
    un = _chain_sum(term(i) for i in range(1, UNROLL_DIM + 1))
    return F.when(guard, un).otherwise(fold)


def _elem(arr: Column, i: int) -> Column:
    # Cast the SCALAR element, not the array: element_at(cast(arr), i) would
    # re-evaluate the whole-array cast (an allocation) once per term.
    # float→double is exact, so the value is identical to reading the i-th
    # element of the cast array.
    return F.element_at(arr, i).cast("double")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_unrolled(a: Column, b: Column) -> Column:
    """`dot` with the UNROLL_DIM codegen fast path — value-identical;
    opt in only where pair volume justifies the planning cost."""
    return _with_unrolled(
        dot(a, b), [a, b], lambda i: _elem(a, i) * _elem(b, i)
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_norm_unrolled(a: Column) -> Column:
    """`l2_norm` with the UNROLL_DIM codegen fast path — value-identical."""
    fold = F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(
        _with_unrolled(fold, [a], lambda i: _elem(a, i) * _elem(a, i))
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
