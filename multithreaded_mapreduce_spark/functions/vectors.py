"""Vector math over ``array<float>`` columns as pure Column expressions
(higher-order functions — JVM-side, no Python UDF, survives codegen).

Dot products and norms fold through DECIMAL(30,20) so the sum is exact
and order-independent: a DuckDB oracle summing unnested elements in any
order produces the bit-identical double. Per-element float→double→
decimal conversion is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC20 = "decimal(30,20)"


def _fold_sum(arr: Column) -> Column:
    """Exact decimal sum of a decimal array, returned as double."""
    return F.aggregate(
        arr,
        F.lit(0).cast(DEC20),
        lambda acc, x: (acc + x).cast(DEC20),
    ).cast("double")


def dot_exact(a: Column | str, b: Column | str) -> Column:
    """Exact dot product of two float-array columns, as double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC20))
    )


def norm_sq_exact(a: Column | str) -> Column:
    """Exact squared L2 norm of a float-array column, as double."""
    a = F.col(a) if isinstance(a, str) else a
    return _fold_sum(
        F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(DEC20))
    )


def cosine_exact(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with exact-sum dot/norms; the final divide and
    sqrt are single IEEE ops, identical across engines."""
    return dot_exact(a, b) / (F.sqrt(norm_sq_exact(a)) * F.sqrt(norm_sq_exact(b)))


def _fold_sum_fast(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def cosine_fast(a: Column | str, b: Column | str) -> Column:
    """Plain double-precision cosine — ~100× cheaper than the decimal
    fold but with order-dependent rounding, so NOT oracle-stable. Use it
    to pre-rank, then rescore the survivors with ``cosine_exact``: the
    exact/fast disagreement (~1e-15 relative) is orders of magnitude
    below any real ranking gap, so a modest rescore buffer makes the
    two-phase result identical to scoring everything exactly."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = _fold_sum_fast(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))
    nsq_a = _fold_sum_fast(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    nsq_b = _fold_sum_fast(F.transform(b, lambda x: x.cast("double") * x.cast("double")))
    return dot / (F.sqrt(nsq_a) * F.sqrt(nsq_b))
