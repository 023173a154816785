"""Numeric helpers for oracle-stable floating aggregates.

Summing doubles is order-dependent (Spark's partial aggregates add in
partition order, DuckDB in scan order), so ``round(sum(x), 2)`` can
still flip at a rounding boundary. The engine instead casts each value
to ``DECIMAL(30,6)`` — exact for 2-decimal money values stored as
doubles — sums exactly in decimal, then casts back to double and
rounds. The result is bit-identical across engines and partitionings.

Matching DuckDB oracle pattern::

    round(CAST(sum(CAST(expr AS DECIMAL(30,6))) AS DOUBLE), 2)

Scale note: decimal aggregation stays inside whole-stage codegen
(Spark's ``Sum`` over ``DecimalType`` uses long-backed Decimal128
arithmetic) — the overhead vs double sums is small and it buys
deterministic results, which a 1000-executor run needs even more than
a local one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,6)"


def dround(col: Column | str, scale: int = 2) -> Column:
    """Per-row oracle-stable rounding of a double expression.

    ``round(double, 2)`` itself diverges between engines: Spark rounds
    the shortest decimal representation (HALF_UP on "38969.325"),
    DuckDB rounds the binary double (38969.32499999... → .32). Snapping
    to DECIMAL(30,6) first recovers the exact money value, after which
    both engines round identically. Oracle pattern::

        CAST(round(CAST(x AS DECIMAL(30,6)), 2) AS DOUBLE)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast(DEC), scale).cast("double")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum of a double expression, rounded to ``scale``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale)


def davg(col: Column | str, scale: int = 4) -> Column:
    """Exact-sum average of a double expression, rounded to ``scale``.

    Computed as decimal-sum / count so both engines divide the same two
    exact numbers. Oracle: ``round(CAST(sum(CAST(x AS DECIMAL(30,6)))
    AS DOUBLE) / count(x), 4)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)
