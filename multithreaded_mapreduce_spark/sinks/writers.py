"""Sinks: the reference's console formatter plus the file sinks a real
deployment writes to.

The reference's only sink prints ``word: count`` lines to stdout in
ascending key order (reference ``1.cpp:322-327``). ``format_console``
reproduces that byte-exactly for parity tests. The parquet/csv writers
are the production path: partitioned, overwrite-safe, and driven by the
DataFrameWriter so they inherit Spark's committer protocol (atomic task
commits, speculative-duplicate tolerance) — the property that matters
when 1000 executors write one table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_console(counts: DataFrame, key: str = "word", value: str = "cnt") -> list[str]:
    """Render ``key: value`` lines in ascending binary key order —
    byte-for-byte the reference's final print loop (``1.cpp:322-327``).

    Collects to the driver by design: a console sink is inherently
    driver-side and only used for parity fixtures (hundreds of rows),
    never for bulk data.
    """
    rows = counts.select(key, value).orderBy(F.col(key).asc()).collect()
    return [f"{r[0]}: {r[1]}" for r in rows]


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Parquet sink. ``partition_by`` produces hive-style directory
    partitioning — the layout that gives downstream readers partition
    pruning for free (a date/tenant-partitioned 100 TB table is only
    scannable because of this)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    """CSV sink for interchange with non-columnar consumers."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
