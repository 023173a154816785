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


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: tuple[str, ...],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink clustered on ``cluster_by``: range-repartition so
    each output file owns a contiguous key range, then sort within
    each file so row groups carry tight min/max statistics.

    This is the layout half of data skipping: parquet footers record
    per-column min/max per row group, and a reader's pushed-down
    predicate on the cluster key then skips whole files/row groups
    whose range can't match. On a 100 TB time-partitioned table this —
    not the filter evaluation itself — is what turns a one-day query
    into a one-partition scan. (Same idea as Delta/Iceberg OPTIMIZE
    ZORDER restricted to one dimension, expressed with stock Spark.)
    """
    out = df.repartitionByRange(*(cluster_by if num_files is None else (num_files, *cluster_by)))
    out.sortWithinPartitions(*cluster_by).write.mode(mode).parquet(path)


def compact_parquet(
    df: DataFrame,
    path: str,
    *,
    target_files: int,
    mode: str = "overwrite",
) -> None:
    """Small-file compaction: rewrite a (possibly thousand-file)
    relation into ``target_files`` evenly sized parquet files.

    Streaming sinks and over-parallel writers leave file counts that
    make listing + task scheduling the dominant cost of every later
    scan; periodic compaction is standard corpus-pipeline hygiene.
    The round-robin ``repartition`` (not ``coalesce``) buys even file
    sizes — coalesce would glue unbalanced input splits into unbalanced
    outputs and can starve upstream parallelism by collapsing the
    whole preceding stage to ``target_files`` tasks."""
    df.repartition(target_files).write.mode(mode).parquet(path)
