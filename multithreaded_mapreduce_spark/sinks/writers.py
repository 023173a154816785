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


def zorder_value(
    df: DataFrame,
    cols: tuple[str, str],
    *,
    bits: int = 8,
    rel_error: float = 0.001,
) -> F.Column:
    """Z-order (Morton) key over two numeric columns: each column is
    quantile-bucketed into ``2**bits`` ranks, and the rank bits are
    interleaved so nearby z-values are nearby in BOTH dimensions.

    Quantile boundaries come from one distributed ``approxQuantile``
    pass (driver receives ``2**bits - 1`` doubles per column — tiny);
    the per-row bucket index and the bit interleave are pure codegen
    expressions (a fold over the boundary array + unrolled bitwise
    ops), so the hot path never leaves the JVM. NULLs rank first
    (bucket 0), matching NULLS FIRST sort order.
    """
    n_bounds = (1 << bits) - 1
    probs = [i / (n_bounds + 1) for i in range(1, n_bounds + 1)]
    ranks = []
    for c in cols:
        bounds = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
            c, probs, rel_error
        )
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        v = F.col(c).cast("double")
        # bucket = #boundaries <= v; NULL comparisons yield false → 0
        ranks.append(
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
            )
        )
    x, y = (r.cast("long") for r in ranks)
    one = F.lit(1).cast("long")
    # Column.bitwiseOR/AND: Python's &/| on Columns are BOOLEAN ops
    z = F.lit(0).cast("long")
    for i in range(bits):  # statically unrolled interleave
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(one), 2 * i + 1))
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_by: tuple[str, str],
    *,
    num_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Parquet sink clustered on a Z-ORDER of two columns — the
    multi-dimensional completion of :func:`write_clustered_parquet`.

    Linear clustering gives tight per-file min/max on ONE key and the
    full value range on every other; z-ordering makes each file a
    small rectangle in (a, b) space, so footer-stats skipping works
    for predicates on EITHER dimension (the Delta/Iceberg ``OPTIMIZE
    ZORDER BY`` layout, expressed with stock Spark: quantile-rank →
    bit-interleave → range-repartition → in-file sort). At 100 TB the
    cost is one approxQuantile pass plus the same shuffle the linear
    cluster writer already pays; the win is every ad-hoc query that
    filters on the second dimension."""
    z = zorder_value(df, zorder_by, bits=bits).alias("_z")
    out = df.withColumn("_z", z).repartitionByRange(num_files, "_z")
    (
        out.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


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
