"""Multi-format source connectors: CSV, JSON-lines, ORC, and XML.

The reference reads exactly one format — whitespace-delimited text via
``fscanf`` (reference ``1.cpp:260``); the engine's native format is
the driver's parquet. This module proves format-independence: each
table can be staged into CSV/JSON/ORC once (a derived copy under the
system temp dir — /root/testdata is read-only) and read back through
Spark's built-in connectors with an EXPLICIT schema, after which every
downstream plan is byte-identical to the parquet path.

Scale notes: explicit schemas mean no inference pre-scan (inference
reads the whole input once before the real scan — a 2× cost at 100 TB).
CSV and JSON are row-formats with no column pruning or predicate
pushdown, so the scan reads everything regardless of the query — the
connectors exist for ingest; analytics should land in a columnar
format immediately. ORC keeps pushdown/pruning like parquet. Doubles
round-trip via Java's shortest-round-trip formatting; timestamps carry
an explicit micro-second format so no precision is silently dropped.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def staged_format_path(sf_dir: str, table: str, fmt: str) -> str:
    tag = hashlib.md5(f"{sf_dir}:{table}:{fmt}".encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"mmr_spark_fmt_{tag}_{table}_{fmt}")


def ensure_staged(spark: SparkSession, sf_dir: str, table: str, fmt: str) -> str:
    """Write the parquet table as ``fmt`` once; idempotent."""
    path = staged_format_path(sf_dir, table, fmt)
    if os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    ):
        return path
    df = load_table(spark, sf_dir, table)
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).option("timestampFormat", TS_FMT).csv(path)
    elif fmt == "json":
        writer.option("timestampFormat", TS_FMT).json(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "xml":
        # Spark 4 native XML writer (no external package); timestamps
        # carry the same explicit format as CSV/JSON
        writer.option("rootTag", "rows").option("rowTag", "row").option(
            "timestampFormat", TS_FMT
        ).format("xml").save(path)
    else:  # pragma: no cover
        raise ValueError(f"unsupported format {fmt!r}")
    return path


def read_staged(spark: SparkSession, sf_dir: str, table: str, fmt: str) -> DataFrame:
    """Read the staged copy back with the parquet table's exact schema."""
    path = ensure_staged(spark, sf_dir, table, fmt)
    schema = load_table(spark, sf_dir, table).schema
    reader = spark.read.schema(schema)
    if fmt == "csv":
        return reader.option("header", True).option("timestampFormat", TS_FMT).csv(path)
    if fmt == "json":
        return reader.option("timestampFormat", TS_FMT).json(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "xml":
        return (
            reader.option("rowTag", "row")
            .option("timestampFormat", TS_FMT)
            .format("xml")
            .load(path)
        )
    raise ValueError(f"unsupported format {fmt!r}")  # pragma: no cover
