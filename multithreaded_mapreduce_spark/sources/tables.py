"""Parquet table sources for the driver's synthetic star schema.

Schemas are self-describing (Parquet footers) — the engine does no
inference of its own, mirroring how the reference's schema is fixed
rather than discovered (reference ``1.cpp:18-35``: two hard-coded
structs). Reading through ``spark.read.parquet`` keeps column pruning
and predicate pushdown available to every downstream query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins at any SF
# (region=5 rows, nation=25 rows at every scale; customer/supplier/part
# scale but stay orders of magnitude below the fact tables).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; available: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    read as a timestamp (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    truncate to microseconds — the same ns→µs truncation DuckDB applies
    when it casts to its native µs TIMESTAMP, so oracle comparisons see
    identical values."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so queries can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
