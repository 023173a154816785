"""Schema-evolution reads: a table whose early files were written with
fewer columns must still be queryable as one relation — the everyday
reality of a long-lived 100 TB dataset whose producers add fields over
time.

The staged layout simulates it deterministically: even order keys are
written with the v1 4-column schema, odd keys with the full v2 schema,
into two directories of one logical table. ``mergeSchema`` unions the
parquet footers at planning time; rows from v1 files surface the
missing columns as NULL.

Scale notes: schema merge is a footer-only planning cost (no data
scan); reading stays columnar with pruning per file. The NULL backfill
is free — parquet's missing-column read path, not a computed default.

Extension surface (SURVEY.md §1.3): the reference's schema is fixed
at compile time (two hard-coded structs, reference 1.cpp:18-35);
evolution handling is engine-new.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

V1_COLS = ("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


def _staged_dirs(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    tag = hashlib.md5(f"{sf_dir}:orders:evolution".encode()).hexdigest()[:12]
    base = os.path.join(tempfile.gettempdir(), f"mmr_spark_evo_{tag}")
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    if not (os.path.isdir(v1) and os.path.isdir(v2)):
        orders = load_table(spark, sf_dir, "orders")
        orders.filter(F.col("o_orderkey") % 2 == 0).select(*V1_COLS).write.mode(
            "overwrite"
        ).parquet(v1)
        orders.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(v2)
    return v1, v2


@register(
    "schema_evolution_orders",
    oracle=f"""
SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-schema>' ELSE o_orderpriority END
         AS o_orderpriority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2) AS total_price
FROM orders
GROUP BY 1 ORDER BY o_orderpriority
""",
    description="One logical orders table read across two schema "
    "generations (4-column v1 files + full v2 files) via mergeSchema: "
    "v1 rows surface the later-added priority column as NULL, bucketed "
    "here as '<pre-schema>'. The merge is footer-only planning cost; "
    "scans stay columnar and pruned per file. Oracle simulates the "
    "generation split arithmetically on the original table.",
    tags=("source", "schema-evolution", "parquet"),
)
def schema_evolution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    v1, v2 = _staged_dirs(spark, sf_dir)
    merged = spark.read.option("mergeSchema", True).parquet(v1, v2)
    # bucket by GENERATION (key parity marks the v1 files), not by
    # coalescing NULLs: a v2 row whose priority is genuinely NULL must
    # stay a NULL group, exactly like the oracle's CASE — a plain
    # coalesce folded it into '<pre-schema>' (corrupted-orders sweep)
    generation = F.when(
        F.col("o_orderkey") % 2 == 0, F.lit("<pre-schema>")
    ).otherwise(F.col("o_orderpriority"))
    return (
        merged.groupBy(generation.alias("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2).alias(
                "total_price"
            ),
        )
        .orderBy("o_orderpriority")
    )
