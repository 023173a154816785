"""Reshaping and mutation operators: wide→long unpivot (melt) and a
declarative MERGE/upsert (SCD-1 style) over ``orders``.

The reference's output shape is fixed (word, count — SURVEY.md §1.1);
these cover the schema-reshaping surface: ``DataFrame.unpivot`` (the
inverse of the engine's ``pivot_orders_status``), and the
merge-without-a-lakehouse pattern — change capture expressed as a
keyed left join + coalesce + union, the shape every Delta/Iceberg
MERGE lowers to.

Scale notes: unpivot is a per-row flatMap (no shuffle — |measures|×
rows out of the already-aggregated summary). The merge joins base and
delta on the primary key — both sides hash-partition on o_orderkey,
which is exactly the plan a 100 TB MERGE runs (AQE picks broadcast
when the delta is small); inserts append via union, never a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC, dround, dsum
from ..plans.registry import register
from ..sources.tables import load_table

INS_KEY_OFFSET = 100_000_000


@register(
    "pricing_summary_unpivot",
    oracle=f"""
WITH wide AS (
  SELECT l_returnflag, l_linestatus,
         round(CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE), 2) AS sum_qty,
         round(CAST(sum(CAST(l_extendedprice AS {DEC})) AS DOUBLE), 2) AS sum_base_price,
         round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS DOUBLE), 2)
           AS sum_disc_price
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, measure, value FROM (
  SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, l_linestatus, 'sum_base_price', sum_base_price FROM wide
  UNION ALL
  SELECT l_returnflag, l_linestatus, 'sum_disc_price', sum_disc_price FROM wide
)
ORDER BY l_returnflag, l_linestatus, measure
""",
    description="Wide→long melt of the Q1-style pricing summary: three "
    "measure columns unpivoted into (measure, value) pairs — the exact "
    "inverse of the engine's pivot operator. Unpivot is a stateless "
    "per-row expansion applied AFTER aggregation, so it adds no shuffle "
    "to the plan.",
    tags=("reshape", "unpivot", "melt"),
)
def pricing_summary_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
    )
    return wide.unpivot(
        ids=["l_returnflag", "l_linestatus"],
        values=["sum_qty", "sum_base_price", "sum_disc_price"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("l_returnflag", "l_linestatus", "measure")


@register(
    "orders_merge_upsert",
    oracle=f"""
WITH upd AS (
  SELECT o_orderkey,
         CAST(round(CAST(o_totalprice * 1.05 AS DECIMAL(30,6)), 2) AS DOUBLE) AS new_price
  FROM orders WHERE o_orderkey % 7 = 0
), ins AS (
  SELECT o_orderkey + {INS_KEY_OFFSET} AS o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 13 = 3
)
SELECT o.o_orderkey, o.o_orderstatus,
       CASE WHEN u.o_orderkey IS NOT NULL THEN u.new_price
            ELSE CAST(round(CAST(o.o_totalprice AS DECIMAL(30,6)), 2) AS DOUBLE)
       END AS o_totalprice,
       CASE WHEN u.o_orderkey IS NOT NULL THEN 'U' ELSE 'K' END AS action
FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.o_orderkey
UNION ALL
SELECT o_orderkey, o_orderstatus,
       CAST(round(CAST(o_totalprice AS DECIMAL(30,6)), 2) AS DOUBLE), 'I'
FROM ins
ORDER BY o_orderkey
""",
    description="Declarative MERGE/upsert: a deterministic change set "
    "(5%-repriced updates for keys ≡0 mod 7, re-keyed inserts for keys "
    "≡3 mod 13) merged into orders as keyed-left-join + coalesce + "
    "union-append, each row tagged U/K/I. This is the relational plan "
    "every lakehouse MERGE INTO lowers to: one hash join on the primary "
    "key (AQE broadcasts small deltas) and a shuffle-free insert append.",
    tags=("reshape", "merge", "upsert", "cdc"),
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    upd = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("u_orderkey"),
        dround(F.col("o_totalprice") * 1.05).alias("new_price"),
    )
    ins = orders.filter(F.col("o_orderkey") % 13 == 3).select(
        (F.col("o_orderkey") + INS_KEY_OFFSET).alias("o_orderkey"),
        "o_orderstatus",
        dround("o_totalprice").alias("o_totalprice"),
        F.lit("I").alias("action"),
    )
    merged = orders.join(
        upd, orders["o_orderkey"] == upd["u_orderkey"], "left"
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("u_orderkey").isNotNull(), F.col("new_price"))
        .otherwise(dround("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("u_orderkey").isNotNull(), F.lit("U"))
        .otherwise(F.lit("K"))
        .alias("action"),
    )
    return merged.unionByName(ins).orderBy("o_orderkey")
