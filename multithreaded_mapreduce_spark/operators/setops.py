"""Set operators: UNION ALL / INTERSECT / EXCEPT (ALL) — absent from the
reference (SURVEY.md §2.2 ✗), all built-in DataFrame ops in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "union_parties",
    oracle="""
SELECT 'customer' AS kind, c_custkey AS party_key, c_name AS name, c_acctbal AS acctbal
FROM customer
UNION ALL
SELECT 'supplier' AS kind, s_suppkey AS party_key, s_name AS name, s_acctbal AS acctbal
FROM supplier
ORDER BY kind, party_key
""",
    description="UNION ALL of customers and suppliers into one tagged "
    "relation (schema aligned by position).",
    tags=("setop", "union"),
)
def union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return customer.unionAll(supplier).orderBy("kind", "party_key")


@register(
    "intersect_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
    description="INTERSECT (distinct): nations that have both customers and "
    "suppliers.",
    tags=("setop", "intersect"),
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.intersect(supp_nations).orderBy("nationkey")


@register(
    "except_nations",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
    description="EXCEPT (distinct): nations with customers but no suppliers.",
    tags=("setop", "except"),
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.subtract(supp_nations).orderBy("nationkey")


@register(
    "except_all_order_priorities",
    oracle="""
SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
ORDER BY priority
""",
    description="EXCEPT ALL (bag semantics): per-priority multiplicity "
    "difference between open and finished orders.",
    tags=("setop", "exceptall"),
)
def except_all_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    open_p = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("priority")
    )
    done_p = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    return open_p.exceptAll(done_p).orderBy("priority")
