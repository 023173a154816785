"""Data-quality audit: the constraint checks (nulls, key uniqueness,
referential integrity, domain rules) a pipeline runs before promoting
a batch — dbt-test / Deequ-style, expressed as one Catalyst plan.

The reference has no notion of constraints (its schema is two
hard-coded structs, reference ``1.cpp:18-35``); a production corpus
pipeline refuses to publish a snapshot whose audit is non-empty.

Scale notes: every check is an independent aggregate over a pruned
column set — nulls and domain rules are scan-local partial aggregates
(one long per partition crosses the wire); uniqueness is a groupBy on
the key only; orphan checks are anti-joins keyed on slim ids where the
parent side's distinct key set shuffles once. The final result is a
handful of rows regardless of data volume, and the checks parallelize
against each other as independent stages of one job.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


def _check(name: str, violations) -> DataFrame:
    return violations.select(
        F.lit(name).alias("check_name"), F.col("violations").cast("long").alias("violations")
    )


@register(
    "data_quality_audit",
    oracle="""
SELECT * FROM (
  SELECT 'dup_c_custkey' AS check_name,
         (SELECT count(*) FROM (SELECT c_custkey FROM customer
           GROUP BY c_custkey HAVING count(*) > 1)) AS violations
  UNION ALL
  SELECT 'dup_o_orderkey',
         (SELECT count(*) FROM (SELECT o_orderkey FROM orders
           GROUP BY o_orderkey HAVING count(*) > 1))
  UNION ALL
  SELECT 'empty_doc_text',
         (SELECT count(*) FROM documents
           WHERE text IS NULL OR NOT regexp_matches(text, '\\S'))
  UNION ALL
  SELECT 'null_o_custkey',
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
  UNION ALL
  SELECT 'orphan_lineitem_orders',
         (SELECT count(*) FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
  UNION ALL
  SELECT 'orphan_orders_customer',
         (SELECT count(*) FROM orders
           WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
  UNION ALL
  SELECT 'price_not_positive',
         (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
)
ORDER BY check_name
""",
    description="Pre-publish data-quality audit (dbt-test/Deequ shape): "
    "key uniqueness, null keys, referential-integrity orphans "
    "(anti-joins on slim id projections), and domain rules, unioned "
    "into one check/violations relation. A clean batch returns all "
    "zeros; the result stays a handful of rows at any data volume.",
    tags=("quality", "audit", "pipeline"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    docs = load_table(spark, sf_dir, "documents").select("text")

    dup_cust = _check(
        "dup_c_custkey",
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    dup_order = _check(
        "dup_o_orderkey",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    empty_text = _check(
        "empty_doc_text",
        docs.filter(F.col("text").isNull() | ~F.col("text").rlike(r"\S")).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    null_cust = _check(
        "null_o_custkey",
        orders.filter(F.col("o_custkey").isNull()).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    orphan_li = _check(
        "orphan_lineitem_orders",
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    orphan_orders = _check(
        "orphan_orders_customer",
        orders.select("o_custkey")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    bad_price = _check(
        "price_not_positive",
        li.filter(F.col("l_extendedprice") <= 0).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    checks = [
        dup_cust, dup_order, empty_text, null_cust,
        orphan_li, orphan_orders, bad_price,
    ]
    return reduce(DataFrame.unionByName, checks).orderBy("check_name")
