"""Subquery-pattern TPC-H shapes: EXISTS (Q4), HAVING over a grouped
subquery (Q18), and scalar-subquery + NOT EXISTS (Q22), adapted to the
synthetic schema's columns (no commit/receipt dates or phone numbers —
see TESTDATA.md).

The reference's only query has no subqueries at all (SURVEY.md §2.1);
these cover the three classic decorrelation patterns an engine must
plan well. Spark has no correlated-subquery surface in the DataFrame
API — the idiomatic form IS the decorrelated one: EXISTS → left-semi
join, NOT EXISTS → left-anti join, scalar aggregate → 1-row broadcast
cross join. Catalyst plans the same shapes for the SQL spellings.

Scale notes: the Q4 semi join carries the non-equi shipdate predicate
inside the join condition, so lineitem never materializes matches —
first hit per order short-circuits. Q18's HAVING filter reduces
lineitem to the qualifying orderkeys BEFORE any join, so the 3-way
join only sees the tiny qualifying set (broadcast at any scale). Q22's
scalar average is one row — broadcast by construction — and the
anti join against recent orders projects a single column of the orders
table before shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

Q4_LO, Q4_HI = "1996-01-01", "1996-07-01"
LATE_DAYS = 60
Q18_MIN_QTY = 300
Q22_CUTOFF = "1999-01-01"


@register(
    "q4_order_priority_exists",
    oracle=f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_LO}' AND o_orderdate < TIMESTAMP '{Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="TPC-H Q4 shape: priority distribution of orders with "
    "at least one lineitem shipped >60 days after the order date. "
    "EXISTS is expressed as a left-semi join whose condition carries "
    "the non-equi shipdate predicate — the probe short-circuits on the "
    "first matching item and never materializes the multiplicity.",
    tags=("relational", "tpch", "subquery", "semi-join"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= Q4_LO) & (F.col("o_orderdate") < Q4_HI))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li["l_orderkey"] == orders["o_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"] + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(CAST(big.sq AS DOUBLE), 2) AS sum_qty
FROM (SELECT l_orderkey, sum(CAST(l_quantity AS {DEC})) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS {DEC})) > {Q18_MIN_QTY}) big
JOIN orders o   ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey  = o.o_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
""",
    description="TPC-H Q18 shape: large-volume orders (>300 total "
    "quantity) with their customers. The HAVING aggregate runs FIRST — "
    "map-side partial sums reduce lineitem to one row per orderkey, the "
    "filter keeps only qualifying keys, and the two joins then touch a "
    "set small enough to broadcast at any scale.",
    tags=("relational", "tpch", "subquery", "having"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
        .filter(F.col("sq") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("sq").cast("double"), 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


@register(
    "q22_idle_rich_customers",
    oracle=f"""
SELECT c_mktsegment, count(*) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS {DEC})) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    description="TPC-H Q22 shape: market segments of above-average-"
    "balance customers with no orders since 1999. The scalar average is "
    "an exact decimal-sum/count one-row aggregate broadcast into the "
    "filter; NOT EXISTS is a left-anti join against a single projected "
    "column of orders, filter pushed below the shuffle.",
    tags=("relational", "tpch", "subquery", "anti-join"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= Q22_CUTOFF)
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast(DEC)).cast("double"), 2).alias(
                "totacctbal"
            ),
        )
        .orderBy("c_mktsegment")
    )
