"""Classic BI analytic patterns: ratio-to-report and period-over-period
growth — window functions OVER aggregates, not over raw rows.

The reference's single aggregate ends at per-key counts (reference
``1.cpp:183-207``); reporting engines additionally need second-order
analytics computed on top of an aggregate: each group's share of the
total, and each period's change vs the prior period. Both patterns
aggregate FIRST (shrinking the relation to |groups| rows) and only then
apply the window — so the window input is tiny at any data volume and
the single-partition/global frames that would be fatal over raw rows
are fine here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "segment_revenue_share",
    oracle=f"""
WITH seg AS (
  SELECT c.c_mktsegment,
         sum(CAST(o.o_totalprice AS {DEC})) AS seg_revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
)
SELECT c_mktsegment,
       round(CAST(seg_revenue AS DOUBLE), 2) AS revenue,
       round(100.0 * CAST(seg_revenue AS DOUBLE)
             / CAST(sum(seg_revenue) OVER () AS DOUBLE), 4) AS pct_of_total
FROM seg
ORDER BY c_mktsegment
""",
    description="Ratio-to-report: each market segment's revenue share of "
    "the grand total. The aggregate runs first (5 rows survive), THEN the "
    "unpartitioned share window — a frame that would be fatal over raw "
    "orders is free over the aggregate. Exact-decimal sums keep the "
    "division bit-stable across engines.",
    tags=("analytics", "window", "ratio-to-report"),
)
def segment_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        # seg_revenue stays DECIMAL through the share window so the
        # grand total is exact in both engines; doubles only appear in
        # the final deterministic division
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("seg_revenue"))
    )
    # |segments| rows → the global window is intentionally one tiny task
    total = W.partitionBy(F.lit(0))
    seg_d = F.col("seg_revenue").cast("double")
    total_d = F.sum("seg_revenue").over(total).cast("double")
    return seg.select(
        "c_mktsegment",
        F.round(seg_d, 2).alias("revenue"),
        F.round(100.0 * seg_d / total_d, 4).alias("pct_of_total"),
    ).orderBy("c_mktsegment")


@register(
    "priority_revenue_mom_growth",
    oracle=f"""
WITH m AS (
  SELECT o_orderpriority,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY 1, 2
)
SELECT o_orderpriority, month,
       round(revenue, 2) AS revenue,
       round(revenue - lag(revenue) OVER w, 2) AS mom_change,
       round(100.0 * (revenue - lag(revenue) OVER w) / lag(revenue) OVER w, 4)
         AS mom_pct
FROM m
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
""",
    description="Period-over-period growth: monthly revenue per order "
    "priority with absolute and percent month-over-month deltas via lag "
    "over the aggregate (|priorities × months| rows — window input is "
    "calendar-bounded, not data-bounded). First month per priority "
    "yields NULL deltas, preserved identically in both engines.",
    tags=("analytics", "window", "growth"),
)
def priority_revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("month")
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"))
    )
    w = W.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "o_orderpriority",
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") - prev, 2).alias("mom_change"),
        F.round(100.0 * (F.col("revenue") - prev) / prev, 4).alias("mom_pct"),
    ).orderBy("o_orderpriority", "month")
