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
  -- an undated order has no calendar position: it must not join the
  -- month-over-month lag chain (and the engines' NULL orderings
  -- disagree) — excluded identically in both engines
  WHERE o_orderdate IS NOT NULL
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
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
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


N_BUCKETS = 20
HIST_LO, HIST_HI = 0.0, 1000.0


@register(
    "value_histogram",
    oracle=f"""
WITH b AS (
  SELECT CASE WHEN value < {HIST_LO} THEN 0
              WHEN value >= {HIST_HI} THEN {N_BUCKETS + 1}
              ELSE CAST(floor((value - {HIST_LO})
                   / (({HIST_HI} - {HIST_LO}) / {N_BUCKETS})) AS BIGINT) + 1
         END AS bucket
  FROM events
)
SELECT bucket, count(*) AS n
FROM b GROUP BY bucket
ORDER BY bucket
""",
    description=f"Equi-width histogram of events.value over "
    f"[{HIST_LO}, {HIST_HI}) in {N_BUCKETS} buckets plus under/overflow "
    "bins (width_bucket semantics, spelled out so both engines agree on "
    "edge ownership). Profiling primitive: one scan, partial-aggregated "
    "counts, ≤22 result rows at any volume.",
    tags=("analytics", "profiling", "histogram"),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("value")
    width = (HIST_HI - HIST_LO) / N_BUCKETS
    v = F.col("value")
    bucket = (
        F.when(v < HIST_LO, F.lit(0))
        .when(v >= HIST_HI, F.lit(N_BUCKETS + 1))
        .otherwise(F.floor((v - HIST_LO) / width).cast("long") + 1)
    )
    return (
        ev.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@register(
    "customer_abc_classification",
    oracle=f"""
WITH c AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS {{DEC}})) AS revenue
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, revenue,
         sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(revenue) OVER () AS total
  FROM c
), shared AS (
  SELECT o_custkey,
         CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
  FROM ranked
)
SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       count(*) AS n_customers
FROM shared
GROUP BY 1
ORDER BY abc_class
""".format(DEC=DEC),
    description="ABC (Pareto) classification: customers ranked by total "
    "revenue, classified by cumulative share (A ≤80%, B ≤95%, C rest), "
    "reported as class sizes. The cumulative window runs over the per-"
    "customer AGGREGATE (|customers| rows, not |orders|), with decimal-"
    "exact sums so the share boundaries are bit-stable. The global "
    "cumsum is the documented single-task stage; for a billion-customer "
    "table swap in the distributed prefix-sum pattern from "
    "pack_training_sequences.",
    tags=("analytics", "window", "pareto"),
)
def customer_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("revenue")
    )
    w_cum = (
        W.partitionBy(F.lit(0))
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_total = W.partitionBy(F.lit(0))
    shared = c.select(
        "o_custkey",
        (
            F.sum("revenue").over(w_cum).cast("double")
            / F.sum("revenue").over(w_total).cast("double")
        ).alias("cum_share"),
    )
    abc = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        shared.select(abc.alias("abc_class"))
        .groupBy("abc_class")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("abc_class")
    )


@register(
    "hourly_seasonality_profile",
    oracle=f"""
SELECT CAST(extract(hour FROM ts) AS INT) AS hour_of_day, event_type,
       count(*) AS n_events,
       CAST(round(CAST(CAST(sum(CAST(value AS {DEC})) AS DOUBLE) / count(*)
                       AS DECIMAL(30,12)), 4) AS DOUBLE) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY hour_of_day, event_type
""",
    description="Seasonality profile: event volume and average value by "
    "hour-of-day × type — the diurnal fingerprint dashboards and anomaly "
    "baselines are built from. 24×|types| result rows at any volume; "
    "average computed as exact-decimal sum / count so both engines "
    "divide the same two numbers.",
    tags=("timeseries", "seasonality", "analytics"),
)
def hourly_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("hour_of_day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast(DEC)).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_value"),
        )
        .orderBy("hour_of_day", "event_type")
    )


@register(
    "customer_rfm_segments",
    oracle=f"""
WITH rfm AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS {DEC})) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score, count(*) AS n_customers
FROM scored
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
""",
    description="RFM segmentation: per-customer recency/frequency/"
    "monetary quartiles (ntile over the per-customer AGGREGATE with "
    "custkey tie-breaks so both engines bucket identically), reported "
    "as segment sizes. The three global ntiles are the documented "
    "single-task stage over |customers| slim rows; monetary stays "
    "decimal so ordering is exact.",
    tags=("analytics", "window", "rfm", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("monetary"),
    )
    one = W.partitionBy(F.lit(0))
    scored = rfm.select(
        "o_custkey",
        F.ntile(4).over(one.orderBy(F.desc("last_order"), F.col("o_custkey"))).alias("r_score"),
        F.ntile(4).over(one.orderBy(F.desc("frequency"), F.col("o_custkey"))).alias("f_score"),
        F.ntile(4).over(one.orderBy(F.desc("monetary"), F.col("o_custkey"))).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )
