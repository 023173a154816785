"""Additional TPC-H-pattern analytics queries (Q3/Q6 shapes adapted to
the synthetic star schema's columns).

The reference computes one fixed aggregation (SURVEY.md §2.1); these
add the two classic OLAP shapes it lacks: a highly-selective
single-table scan-aggregate (Q6 — the predicate-pushdown benchmark)
and a 3-way join + group + top-k (Q3 — the join-order benchmark).

Scale notes: Q6 reads 4 columns of lineitem and folds to ONE row —
with pushdown + partial aggregation the shuffle is one row per
partition; it is pure scan bandwidth at 100 TB. Q3 joins the two fact
tables on their keys (shuffle join — correct at scale) after pushing
the selective filters below the join, and broadcasts nothing because
customer is only semi-filtering (Catalyst turns it into a broadcast
semi-join on its own when small enough; AQE decides at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC, dsum
from ..plans.registry import register
from ..sources.tables import load_table

Q6_Y0, Q6_Y1 = "1996-01-01", "1997-01-01"
Q3_DATE = "1997-06-01"


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS {DEC})) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_Y0}'
  AND l_shipdate <  TIMESTAMP '{Q6_Y1}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    description="TPC-H Q6 shape: forecast-revenue-change — a "
    "single-table scan with four pushed-down predicates folding to one "
    "row. The canonical scan-bandwidth / pushdown benchmark: the Parquet "
    "reader skips row groups via min/max stats on shipdate, reads 4 "
    "columns, and partial aggregation ships one decimal per partition.",
    tags=("relational", "tpch", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q6_Y0)
        & (F.col("l_shipdate") < Q6_Y1)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT o.o_orderkey,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC})) AS DOUBLE), 2)
         AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l.l_shipdate  > TIMESTAMP '{Q3_DATE}'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    description="TPC-H Q3 shape: top-10 unshipped BUILDING-segment "
    "orders by outstanding revenue. Selective filters are declared on "
    "each scan so they push below the joins; orders⋈lineitem is a "
    "key-partitioned shuffle join (the at-scale plan), and the top-10 is "
    "a TakeOrdered — no global sort materializes. Ties broken by "
    "orderkey for cross-engine determinism.",
    tags=("relational", "tpch", "join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < Q3_DATE)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > Q3_DATE)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q14_M0, Q14_M1 = "1996-03-01", "1996-04-01"


@register(
    "q14_promo_revenue_share",
    oracle=f"""
WITH j AS (
  SELECT p.p_type, l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{Q14_M0}' AND l.l_shipdate < TIMESTAMP '{Q14_M1}'
)
SELECT
  CAST(round(CAST(
    100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(rev AS {DEC}) END) AS DOUBLE)
          / CAST(sum(CAST(rev AS {DEC})) AS DOUBLE)
    AS DECIMAL(30,12)), 6) AS DOUBLE) AS promo_share_pct,
  count(*) AS n_items
FROM j
""",
    description="TPC-H Q14 shape: percentage of one month's revenue "
    "from PROMO-type parts — conditional aggregation (CASE inside SUM) "
    "over a fact⋈dim join with the date filter pushed to the lineitem "
    "scan. Both the conditional and total sums are exact decimals, so "
    "the ratio is one deterministic double division. The part side "
    "broadcasts; lineitem never reshuffles.",
    tags=("relational", "tpch", "conditional-agg", "join"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= Q14_M0) & (F.col("l_shipdate") < Q14_M1)
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                (
                    F.lit(100.0)
                    * F.sum(promo).cast("double")
                    / F.sum(rev).cast("double")
                ).cast("decimal(30,12)"),
                6,
            )
            .cast("double")
            .alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "nation_revenue_share",
    oracle=f"""
WITH nrev AS (
  SELECT n.n_name,
         sum(CAST(o.o_totalprice AS {DEC})) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name,
       round(CAST(rev AS DOUBLE), 2) AS revenue,
       CAST(round(CAST(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE)
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS share
FROM nrev ORDER BY n_name
""",
    description="Percent-of-total (ratio_to_report) per nation: revenue "
    "aggregated per nation, then divided by the global total computed as "
    "a scalar aggregate and broadcast back as one row — no unpartitioned "
    "window, so nothing ever collapses to a single partition. Exact "
    "decimal partials make the shares deterministic.",
    tags=("relational", "window", "ratio", "join"),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nrev = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )
    # Global total via scalar aggregate + 1-row broadcast cross-join
    # rather than an unpartitioned window — the window form moves every
    # row to a single partition; this form keeps the agg fully parallel.
    total = F.broadcast(nrev.agg(F.sum("rev").alias("total_rev")))
    return (
        nrev.crossJoin(total)
        .select(
            "n_name",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(
                (
                    F.col("rev").cast("double")
                    / F.col("total_rev").cast("double")
                ).cast("decimal(30,12)"),
                6,
            )
            .cast("double")
            .alias("share"),
        )
        .orderBy("n_name")
    )
