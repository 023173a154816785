"""SQL front door: the engine's queries are DataFrame builders, but the
same Catalyst front-end accepts raw ANSI SQL over registered views —
``spark.sql`` is a first-class entry point, not a separate engine.

The query below (TPC-H Q5 shape: local-supplier revenue per nation) is
ONE SQL string executed verbatim by both Spark and the DuckDB oracle —
the strongest possible statement that the SQL surface is ANSI-portable.
Decimal casts stabilize float aggregation identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import register_views

#: runs unmodified in Spark SQL and DuckDB
Q5_LOCAL_SUPPLIER_VOLUME = f"""
SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC})))
             AS DOUBLE), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register(
    "sql_q5_local_supplier_volume",
    oracle=Q5_LOCAL_SUPPLIER_VOLUME,
    description="TPC-H Q5 shape submitted as raw ANSI SQL through "
    "spark.sql over registered views — the identical string is the DuckDB "
    "oracle. Catalyst plans the 6-table join with broadcast dims and "
    "pushes the date/region filters into the scans.",
    tags=("sql", "join", "tpch"),
)
def sql_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    return spark.sql(Q5_LOCAL_SUPPLIER_VOLUME)


#: runs unmodified in Spark SQL (4.x recursive CTE support) and DuckDB.
#: The recursion is a LINEAR chain (rank k -> k+1 per customer), so
#: UNION ALL terminates — Spark does not yet allow UNION-distinct in
#: recursive CTEs, which rules out cyclic closures like connected
#: components (the DataFrame min-label loop in dedup_components covers
#: that case instead).
RECURSIVE_ORDER_CHAINS = """
WITH RECURSIVE ranked AS (
  -- undated orders are excluded: the chain is DEFINED by date order,
  -- and although this string runs verbatim in both engines, their
  -- default NULL orderings differ (Spark NULLS FIRST, DuckDB LAST)
  SELECT o_custkey AS c, o_orderdate AS d,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
  WHERE o_orderdate IS NOT NULL
), chain (c, rk, d) AS (
  SELECT c, rk, d FROM ranked WHERE rk = 1
  UNION ALL
  SELECT r.c, r.rk, r.d
  FROM ranked r JOIN chain ch ON r.c = ch.c AND r.rk = ch.rk + 1
  WHERE r.d <= ch.d + INTERVAL 30 DAY
)
SELECT c AS custkey,
       CAST(count(*) AS BIGINT) AS streak_len,
       min(d) AS first_order,
       max(d) AS last_order
FROM chain
GROUP BY c
ORDER BY custkey
"""


@register(
    "sql_recursive_order_chains",
    oracle=RECURSIVE_ORDER_CHAINS,
    description="Recursive CTE (Spark 4 WITH RECURSIVE) submitted as raw "
    "SQL: starting from each customer's first order, the chain extends "
    "while the next order (by rank) arrives within 30 days — a linear "
    "per-key recursion whose depth is the reorder streak. The identical "
    "string is the DuckDB oracle. Iterative semantics the reference "
    "cannot express at all, planned by Catalyst as a repeated join with "
    "the recursion-depth guard.",
    tags=("sql", "recursive-cte", "iterative", "spark4"),
)
def sql_recursive_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(RECURSIVE_ORDER_CHAINS)


#: runs unmodified in Spark SQL (lateral correlated subquery, 3.2+) and
#: DuckDB. Top-2-per-key expressed the SQL-standard way: a correlated
#: LATERAL subquery with its own ORDER BY + LIMIT. Catalyst rewrites it
#: to a per-key window/limit — the same plan the row_number idiom gets,
#: but written as the ANSI construct.
LATERAL_TOP_ORDERS = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) o
WHERE c.c_custkey <= 200
ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
"""


@register(
    "sql_lateral_top_orders",
    oracle=LATERAL_TOP_ORDERS,
    description="Correlated LATERAL subquery as raw SQL: each customer's "
    "top-2 orders by price via a per-row subquery with ORDER BY + LIMIT "
    "— the ANSI spelling of top-k-per-group. The identical string is "
    "the DuckDB oracle; Catalyst decorrelates it into the same windowed "
    "per-key limit the DataFrame idiom produces (no per-row re-scan).",
    tags=("sql", "lateral", "subquery", "topk"),
)
def sql_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(LATERAL_TOP_ORDERS)


#: runs unmodified in Spark SQL (GROUP BY ALL: 3.4+, ORDER BY ALL: 4.x)
#: and DuckDB — the modern-SQL ergonomics DuckDB pioneered and Spark
#: adopted; grouping keys are inferred as every non-aggregate select
#: expression, ordering covers the whole select list.
GROUP_BY_ALL_PRIORITY_MIX = f"""
SELECT o_orderpriority,
       o_orderstatus,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2) AS total_value
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "sql_group_by_all",
    oracle=GROUP_BY_ALL_PRIORITY_MIX,
    description="Modern SQL ergonomics as raw SQL: GROUP BY ALL infers "
    "the grouping keys from the non-aggregate select expressions and "
    "ORDER BY ALL sorts by the whole select list — the DuckDB-pioneered "
    "shorthand Spark adopted, so the identical string runs in both "
    "engines. Semantically the plain 2-key aggregate (partial+final, "
    "date filter pushed to the scan).",
    tags=("sql", "aggregate", "spark4"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(GROUP_BY_ALL_PRIORITY_MIX)


#: Spark 4 SQL pipe syntax (SPARK-49555): the same logical pipeline a
#: DataFrame chain expresses, written as linear |> stages inside ONE
#: SQL string. DuckDB does not parse |>, so the oracle is the
#: equivalent classic ANSI form — the pair proves the pipe front-end
#: is sugar over the same Catalyst plan, not a different engine.
PIPE_SEGMENT_REVENUE = f"""
FROM orders
|> WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
|> JOIN customer ON o_custkey = c_custkey
|> AGGREGATE count(*) AS n_orders,
             round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2)
                 AS total_revenue
   GROUP BY c_mktsegment
|> ORDER BY c_mktsegment
"""

PIPE_SEGMENT_REVENUE_ANSI = f"""
SELECT c_mktsegment, count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2)
           AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "sql_pipe_segment_revenue",
    oracle=PIPE_SEGMENT_REVENUE_ANSI,
    description="Spark 4 SQL pipe syntax (|> stages: FROM → WHERE → "
    "JOIN → AGGREGATE...GROUP BY → ORDER BY) executed verbatim through "
    "spark.sql; the oracle is the equivalent classic ANSI string, so "
    "the check proves the pipe front-end lowers to the same plan — "
    "filters still push into the scan, the dimension join still "
    "broadcasts. One more first-class SQL entry point next to the "
    "recursive-CTE / LATERAL / GROUP BY ALL rows.",
    tags=("sql", "pipe-syntax", "join", "aggregate"),
)
def sql_pipe_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(PIPE_SEGMENT_REVENUE)
