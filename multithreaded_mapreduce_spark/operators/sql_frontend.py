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
