"""Bucketed (co-located) joins: pre-partitioning both sides of a
recurring join on its key so the join runs with NO shuffle exchange.

This is the 100 TB play the other join queries can't show at small SF:
a fact-fact join (lineitem ⋈ orders is ~3/4 of a TPC-H-scale dataset)
shuffles both sides on every query unless the tables are bucketed by
the join key at write time. With both sides bucketed into the same
number of buckets on the same key, Spark plans a SortMergeJoin whose
children read bucket-aligned files directly — zero Exchange operators,
which at cluster scale means zero network movement for the heaviest
join in the workload (the test asserts the plan is exchange-free).

The reference has no second relation and no joins (SURVEY.md §2.2);
this operator exists for the extension surface's scale story.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

N_BUCKETS = 8


def _sf_tag(sf_dir: str) -> str:
    """Table-name tag for a source directory: the sf token for
    readability plus a digest of the FULL path — two different dirs
    must never share bucketed tables (an `sf…` substring alone collided
    across test fixture dirs like `corrupt_sf0`/`edge_docs_sf0`, making
    one query silently read another fixture's data)."""
    import hashlib

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = (m.group(1) if m else "x").replace(".", "_")
    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"{sf}_{digest}"


def ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem and orders bucketed by order key (idempotent).

    ``bucketBy`` requires the session catalog (``saveAsTable``); the
    warehouse lives under the system temp dir, keyed by source dir so
    different SF runs (and test fixtures) never collide.
    """
    tag = _sf_tag(sf_dir)
    li_tbl, ord_tbl = f"lineitem_bkt_{tag}", f"orders_bkt_{tag}"
    warehouse = os.path.join(tempfile.gettempdir(), "mmr_spark_warehouse")
    for name, tbl, key in (
        ("lineitem", li_tbl, "l_orderkey"),
        ("orders", ord_tbl, "o_orderkey"),
    ):
        if spark.catalog.tableExists(tbl):
            continue
        path = os.path.join(warehouse, tbl)
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(tbl)
        )
    return li_tbl, ord_tbl


@register(
    "bucketed_join_order_revenue",
    oracle=f"""
SELECT o_orderpriority,
       count(DISTINCT o.o_orderkey) AS n_orders,
       round(CAST(sum(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC})))
                  AS DOUBLE), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Fact-fact join lineitem ⋈ orders executed over tables "
    "bucketed by order key: the SortMergeJoin reads bucket-aligned files "
    "with no shuffle Exchange on either side (asserted in tests). Same "
    "answer as the shuffle join — the oracle proves it.",
    tags=("join", "bucketing", "scale"),
)
def bucketed_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li_tbl, ord_tbl = ensure_bucketed_tables(spark, sf_dir)
    # pin SortMergeJoin: at test SF the optimizer would broadcast orders
    # and skip the bucket-aligned read path this operator demonstrates;
    # at 100 TB neither fact table is broadcastable and SMJ is what runs
    li = spark.table(li_tbl).hint("merge")
    orders = spark.table(ord_tbl)
    revenue = F.sum(
        F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(revenue.cast("double"), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
