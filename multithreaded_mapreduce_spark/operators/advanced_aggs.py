"""Advanced aggregation shapes beyond plain GROUP BY: explicit GROUPING
SETS (the general form rollup/cube specialize) and exact interpolated
percentiles.

The reference's only aggregate is count-per-key (SURVEY.md §2.1 #9/#11);
these are extension surface. Both stay fully declarative: grouping sets
compile to one Expand + HashAggregate pass (no N scans for N sets), and
``percentile`` is Spark's exact interpolated implementation — matched
against DuckDB's ``quantile_cont`` with symmetric rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "grouping_sets_lineitem",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS {DEC})) AS DOUBLE), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    description="Explicit GROUPING SETS — per-flag, per-status, and per-pair "
    "aggregates in ONE Expand+HashAggregate pass (the general form that "
    "ROLLUP/CUBE specialize; note: no grand-total set, which neither "
    "shorthand can express).",
    tags=("relational", "groupingsets"),
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "price_percentiles_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(round(CAST(quantile_cont(l_extendedprice, 0.25) AS DECIMAL(30,12)), 4) AS DOUBLE) AS p25,
       CAST(round(CAST(quantile_cont(l_extendedprice, 0.50) AS DECIMAL(30,12)), 4) AS DOUBLE) AS p50,
       CAST(round(CAST(quantile_cont(l_extendedprice, 0.75) AS DECIMAL(30,12)), 4) AS DOUBLE) AS p75,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Exact interpolated quartiles of l_extendedprice per return "
    "flag (Spark percentile == DuckDB quantile_cont, snapped to 4 "
    "decimals). The exact form is the oracle anchor; at 100 TB the "
    "approx_percentile sketch (mergeable, bounded memory) replaces it.",
    tags=("relational", "percentile", "agg"),
)
def price_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def pct(p: float):
        return (
            F.round(
                F.percentile("l_extendedprice", F.lit(p)).cast("decimal(30,12)"), 4
            ).cast("double")
        )

    return (
        li.groupBy("l_returnflag")
        .agg(
            pct(0.25).alias("p25"),
            pct(0.50).alias("p50"),
            pct(0.75).alias("p75"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


ORDER_STATUSES = ("F", "O", "P")  # fixed pivot columns → stable schema


@register(
    "pivot_orders_status",
    oracle=f"""
SELECT o_orderpriority,
       {", ".join(
           f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS status_{s.lower()}"
           for s in ORDER_STATUSES
       )},
       round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2) AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Pivot: order counts per priority × status spread into "
    "one column per status (explicit value list keeps the schema stable "
    "— a data-driven pivot needs an extra distinct pass at 100 TB). "
    "Oracle is the FILTER-clause conditional aggregation a pivot "
    "desugars to.",
    tags=("relational", "pivot", "agg"),
)
def pivot_orders_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .agg(F.count(F.lit(1)))
    )
    totals = (
        orders.groupBy(F.col("o_orderpriority").alias("t_prio"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2).alias(
                "total_price"
            )
        )
    )
    return (
        # eqNullSafe: a NULL priority is still a group in the oracle's
        # single GROUP BY; a plain equi-join between the pivot and the
        # totals relation would drop it (corrupted-orders sweep)
        pivoted.join(
            totals, F.col("o_orderpriority").eqNullSafe(F.col("t_prio"))
        )
        .select(
            "o_orderpriority",
            *[
                F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s.lower()}")
                for s in ORDER_STATUSES
            ],
            "total_price",
        )
        .orderBy("o_orderpriority")
    )


#: rank-band slack for the percentile bound assertions: GK at accuracy
#: 10000 guarantees rank error ≤ n/10000; 2% relative + 3 absolute is
#: generous headroom that still catches a broken sketch immediately
_PCT_EPS = 0.02
_PCT_ABS = 3


@register(
    "approx_price_percentiles",
    oracle="""
SELECT l_returnflag,
       CAST(count(l_extendedprice) AS BIGINT) AS n,
       TRUE AS p50_in_band, TRUE AS p90_in_band, TRUE AS p99_in_band
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Approximate p50/p90/p99 of extended price per return "
    "flag via percentile_approx (Greenwald-Khanna sketch, accuracy "
    "10000). The sketch is mergeable — partials combine map-side like "
    "any algebraic aggregate — which is the whole point at 100 TB: "
    "exact percentiles need a global sort or two passes, the sketch "
    "needs one pass and a tiny merge. Registered as its own "
    "VERIFICATION harness (VERDICT r3 task 7): GK summaries differ "
    "engine-to-engine, so instead of the raw values the output carries "
    "per-flag booleans asserting each returned value's RANK lies within "
    "(p ± 2%)·n — computed by counting rows on each side of the value "
    "in a second conditional-aggregate pass — which the oracle pins to "
    "TRUE. A sketch returning an out-of-band value fails the driver's "
    "value hash. Production queries ship the one-pass sketch aggregate "
    "this query exercises (the rank-audit join is verification cost).",
    tags=("aggregate", "percentile", "approx", "sketch"),
)
def approx_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias(
            "pcts"
        )
    )
    joined = li.join(
        F.broadcast(ap.withColumnsRenamed({"l_returnflag": "a_flag"})),
        F.col("l_returnflag").eqNullSafe(F.col("a_flag")),
    )
    price = F.col("l_extendedprice")

    def band(i: int, p: float, name: str):
        v = F.col("pcts")[i]
        n_le = F.count_if(price <= v)
        n_lt = F.count_if(price < v)
        n = F.count(price).cast("double")
        # n_le ≥ (p−ε)·n − A keeps v from undershooting its rank;
        # n_lt ≤ (p+ε)·n + A from overshooting; tie-runs sit between
        # n_lt and n_le, so equal values can never fail the band. An
        # all-NULL group (n = 0, v NULL, count_ifs 0) passes trivially,
        # matching the oracle's unconditional TRUE.
        lo_ok = n_le.cast("double") >= (p - _PCT_EPS) * n - _PCT_ABS
        hi_ok = n_lt.cast("double") <= (p + _PCT_EPS) * n + _PCT_ABS
        return (lo_ok & hi_ok).alias(name)

    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(price).alias("n"),
            band(0, 0.5, "p50_in_band"),
            band(1, 0.9, "p90_in_band"),
            band(2, 0.99, "p99_in_band"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "boolean_bitwise_aggs",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_qty,
       bool_and(l_discount <= 0.1) AS all_low_discount,
       bool_or(l_tax > 0.07) AS any_high_tax,
       bit_and(l_linenumber) AS line_bit_and,
       bit_or(l_linenumber) AS line_bit_or,
       bit_xor(l_linenumber) AS line_bit_xor
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Aggregate-function breadth per return flag: count_if, "
    "bool_and/bool_or, and bitwise bit_and/bit_or/bit_xor — all "
    "order-independent (commutative/associative), so partial+final "
    "hash aggregation needs no determinism care at any partitioning. "
    "One scan, four pruned columns.",
    tags=("aggregation", "boolean", "bitwise"),
)
def boolean_bitwise_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_big_qty"),
            F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_discount"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
            F.bit_and("l_linenumber").alias("line_bit_and"),
            F.bit_or("l_linenumber").alias("line_bit_or"),
            F.bit_xor("l_linenumber").alias("line_bit_xor"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "string_agg_status_list",
    oracle="""
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
         AS statuses,
       count(DISTINCT o_orderstatus) AS n_statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Deterministic string aggregation: the sorted distinct "
    "status list per order priority via collect_set → array_sort → "
    "array_join (Spark's collect_set order is partition-dependent; the "
    "sort makes the concatenation order-independent, matching DuckDB's "
    "ORDER BY string_agg). The set is bounded by status cardinality, "
    "never row count, so the agg state stays tiny at any scale.",
    tags=("aggregation", "string"),
)
def string_agg_status_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            # gate on the AGGREGATE, not the joined string: a group
            # whose every status is NULL has an empty set — DuckDB's
            # string_agg returns NULL there, array_join would return ''
            # (corrupted-orders sweep). nullif('') would also swallow a
            # legitimate lone empty-string status, which string_agg
            # keeps as '' — count(col) distinguishes the two.
            F.when(F.count("o_orderstatus") == 0, F.lit(None))
            .otherwise(
                F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",")
            )
            .alias("statuses"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "argminmax_median_mode",
    oracle="""
SELECT o_orderpriority,
       arg_max(o_orderkey, o_totalprice) AS priciest_orderkey,
       arg_min(o_orderkey, o_totalprice) AS cheapest_orderkey,
       CAST(round(CAST(median(o_totalprice) AS DECIMAL(30,12)), 4) AS DOUBLE)
         AS median_totalprice,
       mode(o_orderstatus) AS modal_status,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Modern aggregate breadth per order priority: argmax/"
    "argmin (max_by/min_by — the whole-row-at-extremum idiom without a "
    "self-join), exact interpolated median (snapped to 4 decimals), and "
    "mode. All are single-pass hash aggregates with bounded state "
    "except median, whose exact form is the oracle anchor — at 100 TB "
    "approx_percentile(0.5) replaces it (mergeable sketch, bounded "
    "memory). max_by/mode are tie-unsafe in general; on this data the "
    "extremum and modal value are unique per group (verified), which is "
    "the precondition for cross-engine determinism.",
    tags=("aggregation", "argmax", "median", "mode"),
)
def argminmax_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_orderkey"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_orderkey"),
            F.round(F.median("o_totalprice").cast("decimal(30,12)"), 4)
            .cast("double")
            .alias("median_totalprice"),
            F.mode("o_orderstatus").alias("modal_status"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "global_quantile_binning",
    oracle="""
WITH b AS (
  SELECT CAST(round(CAST(quantile_cont(o_totalprice, 0.25) AS DECIMAL(30,12)), 4) AS DOUBLE) AS b25,
         CAST(round(CAST(quantile_cont(o_totalprice, 0.50) AS DECIMAL(30,12)), 4) AS DOUBLE) AS b50,
         CAST(round(CAST(quantile_cont(o_totalprice, 0.75) AS DECIMAL(30,12)), 4) AS DOUBLE) AS b75
  FROM orders
)
SELECT CASE WHEN o_totalprice < b25 THEN 1
            WHEN o_totalprice < b50 THEN 2
            WHEN o_totalprice < b75 THEN 3
            ELSE 4 END AS price_bin,
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2) AS sum_price
FROM orders, b
GROUP BY 1
ORDER BY price_bin
""",
    description="Equal-frequency quartile binning of every order by "
    "global price quantiles — the scalable replacement for a global "
    "ntile(4), which would drag all rows through ONE partition. Here "
    "the boundaries are computed by a tiny aggregate (exact percentile "
    "as the oracle anchor; approx_percentile at 100 TB), broadcast to "
    "a one-row nested-loop join, and the bin assignment is a pure "
    "per-row CASE that pipelines into the scan. Boundaries are snapped "
    "to 4 decimals on both engines so bin edges agree bit-for-bit.",
    tags=("aggregation", "percentile", "binning", "scale-pattern"),
)
def global_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def bound(p: float):
        return (
            F.round(
                F.percentile("o_totalprice", F.lit(p)).cast("decimal(30,12)"), 4
            )
            .cast("double")
        )

    bounds = orders.agg(
        bound(0.25).alias("b25"), bound(0.50).alias("b50"), bound(0.75).alias("b75")
    )
    price = F.col("o_totalprice")
    binned = orders.crossJoin(F.broadcast(bounds)).withColumn(
        "price_bin",
        F.when(price < F.col("b25"), 1)
        .when(price < F.col("b50"), 2)
        .when(price < F.col("b75"), 3)
        .otherwise(4),
    )
    return (
        binned.groupBy("price_bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(price).alias("min_price"),
            F.max(price).alias("max_price"),
            F.round(F.sum(price.cast(DEC)).cast("double"), 2).alias("sum_price"),
        )
        .orderBy("price_bin")
    )


@register(
    "multi_distinct_order_profile",
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderstatus) AS n_statuses,
       count(DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE))
         AS n_active_months,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Three COUNT(DISTINCT ...) over different columns in one "
    "aggregate — Catalyst rewrites this through Expand (one row replica "
    "per distinct column) into a single two-phase hash aggregate, where "
    "a naive engine runs three scans or keeps three hash sets per "
    "group. The Expand triples the shuffled row count but each replica "
    "carries one slim column; at 100 TB prefer approx_count_distinct "
    "per column if exactness is negotiable.",
    tags=("aggregation", "distinct", "expand"),
)
def multi_distinct_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
            F.countDistinct(
                F.date_trunc("month", "o_orderdate").cast("date")
            ).alias("n_active_months"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )
