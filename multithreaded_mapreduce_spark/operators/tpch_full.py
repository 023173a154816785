"""Remaining feasible TPC-H query shapes
(Q7/Q8/Q9/Q10/Q13/Q15/Q17/Q19/Q21), adapted to the synthetic star
schema's columns.

The reference computes a single fixed word count (reference ``1.cpp``
whole file; SURVEY.md §2.1) — it has no joins at all — so all of these
exercise engine surface the reference lacks. The schema has no
``partsupp`` table and lineitem carries no commit/receipt dates or ship
modes (TESTDATA.md); Q12 is adapted in ``relational.py`` (returnflag in
place of receipt lateness) and Q2/Q11/Q16/Q20 live in
``tpch_bridge.py``, deriving the part–supplier relation from the
lineitem bridge. Q21 is adapted to use ``l_returnflag`` in place of the receipt-late
predicate (keeping its signature EXISTS + NOT-EXISTS self-join shape)
and Q9's cost term derives from ``p_retailprice`` in place of
``ps_supplycost``.

Scale notes (local[32] today, 1000 executors tomorrow):

* Q7/Q8 join lineitem against orders on the order key — the one
  genuinely large shuffle — and broadcast every dimension (customer,
  supplier, nation twice under different roles, part, region), so each
  plan has exactly one fact-fact exchange; the year/nation group-by
  output is tiny and AQE coalesces its partitions.
* Q10 shuffles lineitem once (pre-aggregated by order key is wrong here
  — revenue groups by customer attributes — but the 'R' filter drops
  ~2/3 of lineitem before the join) and ends in a top-k, which Spark
  executes as TakeOrderedAndProject: no global sort materializes.
* Q13 is an outer join whose probe side (orders) is pre-filtered and
  pre-projected to two columns; the double aggregation reduces
  customer-cardinality → count-cardinality (≤ a few hundred rows)
  before the second shuffle, which is therefore negligible.
* Q17's correlated scalar subquery decorrelates to a per-part average
  computed once on the brand-filtered lineitem slice — the brand filter
  broadcasts from part, so the heavy table is scanned once for the
  averages and once for the probe, both times pruned to 3 columns.
* Q19's disjunctive predicate stays a single equi-join on partkey with
  the OR residual evaluated post-join inside codegen; part broadcasts.
* Q21 performs semi and anti self-joins of lineitem keyed on orderkey;
  the 'R'-filter prunes both probe inputs before the exchanges, and all
  three legs share the same orderkey partitioning so AQE reuses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC, dsum
from ..plans.registry import register
from ..sources.tables import load_table

Q7_Y0, Q7_Y1 = "1996-01-01", "1998-01-01"
Q7_SUPP_REGION, Q7_CUST_REGION = "EUROPE", "ASIA"
Q8_REGION, Q8_NATION, Q8_TYPE = "ASIA", "NATION_0", "PROMO"
Q8_Y0, Q8_Y1 = "1996-01-01", "1998-01-01"
Q10_LO, Q10_HI = "1996-01-01", "1996-07-01"
Q13_STATUS = "O"
Q17_BRAND, Q17_FRACTION = "Brand#5", 0.2
Q19_BRANCHES = (  # (brand, max_size, qty_lo, qty_hi)
    ("Brand#1", 10, 1.0, 11.0),
    ("Brand#2", 20, 10.0, 20.0),
    ("Brand#3", 35, 20.0, 30.0),
)
Q21_STATUS = "F"


def _nation_of_region(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """nation ⋈ region filtered to one region — 25×5 rows, broadcast."""
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return F.broadcast(
        nation.join(F.broadcast(reg), nation["n_regionkey"] == reg["r_regionkey"])
        .select("n_nationkey", "n_name")
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(CAST(volume AS {DEC})) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN region r1  ON r1.r_regionkey = n1.n_regionkey AND r1.r_name = '{Q7_SUPP_REGION}'
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r2  ON r2.r_regionkey = n2.n_regionkey AND r2.r_name = '{Q7_CUST_REGION}'
  WHERE l.l_shipdate >= TIMESTAMP '{Q7_Y0}' AND l.l_shipdate < TIMESTAMP '{Q7_Y1}'
) GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    description="TPC-H Q7 shape: shipping volume between two markets "
    "(EUROPE suppliers → ASIA customers) by nation pair and year. The "
    "nation table plays two roles through different join paths — the "
    "classic role-playing-dimension pattern. One fact-fact shuffle "
    "(lineitem⋈orders); everything else broadcasts.",
    tags=("relational", "tpch", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q7_Y0) & (F.col("l_shipdate") < Q7_Y1)
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n1 = _nation_of_region(spark, sf_dir, Q7_SUPP_REGION).withColumnRenamed("n_name", "supp_nation")
    n2 = _nation_of_region(spark, sf_dir, Q7_CUST_REGION).withColumnRenamed("n_name", "cust_nation")
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(n1, supp["s_nationkey"] == n1["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(n2, cust["c_nationkey"] == n2["n_nationkey"])
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT l_year,
       round(CAST(sum(CAST(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume ELSE 0 END
                           AS {DEC})) AS DOUBLE)
             / CAST(sum(CAST(volume AS {DEC})) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = '{Q8_TYPE}'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey AND r.r_name = '{Q8_REGION}'
  WHERE l.l_shipdate >= TIMESTAMP '{Q8_Y0}' AND l.l_shipdate < TIMESTAMP '{Q8_Y1}'
) GROUP BY l_year
ORDER BY l_year
""",
    description="TPC-H Q8 shape: NATION_0's market share of PROMO-part "
    "volume sold into ASIA, by year — conditional aggregation "
    "(sum-of-CASE over sum) atop a 7-table join. All dimensions "
    "broadcast; lineitem⋈orders is the only exchange, and the selective "
    "part-type broadcast filter prunes lineitem before it.",
    tags=("relational", "tpch", "join", "conditional-agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q8_Y0) & (F.col("l_shipdate") < Q8_Y1)
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("supp_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n2 = _nation_of_region(spark, sf_dir, Q8_REGION).select(
        F.col("n_nationkey").alias("cust_nationkey")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == n1["supp_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(n2, cust["c_nationkey"] == n2["cust_nationkey"])
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(num.cast(DEC)).cast("double") / F.sum(vol.cast(DEC)).cast("double"), 4
            ).alias("mkt_share")
        )
        .orderBy("l_year")
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
                  AS DOUBLE), 2) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{Q10_LO}' AND o.o_orderdate < TIMESTAMP '{Q10_HI}'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    description="TPC-H Q10 shape: top-20 customers by lost revenue from "
    "returned items in a six-month window. The returnflag filter prunes "
    "lineitem ~3× before the order-key shuffle; the final top-k runs as "
    "TakeOrderedAndProject (per-partition heaps + driver merge), never "
    "a global sort.",
    tags=("relational", "tpch", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_LO) & (F.col("o_orderdate") < Q10_HI)
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle=f"""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_orderstatus = '{Q13_STATUS}'
  GROUP BY c.c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    description="TPC-H Q13 shape: distribution of customers by number "
    "of open orders, zero-order customers included — the left-outer-join "
    "double-aggregation pattern. The status predicate lives in the join "
    "condition (not a WHERE, which would turn the outer join inner). "
    "First agg reduces to one row per customer; the second shuffle "
    "moves only count-cardinality rows (≤ a few hundred).",
    tags=("relational", "tpch", "outer-join", "double-agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    cond = (orders["o_custkey"] == cust["c_custkey"]) & (
        orders["o_orderstatus"] == Q13_STATUS
    )
    return (
        cust.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT round(CAST(sum(CAST(l.l_extendedprice AS {DEC})) AS DOUBLE) / 7.0, 2)
         AS avg_yearly,
       count(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND l.l_quantity < (SELECT {Q17_FRACTION} * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
""",
    description="TPC-H Q17 shape: average yearly revenue lost if "
    "small-quantity Brand#5 orders went unfilled. The correlated scalar "
    "subquery decorrelates into a per-part average computed once over "
    "the brand-pruned lineitem slice and joined back — two scans of the "
    "pruned slice, no per-row re-aggregation. The brand filter reaches "
    "lineitem as a broadcast join before either aggregate.",
    tags=("relational", "tpch", "subquery", "decorrelation"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Decorrelated scalar subquery: one avg row per brand part (tiny →
    # broadcast back onto the probe side).
    thresholds = F.broadcast(
        branded.groupBy("l_partkey").agg(
            (F.lit(Q17_FRACTION) * F.avg("l_quantity")).alias("qty_cap")
        ).withColumnRenamed("l_partkey", "t_partkey")
    )
    small = branded.join(
        thresholds,
        (branded["l_partkey"] == thresholds["t_partkey"])
        & (branded["l_quantity"] < thresholds["qty_cap"]),
    )
    return small.agg(
        F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 2).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_small"),
    )


def _q19_branch_sql(brand: str, max_size: int, qlo: float, qhi: float) -> str:
    return (
        f"(p.p_brand = '{brand}' AND p.p_size BETWEEN 1 AND {max_size}"
        f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
                AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {" OR ".join(_q19_branch_sql(*b) for b in Q19_BRANCHES)}
""",
    description="TPC-H Q19 shape: revenue from three disjunctive "
    "brand/size/quantity branches. The signature stress: the OR "
    "predicate references BOTH sides, so it cannot push below the join "
    "— the planner must still extract the common partkey equi-condition "
    "(broadcast hash join) and evaluate the residual OR inside codegen. "
    "A naive planner degrades to a cartesian product here; ours must "
    "not (asserted in the plan-lint suite).",
    tags=("relational", "tpch", "join", "disjunction"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    branch = None
    for brand, max_size, qlo, qhi in Q19_BRANCHES:
        b = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )
        branch = b if branch is None else (branch | b)
    return (
        li.join(part, (li["l_partkey"] == part["p_partkey"]) & branch)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q21_sole_return_supplier",
    oracle=f"""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = '{Q21_STATUS}'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
    description="TPC-H Q21 shape (adapted: returnflag 'R' stands in for "
    "the receipt-after-commit predicate, which this schema's lineitem "
    "lacks — TESTDATA.md): suppliers solely responsible for a return on "
    "a multi-supplier finalized order. EXISTS → left-semi self-join, "
    "NOT EXISTS → left-anti self-join, both keyed on orderkey with the "
    "suppkey-inequality as a non-equi residual; the 'R' filter prunes "
    "the probe and anti legs before their exchanges, and all legs share "
    "one orderkey partitioning.",
    tags=("relational", "tpch", "subquery", "semi-join", "anti-join"),
)
def q21_sole_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == Q21_STATUS
    ).select("o_orderkey")
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    waiting = (
        l1.join(orders, F.col("l1.l_orderkey") == orders["o_orderkey"])
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, F.col("l1.l_suppkey") == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


Q15_LO, Q15_HI = "1996-01-01", "1996-04-01"
Q9_NAME_FRAGMENT = "red"
Q9_COST_FACTOR = 0.6  # retailprice-derived cost proxy (schema has no partsupp)


@register(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}' AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
    description="TPC-H Q15 shape: the quarter's top revenue supplier(s) "
    "— an aggregate-derived view compared against its own maximum, the "
    "max-of-aggregate scalar-subquery pattern. The revenue view is "
    "computed ONCE and consumed twice (probe + 1-row max, which "
    "broadcasts); revenue is decimal-summed then rounded on both sides "
    "so the equality against the max is exact, never a float-drift "
    "coin-flip.",
    tags=("relational", "tpch", "subquery", "scalar-max"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q15_LO) & (F.col("l_shipdate") < Q15_HI)
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["mx"])
        .join(supp, rev["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q9_profit_by_nation",
    oracle=f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       round(CAST(sum(CAST((l.l_extendedprice * (1 - l.l_discount))
                           - (({Q9_COST_FACTOR} * p.p_retailprice) * l.l_quantity)
                           AS {DEC})) AS DOUBLE), 2) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%{Q9_NAME_FRAGMENT}%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    description="TPC-H Q9 shape (adapted: the cost term derives from "
    "p_retailprice since the schema has no partsupp/ps_supplycost — "
    "TESTDATA.md): profit per supplier nation per year for parts whose "
    "name contains a fragment. The LIKE filter broadcasts from part and "
    "prunes lineitem ~8× before the one fact-fact exchange "
    "(lineitem⋈orders); the profit measure subtracts inside one decimal "
    "cast so both engines sum the identical per-row double.",
    tags=("relational", "tpch", "join", "computed-measure"),
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{Q9_NAME_FRAGMENT}%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) - (
        (F.lit(Q9_COST_FACTOR) * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(nation, supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


Q12_LATE_DAYS = 60


@register(
    "q12_priority_by_returnflag",
    oracle=f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    description="TPC-H Q12 shape (adapted: the schema has no "
    "l_shipmode/l_commitdate/l_receiptdate — TESTDATA.md — so the "
    "grouping key is l_returnflag and 'late' means shipped more than "
    f"{Q12_LATE_DAYS} days after the order date): per return-flag "
    "counts of late lines on high- vs low-priority orders. The classic "
    "Q12 pattern survives intact — a fact-fact join whose predicate "
    "spans BOTH sides (so it cannot push below the join) feeding "
    "conditional SUM(CASE ...) counters. The join is the at-scale "
    "key-partitioned shuffle; the post-join filter runs streamed inside "
    "the same stage, and the 3-group aggregate ships one row per "
    "partition.",
    tags=("relational", "tpch", "conditional-agg", "join"),
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
