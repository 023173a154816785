"""TPC-H Q2/Q11/Q16/Q20 shapes adapted to the synthetic schema via the
lineitem part–supplier bridge.

The schema ships no ``partsupp`` table, but ``lineitem`` carries
``l_partkey`` AND ``l_suppkey`` (TESTDATA.md), so the partsupp-family
queries survive with their signature shapes intact by deriving the
part–supplier relation from actual shipments:

* Q2  — min-cost supplier per part (correlated MIN decorrelated to a
  per-part rank), supply cost := min observed unit price.
* Q11 — "important stock": parts whose shipped value exceeds a
  threshold share of the global total (scalar aggregate subquery).
* Q16 — distinct supplier count per part group with NOT-IN-style
  supplier exclusion.
* Q20 — suppliers concentrating a part family's shipments in one year
  (semi-join chain over two correlated aggregates).

The reference has no joins at all (SURVEY.md §2.2); these complete the
engine's TPC-H coverage to every shape the schema can express.

Scale notes: every plan aggregates lineitem FIRST (map-side-combinable
groupBys keyed on part/supplier), so the big table shuffles once at
(part, supp) grain and every later join handles only aggregate-sized
relations; dimensions broadcast. Thresholds compare exact decimal sums
with integer scaling (val*2000 > tot*125/100 etc. rewritten as
decimal-exact multiplies), so no float boundary can flip membership
between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

Q2_REGION = "EUROPE"
Q2_TYPE, Q2_MAX_SIZE = "STANDARD", 10
Q11_SHARE_NUM, Q11_SHARE_DEN = 125, 100  # val·|parts| > tot·1.25
Q16_EXCLUDE_BRAND = "Brand#1"
Q20_PREFIX = "red"
Q20_Y0, Q20_Y1 = "1996-01-01", "1997-01-01"
Q20_FRAC_DEN = 5  # 1996 qty > total/5


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT c.l_partkey, c.l_suppkey, c.supply_cost, s.s_name, s.s_acctbal, n.n_name
  FROM cost c
  JOIN supplier s ON c.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{Q2_REGION}'
), ranked AS (
  SELECT e.*, row_number() OVER (PARTITION BY l_partkey
                                 ORDER BY supply_cost, l_suppkey) AS rk
  FROM eligible e
)
SELECT p.p_partkey, p.p_name, k.s_name, k.n_name, k.s_acctbal,
       CAST(round(CAST(k.supply_cost AS DECIMAL(30,12)), 4) AS DOUBLE) AS supply_cost
FROM ranked k
JOIN part p ON k.l_partkey = p.p_partkey
WHERE k.rk = 1 AND p.p_type = '{Q2_TYPE}' AND p.p_size <= {Q2_MAX_SIZE}
ORDER BY p.p_partkey
""",
    description=f"TPC-H Q2 shape: cheapest {Q2_REGION} supplier per "
    f"small {Q2_TYPE} part, supply cost derived as the minimum observed "
    "unit price over the lineitem bridge. The correlated MIN subquery "
    "decorrelates to one (part, supplier) aggregate of lineitem plus a "
    "per-part rank; supplier/nation/region/part all broadcast. Unit "
    "price is one double division per row — identical in both engines — "
    "and ties break on supplier key.",
    tags=("relational", "tpch", "join", "subquery"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q2_REGION)
        .select("r_regionkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE))
        .select("p_partkey", "p_name")
    )
    eligible = (
        cost.join(F.broadcast(supp), cost["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    rk = W.partitionBy("l_partkey").orderBy("supply_cost", "l_suppkey")
    return (
        eligible.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            F.round(F.col("supply_cost").cast("decimal(30,12)"), 4)
            .cast("double")
            .alias("supply_cost"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q11_important_parts",
    oracle=f"""
WITH v AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS {DEC})) AS val
  FROM lineitem GROUP BY 1
), t AS (
  SELECT sum(val) AS tot, count(*) AS n_parts FROM v
)
SELECT v.l_partkey AS p_partkey,
       round(CAST(v.val AS DOUBLE), 2) AS part_value
FROM v, t
WHERE v.val * t.n_parts * {Q11_SHARE_DEN} > t.tot * {Q11_SHARE_NUM}
ORDER BY part_value DESC, p_partkey
""",
    description="TPC-H Q11 shape: parts whose total shipped value "
    "exceeds 1.25× the average part's share of the global total. The "
    "global total is a scalar aggregate broadcast back as one row (no "
    "single-partition window), and the membership test multiplies exact "
    "decimal sums by integer constants — no float boundary can flip a "
    "part in or out between engines. lineitem shuffles once at part "
    "grain.",
    tags=("relational", "tpch", "subquery", "ratio"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    v = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("val")
    )
    t = F.broadcast(
        v.agg(F.sum("val").alias("tot"), F.count(F.lit(1)).alias("n_parts"))
    )
    return (
        v.crossJoin(t)
        .filter(
            F.col("val") * F.col("n_parts") * Q11_SHARE_DEN
            > F.col("tot") * Q11_SHARE_NUM
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle=f"""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> '{Q16_EXCLUDE_BRAND}'
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    description=f"TPC-H Q16 shape: how many qualified suppliers ship "
    f"each (brand, type, size) part group, excluding {Q16_EXCLUDE_BRAND} "
    "and negative-balance suppliers (the complaints stand-in) via a "
    "broadcast anti-join. The part–supplier relation dedups from "
    "lineitem at (part, supp) grain first — the only fact-table "
    "shuffle — then the distinct-count groups by broadcast part "
    "attributes.",
    tags=("relational", "tpch", "distinct", "anti-join"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != Q16_EXCLUDE_BRAND)
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        ps.join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .join(F.broadcast(part), ps["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_concentrated_shippers",
    oracle=f"""
WITH red AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '{Q20_PREFIX}%'
), tot AS (
  SELECT l_suppkey, sum(CAST(l_quantity AS {DEC})) AS q
  FROM lineitem JOIN red ON l_partkey = p_partkey
  GROUP BY 1
), y AS (
  SELECT l_suppkey, sum(CAST(l_quantity AS {DEC})) AS q
  FROM lineitem JOIN red ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q20_Y0}' AND l_shipdate < TIMESTAMP '{Q20_Y1}'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, n.n_name,
       CAST(y.q AS DOUBLE) AS qty_1996,
       CAST(tot.q AS DOUBLE) AS qty_total
FROM y
JOIN tot USING (l_suppkey)
JOIN supplier s ON y.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE y.q * {Q20_FRAC_DEN} > tot.q
ORDER BY s.s_suppkey
""",
    description=f"TPC-H Q20 shape: suppliers who shipped more than 1/"
    f"{Q20_FRAC_DEN} of their all-time '{Q20_PREFIX}*' part quantity "
    "inside 1996 (the availqty comparison re-expressed over the "
    "shipment bridge). Two correlated per-supplier aggregates "
    "decorrelate into two map-side-combinable groupBys over the "
    "broadcast-filtered part family; the membership test compares "
    "exact decimal sums integer-scaled, so both engines agree at the "
    "boundary. Quantities are whole numbers stored as doubles → the "
    "decimal casts are exact.",
    tags=("relational", "tpch", "semi-join", "subquery"),
)
def q20_concentrated_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(Q20_PREFIX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    fam = li.join(red, li["l_partkey"] == F.col("p_partkey"))
    tot = fam.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("q_tot")
    )
    y = (
        fam.filter(
            (F.col("l_shipdate") >= Q20_Y0) & (F.col("l_shipdate") < Q20_Y1)
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q_y"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        y.join(tot, "l_suppkey")
        .filter(F.col("q_y") * Q20_FRAC_DEN > F.col("q_tot"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("q_y").cast("double").alias("qty_1996"),
            F.col("q_tot").cast("double").alias("qty_total"),
        )
        .orderBy("s_suppkey")
    )
