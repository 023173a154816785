"""Scalar-function operators: string / date / JSON / array expressions.

The reference's only scalar function is ``clean_word`` (``1.cpp:60-68``);
these queries exercise the wider built-in function surface the driver
tables need (SURVEY.md §2.2). Everything stays a JVM-side Column
expression — zero Python UDFs — so whole-stage codegen covers each plan
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC, dsum
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substring(p_name, 1, 8) AS name_prefix,
       replace(p_type, ' ', '_') AS type_snake,
       concat(p_brand, ':', p_type) AS brand_type,
       length(p_name) - length(replace(p_name, ' ', '')) + 1 AS n_words
FROM part
WHERE p_size >= 40
ORDER BY p_partkey
""",
    description="String expression battery on part: upper/length/substring/"
    "replace/concat and a word-count-by-length idiom.",
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            (
                F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))) + 1
            ).alias("n_words"),
        )
        .orderBy("p_partkey")
    )


@register(
    "monthly_order_stats",
    oracle=f"""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2) AS month_total
FROM orders
GROUP BY date_trunc('month', o_orderdate)
ORDER BY order_month
""",
    description="date_trunc month rollup of orders — the batch shape of a "
    "time-partitioned aggregation (at 100 TB: partition pruning on a "
    "date-partitioned layout).",
    tags=("scalar", "date"),
)
def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("month_total"))
        .orderBy("order_month")
    )


@register(
    "date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month_num,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
WHERE o_orderkey <= 200
ORDER BY o_orderkey
""",
    description="Timestamp component extraction (year/month/day/quarter + "
    "date cast).",
    tags=("scalar", "date"),
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month_num"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "json_event_props",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       -- nullif + TRY_CAST: DuckDB's regexp_extract returns '' (not
       -- NULL) on a non-match, and CAST('' AS BIGINT) errors — NULL
       -- here matches Spark's get_json_object on malformed/missing JSON
       min(TRY_CAST(nullif(regexp_extract(props, '"k": (-?\\d+)', 1), '') AS BIGINT)) AS min_k,
       max(TRY_CAST(nullif(regexp_extract(props, '"k": (-?\\d+)', 1), '') AS BIGINT)) AS max_k,
       round(CAST(sum(TRY_CAST(nullif(regexp_extract(props, '"k": (-?\\d+)', 1), '') AS BIGINT)) AS DOUBLE)
             / count(*), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="JSON-in-string extraction: get_json_object(props, '$.k') "
    "aggregated per event type (oracle extracts the same field via regex — "
    "same semantics, engine-native path on each side).",
    tags=("scalar", "json"),
)
def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.sum("k").cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "array_functions",
    oracle="""
WITH norms AS (
  SELECT vec_id,
         CAST(round(CAST(sqrt(CAST(sum(CAST(x * x AS DECIMAL(30,20))) AS DOUBLE))
                         AS DECIMAL(30,10)), 6) AS DOUBLE) AS l2
  FROM (
    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
  )
  GROUP BY vec_id
)
SELECT e.vec_id, e.label,
       len(e.embedding) AS dim,
       -- LEFT JOIN (not grouping over unnest) so a NULL embedding keeps
       -- its row with NULL dim/norm, exactly as Spark's per-row fold
       -- does; an empty (but non-NULL) array norms to 0 on both sides
       coalesce(n.l2, CASE WHEN e.embedding IS NOT NULL
                           THEN CAST(0.0 AS DOUBLE) END) AS l2_norm
FROM embeddings e LEFT JOIN norms n ON e.vec_id = n.vec_id
ORDER BY e.vec_id
""",
    description="Higher-order array functions over 64-dim embeddings: "
    "size + L2 norm via transform/aggregate with a decimal-exact fold "
    "(no Python UDF — stays in codegen).",
    tags=("scalar", "array", "vector"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # exact decimal fold of x² keeps the sum order-independent, so the
    # DuckDB oracle can sum the unnested elements in any order
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: (x.cast("double") * x.cast("double")).cast("decimal(30,20)")),
        F.lit(0).cast("decimal(30,20)"),
        lambda acc, x: (acc + x).cast("decimal(30,20)"),
    )
    return (
        emb.select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            F.round(F.sqrt(sq_sum.cast("double")).cast("decimal(30,10)"), 6)
            .cast("double")
            .alias("l2_norm"),
        )
        .orderBy("vec_id")
    )


@register(
    "map_functions",
    oracle="""
WITH pt AS (
  -- NULL event_type rows are excluded: a map key cannot be NULL
  -- (Spark raises NULL_MAP_KEY), so the per-type map is defined over
  -- typed events only — spelled out identically on both sides
  SELECT user_id, event_type, count(*) AS c
  FROM events
  WHERE event_type IS NOT NULL
  GROUP BY user_id, event_type
), mx AS (
  SELECT user_id, max(c) AS mc FROM pt GROUP BY user_id
)
SELECT p.user_id,
       count(*) AS n_types,
       CAST(sum(p.c) AS BIGINT) AS total_events,
       min(p.event_type) FILTER (WHERE p.c = m.mc) AS top_type,
       min(m.mc) AS top_count
-- null-safe join: a NULL user_id is still a group (Spark's map path
-- keeps it via groupBy), but a plain equi-join would drop it
FROM pt p JOIN mx m ON p.user_id IS NOT DISTINCT FROM m.user_id
GROUP BY p.user_id
ORDER BY p.user_id
""",
    description="Map-type functions over a per-user event_type→count "
    "map built with map_from_entries(collect_list(struct)): size, "
    "aggregate over map_values, and argmax via map_filter + map_keys "
    "with a deterministic min-key tiebreak. The map stays internal — "
    "the output is scalar columns, so the DuckDB oracle needs no map "
    "type. Scale: one partial+final aggregation to (user, type) "
    "pairs, then one to users; the map is bounded by the event-type "
    "cardinality, never the event count.",
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # a map key cannot be NULL (NULL_MAP_KEY): untyped events are out of
    # the per-type map by contract, filtered identically in the oracle
    per_type = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("event_type", "c")))
    )
    mapped = per_type.groupBy("user_id").agg(m.alias("type_counts"))
    tc = F.col("type_counts")
    total = F.aggregate(
        F.map_values(tc), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    top_count = F.array_max(F.map_values(tc))
    top_type = F.array_min(
        F.map_keys(F.map_filter(tc, lambda _, v: v == top_count))
    )
    return mapped.select(
        "user_id",
        F.size(tc).cast("long").alias("n_types"),
        total.alias("total_events"),
        top_type.alias("top_type"),
        top_count.alias("top_count"),
    ).orderBy("user_id")


@register(
    "json_typed_extraction",
    oracle="""
SELECT CAST(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) // 10 AS BIGINT)
         AS k_decile,
       count(*) AS n_events,
       min(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS min_k,
       max(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS max_k
FROM events
WHERE regexp_extract(props, '"k": (-?\\d+)', 1) <> ''
GROUP BY k_decile
ORDER BY k_decile
""",
    description="Schema-on-read JSON parsing: from_json(props, 'k LONG') "
    "turns the string column into a typed struct ONCE per row (vs "
    "get_json_object's per-path re-parse in json_event_props — its twin), "
    "then buckets k into deciles. Malformed rows parse to null and drop "
    "out, matching the oracle's empty-extract filter. At scale the parse "
    "cost is one pass and the struct prunes to the single accessed field.",
    tags=("scalar", "json", "schema-on-read"),
)
def json_typed_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        F.from_json("props", "k LONG").alias("p")
    ).select(F.col("p.k").alias("k")).filter(F.col("k").isNotNull())
    return (
        parsed.groupBy(F.floor(F.col("k") / 10).alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_decile")
    )


@register(
    "json_variant_stats",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(count(DISTINCT CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT))
            AS BIGINT) AS n_distinct_k
FROM events
WHERE regexp_extract(props, '"k": (-?\\d+)', 1) <> ''
GROUP BY event_type
ORDER BY event_type
""",
    description="Semi-structured analytics through Spark 4's VARIANT "
    "type: try_parse_json(props) lands the JSON as a binary-encoded "
    "variant (parsed once, no schema declared — the open-schema shape a "
    "100 TB event lake actually has), variant_get('$.k', 'long') does "
    "typed path extraction, and the per-type rollup aggregates it. "
    "Unlike from_json there is no fixed struct: unknown/missing paths "
    "return null and drop out, matching the oracle's regex-extract "
    "filter. At scale variant columns store shredded in parquet, so "
    "path access prunes like a real column.",
    tags=("scalar", "json", "variant", "spark4"),
)
def json_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        events.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count_distinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )
