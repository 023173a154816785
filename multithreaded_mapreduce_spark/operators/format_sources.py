"""Queries proving the CSV/JSON/ORC connectors reproduce the parquet
answers exactly (the oracle always reads the original parquet, so any
staging or parsing loss would hash-mismatch).

Reference parity: the reference's single source is whitespace text via
``fscanf`` (``1.cpp:260``); these are the engine's ingest surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC, dsum
from ..plans.registry import register
from ..sources.formats import read_staged


@register(
    "csv_source_orders_by_priority",
    oracle=f"""
SELECT o_orderpriority, count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS {DEC})) AS DOUBLE), 2) AS total_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    description="Orders aggregated per priority, read through the CSV "
    "connector (explicit schema, header, microsecond timestamp format) "
    "from a staged CSV copy — must match the oracle computed on the "
    "original parquet bit-for-bit, proving the round-trip is lossless. "
    "CSV is a row format: no pruning or pushdown, ingest-only at scale.",
    tags=("source", "csv", "connector"),
)
def csv_source_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_staged(spark, sf_dir, "orders", "csv")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "json_source_events_hourly",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
""",
    description="Hourly event rollup read through the JSON-lines "
    "connector from a staged copy — timestamps carry an explicit "
    "microsecond format so event-time semantics survive the round-trip; "
    "the oracle reads the original parquet. JSON scans parse every byte "
    "of every row: ingest-only at scale, land to columnar immediately.",
    tags=("source", "json", "connector"),
)
def json_source_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_staged(spark, sf_dir, "events", "json")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "xml_source_customer_segments",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE), 2) AS total_acctbal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    description="Customer segment rollup read through Spark 4's NATIVE "
    "XML connector (rowTag records, explicit schema + timestamp format) "
    "from a staged XML copy — oracle computed on the original parquet, "
    "so any parse/precision loss hash-mismatches. XML parses every tag "
    "of every row: ingest-only at scale, like CSV/JSON.",
    tags=("source", "xml", "connector"),
)
def xml_source_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_staged(spark, sf_dir, "customer", "xml")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "wordcount_custom_source",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents
), cleaned AS (
  SELECT lower(regexp_replace(token, '[^0-9A-Za-z]', '', 'g')) AS word
  FROM toks WHERE length(token) > 0
)
SELECT word, count(*) AS cnt
FROM cleaned
WHERE length(word) > 0
GROUP BY word
ORDER BY word
""",
    description="The flagship word count read through a CUSTOM Python "
    "Data Source (pyspark.sql.datasource): documents.text staged once as "
    "one big plain-text file, scanned by the 'wstokens' source that "
    "byte-range-partitions the file (64 KiB chunks here) and resolves "
    "token ownership at the split boundaries — the reference's "
    "sequential fscanf loop (1.cpp:248-264) as a splittable Spark "
    "source. Must reproduce the parquet-path word counts exactly, "
    "proving the boundary rule loses and duplicates nothing.",
    tags=("source", "custom-datasource", "reference-parity", "text"),
)
def wordcount_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import clean_word
    from ..sources.token_datasource import ensure_staged_text, register_token_source

    register_token_source(spark)
    path = ensure_staged_text(spark, sf_dir)
    toks = (
        spark.read.format("wstokens")
        .option("path", path)
        .option("chunk_bytes", 64 * 1024)
        .load()
    )
    return (
        toks.select(clean_word("token").alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


@register(
    "orc_source_lineitem_q6",
    oracle=f"""
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS {DEC})) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    description="The Q6 scan-aggregate read through the ORC connector "
    "from a staged copy — ORC keeps columnar pruning and predicate "
    "pushdown like parquet, so this is a full-fidelity analytics source, "
    "not just ingest. Oracle reads the original parquet.",
    tags=("source", "orc", "connector", "pushdown"),
)
def orc_source_lineitem_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_staged(spark, sf_dir, "lineitem", "orc").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ------------------------------------------------------------------
# libsvm connector: the MLlib-native sparse-vector text format — the
# interchange format of the classic ML tooling a feature pipeline
# feeds. Stages the embeddings as (label, features) libsvm once, reads
# it back through the built-in connector, and aggregates — value-
# checked against the original parquet, proving the vector round-trip
# (sparse text write → shortest-round-trip doubles → dense restore)
# is exact.
# ------------------------------------------------------------------


def _ensure_staged_libsvm(spark: SparkSession, sf_dir: str) -> str:
    from pyspark.ml.functions import array_to_vector

    from ..sources.formats import staged_format_path
    from ..sources.tables import load_table

    path = staged_format_path(sf_dir, "embeddings", "libsvm")
    import os

    if os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    ):
        return path
    emb = load_table(spark, sf_dir, "embeddings")
    prep = (
        emb.filter(
            F.col("embedding").isNotNull()
            & ~F.exists("embedding", lambda y: y.isNull())
        )
        .select(
            F.coalesce(F.col("label"), F.lit(-1)).cast("double").alias("label"),
            array_to_vector(
                F.transform(F.slice("embedding", 1, 64), lambda y: y.cast("double"))
            ).alias("features"),
        )
    )
    prep.write.mode("overwrite").format("libsvm").save(path)
    return path


@register(
    "libsvm_source_label_stats",
    oracle=f"""
WITH prep AS (
  SELECT CAST(coalesce(label, -1) AS DOUBLE) AS label,
         list_transform(list_slice(embedding, 1, 64), y -> CAST(y AS DOUBLE)) AS v
  FROM embeddings
  WHERE embedding IS NOT NULL
    AND len(list_filter(embedding, y -> y IS NULL)) = 0
), s AS (
  SELECT label,
         v[1] AS c0,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v),
                     (a, b) -> a + b) AS rsum
  FROM prep
)
SELECT CAST(label AS BIGINT) AS label,
       count(*) AS n_vectors,
       CAST(round(CAST(CAST(sum(CAST(c0 AS {DEC})) AS DOUBLE) / count(*)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS mean_c0,
       CAST(round(CAST(CAST(sum(CAST(rsum AS {DEC})) AS DOUBLE) / count(*)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS mean_row_sum
FROM s GROUP BY label ORDER BY label
""",
    description="libsvm source connector round-trip: embeddings staged "
    "once as MLlib's (label, features) sparse-vector text format, read "
    "back through the built-in libsvm reader (explicit numFeatures — "
    "no inference pre-scan), vectors densified and aggregated per "
    "label; the oracle computes the same statistics from the ORIGINAL "
    "parquet, so the sparse text write (shortest-round-trip doubles, "
    "zeros dropped and restored) is proven value-exact. Row sums are "
    "fixed-order IEEE folds (zeros restored by the densify add "
    "nothing); per-label means go through exact decimal sums. Rows "
    "with NULL vectors or NULL elements are excluded on both sides; "
    "NULL labels map to -1 (libsvm requires a label).",
    tags=("source", "libsvm", "vectors", "embedding"),
)
def libsvm_source_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import vector_to_array

    path = _ensure_staged_libsvm(spark, sf_dir)
    back = spark.read.format("libsvm").option("numFeatures", "64").load(path)
    v = vector_to_array(F.col("features"))
    s = back.select(
        "label",
        F.get(v, 0).alias("c0"),
        F.aggregate(v, F.lit(0.0), lambda a, y: a + y).alias("rsum"),
    )
    cnt = F.count(F.lit(1))
    return (
        s.groupBy("label")
        .agg(
            cnt.alias("n_vectors"),
            F.round(
                (F.sum(F.col("c0").cast(DEC)).cast("double") / cnt).cast(
                    "decimal(30,12)"
                ),
                6,
            )
            .cast("double")
            .alias("mean_c0"),
            F.round(
                (F.sum(F.col("rsum").cast(DEC)).cast("double") / cnt).cast(
                    "decimal(30,12)"
                ),
                6,
            )
            .cast("double")
            .alias("mean_row_sum"),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n_vectors",
            "mean_c0",
            "mean_row_sum",
        )
        .orderBy("label")
    )
