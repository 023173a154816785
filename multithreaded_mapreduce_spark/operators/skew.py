"""Skew-handling joins: key salting, plus the AQE runtime fallback.

A shuffled join hash-partitions both sides on the key; one hot key
sends its entire row population to a single reducer, and at 100 TB the
job runs at the speed of that one straggler. Salting splits each hot
key into ``n`` sub-keys: the fact side gets a deterministic salt in
[0, n) per row, the (smaller) build side is replicated once per salt,
and the join runs on (key, salt) — fan-out n on the small side buys
n-way parallelism on the hot keys. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles moderate skew at runtime;
explicit salting is the belt-and-braces path for the pathological keys
a pipeline knows about in advance.

Salting is semantically transparent, so the registered query carries a
plain-join DuckDB oracle — the correctness gate proves the rewrite
changes the plan, not the answer.

Extension surface (SURVEY.md §4.2 partitioning row): the reference's
only partitioning is static equal chunks with the remainder to the
last worker (reference 1.cpp:274-280), with no skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

N_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = N_SALTS,
    salt_source: Column | None = None,
    how: str = "inner",
    force_shuffle: bool = True,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with ``n_salts``-way salting.

    ``salt_source`` must be an expression unique-ish per fact row (a row
    id column) so salts spread deterministically; it defaults to a hash
    of all fact columns. The dim side is exploded once per salt value —
    keep it the small side.

    ``force_shuffle`` pins a shuffle-hash join: salting only matters for
    shuffled joins (a broadcastable dim never skews), and at test scale
    Spark would otherwise broadcast the dim and bypass the salted
    exchange this operator exists to exercise.
    """
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in fact.columns])
    salted_fact = fact.withColumn("_salt", F.pmod(salt_source, F.lit(n_salts)).cast("int"))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    if force_shuffle:
        salted_dim = salted_dim.hint("shuffle_hash")
    joined = salted_fact.join(salted_dim, [key, "_salt"], how)
    return joined.drop("_salt")


@register(
    "skew_salted_event_user_totals",
    oracle=f"""
SELECT e.user_id,
       c.c_mktsegment,
       count(*) AS n_events,
       round(CAST(sum(CAST(e.value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.user_id, c.c_mktsegment
ORDER BY e.user_id
""",
    description="events ⋈ customer on user_id executed as an 8-way salted "
    "join (deterministic per-row salt on the fact side, dim replicated per "
    "salt) — the explicit skew mitigation for hot keys. The oracle is the "
    "plain join: salting must not change the answer.",
    tags=("join", "skew", "salting", "scale"),
)
def skew_salted_event_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        events,
        customer,
        "user_id",
        salt_source=F.xxhash64("event_id"),
    )
    return (
        joined.groupBy("user_id", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )
