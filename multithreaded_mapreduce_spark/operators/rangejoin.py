"""Range (interval) join: pair rows whose timestamps fall within a
bounded distance of each other — sessions×events, sensor alignment,
fraud windows.

Spark executes a raw inequality join as BroadcastNestedLoopJoin (every
pair tested — O(|L|·|R|) and undistributable when neither side
broadcasts). The scale rewrite is **time-bucket blocking**: map each
left row to its bucket, each right row to its bucket AND the adjacent
bucket(s) its window can reach, equi-join on the bucket id, then apply
the exact range predicate to the (small) candidate set. With bucket
width >= the range bound, every qualifying pair shares a bucket, so the
rewrite is lossless — and the join is a plain hash-partitioned
equi-join that scales like any other. Same technique DuckDB/"IEJoin"
engines apply internally; here it's explicit because Spark's planner
does not do it for you.

The DuckDB oracle is the naive inequality join — proving the blocked
rewrite changes the plan, not the answer.

Extension surface (SURVEY.md §2.2 joins row): the reference has no
joins at all — no second relation ever exists (reference 1.cpp whole
file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

RANGE_MINUTES = 30
_BUCKET_US = RANGE_MINUTES * 60 * 1_000_000


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delta_us: int,
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``key`` restricted to pairs
    with ``|left_ts - right_ts| <= max_delta_us``, via bucket blocking
    (bucket width = max_delta_us; right rows replicate to the two
    adjacent buckets so every qualifying pair lands in a shared bucket).
    """
    lb = left.withColumn("_bkt", F.floor(F.unix_micros(F.col(left_ts)) / max_delta_us))
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.array(
                F.floor(F.unix_micros(F.col(right_ts)) / max_delta_us) - 1,
                F.floor(F.unix_micros(F.col(right_ts)) / max_delta_us),
                F.floor(F.unix_micros(F.col(right_ts)) / max_delta_us) + 1,
            )
        ),
    )
    exact = (
        F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts)))
        <= max_delta_us
    )
    return lb.join(rb, [key, "_bkt"]).filter(exact).drop("_bkt")


@register(
    "range_join_error_context",
    oracle=f"""
SELECT e.event_id AS error_id,
       e.user_id,
       o.event_id AS nearby_id,
       o.event_type AS nearby_type,
       CAST(epoch_us(o.ts) - epoch_us(e.ts) AS BIGINT) AS delta_us
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type <> 'error') o
  ON e.user_id = o.user_id
 AND abs(epoch_us(e.ts) - epoch_us(o.ts)) <= {_BUCKET_US}
ORDER BY error_id, nearby_id
""",
    description=f"Range join: every error event paired with the same "
    f"user's non-error events within ±{RANGE_MINUTES} minutes, executed "
    "as a lossless time-bucket-blocked equi-join (bucket width = range "
    "bound, 3-way right replication) instead of the quadratic "
    "nested-loop Spark would plan for the raw inequality. Oracle is the "
    "naive inequality join.",
    tags=("join", "range", "events", "scale"),
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("e_ts")
    )
    others = events.filter(F.col("event_type") != "error").select(
        F.col("event_id").alias("nearby_id"),
        "user_id",
        F.col("event_type").alias("nearby_type"),
        F.col("ts").alias("o_ts"),
    )
    joined = range_join_buckets(
        errors,
        others,
        key="user_id",
        left_ts="e_ts",
        right_ts="o_ts",
        max_delta_us=_BUCKET_US,
    )
    return (
        joined.select(
            "error_id",
            "user_id",
            "nearby_id",
            "nearby_type",
            (F.unix_micros("o_ts") - F.unix_micros("e_ts")).alias("delta_us"),
        )
        .orderBy("error_id", "nearby_id")
    )
