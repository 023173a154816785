"""As-of (time-travel) join: each left row matches the single right row
with the greatest timestamp <= its own, per key — the canonical
time-series operator (quotes-to-trades, config-to-event, attribution).

Spark has no ASOF JOIN operator (the reference has no joins at all —
SURVEY.md §2.2), so this composes one from primitives, per the brief's
custom-operator ladder: (a) composition of existing DataFrame ops.
The classic union trick:

    1. tag right rows 0 and left rows 1, align schemas, union
    2. one window per key ordered by (ts, tag): ``last(right_payload,
       ignorenulls)`` carries the most recent right row forward
    3. keep only left rows — each now holds its as-of match

Cost shape: ONE shuffle on the key + an in-partition sort — strictly
better than the naive range join (quadratic per key) and the same
shape a dedicated ASOF implementation uses. At 100 TB both sides
hash-partition by user; no broadcast, no data explosion: the union is
|L|+|R| rows and stays |L|+|R| through the window.

The right side is ordered (ts, tag) so a right row at exactly the left
row's timestamp is visible to it — inclusive ``>=`` semantics, matching
DuckDB's native ASOF JOIN, which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    right_payload: tuple[str, ...],
) -> DataFrame:
    """Left as-of join: every ``left`` row + the ``right_payload`` columns
    of the most recent ``right`` row with ``right.ts <= left.ts`` on the
    same ``key`` (null payload when no such row exists)."""
    l_cols = left.columns
    r = right.select(
        key,
        ts,
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in (key, ts)],
    )
    l = left.select(
        key,
        ts,
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_payload],
        *[F.col(c) for c in l_cols if c not in (key, ts)],
    )
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = r.unionByName(l).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_payload
        ],
    )
    return (
        carried.filter(F.col("_tag") == 1)
        .select(
            *[c for c in l_cols],
            *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_payload],
        )
    )


@register(
    "asof_purchase_attribution",
    oracle="""
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
       v.event_id AS asof_event_id, v.ts AS asof_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
""",
    description="As-of join: every purchase attributed to that user's most "
    "recent view at-or-before it (null when none). Spark side is the "
    "union + last-ignorenulls-window composition; oracle is DuckDB's "
    "native ASOF LEFT JOIN.",
    tags=("join", "asof", "events", "timeseries"),
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        purchases, views, key="user_id", ts="ts", right_payload=("event_id", "ts")
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_event_id"),
        F.col("asof_ts"),
    ).orderBy("event_id")
