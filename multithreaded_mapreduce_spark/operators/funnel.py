"""User-behavior analytics over ``events``: ordered funnel conversion
and weekly cohort retention.

The reference has no users, time, or sequences (its input is a bag of
words — SURVEY.md §1.1); these are the event-analytics staples a
product events table exists for.

Scale notes: the funnel is a chain of per-user MIN aggregates, each a
map-side-combinable groupBy on user_id — every stage reduces to one
row per surviving user before the next join, and all three stage
tables share the user_id partitioning so AQE coalesces the joins onto
one exchange. Cohort retention shuffles events once by user_id (first
touch), once by (cohort, offset) — both partial-aggregated; the cohort
size table is |weeks| rows and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

WEEK_SECONDS = 7 * 24 * 3600


def _snap6(c) -> F.Column:  # type: ignore[name-defined]
    return F.round(c.cast("decimal(30,12)"), 6).cast("double")


@register(
    "funnel_view_click_purchase",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
s AS (SELECT 1 AS stage_no, 'view' AS stage, count(*) AS users FROM v
      UNION ALL SELECT 2, 'click', count(*) FROM c
      UNION ALL SELECT 3, 'purchase', count(*) FROM p)
SELECT stage_no, stage, users,
       CAST(round(CAST(CAST(users AS DOUBLE) / nullif(max(users) OVER (), 0)
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS conv_from_first
FROM s ORDER BY stage_no
""",
    description="Ordered 3-stage funnel (view → click → purchase): a "
    "user converts a stage only with an event strictly after their "
    "previous stage's first event. Each stage is a per-user MIN "
    "aggregate joined to the previous stage — map-side combinable, one "
    "row per surviving user, all stages co-partitioned on user_id.",
    tags=("events", "funnel", "behavior"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(etype: str, prev: DataFrame, prev_ts: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")

    def stage(no: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("users"),
        )

    stages = stage(1, "view", v).unionByName(stage(2, "click", c)).unionByName(
        stage(3, "purchase", p)
    )
    # Scalar aggregate + broadcast, not an unpartitioned window: the
    # global max is computed by a parallel partial+final agg and joined
    # back as a 1-row broadcast, so no stage ever single-partitions.
    top = F.broadcast(stages.agg(F.max("users").alias("top_users")))
    return (
        stages.crossJoin(top)
        .select(
            "stage_no",
            "stage",
            "users",
            # nullif: an empty funnel (top stage = 0 users) yields NULL
            # conversion rates in both engines instead of an ANSI
            # divide-by-zero error
            _snap6(
                F.col("users").cast("double") / F.nullif(F.col("top_users"), F.lit(0))
            ).alias("conv_from_first"),
        )
        .orderBy("stage_no")
    )


@register(
    "cohort_weekly_retention",
    oracle=f"""
WITH fw AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY user_id),
act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk FROM events),
ret AS (SELECT f.cohort_week,
               (CAST(epoch(a.wk) AS BIGINT) - CAST(epoch(f.cohort_week) AS BIGINT))
                 // {WEEK_SECONDS} AS week_offset,
               count(*) AS n_active
        FROM fw f JOIN act a ON f.user_id = a.user_id
        GROUP BY 1, 2),
sz AS (SELECT cohort_week, count(*) AS cohort_size FROM fw GROUP BY cohort_week)
SELECT r.cohort_week, r.week_offset, s.cohort_size, r.n_active,
       CAST(round(CAST(CAST(r.n_active AS DOUBLE) / s.cohort_size
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS retention
FROM ret r JOIN sz s ON r.cohort_week = s.cohort_week
ORDER BY r.cohort_week, r.week_offset
""",
    description="Weekly cohort retention: users grouped by the ISO week "
    "of their first event; for each (cohort, week-offset) the share of "
    "the cohort active that week. First-touch and activity are both "
    "per-user aggregates co-partitioned on user_id; the retention matrix "
    "is |weeks|² rows and the cohort-size side broadcasts.",
    tags=("events", "cohort", "retention", "behavior"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    fw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    ret = (
        fw.join(act, "user_id")
        .groupBy(
            "cohort_week",
            F.expr(
                f"(unix_timestamp(wk) - unix_timestamp(cohort_week)) div {WEEK_SECONDS}"
            ).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sz = fw.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        ret.join(F.broadcast(sz), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            "n_active",
            _snap6(F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )
