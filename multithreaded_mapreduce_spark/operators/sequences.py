"""Order-preserving sequence assembly over ``events`` — collapsing a
user's event stream into one ordered row, the operation that turns raw
logs into training examples (conversation turns, clickstreams,
session traces).

The reference never aggregates anything but counts (SURVEY.md §2.1).
Spark has no ORDER BY inside an aggregate, so the idiomatic exact
pattern is: pack (sort keys + payload) into structs, ``collect_list``
per group, ``array_sort`` (struct comparison is field-order
lexicographic, so (ts, event_id) keys make the sort total), then
``transform`` out the payload. All JVM-side, no window pass, no UDF.

Scale notes: one shuffle on user_id with map-side partial
collect_list; the per-user array is bounded by the user's event count
— the same memory bound any sequence-assembly job carries. The sort
happens AFTER grouping on the already-assembled array (O(k log k) per
user), not as a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "user_event_sequences",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       min(ts) AS first_ts,
       max(ts) AS last_ts,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS type_path
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    description="Each user's full event-type path in exact time order "
    "('view->click->purchase->…'), with count and first/last "
    "timestamps. Order-preserving aggregation via struct-packed "
    "collect_list + array_sort on (ts, event_id) + transform + "
    "array_join — Spark's exact equivalent of ORDER BY inside "
    "string_agg, entirely JVM-side with map-side partials.",
    tags=("events", "sequence", "nested", "aggregate"),
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    packed = F.collect_list(F.struct("ts", "event_id", "event_type"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            packed.alias("seq"),
        )
        .select(
            "user_id",
            "n_events",
            "first_ts",
            "last_ts",
            F.array_join(
                F.transform(F.array_sort("seq"), lambda s: s["event_type"]),
                "->",
            ).alias("type_path"),
        )
        .orderBy("user_id")
    )


@register(
    "user_purchase_sequences",
    oracle="""
SELECT user_id,
       count(*) AS n_purchases,
       string_agg(CAST(CAST(round(CAST(value AS DECIMAL(30,6)), 2) AS DECIMAL(30,2)) AS VARCHAR),
                  ',' ORDER BY ts, event_id) AS amount_path
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY user_id
""",
    description="Per-user purchase-amount trajectory in time order, "
    "amounts snapped to 2-decimal strings so the rendering is engine-"
    "independent. Same struct-pack / array_sort / transform pattern as "
    "the type-path query, after a pushed-down event_type filter.",
    tags=("events", "sequence", "nested", "aggregate"),
)
def user_purchase_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    amount = F.round(F.col("value").cast("decimal(30,6)"), 2).cast("decimal(30,2)")
    packed = F.collect_list(F.struct("ts", "event_id", amount.alias("amt")))
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"), packed.alias("seq"))
        .select(
            "user_id",
            "n_purchases",
            F.array_join(
                F.transform(
                    F.array_sort("seq"), lambda s: s["amt"].cast("string")
                ),
                ",",
            ).alias("amount_path"),
        )
        .orderBy("user_id")
    )


@register(
    "user_active_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), anch AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM days
), streaks AS (
  SELECT user_id, anchor, count(*) AS len,
         min(day) AS streak_start, max(day) AS streak_end
  FROM anch GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS active_days,
       min(streak_start) AS first_active,
       max(streak_end) AS last_active
FROM streaks
GROUP BY user_id
ORDER BY user_id
""",
    description="Gaps-and-islands: each user's maximal runs of "
    "consecutive active calendar days, via the row_number-difference "
    "trick (day minus per-user day rank is constant within a run). "
    "ONE data shuffle end-to-end: an explicit repartition on user_id "
    "satisfies the clustered-distribution requirement of every "
    "downstream stage — the (user, day) distinct, the window, and "
    "both aggregates; the only other exchange is the final "
    "result-ordering range sort.",
    tags=("events", "sequence", "islands", "window"),
)
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streak statistics.

    Scale notes: the classic islands formulation needs no self-join —
    one window pass over (user, day) distinct rows assigns each run a
    constant anchor date (``day - row_number()``), after which runs
    are a plain aggregate. The whole pipeline reuses a SINGLE
    partitioning: hash(user_id) satisfies ClusteredDistribution for
    the (user_id, day) dedup, the user_id window, the (user_id,
    anchor) run aggregate, and the final per-user rollup — written
    naively each stage re-shuffles on its own key (one hash exchange
    + the output range sort, plan-asserted in
    tests/test_scale_plans.py). Per-user day counts are calendar-bounded
    (≤ days in the dataset's span), so no user can skew a partition
    beyond ~10³ rows per year of data."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    days = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .repartition("user_id")
        .dropDuplicates(["user_id", "day"])
    )
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    anch = days.select("user_id", "day", F.date_sub("day", rn).alias("anchor"))
    streaks = anch.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
            F.sum("len").alias("active_days"),
            F.min("streak_start").alias("first_active"),
            F.max("streak_end").alias("last_active"),
        )
        .orderBy("user_id")
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events WHERE ts IS NOT NULL
), trans AS (
  SELECT event_type AS from_type, to_type
  FROM ordered WHERE to_type IS NOT NULL
), counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM trans GROUP BY 1, 2
), totals AS (
  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS from_total
  FROM counts GROUP BY 1
)
SELECT c.from_type, c.to_type, c.n_transitions,
       CAST(round(CAST(CAST(c.n_transitions AS DOUBLE) / t.from_total
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS share
FROM counts c
JOIN totals t ON c.from_type IS NOT DISTINCT FROM t.from_type
ORDER BY c.from_type, c.to_type
""",
    description="First-order Markov transition matrix of event types: "
    "each user's stream ordered by (ts, event_id) — a TOTAL order, so "
    "timestamp ties cannot flip lead() between engines — paired with "
    "its successor via one window pass, counted per (from, to), and "
    "row-normalized into transition shares (single exact division, "
    "6-dp snap). One hash shuffle on user_id for the window; the "
    "|types|² count relation and its broadcast totals are trivially "
    "small at any scale. NULL timestamps are excluded explicitly in "
    "both engines (time-defined semantics); a NULL event_type stays a "
    "real row/column via null-safe grouping and join.",
    tags=("events", "sequence", "markov", "behavioral"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = (
        counts.groupBy("from_type")
        .agg(F.sum("n_transitions").alias("from_total"))
        .withColumnsRenamed({"from_type": "t_from"})
    )
    share = F.round(
        (F.col("n_transitions").cast("double") / F.col("from_total")).cast(
            "decimal(30,12)"
        ),
        6,
    ).cast("double")
    return (
        counts.join(
            F.broadcast(totals), F.col("from_type").eqNullSafe(F.col("t_from"))
        )
        .select("from_type", "to_type", "n_transitions", share.alias("share"))
        .orderBy("from_type", "to_type")
    )
