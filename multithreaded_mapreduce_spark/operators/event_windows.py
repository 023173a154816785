"""Event-time windowing over the ``events`` table — batch expressions of
the streaming shapes (tumbling, sliding, sessionization). The streaming
package (``streaming/``) runs the same logic through Structured
Streaming; these batch versions are the oracle-checkable semantics.

Scale notes: tumbling/sliding windows are plain keyed aggregations —
they shuffle once on (window, type) and partial-aggregate map-side. At
100 TB the events table would be date-partitioned and the window key
prunes partitions. Sessionization is a windowed scan per user —
hash-partitioned by user_id, no global ordering anywhere.

Extension surface (SURVEY.md §2.2 streaming row): the reference is
strictly batch, one-shot (reference 1.cpp whole file — the word
'window' never appears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

_SESSION_GAP_US = 5 * 60 * 1_000_000  # 5 minutes in microseconds


@register(
    "events_tumbling_hourly",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
""",
    description="Tumbling 1-hour event-time windows × event_type "
    "(F.window — epoch-aligned, so equivalent to date_trunc('hour')). "
    "Rows without an event time are excluded EXPLICITLY in both "
    "engines: F.window silently drops NULL timestamps while SQL "
    "GROUP BY would keep a NULL group (edge-events sweep).",
    tags=("events", "window", "tumbling"),
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sliding_windows",
    oracle=f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value
  FROM events WHERE ts IS NOT NULL
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start,
         event_type, value
  FROM events WHERE ts IS NOT NULL
)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM assigned
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    description="Sliding 1-hour windows every 30 minutes: each event lands "
    "in two windows (oracle materializes both assignments via UNION ALL). "
    "NULL event times excluded explicitly in both engines (F.window "
    "drops them silently; the SQL would keep a NULL group).",
    tags=("events", "window", "sliding"),
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "user_sessions",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM gaps
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM sessions
GROUP BY user_id
ORDER BY user_id
""",
    description="Sessionization via 5-minute inactivity gaps: lag + "
    "conditional cumsum assigns session ids per user, then per-user "
    "session/event rollup (streaming analogue: session_window(ts, '5 min')).",
    tags=("events", "session", "window"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    cum = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(order)
    with_sessions = events.select(
        "user_id",
        "ts",
        "value",
        F.when(gap_us > _SESSION_GAP_US, 1).otherwise(0).alias("new_session"),
    ).select(
        "user_id",
        "ts",
        "value",
        F.sum("new_session").over(cum).alias("session_id"),
    )
    return (
        with_sessions.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_session_window_native",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
), sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM gaps
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 5 MINUTE AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    description="Per-session rollup via Spark's NATIVE session_window "
    "operator (dynamic-gap merging inside the aggregation, no window "
    "pass): one row per (user, session) with start, end (last event + "
    "gap), event count, and value total. Twin of user_sessions, which "
    "derives the same sessions manually with lag + cumsum — the oracle "
    "replays that derivation with the half-open boundary session_window "
    "uses (a gap of exactly 5 min starts a new session). Scale: "
    "session_window is a single partial+final aggregation keyed by "
    "(user, merged-window) — no sort-the-world window function, state "
    "bounded by open sessions per key. NULL event times excluded "
    "explicitly in both engines (session_window drops them silently; "
    "the oracle's lag/cumsum would sort them into a session).",
    tags=("events", "session", "window", "native"),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )
