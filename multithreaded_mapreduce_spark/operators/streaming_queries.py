"""Structured Streaming queries registered for the driver harness.

These run the streaming plans from ``streaming/events.py`` to completion
against a memory sink and return the materialized batch result, so the
driver can treat a stream like any other query. The tumbling query
carries the SAME DuckDB oracle as its batch twin
(``events_tumbling_hourly``) — a file-replay stream in complete mode
must reproduce the batch answer exactly, which is the strongest
correctness statement a streaming engine can make without a second
streaming engine to compare against.

Reference parity note: the reference (1.cpp / project.cpp) is strictly
one-shot batch — streaming is extension surface (SURVEY.md §2.2/§2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.numeric import DEC
from ..plans.registry import register
from ..streaming.events import (
    run_stream_to_memory,
    sessionized_stream,
    sliding_counts_stream,
    stream_events,
    tumbling_counts_stream,
)
from ..streaming.stateful import running_user_totals


@register(
    "streaming_tumbling_hourly",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
""",
    description="Structured Streaming twin of events_tumbling_hourly: "
    "readStream(parquet) → watermark 10m → window(1h) × event_type agg → "
    "memory sink, run to completion. Checked against the same batch oracle.",
    tags=("streaming", "events", "window"),
)
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = tumbling_counts_stream(stream_events(spark, sf_dir))
    return run_stream_to_memory(stream, "q_streaming_tumbling_hourly")


@register(
    "streaming_sliding_windows",
    oracle=f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start,
         event_type, value
  FROM events
)
SELECT window_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS {DEC})) AS DOUBLE), 2) AS total_value
FROM assigned
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    description="Structured Streaming twin of events_sliding_windows: "
    "1-hour windows hopping every 30 minutes through readStream, each "
    "event updating two window states. Same batch oracle.",
    tags=("streaming", "events", "window", "sliding"),
)
def streaming_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sliding_counts_stream(stream_events(spark, sf_dir))
    return run_stream_to_memory(stream, "q_streaming_sliding_windows")


@register(
    "streaming_user_sessions",
    oracle=None,  # session_window output isn't ANSI-SQL expressible; the
    # pytest suite checks per-user consistency with the oracle-checked
    # batch `user_sessions` query instead (tests/test_streaming.py)
    description="Native streaming sessionization via session_window(ts, "
    "'5 minutes') per user — stateful merge windows with watermark-bounded "
    "state; rows-only driver check, batch-consistency asserted in tests.",
    tags=("streaming", "events", "session"),
)
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = sessionized_stream(stream_events(spark, sf_dir))
    return run_stream_to_memory(stream, "q_streaming_user_sessions")


@register(
    "streaming_stateful_user_totals",
    oracle=None,  # per-user float accumulation order differs from a SQL
    # sum, so no exact-hash oracle; tests assert 2-dp equality with the
    # batch per-user aggregate instead (tests/test_streaming.py)
    description="Custom stateful streaming operator: running per-user "
    "(count, sum) in explicit GroupState via applyInPandasWithState, "
    "update mode. Final state per user equals the batch aggregate.",
    tags=("streaming", "stateful", "pandas-udf"),
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    stream = running_user_totals(stream_events(spark, sf_dir))
    updates = run_stream_to_memory(
        stream, "q_streaming_stateful_user_totals", output_mode="update"
    )
    # update mode appends one row per user per micro-batch; the final
    # state is the row with the highest running count (monotone per user)
    latest = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("_rn", F.row_number().over(latest))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("user_id")
    )
