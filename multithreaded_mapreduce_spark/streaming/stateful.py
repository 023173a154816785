"""Custom stateful streaming operator: running per-user aggregates via
``applyInPandasWithState`` — the escape hatch for streaming semantics
the built-in windowed aggregations can't express (per-key accumulators,
custom eviction, ML feature state, ...).

State is one row per user (event count + value sum), Arrow-batched in
and out. On a live feed the watermark-driven timeout would evict idle
users' state; with the file-replay source the query processes the whole
history and the final state equals the batch per-user aggregate — which
is exactly what the test asserts (tests/test_streaming.py).

Scale: state is hash-partitioned by user_id across executors and
checkpointed incrementally (RocksDB state store on a real cluster), so
state size scales with distinct keys, never with events processed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in explicit group state.

    Expects a streaming events DataFrame (``stream_events``); emits one
    updated row per user per micro-batch.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
