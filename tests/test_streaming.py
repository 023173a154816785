"""Structured Streaming parity: the streaming queries must produce the
same results as their oracle-checked batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.streaming.events import (
    run_stream_to_memory,
    sessionized_stream,
    stream_events,
    stream_events_multibatch,
    tumbling_counts_stream,
)

Q = all_queries()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = tumbling_counts_stream(stream_events(spark, sf_dir))
    got = run_stream_to_memory(stream, "stream_tumbling")
    want = Q["events_tumbling_hourly"].builder(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_sessionization_consistent_with_batch(spark, sf_dir):
    stream = sessionized_stream(stream_events(spark, sf_dir))
    got = run_stream_to_memory(stream, "stream_sessions")
    # session_window and the batch lag+cumsum query define sessions the
    # same way → per-user session and event counts must agree
    per_user = (
        got.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    )
    want = {r.user_id: (r.n_sessions, r.n_events) for r in Q["user_sessions"].builder(spark, sf_dir).collect()}
    got_map = {r.user_id: (r.n_sessions, r.n_events) for r in per_user}
    assert got_map == want


def test_stream_is_streaming(spark, sf_dir):
    assert stream_events(spark, sf_dir).isStreaming


def test_multibatch_tumbling_accumulates_across_triggers(spark, sf_dir):
    """With maxFilesPerTrigger=1 over a 4-file split, the tumbling
    aggregation must merge state across four genuine micro-batches and
    still land on the batch answer."""
    stream = tumbling_counts_stream(stream_events_multibatch(spark, sf_dir, n_files=4))
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("mb_tumbling")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()
    assert n_batches >= 4, f"expected >=4 micro-batches, got {n_batches}"
    got = spark.sql("SELECT * FROM mb_tumbling")
    want = Q["events_tumbling_hourly"].builder(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_multibatch_stateful_state_survives_triggers(spark, sf_dir):
    """GroupState must carry per-user accumulators across micro-batches:
    the last update per user equals the batch per-user aggregate."""
    from multithreaded_mapreduce_spark.sources.tables import load_table
    from multithreaded_mapreduce_spark.streaming.stateful import running_user_totals

    stream = running_user_totals(stream_events_multibatch(spark, sf_dir, n_files=4))
    updates = run_stream_to_memory(stream, "mb_stateful", output_mode="update")
    final = (
        updates.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    got = {r.user_id: r.n_events for r in final}
    want = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    # multiple updates per user proves state actually spanned batches
    n_updates = updates.count()
    assert n_updates > len(want), "expected more than one update per user"


def test_parquet_sink_checkpointed_exactly_once(spark, sf_dir, tmp_path):
    """Non-aggregated stream → checkpointed parquet sink: output equals
    the batch filter, and re-running on the same checkpoint writes
    nothing new (committed offsets → exactly-once)."""
    import os

    from multithreaded_mapreduce_spark.sources.tables import load_table
    from multithreaded_mapreduce_spark.streaming.sinks import (
        read_sink,
        run_stream_to_parquet,
    )

    out = os.path.join(str(tmp_path), "clicks")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run():
        clicks = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
        run_stream_to_parquet(clicks.select("event_id", "user_id", "ts"), out, ckpt)

    run()
    want = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click").count()
    assert read_sink(spark, out).count() == want
    run()  # same checkpoint: no new input → no new files
    assert read_sink(spark, out).count() == want


def test_parquet_sink_windowed_append_emits_finalized_windows(spark, sf_dir, tmp_path):
    """Windowed aggregate in append mode publishes a window only after
    the watermark passes it; every published row must carry exactly the
    batch query's value for that window. Single-file replay: all rows
    arrive in one batch (no late-vs-watermark drops), then the no-data
    micro-batch advances the watermark and flushes finalized windows.
    (The random multi-file split would legitimately DROP late rows —
    that's watermark semantics, not a sink property.)"""
    import os

    stream = tumbling_counts_stream(stream_events(spark, sf_dir))
    out = os.path.join(str(tmp_path), "hourly")
    ckpt = os.path.join(str(tmp_path), "ckpt2")
    from multithreaded_mapreduce_spark.streaming.sinks import (
        read_sink,
        run_stream_to_parquet,
    )

    run_stream_to_parquet(stream, out, ckpt)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in read_sink(spark, out).collect()
    }
    assert got, "append sink emitted no finalized windows"
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in Q["events_tumbling_hourly"].builder(spark, sf_dir).collect()
    }
    for key, val in got.items():
        assert want[key] == val, f"window {key}: sink={val} batch={want[key]}"


def test_stateful_totals_equal_batch_aggregate(spark, sf_dir):
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in Q["streaming_stateful_user_totals"].builder(spark, sf_dir).collect()
    }
    from multithreaded_mapreduce_spark.sources.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .collect()
    )
    want = {r.user_id: (r.n_events, r.total_value) for r in batch}
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        gn, gtotal = got[uid]
        assert gn == n
        assert abs(gtotal - total) < 0.02  # float accumulation-order slack


def test_transform_with_state_matches_old_api(spark, sf_dir):
    """Spark 4's transformWithStateInPandas twin must emit row-for-row
    what the applyInPandasWithState operator emits on the same replay.

    Dependency-gated: the TWS Python state-server protocol needs
    protobuf (not shipped in this container) and the RocksDB state
    store provider."""
    pytest.importorskip("google.protobuf")
    from multithreaded_mapreduce_spark.streaming.events import (
        run_stream_to_memory,
        stream_events,
    )
    from multithreaded_mapreduce_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        tws = run_stream_to_memory(
            running_user_totals_tws(stream_events(spark, sf_dir)),
            "tws_totals",
            output_mode="update",
        ).collect()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    old = run_stream_to_memory(
        running_user_totals(stream_events(spark, sf_dir)),
        "old_totals",
        output_mode="update",
    ).collect()
    assert sorted(map(tuple, tws)) == sorted(map(tuple, old))


def test_multibatch_dedup_drops_redelivery_across_triggers(spark, sf_dir):
    """Duplicates delivered in DIFFERENT micro-batches must still be
    dropped: union two multibatch replays so every event arrives twice
    across interleaved triggers, and the deduped row count must equal
    the batch distinct count."""
    from multithreaded_mapreduce_spark.streaming.events import (
        deduped_stream,
        run_stream_to_memory,
    )

    src = stream_events_multibatch(spark, sf_dir, n_files=4).unionByName(
        stream_events_multibatch(spark, sf_dir, n_files=4)
    )
    out = run_stream_to_memory(
        deduped_stream(src).select("event_id", "ts"),
        "t_multibatch_dedup",
        output_mode="append",
    )
    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == n_batch
    assert out.select("event_id").distinct().count() == n_batch


def test_stream_stream_join_equals_batch_self_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_spark.streaming.events import (
        click_purchase_join_stream,
        run_stream_to_memory,
        stream_events,
    )

    clicks = stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    purchases = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    out = run_stream_to_memory(
        click_purchase_join_stream(clicks, purchases),
        "t_stream_stream_join",
        output_mode="append",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if ev.schema["ts"].dataType.simpleString() == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    c = ev.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("c_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    n_expected = c.join(
        p,
        F.expr("user_id = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"),
    ).count()
    assert out.count() == n_expected


def test_stream_stream_left_join_flushes_across_triggers(spark, sf_dir):
    """LEFT OUTER interval join over a 4-trigger chronological replay:
    unmatched clicks must flush as the watermark advances batch over
    batch, and the end state must match the batch left join for every
    click provably below the final flush line (min of both sides'
    watermarks minus the 30min horizon, 1min safety margin)."""
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_spark.streaming.events import (
        click_purchase_join_stream,
        run_stream_to_memory,
        stream_events_multibatch,
    )

    clicks = stream_events_multibatch(spark, sf_dir, n_files=4).filter(
        F.col("event_type") == "click"
    )
    purchases = stream_events_multibatch(spark, sf_dir, n_files=4).filter(
        F.col("event_type") == "purchase"
    )
    out = run_stream_to_memory(
        click_purchase_join_stream(clicks, purchases, how="leftOuter"),
        "t_stream_left_join_mb",
        output_mode="append",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if ev.schema["ts"].dataType.simpleString() == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    mxc = c.agg(F.max("c_ts")).collect()[0][0]
    mxp = p.agg(F.max("p_ts")).collect()[0][0]
    import datetime

    cutoff = min(mxc, mxp) - datetime.timedelta(minutes=41)
    batch = c.filter(F.col("c_ts") <= F.lit(cutoff)).join(
        p,
        F.expr("user_id = p_user AND p_ts > c_ts AND p_ts <= c_ts + INTERVAL 30 MINUTES"),
        "left",
    )
    want_matched = batch.filter(F.col("p_ts").isNotNull()).count()
    want_unmatched = batch.filter(F.col("p_ts").isNull()).count()
    got = out.filter(F.col("c_ts") <= F.lit(cutoff))
    assert got.filter(F.col("p_ts").isNotNull()).count() == want_matched
    assert got.filter(F.col("p_ts").isNull()).count() == want_unmatched


def test_watermark_drops_late_beyond_allowed_lateness(spark, tmp_path):
    """The watermark contract Spark actually guarantees: once a window
    is finalized (its end fell behind the watermark and append mode
    emitted it), a late arrival for that window is DROPPED — the window
    is never re-opened, so no duplicate append row appears. A
    below-watermark row whose window is still live, by contrast, may
    still be aggregated (watermark dropping is best-effort before
    eviction — measured, not assumed, on this engine). The replay:

    - batch0: three 10:xx events + one 12:00 → watermark becomes 11:50
    - batch1: 13:00 → the [10:00,11:00) window is evicted, emitting 3;
      watermark becomes 12:50
    - batch2: 10:30 targets the finalized window → guaranteed drop;
      12:05 is below-watermark but its [12:00,13:00) window is live
    - batch3: 14:30 pushes the watermark past 13:00, flushing the
      [12:00,13:00) window
    """
    import os
    import time

    def day(hhmm: str) -> str:
        return f"2024-03-01 {hhmm}:00"

    batches = [
        [day(t) for t in ("10:00", "10:10", "10:20", "12:00")],
        [day("13:00")],
        [day("10:30"), day("12:05")],
        [day("14:30")],
    ]
    src = str(tmp_path / "late_events")
    os.makedirs(src)
    base = int(time.time())
    for k, ts_list in enumerate(batches):
        pdf = spark.createDataFrame(
            [(t,) for t in ts_list], "ts_str string"
        ).select(F.col("ts_str").cast("timestamp").alias("ts"))
        f = os.path.join(src, f"batch{k}.parquet")
        pdf.coalesce(1).write.mode("overwrite").parquet(f)
        os.utime(f, (base + 10 * k, base + 10 * k))
        for p in os.listdir(f):
            os.utime(os.path.join(f, p), (base + 10 * k, base + 10 * k))

    schema = spark.read.parquet(os.path.join(src, "batch0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*.parquet"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM late_drop").collect()
    starts = [str(r.window_start) for r in rows]
    assert len(starts) == len(set(starts)), "finalized window re-opened!"
    got = {str(r.window_start): r.n_events for r in rows}
    assert got == {
        # the 10:30 arrival after finalization is NOT here (still 3)
        "2024-03-01 10:00:00": 3,
        # 12:00 + the below-watermark-but-live-window 12:05 arrival
        "2024-03-01 12:00:00": 2,
        # batch1's 13:00 event, flushed once 14:30 moved the watermark
        "2024-03-01 13:00:00": 1,
    }


def test_multibatch_stream_static_join_equals_batch(spark, sf_dir):
    """Stream-static enrichment across multiple triggers: the dim join
    holds no state, so an N-trigger replay must still converge to the
    batch join+aggregate (complete mode re-emits the full result)."""
    from multithreaded_mapreduce_spark.sources.tables import load_table
    from multithreaded_mapreduce_spark.streaming.events import (
        enriched_segment_stream,
        stream_events_multibatch,
    )

    customer = load_table(spark, sf_dir, "customer")
    stream = enriched_segment_stream(
        stream_events_multibatch(spark, sf_dir, n_files=4), customer
    )
    got = run_stream_to_memory(stream, "stream_static_mb")
    ev = load_table(spark, sf_dir, "events")
    from multithreaded_mapreduce_spark.functions.numeric import DEC

    want = (
        ev.join(
            customer.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
            "user_id",
        )
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2).alias("total_value"),
        )
    )
    cols = ["window_start", "c_mktsegment", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_ewma_coefficients_stay_in_sync():
    """streaming/stateful.py keeps a local copy of the EWMA
    coefficients to avoid importing the operator layer; they must
    never drift from the batch operator's."""
    from multithreaded_mapreduce_spark.operators import timeseries as batch
    from multithreaded_mapreduce_spark.streaming import stateful as stream

    assert stream.EWMA_ALPHA == batch.EWMA_ALPHA
    assert stream.EWMA_BETA == batch._EWMA_BETA


def test_streaming_ewma_matches_batch_operator(spark, sf_dir):
    """End-state parity with the batch fold itself (the oracle gate
    already checks the recursive CTE; this pins the two ENGINE paths
    to each other, including the multi-batch day-straddling replay)."""
    from multithreaded_mapreduce_spark.operators.streaming_queries import (
        streaming_ewma_daily,
    )
    from multithreaded_mapreduce_spark.operators.timeseries import events_ewma_daily

    got = {
        (r.event_type, r.day): (r.daily_total, r.ewma)
        for r in streaming_ewma_daily(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.day): (r.daily_total, r.ewma)
        for r in events_ewma_daily(spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_cusum_matches_batch_operator(spark, sf_dir):
    """End-state parity of the streaming CUSUM twin with the batch fold
    (the oracle gate already checks the recursive CTE; this pins the
    two ENGINE paths to each other across the multi-batch replay —
    including the global mean recomputed from state each emission)."""
    from multithreaded_mapreduce_spark.operators.streaming_queries import (
        streaming_cusum_daily,
    )
    from multithreaded_mapreduce_spark.operators.timeseries import events_cusum_daily

    got = {
        (r.event_type, r.day): (r.daily_total, r.cusum, r.drift_flag)
        for r in streaming_cusum_daily(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.day): (r.daily_total, r.cusum, r.drift_flag)
        for r in events_cusum_daily(spark, sf_dir).collect()
    }
    assert got == want
    # non-degenerate: the replay produces at least one live chain value
    assert any(c is not None for (_t, c, _f) in got.values())


def test_streaming_holt_matches_batch_operator_and_constants(spark, sf_dir):
    """End-state parity of the streaming Holt twin with the batch fold,
    plus the coefficient-copy equality guard (the streaming layer keeps
    local constants to stay import-free of operator modules)."""
    import multithreaded_mapreduce_spark.operators.timeseries as ts
    import multithreaded_mapreduce_spark.streaming.stateful as st
    from multithreaded_mapreduce_spark.operators.streaming_queries import (
        streaming_holt_daily,
    )
    from multithreaded_mapreduce_spark.operators.timeseries import events_holt_daily

    assert (st.HOLT_ALPHA, st.HOLT_A1, st.HOLT_BETA, st.HOLT_B1) == (
        ts.HOLT_ALPHA, ts._HOLT_A1, ts.HOLT_BETA, ts._HOLT_B1
    )
    got = {
        (r.event_type, r.day): (r.daily_total, r.level, r.trend, r.forecast_next)
        for r in streaming_holt_daily(spark, sf_dir).collect()
    }
    want = {
        (r.event_type, r.day): (r.daily_total, r.level, r.trend, r.forecast_next)
        for r in events_holt_daily(spark, sf_dir).collect()
    }
    assert got == want
    assert any(l is not None for (_t, l, _b, _f) in got.values())
