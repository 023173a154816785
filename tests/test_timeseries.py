"""Structural invariants of the time-series operators: spine density,
gap-fill semantics, and cross-grain rollup consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.plans.registry import all_queries

Q = all_queries()


def test_gapfill_spine_is_dense_and_filled(spark, sf_dir):
    rows = Q["events_gapfill_resample"].builder(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    n_slots = {t: len(v) for t, v in by_type.items()}
    # every event_type shares the same global spine
    assert len(set(n_slots.values())) == 1
    for t, series in by_type.items():
        ts = [r.slot for r in series]
        deltas = {(b - a).total_seconds() for a, b in zip(ts, ts[1:])}
        assert deltas == {900.0}, f"{t}: spine not dense 15-min: {sorted(deltas)[:3]}"
        # forward fill: once a value is seen, filled_avg is never null and
        # equals the last non-null avg_value
        last = None
        for r in series:
            if r.avg_value is not None:
                last = r.avg_value
            assert r.filled_avg == last
            if r.n_events == 0:
                assert r.avg_value is None  # gap rows carry no raw average


def test_rollup_grains_are_consistent(spark, sf_dir):
    df = Q["events_multires_rollup"].builder(spark, sf_dir)
    totals = {
        r.level: (r.n, round(r.v, 2))
        for r in df.groupBy("level")
        .agg(F.sum("n_events").alias("n"), F.sum("total_value").alias("v"))
        .collect()
    }
    # each grain partitions the same event stream: counts identical,
    # value totals equal up to the per-row output rounding
    assert totals["minute"][0] == totals["hour"][0] == totals["day"][0]
    assert abs(totals["minute"][1] - totals["day"][1]) < 0.1
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert totals["minute"][0] == n_events


def test_rollup_day_rows_bound(spark, sf_dir):
    df = Q["events_multires_rollup"].builder(spark, sf_dir)
    n_day = df.filter(F.col("level") == "day").count()
    # 30 days of data x 5 event types
    assert n_day <= 31 * 5


def test_event_transition_shares_sum_to_one(spark, sf_dir):
    """Each from_type's outgoing transition shares sum to 1 (up to the
    6-dp snap × fan-out), and counts reconcile with the raw stream:
    every event except each user's last contributes one transition."""
    from multithreaded_mapreduce_spark.plans.registry import all_queries
    from pyspark.sql import functions as F

    rows = all_queries()["event_transition_matrix"].builder(spark, sf_dir).collect()
    assert rows
    by_from: dict[str, float] = {}
    fanout: dict[str, int] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.share
        fanout[r.from_type] = fanout.get(r.from_type, 0) + 1
    for ft, s in by_from.items():
        assert abs(s - 1.0) <= 5e-7 * fanout[ft] + 1e-9, (ft, s)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("ts").isNotNull()
    )
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users


def test_mad_detector_flags_planted_wild_day(spark, tmp_path):
    """A single 50x day must be flagged, and — the robustness property —
    its own magnitude must not drag the median/MAD enough to flag any
    ordinary day. Daily totals reconcile by construction."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    for day in range(14):
        n = 10
        for k in range(n):
            v = 100.0 + (day % 3)  # mild, regular variation
            if day == 7:
                v = 5000.0  # the wild day
            rows.append(
                (day * 100 + k, base + dt.timedelta(days=day, minutes=k), "click", 7, v)
            )
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = all_queries()["events_mad_anomalies"].builder(spark, str(tmp_path)).collect()
    flagged_days = {r.day.isoformat() for r in out}
    assert "2024-01-08" in flagged_days, out  # UTC day of the planted spike
    assert len(flagged_days) == 1, flagged_days  # no collateral flags
    assert all(r.robust_z > 1.5 for r in out)
