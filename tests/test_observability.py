"""Production-observability surfaces: single-pass pipeline metrics via
``Observation``, idempotent foreachBatch sinks, and AQE's runtime
partition coalescing (the mechanism that right-sizes reducer counts at
any scale without manual tuning).
"""

from __future__ import annotations

import os

from pyspark.sql import Observation
from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.sources.tables import load_table


def test_observation_metrics_ride_the_main_pass(spark, sf_dir):
    """df.observe() collects pipeline metrics DURING the action — no
    second scan. This is how a corpus job publishes row counts and
    quality tallies without doubling its I/O."""
    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("corpus_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        # CollectMetrics forbids DISTINCT aggregates; the HLL sketch is
        # exact at |langs|=5 cardinality
        F.approx_count_distinct("lang").alias("n_langs"),
    )
    # one action drives both the query result and the metrics
    n_en = observed.filter(F.col("lang") == "en").count()
    metrics = obs.get
    assert metrics["n_docs"] == docs.count()
    assert metrics["total_chars"] == docs.agg(F.sum(F.length("text"))).first()[0]
    assert metrics["n_langs"] == docs.select("lang").distinct().count()
    assert 0 < n_en <= metrics["n_docs"]


def test_foreachbatch_sink_is_idempotent_per_batch(spark, sf_dir, tmp_path):
    """foreachBatch + overwrite-by-batch-directory: replaying a batch id
    (as Spark does after a crash-before-commit) rewrites the same
    directory instead of duplicating rows — the standard exactly-once
    recipe for sinks without transactional append."""
    from multithreaded_mapreduce_spark.streaming.events import stream_events_multibatch

    out = str(tmp_path / "batches")
    seen: list[int] = []

    def write_batch(df, batch_id: int) -> None:
        seen.append(batch_id)
        df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

    stream = stream_events_multibatch(spark, sf_dir, n_files=3).select(
        "event_id", "event_type"
    )
    q = stream.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) >= 3

    total = spark.read.parquet(os.path.join(out, "batch=*")).count()
    want = load_table(spark, sf_dir, "events").count()
    assert total == want

    # simulate the post-crash replay of the last batch: same id, same
    # data → same directory overwritten, total unchanged
    last = max(seen)
    replay = spark.read.parquet(os.path.join(out, f"batch={last}"))
    replay_rows = replay.collect()
    df_again = spark.createDataFrame(replay_rows, replay.schema)
    write_batch(df_again, last)
    assert spark.read.parquet(os.path.join(out, "batch=*")).count() == want


def test_aqe_coalesces_overpartitioned_shuffle(spark, sf_dir):
    """With 32 shuffle partitions configured but only a few KB of
    shuffle data, AQE must coalesce reducers at runtime — proof the
    session relies on adaptive sizing rather than hand-tuned partition
    counts (the only strategy that survives a 1000× scale change)."""
    nation = load_table(spark, sf_dir, "nation")
    agg = nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()  # materialize so the adaptive plan is final
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
