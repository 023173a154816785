"""Structural invariants of the behavioral/statistical analytics:
funnel monotonicity, retention bounds, moment-statistics sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.plans.registry import all_queries

Q = all_queries()


def test_funnel_is_monotone(spark, sf_dir):
    rows = Q["funnel_view_click_purchase"].builder(spark, sf_dir).collect()
    assert [r.stage for r in rows] == ["view", "click", "purchase"]
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True), "funnel stages must shrink"
    assert rows[0].conv_from_first == 1.0
    assert all(0.0 <= r.conv_from_first <= 1.0 for r in rows)


def test_retention_week0_is_full(spark, sf_dir):
    rows = Q["cohort_weekly_retention"].builder(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.retention <= 1.0
        assert r.n_active <= r.cohort_size
        if r.week_offset == 0:
            # every user is active in their own first week by construction
            assert r.retention == 1.0


def test_moment_stats_match_numpy(spark, sf_dir):
    import numpy as np

    got = {
        r.l_returnflag: r
        for r in Q["lineitem_moment_stats"].builder(spark, sf_dir).collect()
    }
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, grp in li.groupby("l_returnflag"):
        x, y = grp["l_quantity"].to_numpy(), grp["l_extendedprice"].to_numpy()
        r = got[flag]
        assert r.n == len(x)
        assert math.isclose(r.mean_qty, x.mean(), rel_tol=1e-6)
        assert math.isclose(r.stddev_price, y.std(ddof=1), rel_tol=1e-6)
        assert math.isclose(
            r.corr_qty_price, float(np.corrcoef(x, y)[0, 1]), rel_tol=1e-5, abs_tol=1e-6
        )
        slope, intercept = np.polyfit(x, y, 1)
        assert math.isclose(r.regr_slope, float(slope), rel_tol=1e-5, abs_tol=1e-6)
        assert math.isclose(
            r.regr_intercept, float(intercept), rel_tol=1e-5, abs_tol=1e-3
        )


def test_histogram_partitions_orders(spark, sf_dir):
    df = Q["order_price_histogram"].builder(spark, sf_dir)
    rows = df.collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.bucket_lo == r.bucket * 25_000.0
        assert r.bucket_lo <= r.min_price <= r.max_price < r.bucket_lo + 25_000.0


def test_q18_threshold_holds(spark, sf_dir):
    rows = Q["q18_large_volume_customers"].builder(spark, sf_dir).collect()
    assert all(r.sum_qty > 300 for r in rows)


def test_event_sequence_path_matches_count(spark, sf_dir):
    rows = Q["user_event_sequences"].builder(spark, sf_dir).collect()
    for r in rows:
        assert len(r.type_path.split("->")) == r.n_events
        assert r.first_ts <= r.last_ts


def test_edit_distance_pairs_are_tight(spark, sf_dir):
    rows = Q["dedup_edit_distance"].builder(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.edits <= 5
        assert r.doc_a < r.doc_b


def test_schema_evolution_buckets_cover_all_orders(spark, sf_dir):
    rows = Q["schema_evolution_orders"].builder(spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert any(r.o_orderpriority == "<pre-schema>" for r in rows)


def test_ffd_packing_invariants(spark, sf_dir):
    from multithreaded_mapreduce_spark.operators.pipeline_prep import (
        MAX_SEQ_TOKENS,
    )

    bins = Q["pack_sequences_ffd"].builder(spark, sf_dir).collect()
    assert bins, "packing must produce at least one bin"
    assert all(r.bin_tokens <= MAX_SEQ_TOKENS for r in bins)
    # bin ids are dense per chunk
    by_chunk: dict[int, list[int]] = {}
    for r in bins:
        by_chunk.setdefault(r.chunk, []).append(r.bin_id)
    for ids in by_chunk.values():
        assert sorted(ids) == list(range(len(ids)))

    # exactly-once: packed totals equal the corpus totals
    docs = Q["token_counting"].builder(spark, sf_dir)
    total = docs.agg(
        F.sum("n_ws_tokens").alias("t"), F.count("*").alias("d")
    ).collect()[0]
    assert sum(r.bin_tokens for r in bins) == total.t
    assert sum(r.n_docs for r in bins) == total.d

    # greedy largest-first packs at least as tight as the order-preserving
    # cumsum packer (same capacity, same docs)
    seqs = Q["pack_training_sequences"].builder(spark, sf_dir).collect()
    assert len(bins) <= len(seqs)


def test_ffd_packing_partitioning_independent(spark, sf_dir):
    q = Q["pack_sequences_ffd"].builder
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).repartition(7).orderBy("chunk", "bin_id").collect()]
    assert a == b


def test_chunk_documents_survives_empty_token_docs(spark, tmp_path):
    """Docs whose text cleans to zero tokens must yield zero chunks, not
    an 'Illegal sequence boundaries' error (sequence(1, 0) throws while
    the DuckDB oracle's generate_series(1, 0) returns empty)."""
    import pandas as pd

    d = tmp_path / "sf_empty"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma delta", "", "   "],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
        }
    ).to_parquet(d / "documents.parquet")
    rows = Q["chunk_documents"].builder(spark, str(d)).collect()
    assert {r.doc_id for r in rows} == {1}
    assert all(r.n_chunk_tokens > 0 for r in rows)


def test_approx_count_distinct_within_sketch_tolerance(spark, sf_dir):
    """The query's self-verifying output: exact twins match an
    independent count_distinct, and the 3%-band booleans all hold."""
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_spark.plans.registry import all_queries
    from multithreaded_mapreduce_spark.sources.tables import load_table

    rows = {
        r.l_returnflag: r
        for r in all_queries()["approx_count_distinct_parts"]
        .builder(spark, sf_dir)
        .collect()
    }
    exact = {
        r.l_returnflag: (r.parts, r.supps)
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.count_distinct("l_suppkey").alias("supps"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, row in rows.items():
        assert (row.exact_parts, row.exact_supps) == exact[flag], flag
        assert row.parts_within_3pct and row.supps_within_3pct, row
