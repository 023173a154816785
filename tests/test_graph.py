"""PageRank verified against a NumPy power iteration on the same
edge weights, plus sketch-percentile error bounds."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.operators.graph import (
    DAMPING,
    N_ITER,
    cooccurrence_edges,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries

Q = all_queries()


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    edges = cooccurrence_edges(spark, sf_dir).collect()
    tokens = sorted({r.src for r in edges} | {r.dst for r in edges})
    idx = {t: i for i, t in enumerate(tokens)}
    n = len(tokens)
    w = np.zeros((n, n))
    for r in edges:
        w[idx[r.src], idx[r.dst]] = r.weight
    p = w / w.sum(axis=1, keepdims=True)  # row-stochastic transition
    rank = np.full(n, 1.0 / n)
    for _ in range(N_ITER):
        rank = (1 - DAMPING) / n + DAMPING * (p.T @ rank)

    got = {r.token: r.rank for r in Q["token_pagerank"].builder(spark, sf_dir).collect()}
    assert set(got) == set(tokens)
    for t in tokens:
        assert math.isclose(got[t], rank[idx[t]], rel_tol=1e-6, abs_tol=1e-9), t
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-6)


def test_approx_percentiles_within_bounds(spark, sf_dir):
    """The query's own rank-band audit must agree with an independent
    positional check of the raw sketch values."""
    rows = Q["approx_price_percentiles"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_in_band and r.p90_in_band and r.p99_in_band, r
    # independent check: recompute the raw sketch values and bracket
    # them positionally against the sorted group (the pre-r4 test body)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = {
        r.l_returnflag: r.pcts
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias(
                "pcts"
            )
        )
        .collect()
    }
    for flag, (p50, p90, p99) in approx.items():
        vals = sorted(
            r.l_extendedprice
            for r in li.filter(F.col("l_returnflag") == flag).collect()
        )
        for p, got in ((0.5, p50), (0.9, p90), (0.99, p99)):
            k = int(p * (len(vals) - 1))
            slack = max(3, len(vals) // 1000)
            lo = vals[max(0, k - slack)]
            hi = vals[min(len(vals) - 1, k + slack)]
            assert lo <= got <= hi, (flag, p, got, lo, hi)


def test_rolling_median_is_robust_center(spark, sf_dir):
    rows = Q["events_rolling_median"].builder(spark, sf_dir).limit(500).collect()
    for r in rows:
        assert r.roll_median is not None


def test_triangle_counts_match_bruteforce(spark, sf_dir):
    """Independent check of the degree-ordered triangle census: a
    Python brute force over all vertex triples of the (tiny at
    sf0.001) co-occurrence graph."""
    from itertools import combinations

    edges = cooccurrence_edges(spark, sf_dir).collect()  # symmetric
    adj: dict[str, set[str]] = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
    tokens = sorted(adj)
    tri = dict.fromkeys(tokens, 0)
    for u, v, w in combinations(tokens, 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for x in (u, v, w):
                tri[x] += 1

    got = {
        r.token: (r.degree, r.triangles, r.clustering)
        for r in Q["token_triangle_counts"].builder(spark, sf_dir).collect()
    }
    assert set(got) == set(tokens)
    for t in tokens:
        d = len(adj[t])
        assert got[t][0] == d, (t, "degree")
        assert got[t][1] == tri[t], (t, "triangles")
        expect = 2 * tri[t] / (d * (d - 1)) if d >= 2 else 0.0
        assert math.isclose(got[t][2], expect, abs_tol=5e-7), (t, "clustering")
