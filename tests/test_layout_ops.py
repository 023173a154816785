"""Invariants for the physical-layout operators beyond the oracle
parity gate (tests/test_oracle_parity.py runs them side-by-side with
DuckDB; tests/test_adversarial_fixtures.py runs them over edge data):

* the Morton interleave matches a bit-twiddling Python reference and
  honors the per-bucket span bound the audit exists to demonstrate;
* the Bloom prefilter admits every true member (no false negatives —
  the property that makes the confirming join sufficient) and its
  false-positive mass stays under the geometry's design bound;
* the shard plan partitions the corpus exactly (counts and bytes are
  conserved, ids stay in range).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.operators.layout import (
    BLOOM_K,
    BLOOM_SEGMENT,
    N_SHARDS,
    Z_BITS,
    Z_BUCKET_BITS,
    _bloom_pos,
    _z_interleave,
    bloom_prefilter_semi_join,
    shard_layout_plan,
    zorder_layout_audit,
)
from multithreaded_mapreduce_spark.sources.tables import load_table


def _z_ref(x: int, y: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_interleave_matches_python_reference(spark):
    # deterministic pseudo-random 16-bit pairs plus the corners
    pairs = [(0, 0), (1, 0), (0, 1), (65535, 65535), (65535, 0), (0, 65535)]
    pairs += [((97 * k * k + 13 * k) % 65536, (89 * k * k + 7 * k) % 65536) for k in range(50)]
    df = spark.createDataFrame(pairs, "xk long, yk long").selectExpr(
        "xk", "yk", f"({_z_interleave('xk', 'yk', 'div')}) AS zkey"
    )
    for r in df.collect():
        assert r.zkey == _z_ref(r.xk, r.yk), (r.xk, r.yk)


def test_zorder_buckets_bound_both_dimension_spans(spark, sf_dir):
    """The top Z_BUCKET_BITS of the Morton key fix the top
    ceil/floor-split bits of EACH dimension, so every bucket's span is
    bounded on both axes — the data-skipping property the audit
    reports. With 6 bucket bits, x contributes 3 and y 3: spans are
    below 2^(Z_BITS-3)."""
    rows = zorder_layout_audit(spark, sf_dir).collect()
    assert rows, "audit returned no buckets"
    x_bound = 1 << (Z_BITS - Z_BUCKET_BITS // 2)
    y_bound = 1 << (Z_BITS - (Z_BUCKET_BITS - Z_BUCKET_BITS // 2))
    for r in rows:
        assert 0 <= r.zbucket < (1 << Z_BUCKET_BITS)
        assert r.ck_span < x_bound, r
        assert r.day_span < y_bound, r
    # and the buckets partition the table
    orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_rows for r in rows) == orders


def test_bloom_prefilter_has_no_false_negatives_and_low_fpr(spark, sf_dir):
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    bits = cust.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("c_custkey"), p) for p in range(BLOOM_K)])
        ).alias("pos")
    ).distinct()
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    passed = orders
    for p in range(BLOOM_K):
        b = bits.alias(f"b{p}")
        passed = passed.join(
            F.broadcast(b),
            _bloom_pos(F.col("o_custkey"), p) == F.col(f"b{p}.pos"),
            "left_semi",
        )
    n_pass = passed.count()
    n_exact = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"], "left_semi"
    ).count()
    n_total = orders.count()
    # no false negatives: every true member's probes are set bits
    assert n_pass >= n_exact
    # false-positive mass well under the (9k/131072)^3-class design
    # bound — 1% of the table is orders of magnitude of headroom
    assert n_pass - n_exact <= max(1, n_total // 100), (n_pass, n_exact, n_total)


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    via_bloom = {
        r.o_orderpriority: (r.n_orders, r.total_revenue)
        for r in bloom_prefilter_semi_join(spark, sf_dir).collect()
    }
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        r.o_orderpriority: r.n_orders
        for r in orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }
    assert {k: v[0] for k, v in via_bloom.items()} == plain


def test_shard_plan_partitions_the_corpus_exactly(spark, sf_dir):
    rows = shard_layout_plan(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    totals = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce("n_chars", F.lit(0))).alias("b"),
    ).collect()[0]
    assert all(0 <= r.shard_id < N_SHARDS for r in rows)
    assert len({r.shard_id for r in rows}) == len(rows)  # one row per shard
    assert sum(r.n_docs for r in rows) == totals.n
    assert sum(r.shard_bytes for r in rows) == totals.b


def test_rendezvous_resharding_moves_the_minimum(spark, sf_dir):
    """HRW's defining property, measured not assumed: growing the
    shard set only moves keys whose global argmax lands on an ADDED
    shard — retained shards lose nothing."""
    from multithreaded_mapreduce_spark.operators.layout import (
        RDV_NEW,
        RDV_OLD,
        rendezvous_shard_moves,
    )

    rows = rendezvous_shard_moves(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == docs
    for r in rows:
        assert 0 <= r.shard_id < RDV_NEW
        if r.shard_id < RDV_OLD:
            assert r.n_moved == 0, r  # retained shards keep every doc
        else:
            assert r.n_moved == r.n_docs, r  # added shards only gain
    moved = sum(r.n_moved for r in rows)
    # expected fraction (RDV_NEW-RDV_OLD)/RDV_NEW = 0.2; binomial noise
    # at the sf0.001 corpus size stays well inside ±0.1
    assert abs(moved / docs - (RDV_NEW - RDV_OLD) / RDV_NEW) < 0.1


def test_column_stats_profile_invariants(spark, sf_dir):
    from multithreaded_mapreduce_spark.operators.audit import (
        _PROFILE_COLS,
        column_stats_profile,
    )

    rows = {r.column_name: r for r in column_stats_profile(spark, sf_dir).collect()}
    assert set(rows) == {c for c, _ in _PROFILE_COLS}
    n = load_table(spark, sf_dir, "orders").count()
    for c, kind in _PROFILE_COLS:
        r = rows[c]
        assert r.n_rows == n
        assert 0 <= r.n_nulls <= n
        assert 0 <= r.ndv <= n - r.n_nulls
        if kind == "num":
            assert r.min_str is None and r.max_str is None
            if r.ndv:
                assert r.min_num <= r.max_num
        else:
            assert r.min_num is None and r.max_num is None
            if r.ndv:
                assert r.min_str <= r.max_str


def test_column_stats_profile_approx_bounded_by_exact(spark, sf_dir):
    """VERDICT r7 task 5: the approx twin. Every deterministic column
    (n_rows, n_nulls, typed min/max) must be bit-equal to the exact
    profile's; approx ndv must land within 15% of exact (HLL++ default
    rsd is 5%); and the multi-distinct Expand operator must DISAPPEAR
    from the approx plan — that x|columns| map-side row blowup is
    exactly what the 100 TB knob buys back."""
    import io
    from contextlib import redirect_stdout

    from multithreaded_mapreduce_spark.operators.audit import (
        _PROFILE_COLS,
        column_stats_profile,
        column_stats_profile_approx,
    )

    exact = {r.column_name: r for r in column_stats_profile(spark, sf_dir).collect()}
    adf = column_stats_profile_approx(spark, sf_dir)
    approx = {r.column_name: r for r in adf.collect()}
    assert set(approx) == {c for c, _ in _PROFILE_COLS}
    for c, _kind in _PROFILE_COLS:
        e, a = exact[c], approx[c]
        assert (a.n_rows, a.n_nulls, a.min_num, a.max_num, a.min_str, a.max_str) == (
            e.n_rows, e.n_nulls, e.min_num, e.max_num, e.min_str, e.max_str
        )
        if e.ndv:
            assert abs(a.ndv - e.ndv) <= 0.15 * e.ndv, (c, a.ndv, e.ndv)

    def plan(df) -> str:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("simple")
        return buf.getvalue()

    assert "Expand" in plan(column_stats_profile(spark, sf_dir))
    assert "Expand" not in plan(adf)


def test_bloom_positions_match_hashlib_reference(spark):
    """The probe-position math (md5-prefix fold mod 2^17) against an
    independent hashlib implementation on synthetic keys — verifies
    the composition end-to-end off the production corpus, like the
    rendezvous test in tests/test_randomized_props.py."""
    import hashlib
    import random

    from multithreaded_mapreduce_spark.operators.layout import (
        BLOOM_BITS,
        BLOOM_HEX_DIGITS,
        BLOOM_K,
    )

    def py_pos(key, probe):
        h = hashlib.md5(f"bloom{probe}:{key}".encode()).hexdigest()
        return int(h[:BLOOM_HEX_DIGITS], 16) % BLOOM_BITS

    keys = [0, 1, 2**40, 10**15 + 7] + [
        random.Random(99).randrange(10**9) for _ in range(30)
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: [r[f"p{p}"] for p in range(BLOOM_K)]
        for r in df.select(
            "k", *[_bloom_pos(F.col("k"), p).alias(f"p{p}") for p in range(BLOOM_K)]
        ).collect()
    }
    for k in keys:
        assert got[k] == [py_pos(k, p) for p in range(BLOOM_K)], k
