"""r10 optimization-round tests: the fixed-width set-bitmask compare
(operators/dedup.py, the setmask block) and the literal-rows helper
(functions/rows.py).

The bitmask path replaces array_intersect with W AND+popcounts when
the corpus' distinct token-id universe fits SETMASK_MAX_VOCAB bit
positions. The engaged single-word (W=1) path is already exercised
against the DuckDB oracle by every dedup row of the adversarial
edge-docs sweep (vocab ~30 there); what needs its own coverage is

* the MULTI-word path (vocab > 64 → W >= 2, the shape a 10× corpus
  takes under the disjoint-replica-vocabulary generator),
* the off/on value identity that makes the knob a pure plan decision,
* the sampled-variant skip (the A/B-measured gate), and
* the kill switch / cap disengage.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

import multithreaded_mapreduce_spark.operators.dedup as dd
from multithreaded_mapreduce_spark.plans.caching import (
    release_result_memos,
    release_tracked,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.sources.tables import TABLES, table_path

from .conftest import SF_DIR
from .oracle import compare_query

_Q = all_queries()


@pytest.fixture(scope="module")
def wide_vocab_dir(tmp_path_factory, spark) -> str:
    """sf0.001 with documents rewritten over a ~90-token vocabulary so
    the setmask decision lands on W = 2 words — near-dup structure is
    preserved (clone pairs per base doc) so the pair relations are
    non-trivial."""
    d = str(tmp_path_factory.mktemp("wide_vocab_sf"))
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    schema = spark.read.parquet(table_path(SF_DIR, "documents")).schema
    rows = []
    did = 0
    for base in range(30):
        toks = [f"w{(base * 7 + j) % 90}" for j in range(12)]
        text = " ".join(toks)
        near = " ".join(toks[:11] + [f"w{(base * 7) % 90}"])  # ~0.85 jaccard
        for s in (text, text, near):  # exact dup + near dup per base
            rows.append((did, s, "en", f"src{did % 20}", len(s)))
            did += 1
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "_docs_tmp"))
    part = next(
        f for f in os.listdir(os.path.join(d, "_docs_tmp")) if f.endswith(".parquet")
    )
    shutil.copyfile(os.path.join(d, "_docs_tmp", part), table_path(d, "documents"))
    return d


def _snapshot(spark, name: str, sf_dir: str):
    release_tracked()
    release_result_memos()
    spark.catalog.clearCache()
    return sorted(tuple(r) for r in _Q[name].builder(spark, sf_dir).collect())


@pytest.mark.parametrize(
    "name",
    ["dedup_jaccard_pairs", "dedup_minhash_verified", "dedup_components",
     "dedup_containment", "dedup_incremental_neardup"],
)
def test_multiword_mask_off_on_identity(spark, wide_vocab_dir, name, monkeypatch):
    """W=2 engaged path returns the identical row multiset as the
    array path — the optimization is a pure plan decision."""
    monkeypatch.setenv("MMR_SETMASK", "off")
    dd._SETMASK_DECISION_CACHE.clear()
    off = _snapshot(spark, name, wide_vocab_dir)
    monkeypatch.setenv("MMR_SETMASK", "auto")
    dd._SETMASK_DECISION_CACHE.clear()
    on = _snapshot(spark, name, wide_vocab_dir)
    assert dd.LAST_SETMASK_DECISION["engage"], dd.LAST_SETMASK_DECISION
    assert dd.LAST_SETMASK_DECISION["n_words"] >= 2, dd.LAST_SETMASK_DECISION
    assert off == on
    assert len(on) > 0  # the fixture plants real dup/near-dup pairs


def test_multiword_mask_oracle_parity(spark, wide_vocab_dir):
    """The engaged W=2 path also matches the registered DuckDB oracle
    (value hash, not just self-consistency)."""
    dd._SETMASK_DECISION_CACHE.clear()
    for name in ("dedup_jaccard_pairs", "dedup_minhash_verified"):
        compare_query(spark, wide_vocab_dir, _Q[name].builder, _Q[name].oracle)
    assert dd.LAST_SETMASK_DECISION["engage"]


def test_sampled_variants_literal_only_and_identical(spark, monkeypatch):
    """The eval-sampled pair relations are bounded by construction and
    measured SLOWER with the JOIN-based mask build — they may engage
    only the zero-extra-stage LITERAL path (vocab ≤ 64), and the
    engaged output must equal the array path's."""
    monkeypatch.setattr(dd, "EVAL_SAMPLE_TARGET_DOCS", 100)  # force k > 1
    dd._EVAL_SAMPLE_CACHE.clear()

    def eval_pairs_rows():
        release_tracked()
        release_result_memos()
        spark.catalog.clearCache()
        return sorted(tuple(r) for r in dd._eval_pairs(spark, SF_DIR).collect())

    monkeypatch.setenv("MMR_SETMASK", "off")
    dd._SETMASK_DECISION_CACHE.clear()
    off = eval_pairs_rows()
    monkeypatch.setenv("MMR_SETMASK", "auto")
    dd._SETMASK_DECISION_CACHE.clear()
    on = eval_pairs_rows()
    assert off == on and len(on) > 0
    # the sampled site engaged via literal positions (vocab fits 64
    # here); had the vocab exceeded the literal cap, the sampled path
    # must fall back to arrays, never the join build — pinned below
    sampled = [
        d
        for (_s, site), d in dd._SETMASK_DECISION_CACHE.items()
        if site.startswith("jaccard_groupssample")
    ]
    assert sampled and all("vocab_ids" in d for d in sampled), sampled
    # simulate a wide-vocab corpus: literal cap 0 → sampled variants
    # must NOT take the join-mask branch (use_masks False)
    monkeypatch.setattr(dd, "SETMASK_LITERAL_MAX_VOCAB", 0)
    dd._SETMASK_DECISION_CACHE.clear()
    wide = eval_pairs_rows()
    assert wide == off
    sampled = [
        d
        for (_s, site), d in dd._SETMASK_DECISION_CACHE.items()
        if site.startswith("jaccard_groupssample")
    ]
    assert sampled and all("vocab_ids" not in d for d in sampled), sampled


def test_cap_and_kill_switch_disengage(spark, monkeypatch):
    monkeypatch.setenv("MMR_SETMASK", "off")
    dd._SETMASK_DECISION_CACHE.clear()
    sm = dd._setmask_decision(
        spark, SF_DIR, spark.range(3).select(F.col("id")), "t1"
    )
    assert sm["engage"] is False and sm.get("forced") == "off"
    monkeypatch.setenv("MMR_SETMASK", "auto")
    monkeypatch.setattr(dd, "SETMASK_MAX_VOCAB", 2)
    dd._SETMASK_DECISION_CACHE.clear()
    sm = dd._setmask_decision(
        spark, SF_DIR, spark.range(3).select(F.col("id")), "t2"
    )
    assert sm["engage"] is False and sm["n_vocab"] == 3


def test_mask_words_cover_vocab_boundaries(spark):
    """Bit assignment crosses the 64-bit word boundary correctly: 70
    ids -> W=2, and a set containing ids on both sides of the boundary
    intersects exactly."""
    ids = spark.range(70).select(F.col("id"))
    vocab = dd._setmask_vocab(ids)
    rows = vocab.collect()
    assert sorted(r.pos for r in rows) == list(range(70))
    # two sets: {0..69} and {60..69} -> intersection 10
    sets_df = spark.createDataFrame(
        [(1, list(range(70))), (2, list(range(60, 70)))], "sid int, members array<int>"
    ).select("sid", F.explode("members").alias("id"))
    masked = (
        sets_df.join(vocab, "id")
        .groupBy("sid")
        .agg(*dd._mask_word_aggs(2))
    )
    a = masked.filter("sid = 1").select(
        *[F.col(f"_m{w}").alias(f"_a{w}") for w in range(2)]
    )
    b = masked.filter("sid = 2").select(
        *[F.col(f"_m{w}").alias(f"_b{w}") for w in range(2)]
    )
    got = a.crossJoin(b).select(
        dd._mask_intersect_size(2, "_a", "_b").alias("c")
    ).first()["c"]
    assert got == 10


def test_literal_rows_df_roundtrip(spark):
    from multithreaded_mapreduce_spark.functions.rows import literal_rows_df

    rows = [(1, "a", 1.5), (2, None, -0.0), (None, "", 2.0)]
    df = literal_rows_df(spark, rows, "i int, s string, x double")
    assert df.schema.simpleString() == "struct<i:int,s:string,x:double>"
    got = [(r.i, r.s, r.x) for r in df.collect()]
    assert got == rows
    # no Python-RDD scan in the plan (the point of the helper)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, plan
    empty = literal_rows_df(spark, [], "i int, s string, x double")
    assert empty.count() == 0 and empty.columns == ["i", "s", "x"]
