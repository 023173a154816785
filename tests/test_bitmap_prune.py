"""r11 optimization-round tests: the lossy-bitmap union-bound prune on
the setmask-DISENGAGED verify paths (operators/dedup.py, the bitmap
block + _bitmap_guard).

The prune CASE-guards the exact per-pair ``array_intersect`` with a
fixed-width hashed-bitmap upper bound on |A∩B| — collisions can only
RAISE the bound, so it admits false positives and never false
negatives, and the unchanged exact threshold filter still decides.
What needs coverage:

* the off/on value identity on the disengaged (MMR_SETMASK=off) path
  for every consumer query — the prune is a pure plan decision,
* the upper-bound property itself on adversarial collision-heavy sets
  (W=1 forces collisions),
* the −1 sentinel semantics (a pruned pair can never reach a
  threshold-passing ratio),
* the per-site defaults and the MMR_BITMAP_PRUNE=on|off override.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import multithreaded_mapreduce_spark.operators.dedup as dd
from multithreaded_mapreduce_spark.plans.caching import (
    release_result_memos,
    release_tracked,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries

from .conftest import SF_DIR

_Q = all_queries()


def _snapshot(spark, name: str, sf_dir: str):
    release_tracked()
    release_result_memos()
    spark.catalog.clearCache()
    return sorted(tuple(r) for r in _Q[name].builder(spark, sf_dir).collect())


@pytest.mark.parametrize(
    "name",
    ["dedup_jaccard_pairs", "dedup_components", "dedup_containment",
     "dedup_minhash_verified", "dedup_minhash_lsh",
     "dedup_incremental_neardup"],
)
def test_prune_off_on_identity_disengaged(spark, name, monkeypatch):
    """With the setmask disengaged (the 100 TB / real-vocabulary shape)
    the prune-on output equals the prune-off output row for row —
    forced ON everywhere so the site-default-off banding verifies are
    exercised too."""
    monkeypatch.setenv("MMR_SETMASK", "off")
    dd._SETMASK_DECISION_CACHE.clear()
    monkeypatch.setenv("MMR_BITMAP_PRUNE", "off")
    off = _snapshot(spark, name, SF_DIR)
    monkeypatch.setenv("MMR_BITMAP_PRUNE", "on")
    on = _snapshot(spark, name, SF_DIR)
    assert off == on
    assert len(on) > 0


def test_union_bound_is_exact_upper_bound_under_collisions(spark, monkeypatch):
    """W=1 (64 bits) over ids far wider than the bitmap: for every
    pair, na + nb − popcount(bm_a|bm_b) >= |A∩B| — collisions only
    raise the bound."""
    monkeypatch.setattr(dd, "BITMAP_PRUNE_WORDS", 1)
    sets = [
        (1, [i * 97 for i in range(40)]),
        (2, [i * 97 for i in range(20)] + [i * 131 + 7 for i in range(20)]),
        (3, [i * 131 + 7 for i in range(40)]),
        (4, [i for i in range(64)]),          # saturates the single word
        (5, [-(i * 97) for i in range(40)]),  # negative ids → pmod path
    ]
    df = spark.createDataFrame(sets, "sid int, toks array<long>").select(
        "sid", "toks", F.size("toks").alias("n"), *dd._bitmap_cols("toks", "_p")
    )
    a = df.select(
        F.col("sid").alias("sa"), F.col("toks").alias("ta"),
        F.col("n").alias("na"),
        *[F.col(f"_p{w}").alias(f"_pa{w}") for w in range(1)],
    )
    b = df.select(
        F.col("sid").alias("sb"), F.col("toks").alias("tb"),
        F.col("n").alias("nb"),
        *[F.col(f"_p{w}").alias(f"_pb{w}") for w in range(1)],
    )
    rows = (
        a.crossJoin(b)
        .select(
            dd._bitmap_intersect_ub("_pa", "_pb").alias("ub"),
            F.size(F.array_intersect("ta", "tb")).alias("c"),
        )
        .collect()
    )
    assert rows and all(r.ub >= r.c for r in rows), rows


def test_guard_sentinel_never_reaches_threshold(spark):
    """_bitmap_guard's −1 sentinel: jaccard and containment ratios on
    c = −1 are strictly negative, i.e. below every positive
    threshold."""
    df = spark.createDataFrame([(10, 12)], "na int, nb int").select(
        (F.lit(-1).cast("double") / (F.col("na") + F.col("nb") - F.lit(-1))).alias("jac"),
        (F.lit(-1).cast("double") / F.col("na")).alias("cont"),
    )
    r = df.first()
    assert r.jac < 0 and r.cont < 0


def test_site_defaults_and_override(monkeypatch):
    monkeypatch.delenv("MMR_BITMAP_PRUNE", raising=False)
    assert dd._bitmap_prune_on() is True
    assert dd._bitmap_prune_on(site_default=False) is False
    monkeypatch.setenv("MMR_BITMAP_PRUNE", "on")
    assert dd._bitmap_prune_on(site_default=False) is True
    monkeypatch.setenv("MMR_BITMAP_PRUNE", "off")
    assert dd._bitmap_prune_on() is False
    monkeypatch.setenv("MMR_BITMAP_PRUNE", "auto")
    monkeypatch.setattr(dd, "BITMAP_PRUNE_WORDS", 0)
    assert dd._bitmap_prune_on() is False
