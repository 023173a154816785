"""Seeded connected-components (VERDICT r9 task 7): when a calibration
session left the FULL k=1 jaccard pair relation checkpointed,
_doc_components derives its group edge set from it (two id-keyed
joins) instead of re-running the pairwise token-set compare. Measured
at sf0.1: dedup_components 7.8 -> 5.6 s with a warm memo; the cold
path is untouched (peek, never pay). These pin the contract: seeded
and plain labels are multiset-identical, the seeded path still
hash-matches the DuckDB oracle, and the env kill-switch forces plain.
"""

from __future__ import annotations

import os

import pytest

import multithreaded_mapreduce_spark.operators.dedup as dd
from multithreaded_mapreduce_spark.plans.caching import (
    release_result_memos,
    release_tracked,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries

from .oracle import compare_query

Q = all_queries()


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(autouse=True)
def _clean_memos():
    release_result_memos()
    release_tracked()
    yield
    release_result_memos()
    release_tracked()


def test_cold_session_stays_plain(spark, sf_dir):
    got = _multiset(Q["dedup_components"].builder(spark, sf_dir))
    assert dd.LAST_CC_SEED_DECISION == {"seeded": False, "source": "plain"}
    assert got


def test_seeded_equals_plain_and_oracle(spark, sf_dir):
    plain = _multiset(Q["dedup_components"].builder(spark, sf_dir))
    release_result_memos()
    release_tracked()
    dd._jaccard_pairs_memo(spark, sf_dir).count()  # calibration build
    release_tracked()
    seeded = _multiset(Q["dedup_components"].builder(spark, sf_dir))
    assert dd.LAST_CC_SEED_DECISION["seeded"] is True
    assert seeded == plain
    # the full trio rides the same CC memo; spot-check one consumer
    # and the registered oracle under the seeded labels
    release_result_memos()
    release_tracked()
    dd._jaccard_pairs_memo(spark, sf_dir).count()
    release_tracked()
    q = Q["dedup_components"]
    compare_query(spark, sf_dir, q.builder, q.oracle)
    assert dd.LAST_CC_SEED_DECISION["seeded"] is True


def test_env_kill_switch_forces_plain(spark, sf_dir):
    dd._jaccard_pairs_memo(spark, sf_dir).count()
    release_tracked()
    os.environ["MMR_CC_SEED"] = "off"
    try:
        got = _multiset(Q["dedup_components"].builder(spark, sf_dir))
        assert dd.LAST_CC_SEED_DECISION == {"seeded": False, "source": "plain"}
        assert got
    finally:
        del os.environ["MMR_CC_SEED"]
