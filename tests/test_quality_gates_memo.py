"""r11: the shared per-document quality-gate relation (VERDICT r10
item 3) — doc_quality_composite, quality_gate_agreement and
quality_weighted_sample all consume the same (doc_id, g_len, g_rep,
g_ent, g_lm) relation, checkpoint-memoized per corpus so a session
running the trio pays the tokenize + 37-count + unigram-LM scan ONCE.
Value identity vs the oracles is covered by the driver gate and
test_oracle_parity; this pins the sharing itself."""

from __future__ import annotations

from multithreaded_mapreduce_spark.plans import caching
from multithreaded_mapreduce_spark.plans.caching import (
    release_result_memos,
    release_tracked,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries

from .conftest import SF_DIR

_Q = all_queries()


def test_trio_shares_one_gates_build(spark):
    release_tracked()
    release_result_memos()
    spark.catalog.clearCache()
    first = _Q["doc_quality_composite"].builder(spark, SF_DIR)
    assert first.count() > 0
    memo = caching._RESULT_MEMO.get("quality_gates")
    assert memo is not None
    gates_df = memo[1]
    # the two other consumers must reuse the SAME memoized DataFrame
    for name in ("quality_gate_agreement", "quality_weighted_sample"):
        _Q[name].builder(spark, SF_DIR).count()
        assert caching._RESULT_MEMO["quality_gates"][1] is gates_df, name
    # eviction (what the bench does before every timed run) drops it
    release_result_memos()
    assert "quality_gates" not in caching._RESULT_MEMO
