"""The md5-uniform eval-sample knob for the pair-relation-bound eval
queries (VERDICT r7 task 1): dedup_threshold_sweep, lsh_recall_report
and kfold_leakage_report run on a deterministic 1-in-k document sample
once the corpus exceeds EVAL_SAMPLE_TARGET_DOCS, mirrored verbatim in
their oracles. These tests pin (a) the identity guarantee under the
target, (b) bit-parity of the sampled path against the sampled oracle
(forced via a small target), (c) the restriction property (sampled
pairs == full pairs restricted to sampled endpoints), and (d) the
modulus arithmetic agreeing between engines AND a pure-python third
opinion."""

from __future__ import annotations

import hashlib

import pytest

import multithreaded_mapreduce_spark.operators.dedup as dd
from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.plans.verification import (
    compare_query,
    duck_connection,
    rows_multiset,
)

Q = all_queries()

FORCED_TARGET = 100  # 500 docs -> k = 5 on the sf0.001 fixture
#: the target the registered oracle strings were built with (captured
#: before any monkeypatching)
ORIG_TARGET = dd.EVAL_SAMPLE_TARGET_DOCS


def _multiset(df):
    cols = list(df.columns)
    return rows_multiset(cols, [tuple(r) for r in df.collect()])


def test_identity_under_target(spark, sf_dir):
    """At or under the target the sample is the identity: the eval pair
    relation is bit-equal to the registered full pair relation, and the
    decision reports k == 1, disengaged."""
    d = dd._eval_sample_decision(spark, sf_dir)
    assert d["modulus"] == 1 and not d["engaged"]
    full = _multiset(Q["dedup_jaccard_pairs"].builder(spark, sf_dir))
    eval_rel = _multiset(dd._eval_pairs(spark, sf_dir))
    assert full == eval_rel


def test_modulus_integer_ceil_matches_oracle(spark, sf_dir):
    """k = ceil(n/target) by integer math — the Spark probe and the
    oracle CTE must compute the same modulus for targets around the
    corpus size (n = 500 on the fixture)."""
    con = duck_connection(sf_dir)
    for t, expect in ((100, 5), (166, 4), (250, 2), (499, 2), (500, 1), (501, 1)):
        d = dd._eval_sample_decision(spark, sf_dir, target=t)
        assert d["modulus"] == expect, (t, d)
        (k_duck,) = con.execute(
            f"SELECT greatest(1, (count(*) + {t} - 1) // {t}) FROM documents"
        ).fetchone()
        assert int(k_duck) == expect, (t, k_duck)
    con.close()


def test_decision_is_memoized_per_corpus(spark, sf_dir):
    """Repeat probes on the same (corpus, target) must reuse the cached
    count (the LSH-decision pattern)."""
    first = dd._eval_sample_decision(spark, sf_dir, target=FORCED_TARGET)
    again = dd._eval_sample_decision(spark, sf_dir, target=FORCED_TARGET)
    assert again is first
    assert dd.LAST_EVAL_SAMPLE_DECISION is first


def test_sampled_docs_match_python_md5(spark, sf_dir):
    """Third-engine check: the sampled doc_id set equals a pure-python
    recomputation of the md5-prefix draw — no Spark/DuckDB-specific
    hashing can have leaked into the predicate."""
    k = 5
    got = {
        r.doc_id
        for r in dd._eval_sampled_docs(spark, sf_dir, k).select("doc_id").collect()
    }
    all_ids = {
        r.doc_id
        for r in dd._eval_sampled_docs(spark, sf_dir, 1).select("doc_id").collect()
    }
    expect = {
        i
        for i in all_ids
        if int(hashlib.md5(f"evalsample:{i}".encode()).hexdigest()[:8], 16) % k == 0
    }
    assert got == expect
    assert 0 < len(got) < len(all_ids)


def test_sampled_pairs_parity_and_restriction(spark, sf_dir):
    """Forced sampling (k=5): the Spark sampled pair relation matches
    the sampled oracle bit-for-bit AND equals the full relation
    restricted to pairs with both endpoints in the sample."""
    sdf = dd._eval_pairs(spark, sf_dir, target=FORCED_TARGET)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    sql = (
        "WITH "
        + dd._eval_sample_ctes(target=FORCED_TARGET)
        + ",\nep AS ("
        + dd._jaccard_pairs_oracle("sampled_documents")
        + ")\nSELECT * FROM ep"
    )
    tbl = con.execute(sql).fetch_arrow_table()
    con.close()
    d_rows = [tuple(r.values()) for r in tbl.to_pylist()]
    assert rows_multiset(list(sdf.columns), s_rows) == rows_multiset(
        list(tbl.schema.names), d_rows
    )
    # restriction property
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in Q["dedup_jaccard_pairs"].builder(spark, sf_dir).collect()
    }
    k = dd._eval_sample_decision(spark, sf_dir, target=FORCED_TARGET)["modulus"]
    samp = {
        r.doc_id
        for r in dd._eval_sampled_docs(spark, sf_dir, k).select("doc_id").collect()
    }
    restricted = {p: j for p, j in full.items() if p[0] in samp and p[1] in samp}
    assert {(a, b): j for a, b, j in s_rows} == restricted


def _force_target_oracle(name: str) -> str:
    """The registered oracle with its eval_k arithmetic re-targeted to
    FORCED_TARGET (the CTE text is generated, so the arithmetic appears
    exactly once)."""
    t = ORIG_TARGET
    frag_old = f"(count(*) + {t} - 1) // {t}"
    frag_new = f"(count(*) + {FORCED_TARGET} - 1) // {FORCED_TARGET}"
    oracle = Q[name].oracle
    assert oracle.count(frag_old) == 1
    return oracle.replace(frag_old, frag_new)


@pytest.mark.parametrize(
    "name", ["dedup_threshold_sweep", "kfold_leakage_report", "lsh_recall_report"]
)
def test_forced_sampling_full_query_parity(spark, sf_dir, name, monkeypatch):
    """End-to-end: each eval query, with sampling FORCED on (target
    lowered under the fixture size on both sides), still hash-matches
    its oracle — the k>1 code path gets the same cross-engine gate the
    driver applies to the k=1 path."""
    monkeypatch.setattr(dd, "EVAL_SAMPLE_TARGET_DOCS", FORCED_TARGET)
    compare_query(spark, sf_dir, Q[name].builder, _force_target_oracle(name))
    assert dd.LAST_EVAL_SAMPLE_DECISION["engaged"] is True
    assert dd.LAST_EVAL_SAMPLE_DECISION["modulus"] == 5


def test_pair_memo_is_shared_across_eval_consumers(spark, sf_dir):
    """VERDICT r7 task 3: in a pipeline-shaped session the sweep, the
    leakage audit and the recall report share ONE build of the exact
    pair relation through the named result memo."""
    from multithreaded_mapreduce_spark.plans.caching import (
        release_result_memos,
        result_memo_stats,
    )

    release_result_memos()
    dd._MEMO_BASELINE = result_memo_stats("jaccard_pairs") or {"hits": 0, "misses": 0}
    base = dict(dd._MEMO_BASELINE)
    Q["dedup_threshold_sweep"].builder(spark, sf_dir).collect()
    Q["kfold_leakage_report"].builder(spark, sf_dir).collect()
    Q["lsh_recall_report"].builder(spark, sf_dir).collect()
    stats = result_memo_stats("jaccard_pairs")
    assert stats["misses"] == base["misses"] + 1
    assert stats["hits"] >= base["hits"] + 2
    release_result_memos()


def test_banding_memo_shared_with_registered_builder(spark, sf_dir):
    """VERDICT r8 task 6: lsh_recall_report's caught side memoizes the
    banding relation, and the registered dedup_minhash_verified builder
    opportunistically PEEKS the k=1 slot when sampling is disengaged
    (the fixture's k = 1) — a calibration session builds the relation
    once, the peeked frame is value-identical to a fresh unmemoized
    build, and a COLD dedup_minhash_verified run stays the plain lazy
    plan (no memo write, no eager materialization)."""
    from multithreaded_mapreduce_spark.plans.caching import (
        release_result_memos,
        result_memo_stats,
    )

    release_result_memos()
    base = result_memo_stats("minhash_verified_pairs") or {"hits": 0, "misses": 0}
    # cold: the registered builder must NOT populate or pay the memo
    cold = Q["dedup_minhash_verified"].builder(spark, sf_dir)
    cold_rows = _multiset(cold)
    mid = result_memo_stats("minhash_verified_pairs") or {"hits": 0, "misses": 0}
    assert mid["misses"] == base["misses"] and mid["hits"] == base["hits"]
    # calibration session: recall report builds the k=1 memo ...
    Q["lsh_recall_report"].builder(spark, sf_dir).collect()
    # ... and the production builder rides it for free
    warm_rows = _multiset(Q["dedup_minhash_verified"].builder(spark, sf_dir))
    stats = result_memo_stats("minhash_verified_pairs")
    assert stats["misses"] == base["misses"] + 1
    assert stats["hits"] >= base["hits"] + 1
    assert cold_rows == warm_rows
    assert cold_rows == _multiset(dd._minhash_verified_pairs(spark, sf_dir))
    release_result_memos()


@pytest.mark.parametrize(
    "name", ["dedup_threshold_sweep", "kfold_leakage_report", "lsh_recall_report"]
)
def test_engaged_modulus_parity_at_sf01(spark, name):
    """The modulus actually used at bench scale (sf0.1: 5000 docs,
    target 2000 → k = 3) hash-matches the oracle — the driver's sf0.01
    gate only ever exercises the k = 1 identity, so this pins the
    ENGAGED path on the real data it runs on."""
    import os

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 data not present")
    compare_query(spark, sf01, Q[name].builder, Q[name].oracle)
    assert dd.LAST_EVAL_SAMPLE_DECISION["modulus"] == 3
    assert dd.LAST_EVAL_SAMPLE_DECISION["engaged"] is True
