"""Invariants of the reshape and text-ranking operators: melt
cardinality, merge action accounting, prefix-filter ≡ naive join."""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.plans.registry import all_queries

Q = all_queries()


def test_unpivot_triples_rows(spark, sf_dir):
    long = Q["pricing_summary_unpivot"].builder(spark, sf_dir)
    wide_groups = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .count()
    )
    assert long.count() == 3 * wide_groups
    assert long.select("measure").distinct().count() == 3


def test_merge_action_accounting(spark, sf_dir):
    merged = Q["orders_merge_upsert"].builder(spark, sf_dir)
    by_action = {r.action: r.n for r in merged.groupBy("action").agg(F.count("*").alias("n")).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_orders = orders.count()
    n_upd = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    n_ins = orders.filter(F.col("o_orderkey") % 13 == 3).count()
    assert by_action.get("U", 0) == n_upd
    assert by_action.get("I", 0) == n_ins
    assert by_action.get("K", 0) == n_orders - n_upd
    # primary key stays unique after the merge
    assert merged.select("o_orderkey").distinct().count() == n_orders + n_ins


def test_prefix_filter_matches_naive(spark, sf_dir):
    naive = Q["dedup_jaccard_pairs"].builder(spark, sf_dir).collect()
    pref = Q["dedup_prefix_filter"].builder(spark, sf_dir).collect()
    key = lambda r: (r.doc_a, r.doc_b, round(r.jaccard, 9))  # noqa: E731
    assert sorted(map(key, naive)) == sorted(map(key, pref))


def test_tfidf_ranks_are_dense_per_doc(spark, sf_dir):
    rows = Q["tfidf_top_terms"].builder(spark, sf_dir).collect()
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r.rank)
        assert r.tf >= 1
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
