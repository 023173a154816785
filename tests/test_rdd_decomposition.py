"""The literal MapReduce decomposition, as an RDD pipeline, must agree
with the declarative DataFrame flagship.

This is the one place the engine touches RDDs (SURVEY.md §7: "no RDDs
except where a parity test wants to demonstrate the literal
map/shuffle/reduce decomposition"). Each reference phase maps to an
explicit RDD op:

    mappers   (1.cpp:71-110)  → flatMap(tokenize+clean) → map((w, 1))
    shuffle   (1.cpp:113-168) → the exchange inside reduceByKey
    reducers  (1.cpp:171-220) → reduceByKey(add) merge function
    final sort(1.cpp:316-320) → sortByKey (bytewise ascending)

The DataFrame engine never executes this shape — Catalyst's partial+
final HashAggregate strictly dominates it — but semantically they are
the same program, and this test proves it on real data.
"""

from __future__ import annotations

import re


def _clean(token: str) -> str:
    return re.sub(r"[^0-9A-Za-z]", "", token).lower()


def test_rdd_map_shuffle_reduce_matches_dataframe(spark, sf_dir):
    from multithreaded_mapreduce_spark.plans.registry import all_queries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    rdd_counts = (
        docs.rdd.flatMap(lambda row: row.text.split())  # scan + tokenize
        .map(_clean)                                    # mapper: clean_word
        .filter(lambda w: len(w) > 0)                   # mapper: drop empty
        .map(lambda w: (w, 1))                          # mapper: emit (w, 1)
        .reduceByKey(lambda a, b: a + b)                # shuffle + reduce
        .sortByKey()                                    # final sort
        .collect()
    )
    df_counts = [
        (r.word, r.cnt)
        for r in all_queries()["wordcount"].builder(spark, sf_dir).collect()
    ]
    assert rdd_counts == df_counts
