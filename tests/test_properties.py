"""Property-based tests (hypothesis): the Spark word-count pipeline must
agree with a direct Python model of the golden-verified reference
semantics (SURVEY.md §1.4) on arbitrary inputs, and obey the algebraic
invariants the reference's phases imply."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multithreaded_mapreduce_spark.operators.wordcount import word_count

# tokens drawn to hit every cleaning path: letters (mixed case), digits,
# pure symbols (clean to empty), mixed, unicode punctuation
_TOKEN = st.text(
    alphabet="aAbB9 0!+’é-",
    min_size=0,
    max_size=8,
)
_TEXT = st.lists(_TOKEN, min_size=0, max_size=30).map(" ".join)


def _model(text: str) -> list[tuple[str, int]]:
    """Pure-Python reference semantics: whitespace split, keep ASCII
    alnum lowercased, drop empties, count, bytewise ascending."""
    counts = Counter()
    for tok in text.split():
        clean = re.sub(r"[^0-9A-Za-z]", "", tok).lower()
        if clean:
            counts[clean] += 1
    return sorted(counts.items())


def _spark_counts(spark, text: str) -> list[tuple[str, int]]:
    lines = spark.createDataFrame([(line,) for line in text.split("\n")] or [("",)], "value string")
    return [(r.word, r.cnt) for r in word_count(lines).collect()]


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=_TEXT)
def test_matches_python_model(spark, text):
    assert _spark_counts(spark, text) == _model(text)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=st.lists(st.sampled_from(["Ab", "ab", "AB", "c1", "+", "9"]), max_size=20))
def test_case_insensitive_and_sum_invariant(spark, toks):
    text = " ".join(toks)
    got = _spark_counts(spark, text)
    # case-insensitivity: uppercase input gives identical output
    assert _spark_counts(spark, text.upper()) == got
    # Σ counts == number of tokens that clean to non-empty
    n_clean = sum(1 for t in toks if re.sub(r"[^0-9A-Za-z]", "", t))
    assert sum(c for _, c in got) == n_clean


def test_cleaning_is_idempotent(spark):
    """Running the pipeline's output words through the pipeline again is
    a fixpoint: cleaned words contain only [0-9a-z]."""
    text = "It’s C++ and_Python 3.14!"
    once = _spark_counts(spark, text)
    again = _spark_counts(spark, " ".join(w for w, _ in once))
    assert sorted(w for w, _ in again) == sorted(w for w, _ in once)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "e9"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_pair_counts_match_python_model(spark, docs):
    """bpe_merge_candidates' pair construction must agree with a direct
    Python model (adjacent pairs, whitespace tokens, short docs empty)
    on arbitrary corpora, including empty docs and one-token docs."""
    from collections import Counter

    from pyspark.sql import functions as F

    model = Counter()
    for toks in docs:
        for a, b in zip(toks, toks[1:]):
            model[f"{a} {b}"] += 1

    df = spark.createDataFrame([(" ".join(t),) for t in docs], "text string")
    ts = F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
    tok_df = df.select(ts.alias("ts"))
    arr = F.col("ts")
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(" ", F.element_at(arr, i), F.element_at(arr, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    got = Counter(
        {
            r.pair: r.cnt
            for r in tok_df.select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
    )
    assert got == model


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    groups=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 500), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    )
)
def test_two_stage_fixed_point_sum_equals_decimal_sum(spark, groups):
    """partial_cent_sums + exact_dollars must equal the one-stage
    decimal sum bit-for-bit on arbitrary integer cent data — the
    equivalence the q1 rewrite relies on."""
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_spark.functions.numeric import (
        exact_dollars,
        partial_cent_sums,
    )

    df = spark.createDataFrame(
        [(k, c) for k, c, _ in groups], "k string, cents long"
    ).repartition(4)
    partial = partial_cent_sums(df, ["k"], {"_c": F.col("cents")})
    got = {
        r.k: r.total
        for r in partial.groupBy("k")
        .agg(F.round(exact_dollars("_c", 100), 2).alias("total"))
        .collect()
    }
    want = {
        r.k: r.total
        for r in df.groupBy("k")
        .agg(
            F.round(
                F.sum((F.col("cents") / 100.0).cast("decimal(30,6)")).cast("double"), 2
            ).alias("total")
        )
        .collect()
    }
    assert got == want
