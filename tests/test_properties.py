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
