"""Reference word-count parity fixtures (FIXTURES.md §A).

Inputs are the reference repo's own ``*.txt`` fixtures; expected outputs
are computed from the golden-verified semantics (SURVEY.md §1.4) — split
on whitespace, keep [0-9A-Za-z] lowercased, drop empty, count, binary
ascending order.
"""

from __future__ import annotations

import pytest

from multithreaded_mapreduce_spark.operators.wordcount import word_count
from multithreaded_mapreduce_spark.sources.text import tokens_from_list

FIXTURES = {
    "single": ("hello", [("hello", 1)]),
    "repeat": ("apple apple banana apple", [("apple", 3), ("banana", 1)]),
    "formats": ("Hello, hello! HELLO world. World?", [("hello", 3), ("world", 2)]),
    "num": (
        "42 test 42 hello 007 test 42",
        [("007", 1), ("42", 3), ("hello", 1), ("test", 2)],
    ),
    "symbol": (
        "code++ python@ java# c++",
        [("c", 1), ("code", 1), ("java", 1), ("python", 1)],
    ),
    "large": (
        "The quick brown fox jumps over the lazy dog. The dog barks, the fox runs away.",
        [
            ("away", 1),
            ("barks", 1),
            ("brown", 1),
            ("dog", 2),
            ("fox", 2),
            ("jumps", 1),
            ("lazy", 1),
            ("over", 1),
            ("quick", 1),
            ("runs", 1),
            ("the", 4),
        ],
    ),
    "notext": ("", []),
    # multi-line input collapses (whitespace-driven tokenization)
    "multiline": ("a b\nb\tc\n\n", [("a", 1), ("b", 2), ("c", 1)]),
    # token cleaning to empty is excluded entirely
    "allsymbols": ("++-- !!! ok", [("ok", 1)]),
    # curly-quote UTF-8 bytes are non-alnum → dropped ("it’s" → "its")
    "unicode": ("it’s it's its", [("its", 3)]),
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_fixture(spark, name):
    content, expected = FIXTURES[name]
    lines = spark.createDataFrame([(line,) for line in content.split("\n")] or [("",)], "value string")
    got = [(r.word, r.cnt) for r in word_count(lines).collect()]
    assert got == expected  # list equality also asserts binary asc order


def test_end_sentinel_in_file_mode_is_counted(spark):
    """A literal END token in *file* input is counted (1.cpp:259-263 has
    no sentinel check)."""
    lines = spark.createDataFrame([("foo END bar",)], "value string")
    got = dict((r.word, r.cnt) for r in word_count(lines).collect())
    assert got == {"bar": 1, "end": 1, "foo": 1}


def test_end_sentinel_in_manual_mode_terminates(spark):
    """Interactive mode stops at END and does not count it (1.cpp:244)."""
    df = tokens_from_list(spark, ["foo", "bar", "END", "baz"])
    got = sorted((r.token) for r in df.collect())
    assert got == ["bar", "foo"]


def test_sum_of_counts_equals_token_count(spark):
    """Property: Σ counts == number of non-empty cleaned tokens."""
    content = "a b c a b a ++ %% d"
    lines = spark.createDataFrame([(content,)], "value string")
    wc = word_count(lines)
    total = sum(r.cnt for r in wc.collect())
    assert total == 7  # 9 tokens, 2 clean to empty


def test_permutation_invariance(spark):
    toks = "x y z x y x".split()
    a = word_count(spark.createDataFrame([(" ".join(toks),)], "value string"))
    b = word_count(spark.createDataFrame([(" ".join(reversed(toks)),)], "value string"))
    assert a.collect() == b.collect()
