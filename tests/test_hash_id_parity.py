"""Cross-engine parity sweep for the md5-prefix hash ids that the r4
dedup/fingerprint family builds on (operators/dedup.py): Spark's
conv(substring(md5(c),1,N),16,10) must equal DuckDB's strpos-fold over
the same hex prefix for ANY input bytes — ASCII, unicode (including
astral plane), whitespace, quotes, long strings. md5 is byte-defined,
so the only way these could diverge is an implementation bug in either
expression; this pins both."""

from __future__ import annotations

import random

import duckdb

from multithreaded_mapreduce_spark.operators.dedup import (
    SPAN_HASH_HEX_DIGITS,
    TOKEN_HASH_HEX_DIGITS,
    _oracle_hex_id,
    _spark_hex_id,
)

_POOL = (
    [chr(c) for c in range(32, 127)]
    + list("äöüßéèñçøπ中文字한국어の日本語 русский عربى")
    + ["𝄞", "🎉", "👩‍🔬", "\t", "\n", "'", '"', "\\", "‐", " "]
)


def _random_strings(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 60)
        out.append("".join(rng.choice(_POOL) for _ in range(k)))
    out += ["", "a", " ", "0" * 300]
    return out


def test_hex_id_parity_over_random_unicode(spark):
    strings = _random_strings(20260815, 200)
    sdf = spark.createDataFrame([(s,) for s in strings], "t string")
    for digits in (TOKEN_HASH_HEX_DIGITS, SPAN_HASH_HEX_DIGITS):
        got = [
            r.h
            for r in sdf.select(_spark_hex_id("t", digits).alias("h"))
            .collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE s AS SELECT * FROM (VALUES "
            + ", ".join("(?)" for _ in strings)
            + ") v(token)",
            strings,
        )
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {_oracle_hex_id('token', digits)} FROM s"
            ).fetchall()
        ]
        assert got == want, [
            (s, g, w) for s, g, w in zip(strings, got, want) if g != w
        ][:5]
