"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
builder and the oracle SQL on the same parquet tables, compare row count,
column names, and (order-insensitively) values.

Mirrors the strictness described in the driver contract: columns are
sorted by name, rows compared as a multiset. Floats must match exactly —
queries are responsible for rounding on BOTH sides.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from multithreaded_mapreduce_spark.sources.tables import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # exact repr — queries must round identically on both sides
        return f"f:{v!r}"
    if isinstance(v, datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):  # date
        return f"d:{v.isoformat()}"
    return f"{type(v).__name__}:{v}"


def rows_multiset(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


def compare_query(spark, sf_dir: str, builder, oracle: str) -> None:
    sdf = builder(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_ms = rows_multiset(s_cols, s_rows)
    d_ms = rows_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        diff_s = [r for r in s_ms if r not in set(d_ms)][:5]
        diff_d = [r for r in d_ms if r not in set(s_ms)][:5]
        raise AssertionError(
            f"value mismatch; spark-only (≤5): {diff_s}; duckdb-only (≤5): {diff_d}"
        )
