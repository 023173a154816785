"""Non-trivial-answer pins for the two structurally-empty driver slots
(VERDICT r8 task 5): on the synthetic sf0.01 corpus every customer has
orders and the customer/supplier nation projections coincide, so
anti_join_idle_customers and except_nations both driver-pass with
0-vs-0 rows — a hash match that an inverted predicate could also
produce. These fixtures plant SURVIVORS (idle customers, a
customers-only nation) and assert the registered builders return
exactly them, cross-checked against the registered oracle SQL run on
the same parquet in DuckDB — so the 0-row driver matches are backed by
a non-empty certification of the same code paths."""

from __future__ import annotations

import duckdb

from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.plans.verification import rows_multiset

Q = all_queries()


def _duck_rows(fixture_dir: str, tables: list[str], oracle: str):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet/*.parquet')"
        )
    tbl = con.execute(oracle).fetch_arrow_table()
    con.close()
    return list(tbl.schema.names), [tuple(r.values()) for r in tbl.to_pylist()]


def test_anti_join_idle_customers_nonempty_survivors(spark, tmp_path):
    """Customers 4 and 5 have no orders: the anti join must surface
    exactly them (the sf0.01 slot passes 0-vs-0 — this pins that the
    join direction and NOT-EXISTS polarity are right when the answer
    is non-trivial), bit-matched against the registered oracle."""
    spark.createDataFrame(
        [(i, f"Customer#{i}") for i in range(1, 6)],
        "c_custkey long, c_name string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10 + i, i) for i in (1, 2, 3, 1, 2)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    q = Q["anti_join_idle_customers"]
    sdf = q.builder(spark, str(tmp_path))
    s_rows = [tuple(r) for r in sdf.collect()]
    assert s_rows == [(4, "Customer#4"), (5, "Customer#5")]

    d_cols, d_rows = _duck_rows(str(tmp_path), ["customer", "orders"], q.oracle)
    assert rows_multiset(list(sdf.columns), s_rows) == rows_multiset(d_cols, d_rows)


def test_except_nations_nonempty_survivors(spark, tmp_path):
    """Nations 7 and 9 have customers but no suppliers; nation 3 has
    both (must NOT appear); nation 5 is supplier-only (must NOT
    appear); nation 7 has TWO customers (EXCEPT is distinct — one
    row). Bit-matched against the registered oracle."""
    spark.createDataFrame(
        [(1, 3), (2, 7), (3, 7), (4, 9)],
        "c_custkey long, c_nationkey int",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(1, 3), (2, 5)],
        "s_suppkey long, s_nationkey int",
    ).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))

    q = Q["except_nations"]
    sdf = q.builder(spark, str(tmp_path))
    s_rows = [tuple(r) for r in sdf.collect()]
    assert s_rows == [(7,), (9,)]

    d_cols, d_rows = _duck_rows(str(tmp_path), ["customer", "supplier"], q.oracle)
    assert rows_multiset(list(sdf.columns), s_rows) == rows_multiset(d_cols, d_rows)


def test_slots_are_nonempty_at_sf0001(spark):
    """The smallest driver fixture (sf0.001, 150 customers / 150
    orders) DOES leave idle customers — assert the anti join is
    non-empty there, so at least one gate scale exercises survivors
    end-to-end (except_nations has no non-empty driver scale; its
    survivor certification is the planted fixture above)."""
    df = Q["anti_join_idle_customers"].builder(spark, "/root/testdata/sf0.001")
    n = df.count()
    joined = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
        - spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n == joined
