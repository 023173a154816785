"""Shim: the oracle comparator moved into the package (r4) so the CLI
``verify`` subcommand can use it; tests keep their import path."""

from multithreaded_mapreduce_spark.plans.verification import (  # noqa: F401
    assert_type_parity,
    compare_query,
    duck_connection,
    rows_multiset,
)
