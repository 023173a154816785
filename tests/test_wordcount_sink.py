"""Custom Python Data Source WRITE path ('wcsink'): the reference's
``word: count`` console format (1.cpp:322-327) as a distributed sink
with two-phase task commit — the write-side twin of the 'wstokens'
read-side source."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.sinks.wordcount_datasink import (
    read_sink_lines,
    register_wordcount_sink,
)
from multithreaded_mapreduce_spark.sinks.writers import format_console

Q = all_queries()


def test_wcsink_matches_console_formatter(spark, sf_dir, tmp_path):
    """Range-partitioned + sorted input through the sink concatenates to
    exactly the driver-side console formatter's golden line order."""
    counts = Q["wordcount"].builder(spark, sf_dir)
    out = str(tmp_path / "wc_out")
    register_wordcount_sink(spark)
    (
        counts.repartitionByRange(4, "word")
        .sortWithinPartitions("word")
        .write.format("wcsink")
        .option("path", out)
        .mode("append")
        .save()
    )
    got = read_sink_lines(out)
    want = format_console(counts)
    assert got == want
    # commit protocol hygiene: every temp file was renamed or removed
    leftovers = [f for f in os.listdir(out) if f.startswith("_temp-")]
    assert not leftovers
    # one committed file per partition
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4


def test_wcsink_multiple_tasks_write_disjoint_rows(spark, sf_dir, tmp_path):
    """Row multiset is preserved across an arbitrary (unsorted) write —
    the sink adds no rows, drops no rows, regardless of partitioning."""
    counts = Q["wordcount"].builder(spark, sf_dir)
    out = str(tmp_path / "wc_unsorted")
    register_wordcount_sink(spark)
    (
        counts.repartition(8)
        .write.format("wcsink")
        .option("path", out)
        .mode("append")
        .save()
    )
    got = sorted(read_sink_lines(out))
    want = sorted(f"{r['word']}: {r['cnt']}" for r in counts.collect())
    assert got == want
