"""The per-session parquet SCHEMA cache in sources.tables (VERDICT r8
task 7): footer re-reads were the dominant fixed cost of trivial
queries' builder phase. The cache must (a) return a FRESH DataFrame
per call so role-playing self-joins keep distinct plan ids (the bug a
whole-DataFrame cache introduced and q7's corrupted-nation fixture
caught), (b) invalidate when a fixture dir is rewritten (mtime key),
and (c) actually populate per (path, table)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.sources import tables as tb


def test_two_loads_self_join_without_ambiguity(spark, sf_dir):
    """q7's role-playing shape: two load_table calls of the same table
    joined against each other must analyze (a shared plan object raises
    AMBIGUOUS_SELF_JOIN)."""
    n1 = tb.load_table(spark, sf_dir, "nation")
    n2 = tb.load_table(spark, sf_dir, "nation")
    assert n1 is not n2
    out = n1.join(n2, n1["n_regionkey"] == n2["n_regionkey"]).count()
    assert out > 0


def test_schema_cache_populates_and_reuses(spark, sf_dir):
    tb.load_table(spark, sf_dir, "region")
    key = (os.path.realpath(sf_dir), "region")
    entries = [k for k in tb._SCHEMA_CACHE if k[:2] == key]
    assert entries, "schema cache did not populate for region"
    sess, schema = tb._SCHEMA_CACHE[entries[-1]]
    assert sess is spark
    assert "r_regionkey" in schema.fieldNames()


def test_rewritten_fixture_dir_invalidates_by_mtime(spark, tmp_path):
    """Overwriting a table in place (new mtime) must re-read the
    schema — a stale cached schema would mis-project or crash."""
    p = str(tmp_path / "region.parquet")
    spark.createDataFrame(
        [(1, "AMERICA")], "r_regionkey long, r_name string"
    ).write.mode("overwrite").parquet(p)
    df1 = tb.load_table(spark, str(tmp_path), "region")
    assert df1.columns == ["r_regionkey", "r_name"]
    # rewrite with an extra column; dir mtime changes on rewrite
    spark.createDataFrame(
        [(2, "ASIA", "note")],
        "r_regionkey long, r_name string, r_comment string",
    ).write.mode("overwrite").parquet(p)
    df2 = tb.load_table(spark, str(tmp_path), "region")
    assert df2.columns == ["r_regionkey", "r_name", "r_comment"]
    assert [tuple(r) for r in df2.collect()] == [(2, "ASIA", "note")]


def test_cached_schema_read_matches_inferred_read(spark, sf_dir):
    """Value-level: a schema-supplied read returns exactly the same
    rows and dtypes as a plain inferred read."""
    a = tb.load_table(spark, sf_dir, "nation")
    b = spark.read.parquet(tb.table_path(sf_dir, "nation"))
    assert dict(a.dtypes) == dict(b.dtypes)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_events_ltz_normalization_preserved(spark, sf_dir):
    """The events nanos/NTZ normalization must still apply on the
    cached-schema path (ts ends LTZ, usable by unix_micros)."""
    ev = tb.load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.select(F.unix_micros("ts")).first()[0] is not None
