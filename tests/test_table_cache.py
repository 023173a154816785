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
    assert key in tb._SCHEMA_CACHE, "schema cache did not populate for region"
    sess, mtime, schema = tb._SCHEMA_CACHE[key]
    assert sess is spark
    assert mtime == tb._dataset_mtime_ns(tb.table_path(sf_dir, "region"))
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


def test_inplace_part_overwrite_invalidates(spark, tmp_path):
    """ADVICE r9: a directory-style dataset whose PART FILES are
    overwritten in place leaves the dir mtime unchanged — the cache
    must key on the newest file inside, not the dir entry, or a stale
    schema gets forced onto the new data."""
    import shutil
    import tempfile

    p = str(tmp_path / "region.parquet")
    spark.createDataFrame(
        [(1, "AMERICA")], "r_regionkey long, r_name string"
    ).write.mode("overwrite").parquet(p)
    df1 = tb.load_table(spark, str(tmp_path), "region")
    assert df1.columns == ["r_regionkey", "r_name"]
    # write the new-schema dataset elsewhere, then copy its part file
    # CONTENTS over the old one and mirror names — dir mtime untouched
    with tempfile.TemporaryDirectory() as alt:
        spark.createDataFrame(
            [(2, "ASIA", "note")],
            "r_regionkey long, r_name string, r_comment string",
        ).write.mode("overwrite").parquet(os.path.join(alt, "w"))
        new_part = next(
            f for f in os.listdir(os.path.join(alt, "w")) if f.endswith(".parquet")
        )
        old_parts = [f for f in os.listdir(p) if f.endswith(".parquet")]
        dir_mtime = os.stat(p).st_mtime_ns
        for old in old_parts:
            shutil.copyfile(os.path.join(alt, "w", new_part), os.path.join(p, old))
        for f in os.listdir(p):  # stale Hadoop checksums of the old bytes
            if f.startswith(".") and f.endswith(".crc"):
                os.remove(os.path.join(p, f))
        os.utime(p, ns=(dir_mtime, dir_mtime))  # pin the dir mtime
    df2 = tb.load_table(spark, str(tmp_path), "region")
    assert df2.columns == ["r_regionkey", "r_name", "r_comment"]


def test_cache_stays_bounded_per_table(spark, tmp_path):
    """Rewrites supersede the entry for their (dir, table) instead of
    accumulating one entry per mtime."""
    p = str(tmp_path / "nation.parquet")
    for i in range(3):
        spark.createDataFrame(
            [(i, f"N{i}", 0)], "n_nationkey long, n_name string, n_regionkey int"
        ).write.mode("overwrite").parquet(p)
        tb.load_table(spark, str(tmp_path), "nation")
    key = (os.path.realpath(str(tmp_path)), "nation")
    matches = [k for k in tb._SCHEMA_CACHE if k[0] == key[0] and k[1] == "nation"]
    assert matches == [key]


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
