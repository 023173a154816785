"""Family-wide duplicate/damaged-id contract for the media queries.

Every mapInPandas media builder derives per-row work from ``doc_id``
(raster-from-id certifications) or from ``(doc_id, text)`` (frame
fan-outs). The r9 verdict found the raster-from-id family emitting one
output row per INPUT row while its oracles collapse duplicates — green
on the driver's unique-id data, wrong on a damaged corpus. This suite
pins the contract so the next raster-from-id operator can't
reintroduce the bug: on a fixture carrying duplicate (same id,
different text), NULL, and negative doc_ids, every oracle-bearing
multimodal query must keep exact row-multiset parity with its DuckDB
oracle (the same comparison the driver runs).
"""

from __future__ import annotations

import os
import shutil

import pytest

from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.sources.tables import TABLES, table_path

from .conftest import SF_DIR
from .oracle import compare_query

_Q = all_queries()

#: documents rows with every id pathology an upstream pipeline emits:
#: duplicate ids (same and different text), a NULL id, negative ids
#: (including a duplicated negative), and ordinary rows for contrast.
_DAMAGED_DOCS = [
    # (doc_id, text, lang, source)
    (0, "plain row zero", "en", "src0"),
    (1, "plain row one", "en", "src1"),
    (2, "plain row two", "fr", "src2"),
    (3, "plain row three", "es", "src3"),
    (4, "duplicate id original text", "en", "src4"),
    (4, "duplicate id DIFFERENT text", "en", "src5"),  # id dup, text differs
    (7, "identical twin text", "de", "src6"),
    (7, "identical twin text", "de", "src6"),  # full-row duplicate
    (None, "orphan row with no id", None, "src7"),  # NULL id
    (-3, "negative id row", "en", "src8"),  # negative id
    (-3, "negative id duplicated", "en", "src8"),  # negative dup
    (11, "", "en", "src9"),  # empty text on a valid id
    (12, None, "en", "src9"),  # NULL text on a valid id
]


def _media_oracle_queries() -> list[str]:
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and "multimodal" in q.tags and "streaming" not in q.tags
    )


@pytest.fixture(scope="session")
def damaged_ids_dir(tmp_path_factory, spark) -> str:
    """sf0.001 with documents replaced by the damaged-id rows."""
    d = str(tmp_path_factory.mktemp("damaged_ids_sf"))
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    schema = spark.read.parquet(table_path(SF_DIR, "documents")).schema
    rows = [
        (i, s, lang, src, len(s) if s is not None else None)
        for i, s, lang, src in _DAMAGED_DOCS
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "_docs_tmp")
    )
    part = next(
        f
        for f in os.listdir(os.path.join(d, "_docs_tmp"))
        if f.endswith(".parquet")
    )
    shutil.copyfile(os.path.join(d, "_docs_tmp", part), table_path(d, "documents"))
    return d


def test_family_is_nonempty():
    """The parameterization below must actually cover the certification
    family — if a rename empties it, fail loudly instead of skipping."""
    names = _media_oracle_queries()
    for expected in (
        "media_png_roundtrip",
        "media_jpeg_roundtrip",
        "media_wav_roundtrip",
        "media_phash_dedup",
        "media_phash_near_pairs",
        "media_mp4_metadata",
        "media_audio_fp_dedup",
        "media_text_frames",
        "media_frame_dedup",
    ):
        assert expected in names, f"{expected} missing from media contract sweep"


@pytest.mark.parametrize("name", _media_oracle_queries())
def test_damaged_id_parity(spark, damaged_ids_dir, name):
    compare_query(spark, damaged_ids_dir, _Q[name].builder, _Q[name].oracle)


def test_raster_family_emits_one_row_per_distinct_id(spark, damaged_ids_dir):
    """The raster-from-id contract directly (independent of the oracle):
    one output row per DISTINCT non-null non-negative doc_id — 8 here
    (0,1,2,3,4,7,11,12) — never one per input row."""
    for name in (
        "media_png_roundtrip",
        "media_jpeg_roundtrip",
        "media_wav_roundtrip",
        "media_phash_dedup",
        "media_mp4_metadata",
        "media_audio_fp_dedup",
    ):
        got = _Q[name].builder(spark, damaged_ids_dir).collect()
        ids = [r.doc_id for r in got]
        # order-insensitive since r10: the builders return
        # sortWithinPartitions (a global orderBy's range-sampling pass
        # re-executed the codec mapInPandas once per query); the
        # contract under test is one row per DISTINCT id, not order
        assert sorted(ids) == sorted(set(ids)), f"{name} emitted duplicate ids"
        assert len(ids) == 8, f"{name}: {len(ids)} rows, expected 8"
