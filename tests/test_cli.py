"""CLI entry point: catalog listing (Spark-free) and arg handling.

The Spark-dependent subcommands (count-file, run) are exercised by the
word_count / format_console unit tests plus manual runs; spawning a
JVM per CLI test would dominate suite time for no extra coverage.
"""

from __future__ import annotations

import pytest

from multithreaded_mapreduce_spark.__main__ import main


def test_list_prints_catalog(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "wordcount  [oracle]" in out
    assert "dedup_minhash_lsh  [rows-only]" in out
    assert len(out.strip().splitlines()) >= 100


def test_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])
