"""The driver's correctness gate hashes only the first 50 registered
queries — pin that window to oracle-bearing entries so no checked slot
is wasted on a rows-only query (VERDICT r2 task 3)."""

from __future__ import annotations

from multithreaded_mapreduce_spark.plans.registry import FRONT_WINDOW, all_queries


def test_front_window_is_50_oracle_bearing():
    qs = all_queries()
    assert len(FRONT_WINDOW) == 50
    assert len(set(FRONT_WINDOW)) == 50
    missing = [n for n in FRONT_WINDOW if n not in qs]
    assert not missing, f"front-window names not registered: {missing}"
    rows_only = [n for n in FRONT_WINDOW if qs[n].oracle is None]
    assert not rows_only, f"rows-only queries waste driver-checked slots: {rows_only}"


def test_front_window_leads_registration_order():
    names = list(all_queries())
    assert names[:50] == list(FRONT_WINDOW)
