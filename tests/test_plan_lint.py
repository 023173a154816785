"""Plan lint over the whole registry: every query's physical plan must
be free of the two classic scale killers —

* ``CartesianProduct`` (an unconstrained cross join executes |L|×|R|
  comparisons; even the intentional all-pairs dedup ops must go
  through a *broadcast* nested loop with a pruning condition, never a
  partitioned cartesian), and
* ``BatchEvalPython`` (row-at-a-time Python UDFs serialize every row
  through pickle; the engine's rule is JVM expressions or Arrow-batched
  Pandas UDFs only).

Streaming queries are excluded (their builders execute the stream to
materialize a memory sink; plan shape is covered by their own tests).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from multithreaded_mapreduce_spark.plans.registry import all_queries

_QUERIES = all_queries()
_LINTABLE = sorted(
    n for n, q in _QUERIES.items() if "streaming" not in q.tags
)

#: one-row-side cross joins (scalar subquery broadcasts) are fine; the
#: plan shows them as BroadcastNestedLoopJoin, not CartesianProduct
FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", _LINTABLE)
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = _QUERIES[name].builder(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("extended")
    plan = buf.getvalue()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: {bad} in physical plan"
