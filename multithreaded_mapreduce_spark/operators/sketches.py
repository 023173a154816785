"""Mergeable-sketch aggregation: HyperLogLog distinct-count rollups
via Spark's Datasketches-backed ``hll_sketch_agg`` / ``hll_union_agg``
(SURVEY.md §2.2 aggregation surface; the reference's only aggregate is
an exact count, reference ``1.cpp:144-158``).

This is the operator that makes distinct counts COMPOSABLE at 100 TB:
each (event_type, day) partition folds its users into a fixed-size
sketch (map-side combinable, ~KB per group regardless of cardinality),
and any rollup — per type, per week, global — is a cheap union of
sketches rather than a re-scan of raw events. The exact equivalent
(count(DISTINCT ...) at every grain) re-shuffles the full event stream
once per grain; the sketch pipeline shuffles kilobytes.

Estimates are engine-specific (Datasketches HLL has no DuckDB twin) →
rows-only driver check; the estimate-vs-exact error bound is asserted
in ``tests/test_sampling_freq.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

#: log2 of HLL register count: 12 → 4096 registers, ~1.6% rel. error
HLL_LGK = 12


@register(
    "hll_distinct_users_rollup",
    oracle=None,  # Datasketches HLL estimates have no DuckDB twin;
    # tests assert the estimates within 5% of exact countDistinct
    description="Two-level distinct-user rollup through mergeable HLL "
    "sketches (lgK=12): per-(event_type, day) sketches built in one "
    "map-side-combinable aggregate, then unioned per event_type — "
    "kilobytes through the shuffle at any cardinality, and any further "
    "grain (week, global) unions the same sketches without re-scanning "
    "events. The scale substitute for count(DISTINCT) at every grain.",
    tags=("sketch", "hll", "approx", "events", "rollup"),
)
def hll_distinct_users_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n_events").alias("n_events"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct_users"
            ),
        )
        .orderBy("event_type")
    )
