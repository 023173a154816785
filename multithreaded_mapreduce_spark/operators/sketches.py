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
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
), rolled AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(n_events) AS BIGINT) AS n_events
  FROM daily GROUP BY event_type
), direct AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct_users
  FROM events GROUP BY event_type
)
SELECT r.event_type, r.n_days, r.n_events, d.exact_distinct_users,
       TRUE AS merge_within_1pct, TRUE AS hll_within_5pct
FROM rolled r JOIN direct d ON r.event_type IS NOT DISTINCT FROM d.event_type
ORDER BY r.event_type
""",
    description="Two-level distinct-user rollup through mergeable HLL "
    "sketches (lgK=12): per-(event_type, day) sketches built in one "
    "map-side-combinable aggregate, then unioned per event_type — "
    "kilobytes through the shuffle at any cardinality, and any further "
    "grain (week, global) unions the same sketches without re-scanning "
    "events. The scale substitute for count(DISTINCT) at every grain. "
    "Registered as its own VERIFICATION harness (VERDICT r3 task 7): "
    "the raw Datasketches estimate has no DuckDB twin, so the output "
    "carries the exact distinct count (hash-checkable) plus two bound "
    "assertions the oracle pins to TRUE — the union-of-dailies estimate "
    "within 1% of a direct single-level sketch (mergeability), and the "
    "sketch estimate within 5% of exact (accuracy). A drifting sketch "
    "turns a boolean false and fails the driver's value hash. The "
    "exact twin is verification-only cost; production rollups ship "
    "just the sketch pipeline this query exercises.",
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
    rolled = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_merged"),
    )
    # the exact twin + a direct (single-level) sketch, for the two bound
    # assertions; an all-NULL user group yields a NULL/empty sketch →
    # coalesce the estimate to 0 to match exact = 0
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
        ).alias("est_direct"),
        F.countDistinct("user_id").alias("exact_distinct_users"),
    )
    em = F.coalesce(F.col("est_merged"), F.lit(0.0))
    ed = F.coalesce(F.col("est_direct"), F.lit(0.0))
    exact = F.col("exact_distinct_users").cast("double")
    return (
        rolled.join(
            direct.withColumnsRenamed({"event_type": "d_event_type"}),
            F.col("event_type").eqNullSafe(F.col("d_event_type")),
        )
        .select(
            "event_type",
            "n_days",
            "n_events",
            "exact_distinct_users",
            (F.abs(em - ed) <= 0.01 * F.greatest(ed, F.lit(1.0))).alias(
                "merge_within_1pct"
            ),
            F.when(F.col("exact_distinct_users") == 0, em == 0.0)
            .otherwise(F.abs(em - exact) / exact <= 0.05)
            .alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )
