"""Warehouse maintenance operators: MERGE-style incremental upsert and
SCD Type-2 dimension history.

The reference is a one-shot batch counter (reference ``1.cpp`` whole
file: consume once, emit counts, exit); a production analytics engine
additionally *maintains* derived state between runs. The two canonical
maintenance shapes are implemented here as plain DataFrame programs —
no table-format dependency (Delta/Iceberg MERGE INTO is the managed
version of exactly this join):

* ``merge_upsert_customer_state`` — MERGE semantics over a keyed state
  table: WHEN MATCHED update, WHEN NOT MATCHED BY TARGET insert, WHEN
  NOT MATCHED BY SOURCE keep. Expressed as one full-outer join of the
  established state and the new batch.
* ``scd2_customer_history`` — slowly-changing-dimension Type 2: a
  change-event stream collapses into versioned validity intervals
  (valid_from / valid_to / is_current) per key.

Scale notes (local[32] today, 1000 executors tomorrow):

* The upsert's full-outer join cannot broadcast either side (Spark
  requires a shuffle SMJ/hash for full outer), so at 100 TB the state
  table's partitioning IS the knob: bucket the persisted state on the
  merge key and the recurring nightly merge becomes a bucket-aligned
  SMJ with only the (small) batch side exchanging — the same shape
  `bucketed_join_order_revenue` proves plan-level. Both inputs here
  are pre-aggregated per key before the join, so the exchange carries
  one slim row per key, never raw orders.
* SCD2 is two windows over one hash exchange on the dimension key
  (lag for change detection, lead for interval close). Versions per
  key are human-bounded (orders per customer), so no partition-width
  skew; the decimal-exact money columns never enter the windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table

#: orders on/after this instant are "the new batch" arriving against the
#: established state built from everything before it (~10% of rows).
MERGE_CUTOFF = "2001-01-01"


@register(
    "merge_upsert_customer_state",
    oracle=f"""
WITH t AS (
  SELECT o_custkey, count(*) AS n,
         sum(CAST(o_totalprice AS {DEC})) AS r
  FROM orders WHERE o_orderdate < TIMESTAMP '{MERGE_CUTOFF}'
  GROUP BY o_custkey
), b AS (
  SELECT o_custkey, count(*) AS n,
         sum(CAST(o_totalprice AS {DEC})) AS r
  FROM orders WHERE o_orderdate >= TIMESTAMP '{MERGE_CUTOFF}'
  GROUP BY o_custkey
)
SELECT coalesce(t.o_custkey, b.o_custkey) AS custkey,
       CAST(coalesce(t.n, 0) + coalesce(b.n, 0) AS BIGINT) AS n_orders,
       round(CAST(coalesce(t.r, 0) + coalesce(b.r, 0) AS DOUBLE), 2) AS revenue,
       CASE WHEN t.o_custkey IS NULL AND t.n IS NULL THEN 'insert'
            WHEN b.o_custkey IS NULL AND b.n IS NULL THEN 'keep'
            ELSE 'update' END AS merge_action
FROM t FULL OUTER JOIN b ON t.o_custkey = b.o_custkey
ORDER BY custkey
""",
    description="MERGE-style incremental upsert of a per-customer state "
    "table: established state (orders before the cutoff) full-outer-"
    "joined with the new batch's per-key aggregate — matched keys "
    "update (counts add, decimal-exact revenue adds BEFORE the final "
    "round), batch-only keys insert, state-only keys keep. The "
    "DataFrame expansion of Delta/Iceberg MERGE INTO, with the action "
    "taken recorded per row.",
    tags=("warehouse", "merge", "incremental", "join"),
)
def merge_upsert_customer_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")

    def state(df: DataFrame, n: str, r: str) -> DataFrame:
        # unrounded decimal sums: the merged total must round ONCE,
        # after addition, or update rows drift a cent from the oracle
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias(n),
            F.sum(F.col("o_totalprice").cast(DEC)).alias(r),
        )

    t = state(orders.filter(F.col("o_orderdate") < cutoff), "t_n", "t_r")
    b = state(orders.filter(F.col("o_orderdate") >= cutoff), "b_n", "b_r")
    # join on equality (not null-safe): a NULL-custkey group on either
    # side stays unmatched — exactly DuckDB's FULL OUTER semantics, so
    # the corrupted-orders fixture (NULL custkey rows) agrees engine-
    # for-engine. The action CASE checks a non-nullable aggregate (n)
    # alongside the key so a NULL-key unmatched row still classifies.
    tk = t.withColumnRenamed("o_custkey", "t_key")
    bk = b.withColumnRenamed("o_custkey", "b_key")
    merged = tk.join(bk, tk.t_key == bk.b_key, "full_outer")
    zero = F.lit(0).cast(DEC)
    return (
        merged.select(
            F.coalesce("t_key", "b_key").alias("custkey"),
            (F.coalesce("t_n", F.lit(0)) + F.coalesce("b_n", F.lit(0))).alias(
                "n_orders"
            ),
            F.round(
                (F.coalesce("t_r", zero) + F.coalesce("b_r", zero)).cast("double"), 2
            ).alias("revenue"),
            F.when(F.col("t_key").isNull() & F.col("t_n").isNull(), F.lit("insert"))
            .when(F.col("b_key").isNull() & F.col("b_n").isNull(), F.lit("keep"))
            .otherwise(F.lit("update"))
            .alias("merge_action"),
        )
        .orderBy("custkey")
    )


@register(
    "scd2_customer_history",
    oracle="""
WITH ev AS (
  -- the change feed is DEFINED by date order: undated orders have no
  -- position in it (and the engines' NULL orderings disagree), so
  -- they are excluded identically in both engines
  SELECT o_custkey AS custkey, o_orderdate, o_orderkey, o_orderpriority,
         lag(o_orderpriority) OVER w AS prev_p
  FROM orders
  WHERE o_orderdate IS NOT NULL
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), ch AS (
  SELECT custkey, o_orderdate AS valid_from, o_orderkey, o_orderpriority AS priority
  FROM ev WHERE prev_p IS DISTINCT FROM o_orderpriority
)
SELECT custkey, priority, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       CAST(row_number() OVER w2 AS BIGINT) AS version_n,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM ch
WINDOW w2 AS (PARTITION BY custkey ORDER BY valid_from, o_orderkey)
ORDER BY custkey, version_n
""",
    description="SCD Type-2 dimension build: each customer's order "
    "stream is a change feed of their priority tier; consecutive equal "
    "values collapse (IS DISTINCT FROM, so NULL-valued and first events "
    "open versions identically in both engines) and each surviving "
    "change opens a version with valid_from/valid_to interval and an "
    "is_current flag — lag detects the change, lead closes the "
    "interval, one hash exchange on the dimension key total.",
    tags=("warehouse", "scd2", "window"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL order dates excluded in both engines — see the oracle comment
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    w = Window.partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
    ev = orders.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
    ).withColumn("prev_p", F.lag("o_orderpriority").over(w))
    ch = ev.filter(
        # IS DISTINCT FROM: first event (prev NULL) and genuine changes
        # open versions; equal consecutive values (incl. NULL==NULL on
        # damaged data) collapse — identical spelling both engines
        ~F.col("prev_p").eqNullSafe(F.col("o_orderpriority"))
    ).select(
        "custkey",
        F.col("o_orderdate").alias("valid_from"),
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )
    w2 = Window.partitionBy("custkey").orderBy("valid_from", "o_orderkey")
    return (
        ch.select(
            "custkey",
            "priority",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("long").alias("version_n"),
            F.lead("valid_from").over(w2).isNull().alias("is_current"),
        )
        .orderBy("custkey", "version_n")
    )
