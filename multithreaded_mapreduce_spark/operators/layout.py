"""Physical data-layout planning and runtime-filter operators.

The reference engine ends at a sorted console print (reference
``1.cpp:316-327``); a 100 TB lakehouse additionally has to plan its
WRITE side — how rows land in files — and its read side's join
filters, because at that scale layout IS performance:

* :func:`shard_layout_plan` — balanced hash-shard assignment + skew
  audit, the planning step behind "write N similar-sized files".
* :func:`zorder_layout_audit` — Morton (Z-order) interleaving of two
  clustering dimensions + per-bucket min/max spans, the data-skipping
  audit behind ``OPTIMIZE ZORDER BY`` in Delta/Iceberg-style tables.
* :func:`bloom_prefilter_semi_join` — a Bloom-filter runtime
  prefilter on the fact side of a semi-join, the pattern Spark AQE /
  Trino inject as "runtime filters" when the dimension side is too
  large for a broadcast hash join but its bit-set is not.
* :func:`rendezvous_shard_moves` — elastic re-sharding under
  rendezvous (HRW) hashing, with the minimal-movement guarantee
  measured from the data rather than assumed.

All four are pure DataFrame plans (no UDFs, no driver collects) with
exact DuckDB oracles; the Bloom operator's oracle is the PLAIN
semi-join — the strongest possible check that the prefilter changes
nothing semantically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..plans.registry import register
from ..sources.tables import load_table
from .dedup import _oracle_hex_id, _spark_hex_id

# --------------------------------------------------------------------------
# shard_layout_plan
# --------------------------------------------------------------------------

#: target shard count and md5-prefix width for the uniform draw. 12 hex
#: digits = 48 bits; mod 64 is exactly uniform over the prefix space.
N_SHARDS = 64
SHARD_HEX_DIGITS = 12


@register(
    "shard_layout_plan",
    oracle=f"""
WITH s AS (
  SELECT ({_oracle_hex_id(
        "'shard:' || coalesce(CAST(doc_id AS VARCHAR), '<null>')",
        SHARD_HEX_DIGITS,
    )})
             % {N_SHARDS} AS shard_id,
         coalesce(n_chars, 0) AS n_bytes
  FROM documents
), per AS (
  SELECT shard_id,
         count(*) AS n_docs,
         CAST(sum(n_bytes) AS BIGINT) AS shard_bytes
  FROM s GROUP BY shard_id
)
SELECT shard_id, n_docs, shard_bytes,
       CAST(round(CAST((shard_bytes - avg(shard_bytes) OVER ()) * 100.0
                       / avg(shard_bytes) OVER () AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS bytes_dev_pct
FROM per
ORDER BY shard_id
""",
    description=f"Write-side layout plan: assign every document to one "
    f"of {N_SHARDS} shards by an md5-uniform draw on doc_id and audit "
    "the balance (per-shard doc count, byte total, and percent "
    "deviation from the mean shard size). The planning step behind "
    "writing N similar-sized files: content-hash sharding is the only "
    "layout that stays balanced under any ingest order or key skew. "
    "One map-side-combinable aggregate over the scan; the global-mean "
    "window runs on the 64-row post-aggregate relation only.",
    tags=("layout", "report", "aggregate", "pipeline"),
)
def shard_layout_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        (
            # coalesce: a NULL doc_id (broken upstream id assignment)
            # still needs a deterministic shard, and DuckDB's hex fold
            # maps NULL to 0 while Spark's conv() yields NULL — hashing
            # a sentinel rendering keeps both engines identical
            _spark_hex_id(
                F.concat(
                    F.lit("shard:"),
                    F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>")),
                ),
                SHARD_HEX_DIGITS,
            )
            % N_SHARDS
        ).alias("shard_id"),
        F.coalesce("n_chars", F.lit(0)).alias("n_bytes"),
    )
    per = docs.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
    )
    # global mean over the N_SHARDS-row aggregate output — bounded by
    # construction (the global-window lint classifies post-aggregate
    # inputs as safe)
    mean = F.avg("shard_bytes").over(Window.partitionBy())
    return per.select(
        "shard_id",
        "n_docs",
        "shard_bytes",
        F.round(
            ((F.col("shard_bytes") - mean) * 100.0 / mean).cast("decimal(30,12)"), 4
        )
        .cast("double")
        .alias("bytes_dev_pct"),
    ).orderBy("shard_id")


# --------------------------------------------------------------------------
# zorder_layout_audit
# --------------------------------------------------------------------------

#: bits interleaved per dimension and the bucket prefix width: 16+16
#: bits of Morton key, top 6 bits → 64 buckets (≈ output files).
Z_BITS = 16
Z_BUCKET_BITS = 6
Z_EPOCH = "1992-01-01"


def _z_interleave(xcol: str, ycol: str, intdiv: str) -> str:
    """Morton interleave as plain integer arithmetic, shared by both
    engines up to the integer-division token (Spark ``div``, DuckDB
    ``//``): bit i of x lands at position 2i, bit i of y at 2i+1.
    Literals above 2^31 force the term to BIGINT in both dialects."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({xcol} {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "zorder_layout_audit",
    oracle=f"""
WITH d AS (
  SELECT CAST(o_custkey % {1 << Z_BITS} AS BIGINT) AS xk,
         CAST(datediff('day', DATE '{Z_EPOCH}', CAST(o_orderdate AS DATE))
              % {1 << Z_BITS} AS BIGINT) AS yk
  FROM orders
), z AS (
  SELECT xk, yk, ({_z_interleave("xk", "yk", "//")}) AS zkey FROM d
)
SELECT zkey // {1 << (2 * Z_BITS - Z_BUCKET_BITS)} AS zbucket,
       count(*) AS n_rows,
       min(xk) AS ck_min, max(xk) AS ck_max, max(xk) - min(xk) AS ck_span,
       min(yk) AS day_min, max(yk) AS day_max, max(yk) - min(yk) AS day_span
FROM z
GROUP BY zbucket
ORDER BY zbucket
""",
    description="Multi-dimensional clustering audit: Morton (Z-order) "
    f"interleave of (o_custkey, order-day) at {Z_BITS} bits each, "
    f"bucketed by the top {Z_BUCKET_BITS} key bits into "
    f"{1 << Z_BUCKET_BITS} would-be files, reporting each bucket's "
    "min/max span on BOTH dimensions. Small spans on both axes mean "
    "file-level min/max statistics prune reads for predicates on "
    "EITHER column — the property a single-column sort gives only its "
    "sort key (a date-sorted layout has day_span≈0 but ck_span≈full "
    "range, so customer-key predicates scan every file). Pure integer "
    "row math in the scan projection + one map-side-combinable "
    "aggregate; nothing shuffles but the 64-row bucket relation.",
    tags=("layout", "report", "aggregate"),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "orders").selectExpr(
        f"CAST(o_custkey % {1 << Z_BITS} AS BIGINT) AS xk",
        f"CAST(datediff(CAST(o_orderdate AS DATE), DATE '{Z_EPOCH}')"
        f" % {1 << Z_BITS} AS BIGINT) AS yk",
    )
    z = d.selectExpr("xk", "yk", f"({_z_interleave('xk', 'yk', 'div')}) AS zkey")
    return (
        z.selectExpr(
            f"zkey div {1 << (2 * Z_BITS - Z_BUCKET_BITS)} AS zbucket", "xk", "yk"
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xk").alias("ck_min"),
            F.max("xk").alias("ck_max"),
            (F.max("xk") - F.min("xk")).alias("ck_span"),
            F.min("yk").alias("day_min"),
            F.max("yk").alias("day_max"),
            (F.max("yk") - F.min("yk")).alias("day_span"),
        )
        .orderBy("zbucket")
    )


# --------------------------------------------------------------------------
# bloom_prefilter_semi_join
# --------------------------------------------------------------------------

#: Bloom geometry: m = 2^17 positions, k = 3 md5-derived probes. At
#: sf0.1 the BUILDING segment holds ~3k keys → ≤ 9k set bits → false-
#: positive rate ≈ (9k/131072)^3 ≈ 3e-4. The positions relation is at
#: most m rows of one long (~1 MB) — broadcastable at any corpus size.
BLOOM_BITS = 1 << 17
BLOOM_K = 3
BLOOM_HEX_DIGITS = 12
BLOOM_SEGMENT = "BUILDING"


def _bloom_pos(key: Column, probe: int) -> Column:
    """Probe ``probe``'s bit position for ``key``: md5-uniform on a
    probe-tagged rendering, mod the bit-array width."""
    return (
        _spark_hex_id(
            F.concat(F.lit(f"bloom{probe}:"), key.cast("string")), BLOOM_HEX_DIGITS
        )
        % BLOOM_BITS
    )


@register(
    "bloom_prefilter_semi_join",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2)
           AS total_revenue
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    description="Runtime-filter pattern: orders of BUILDING-segment "
    f"customers via a {BLOOM_K}-probe Bloom prefilter (m=2^17 bits as "
    "a broadcast distinct-positions relation, md5-derived probe "
    "positions) followed by an exact confirming semi-join, then a "
    "per-priority count/revenue rollup. The oracle is the PLAIN "
    "semi-join — the prefilter is semantically invisible, which is "
    "the whole point: at 100 TB a dimension side too large for a "
    "broadcast HASH join often still fits as a bit-set, and the "
    "prefilter drops most fact rows map-side before any exchange. "
    "Here every probe is a broadcast semi-join on the position "
    "column, so the fact table never shuffles at all; only the 5-row "
    "priority aggregate exchanges.",
    tags=("join", "bloom", "runtime-filter", "layout"),
)
def bloom_prefilter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
        .select("c_custkey")
    )
    # the Bloom "bit array" as a relation of set positions: ≤ k·n longs
    # (NOT deduped — a .distinct() here would shuffle the small side
    # once per probe plan, while the broadcast hash relation dedups its
    # build keys anyway, so duplicates cost broadcast bytes only and
    # the whole query's sole data-bearing exchange stays the final
    # 5-row aggregate; plan-asserted in tests/test_scale_plans.py)
    bits = cust.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("c_custkey"), p) for p in range(BLOOM_K)])
        ).alias("pos")
    )

    passed = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    for p in range(BLOOM_K):
        b = bits.alias(f"bloom_{p}")
        passed = passed.join(
            F.broadcast(b),
            _bloom_pos(F.col("o_custkey"), p) == F.col(f"bloom_{p}.pos"),
            "left_semi",
        )
    # exact confirmation: the Bloom pass is a superset (false positives
    # only); the semi-join against the true key set restores exactness
    exact = passed.join(
        F.broadcast(cust),
        passed["o_custkey"] == cust["c_custkey"],
        "left_semi",
    )
    return (
        exact.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# rendezvous_shard_moves
# --------------------------------------------------------------------------

#: rendezvous (highest-random-weight) hashing geometry: the corpus is
#: re-sharded from RDV_OLD to RDV_NEW nodes. HRW's guarantee: a key
#: moves IFF its new argmax weight lands on an added node, so exactly
#: ~(RDV_NEW-RDV_OLD)/RDV_NEW of keys move — the minimum possible —
#: versus mod-N hashing where growing 16 -> 20 reshuffles ~80% of keys.
RDV_OLD = 16
RDV_NEW = 20
RDV_HEX_DIGITS = 12


def _rdv_weight_spark(shard: int):
    return _spark_hex_id(
        F.concat(
            F.lit(f"rdv:{shard}:"),
            F.coalesce(F.col("doc_id").cast("string"), F.lit("<null>")),
        ),
        RDV_HEX_DIGITS,
    )


def _rdv_weight_sql(shard: int) -> str:
    return _oracle_hex_id(
        f"'rdv:{shard}:' || coalesce(CAST(doc_id AS VARCHAR), '<null>')",
        RDV_HEX_DIGITS,
    )


def _rdv_oracle() -> str:
    packs = ", ".join(
        f"struct_pack(w := {_rdv_weight_sql(s)}, s := {s})" for s in range(RDV_NEW)
    )
    return f"""
WITH w AS (
  SELECT doc_id, [{packs}] AS arr FROM documents
), pick AS (
  SELECT (list_reduce(arr[1:{RDV_OLD}],
                      (a, b) -> CASE WHEN b > a THEN b ELSE a END)).s AS old_shard,
         (list_reduce(arr,
                      (a, b) -> CASE WHEN b > a THEN b ELSE a END)).s AS new_shard
  FROM w
)
SELECT new_shard AS shard_id,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved
FROM pick
GROUP BY new_shard
ORDER BY shard_id
"""


@register(
    "rendezvous_shard_moves",
    oracle=_rdv_oracle(),
    description=f"Elastic re-sharding audit via rendezvous (HRW) "
    f"hashing: every document is assigned to argmax-weight of "
    f"{RDV_OLD} and then {RDV_NEW} shards (md5-derived per-(doc,shard) "
    "weights), and the report counts per-new-shard documents and how "
    "many MOVED. HRW's minimal-disruption guarantee — a key moves iff "
    "its global argmax lands on an added node, so only "
    f"~{RDV_NEW - RDV_OLD}/{RDV_NEW} of keys move (mod-N hashing "
    "would reshuffle ~80%) — is computed from the data and "
    "cross-engine-checked, not assumed. One scan projection "
    f"({RDV_NEW} hash terms, the old argmax reuses the first "
    f"{RDV_OLD} array slots), one small aggregate; nothing shuffles "
    "but the shard-count rows.",
    tags=("layout", "report", "aggregate", "pipeline"),
)
def rendezvous_shard_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    arr = F.array(
        *[
            F.struct(_rdv_weight_spark(s).alias("w"), F.lit(s).alias("s"))
            for s in range(RDV_NEW)
        ]
    )
    pick = load_table(spark, sf_dir, "documents").select(
        F.array_max(F.slice(arr, 1, RDV_OLD))["s"].alias("old_shard"),
        F.array_max(arr)["s"].alias("new_shard"),
    )
    return (
        pick.groupBy(F.col("new_shard").alias("shard_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("old_shard") != F.col("new_shard"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_moved"),
        )
        .orderBy("shard_id")
    )
