"""Data-quality audit: the constraint checks (nulls, key uniqueness,
referential integrity, domain rules) a pipeline runs before promoting
a batch — dbt-test / Deequ-style, expressed as one Catalyst plan.

The reference has no notion of constraints (its schema is two
hard-coded structs, reference ``1.cpp:18-35``); a production corpus
pipeline refuses to publish a snapshot whose audit is non-empty.

Scale notes: every check is an independent aggregate over a pruned
column set — nulls and domain rules are scan-local partial aggregates
(one long per partition crosses the wire); uniqueness is a groupBy on
the key only; orphan checks are anti-joins keyed on slim ids where the
parent side's distinct key set shuffles once. The final result is a
handful of rows regardless of data volume, and the checks parallelize
against each other as independent stages of one job.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table, spread


def _check(name: str, violations) -> DataFrame:
    return violations.select(
        F.lit(name).alias("check_name"), F.col("violations").cast("long").alias("violations")
    )


@register(
    "data_quality_audit",
    oracle="""
SELECT * FROM (
  SELECT 'dup_c_custkey' AS check_name,
         (SELECT count(*) FROM (SELECT c_custkey FROM customer
           GROUP BY c_custkey HAVING count(*) > 1)) AS violations
  UNION ALL
  SELECT 'dup_o_orderkey',
         (SELECT count(*) FROM (SELECT o_orderkey FROM orders
           GROUP BY o_orderkey HAVING count(*) > 1))
  UNION ALL
  SELECT 'empty_doc_text',
         (SELECT count(*) FROM documents
           WHERE text IS NULL OR NOT regexp_matches(text, '\\S'))
  UNION ALL
  SELECT 'null_o_custkey',
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
  UNION ALL
  SELECT 'orphan_lineitem_orders',
         (SELECT count(*) FROM lineitem
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
  UNION ALL
  SELECT 'orphan_orders_customer',
         (SELECT count(*) FROM orders
           WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
  UNION ALL
  SELECT 'price_not_positive',
         (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
)
ORDER BY check_name
""",
    description="Pre-publish data-quality audit (dbt-test/Deequ shape): "
    "key uniqueness, null keys, referential-integrity orphans "
    "(anti-joins on slim id projections), and domain rules, unioned "
    "into one check/violations relation. A clean batch returns all "
    "zeros; the result stays a handful of rows at any data volume.",
    tags=("quality", "audit", "pipeline"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    docs = load_table(spark, sf_dir, "documents").select("text")

    dup_cust = _check(
        "dup_c_custkey",
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    dup_order = _check(
        "dup_o_orderkey",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    empty_text = _check(
        "empty_doc_text",
        docs.filter(F.col("text").isNull() | ~F.col("text").rlike(r"\S")).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    null_cust = _check(
        "null_o_custkey",
        orders.filter(F.col("o_custkey").isNull()).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    orphan_li = _check(
        "orphan_lineitem_orders",
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    orphan_orders = _check(
        "orphan_orders_customer",
        orders.select("o_custkey")
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("violations")),
    )
    bad_price = _check(
        "price_not_positive",
        li.filter(F.col("l_extendedprice") <= 0).agg(
            F.count(F.lit(1)).alias("violations")
        ),
    )
    checks = [
        dup_cust, dup_order, empty_text, null_cust,
        orphan_li, orphan_orders, bad_price,
    ]
    return reduce(DataFrame.unionByName, checks).orderBy("check_name")


# ------------------------------------------------------------------
# forensic / reconciliation audits: Benford first-digit conformance
# (the classic fraud / synthetic-data screen) and cross-table money
# reconciliation (the warehouse invariant check every finance
# pipeline runs).
# ------------------------------------------------------------------


@register(
    "orders_benford_audit",
    oracle=f"""
WITH d AS (
  SELECT substr(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM orders
  WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) >= 1
), n AS (
  SELECT count(*) AS total FROM d
)
SELECT d.digit,
       count(*) AS n_orders,
       CAST(round(CAST(CAST(count(*) AS DOUBLE) / any_value(n.total)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS share,
       CAST(round(CAST(log10(1.0 + 1.0 / CAST(d.digit AS INTEGER))
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS benford_expected,
       CAST(round(CAST(abs(CAST(count(*) AS DOUBLE) / any_value(n.total)
                          - log10(1.0 + 1.0 / CAST(d.digit AS INTEGER)))
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS abs_gap
FROM d CROSS JOIN n
GROUP BY d.digit
ORDER BY d.digit
""",
    description="Benford first-digit audit over order totals: observed "
    "leading-digit shares vs the Benford expectation log10(1+1/d) with "
    "per-digit gaps — the classic forensic screen for fabricated or "
    "synthetically generated monetary data (this corpus's flat 1-4 "
    "digits fail it loudly, which is exactly the point of the audit). "
    "One scan, a 9-row aggregate, the total broadcast back.",
    tags=("audit", "quality", "benford", "orders"),
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & (F.abs("o_totalprice") >= 1)
    )
    d = orders.select(
        F.substring(
            F.floor(F.abs("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))

    def snap6(c):
        return F.round(c.cast("decimal(30,12)"), 6).cast("double")

    expected = F.log10(1.0 + 1.0 / F.col("digit").cast("int"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # raw share carried unsnapped so abs_gap mirrors the
            # oracle's abs(raw_share - expected) before ITS snap
            (F.count(F.lit(1)).cast("double") / F.first("total")).alias("share_raw"),
        )
        .select(
            "digit",
            "n_orders",
            snap6(F.col("share_raw")).alias("share"),
            snap6(expected).alias("benford_expected"),
            snap6(F.abs(F.col("share_raw") - expected)).alias("abs_gap"),
        )
        .orderBy("digit")
    )


@register(
    "orders_reconciliation_audit",
    oracle=f"""
WITH l AS (
  SELECT l_orderkey,
         sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                  AS {DEC})) AS computed
  FROM lineitem
  GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey,
         abs(CAST(o.o_totalprice AS {DEC}) - l.computed) AS adelta
  FROM orders o JOIN l ON o.o_orderkey = l.l_orderkey
  WHERE o.o_totalprice IS NOT NULL
)
SELECT count(*) AS n_orders_checked,
       CAST(sum(CASE WHEN adelta < 0.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reconciled,
       CAST(round(CAST(CAST(sum(CASE WHEN adelta < 0.01 THEN 1 ELSE 0 END)
                            AS DOUBLE) / count(*) AS DECIMAL(30,12)), 6)
            AS DOUBLE) AS share_reconciled,
       CAST(round(max(adelta), 2) AS DOUBLE) AS max_abs_delta,
       CAST(round(CAST(CAST(sum(adelta) AS DOUBLE) / count(*)
            AS DECIMAL(30,12)), 2) AS DOUBLE) AS avg_abs_delta
FROM j
""",
    description="Cross-table money reconciliation: every order's header "
    "total vs the exact-decimal sum of its line items "
    "(extendedprice·(1−discount)·(1+tax)) — the invariant check a "
    "finance warehouse runs on every load. Reports how many orders "
    "reconcile within a cent plus the magnitude of the drift (this "
    "synthetic corpus reconciles NOWHERE — the audit says so honestly, "
    "which is the audit's job). One lineitem aggregate co-partitioned "
    "with the orders join on the key; deltas exact in decimal.",
    tags=("audit", "quality", "reconciliation", "orders", "lineitem"),
)
def orders_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    computed = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast(DEC)
        ).alias("computed")
    )
    j = orders.join(
        computed, orders["o_orderkey"] == computed["l_orderkey"]
    ).select(
        F.abs(F.col("o_totalprice").cast(DEC) - F.col("computed")).alias("adelta")
    )
    cnt = F.count(F.lit(1))
    recon = F.sum(F.when(F.col("adelta") < 0.01, 1).otherwise(0))
    return j.agg(
        cnt.alias("n_orders_checked"),
        recon.alias("n_reconciled"),
        F.round(
            (recon.cast("double") / cnt).cast("decimal(30,12)"), 6
        )
        .cast("double")
        .alias("share_reconciled"),
        F.round(F.max("adelta"), 2).cast("double").alias("max_abs_delta"),
        F.round(
            (F.sum("adelta").cast("double") / cnt).cast("decimal(30,12)"), 2
        )
        .cast("double")
        .alias("avg_abs_delta"),
    )


@register(
    "source_overlap_matrix",
    oracle="""
WITH h AS (
  SELECT DISTINCT source, md5(text) AS ch FROM documents
), sizes AS (
  SELECT source, count(*) AS n FROM h GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS n_shared_hashes
  FROM h a JOIN h b ON a.ch = b.ch AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared_hashes,
       CAST(s.n_shared_hashes AS DOUBLE) / least(sa.n, sb.n)
         AS overlap_of_smaller
FROM shared s
JOIN sizes sa ON s.source_a = sa.source
JOIN sizes sb ON s.source_b = sb.source
ORDER BY source_a, source_b
""",
    description="Cross-source contamination matrix: for every pair of "
    "crawl sources, how many exact-content digests they share and what "
    "fraction of the smaller source that overlap is — the audit a "
    "pipeline publishes to catch one dump republishing another (or a "
    "benchmark leaking into a crawl). Text is hashed in the scan "
    "projection, the per-source digest sets deduplicate BEFORE the "
    "self-join (one row per distinct (source, digest)), and the join "
    "keys on the 32-byte digest — document bodies never shuffle. At "
    "100 TB the digest relation is corpus-cardinality but slim, and "
    "the equi-join output is bounded by true cross-source duplication.",
    tags=("audit", "dedup", "observability", "pipeline"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.md5("text").alias("ch"))
        .distinct()
    )
    sizes = h.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    shared = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.ch") == F.col("b.ch"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_hashes"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_hashes",
            (
                F.col("n_shared_hashes").cast("double")
                / F.least("na", "nb")
            ).alias("overlap_of_smaller"),
        )
        .orderBy("source_a", "source_b")
    )


#: snapshot-diff role play over the single documents table (the same
#: convention as corpus_ops.NEW_BATCH_SOURCE / the every-97th-doc eval
#: set): snapshot A is the corpus without the src19 crawl batch;
#: snapshot B is today's corpus where every 13th doc was re-crawled
#: (deterministic ' rev2' suffix) and every 17th doc was taken down.
SNAP_NEW_SOURCE = "src19"
SNAP_REVISE_MOD = 13
SNAP_DROP_MOD = 17


@register(
    "corpus_snapshot_diff",
    oracle=f"""
WITH a AS (
  SELECT doc_id, md5(text) AS dig
  FROM documents WHERE source <> '{SNAP_NEW_SOURCE}'
), b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {SNAP_REVISE_MOD} = 0
                  THEN text || ' rev2' ELSE text END) AS dig
  FROM documents WHERE doc_id % {SNAP_DROP_MOD} <> 0
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.dig IS DISTINCT FROM b.dig THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
ORDER BY doc_id, status
""",
    description="Corpus snapshot diff — the versioning audit between "
    "two corpus states: per-doc added / removed / changed / unchanged "
    "by 32-byte content digest over a full outer join on doc_id "
    "(snapshot role-play documented at SNAP_* above; NULL-id rows "
    "never join and surface on their own side, exactly like the "
    "oracle). At 100 TB only (doc_id, digest) pairs shuffle — text "
    "never moves; the diff is one exchange per side plus the join.",
    tags=("warehouse", "audit", "pipeline"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("source") != SNAP_NEW_SOURCE).select(
        F.col("doc_id").alias("a_id"), F.md5("text").alias("a_dig")
    )
    b = docs.filter(F.col("doc_id") % SNAP_DROP_MOD != 0).select(
        F.col("doc_id").alias("b_id"),
        F.md5(
            F.when(
                F.col("doc_id") % SNAP_REVISE_MOD == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text"))
        ).alias("b_dig"),
    )
    joined = a.join(b, a.a_id == b.b_id, "full_outer")
    status = (
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(~F.col("a_dig").eqNullSafe(F.col("b_dig")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce("a_id", "b_id").alias("doc_id"), status.alias("status")
    ).orderBy("doc_id", "status")


#: orders columns profiled by column_stats_profile, with their
#: min/max rendering class: numeric -> double columns, varchar ->
#: string columns, timestamp -> ISO dates in the string columns.
_PROFILE_COLS = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
)


def _profile_oracle() -> str:
    aggs, selects = [], []
    for c, kind in _PROFILE_COLS:
        aggs.append(f"count({c}) AS cnt_{c}")
        aggs.append(f"count(DISTINCT {c}) AS ndv_{c}")
        if kind == "num":
            aggs.append(f"CAST(min({c}) AS DOUBLE) AS min_{c}")
            aggs.append(f"CAST(max({c}) AS DOUBLE) AS max_{c}")
            mn, mx = f"min_{c}", f"max_{c}"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "date":
            aggs.append(f"strftime(min(CAST({c} AS DATE)), '%Y-%m-%d') AS min_{c}")
            aggs.append(f"strftime(max(CAST({c} AS DATE)), '%Y-%m-%d') AS max_{c}")
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"min_{c}", f"max_{c}"
        else:
            aggs.append(f"min({c}) AS min_{c}")
            aggs.append(f"max({c}) AS max_{c}")
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"min_{c}", f"max_{c}"
        selects.append(
            f"SELECT '{c}' AS column_name, n_rows, n_rows - cnt_{c} AS n_nulls,\n"
            f"       ndv_{c} AS ndv, {mn} AS min_num, {mx} AS max_num,\n"
            f"       {ms} AS min_str, {xs} AS max_str FROM a"
        )
    return (
        "WITH a AS (\n  SELECT count(*) AS n_rows, "
        + ",\n         ".join(aggs)
        + "\n  FROM orders\n)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY column_name"
    )


@register(
    "column_stats_profile",
    oracle=_profile_oracle(),
    description="Per-column profile of the orders table — row count, "
    "null count, exact distinct count, and typed min/max (numerics as "
    "doubles, strings as strings, timestamps as ISO dates) — the "
    "ANALYZE-TABLE statistics that drive encoding choice (low-ndv -> "
    "dictionary), join planning, and file-skipping expectations. ONE "
    "scan computes every measure (multi-distinct runs through Spark's "
    "expand, ×|columns| rows map-side, same as "
    "multi_distinct_order_profile) and the per-column rows are "
    "exploded from the single aggregate row, never re-scanned. At "
    "100 TB swap exact ndv for approx_count_distinct per column — "
    "the plan shape is unchanged.",
    tags=("audit", "report", "aggregate", "layout"),
)
def column_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile_frame(spark, sf_dir, approx=False)


def _profile_frame(spark: SparkSession, sf_dir: str, approx: bool) -> DataFrame:
    # spread BEFORE the aggregate (r10 optimization, guide §2.5/§2.6):
    # the driver ships orders as one single-row-group parquet file, so
    # the scan — and the partial phase of the multi-distinct expand
    # aggregate fused into it — ran as ONE task (profiled 2.2 s on one
    # core at sf0.1, the whole query's dominant stage). An explicit
    # repartition of the 6 profiled columns costs a ~MB exchange and
    # makes the ×7 expand + partial hash run at full parallelism
    # (3.3 → ~1.3 s at sf0.1). On a cluster with split inputs the
    # exchange is redundant but cheap — same rationale as every other
    # spread-before-CPU-heavy-work site (sources/tables.py).
    orders = spread(
        load_table(spark, sf_dir, "orders").select(*[c for c, _ in _PROFILE_COLS])
    )
    ndv_agg = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(F.col(c)).alias(f"cnt_{c}"))
        aggs.append(ndv_agg(F.col(c)).alias(f"ndv_{c}"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"max_{c}"))
        elif kind == "date":
            aggs.append(
                F.date_format(F.min(F.col(c).cast("date")), "yyyy-MM-dd").alias(f"min_{c}")
            )
            aggs.append(
                F.date_format(F.max(F.col(c).cast("date")), "yyyy-MM-dd").alias(f"max_{c}")
            )
        else:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
    a = orders.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c, kind in _PROFILE_COLS:
        mn = F.col(f"min_{c}") if kind == "num" else null_d
        mx = F.col(f"max_{c}") if kind == "num" else null_d
        ms = F.col(f"min_{c}") if kind != "num" else null_s
        xs = F.col(f"max_{c}") if kind != "num" else null_s
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"cnt_{c}")).alias("n_nulls"),
                F.col(f"ndv_{c}").alias("ndv"),
                mn.alias("min_num"),
                mx.alias("max_num"),
                ms.alias("min_str"),
                xs.alias("max_str"),
            )
        )
    return (
        a.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )


@register(
    "column_stats_profile_approx",
    oracle=None,
    description="The documented 100 TB knob of column_stats_profile "
    "made concrete (VERDICT r7 task 5): the identical one-scan "
    "per-column profile with exact count(DISTINCT) swapped for "
    "approx_count_distinct (HyperLogLog++, default 5% rsd). The "
    "multi-distinct Expand operator — x|columns| map-side rows, the "
    "exact plan's scale cost — DISAPPEARS from this plan "
    "(plan-asserted in tests/test_layout_ops.py); sketches merge "
    "map-side like any other aggregate. Rows-only for the driver "
    "(HLL values are engine-specific); pytest bounds every approx ndv "
    "within 15% of the exact twin's and requires all deterministic "
    "columns (n_rows, n_nulls, typed min/max) bit-equal to the exact "
    "profile, which IS oracle-checked.",
    tags=("audit", "report", "aggregate", "layout", "approx", "scale"),
)
def column_stats_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile_frame(spark, sf_dir, approx=True)
