"""Adversarial-input parity: the SAME oracle comparison the driver
runs, but over data built to hit the edges — degenerate documents
(empty/whitespace/single-token/unicode text) and fully EMPTY tables.

Both fixtures keep the production schemas, so every failure here is a
real semantics divergence (a guard missing around ``sequence(1, 0)``,
a division that returns NaN in one engine and NULL in the other, an
aggregate that drops instead of returning an empty/zero row) — exactly
the class of bug round-1 advice found latent in chunk_documents.

Streaming queries are excluded (stream replay of a 0-row file exercises
the sink harness, not edge semantics — their own suite covers them);
so are the sketch/ANN rows-only queries (no oracle to diverge from,
and k-means on an empty relation is undefined by contract).
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

#: documents.text edge rows — every tokenize/shingle/chunk path must
#: survive all of them with oracle-identical results.
_EDGE_DOCS = [
    # (doc_id, text, lang, source)
    (1, "", "en", "src0"),                      # empty text
    (2, "   ", "en", "src1"),                   # whitespace only
    (3, "solo", "en", "src2"),                  # single token
    (4, "a b", "fr", "src3"),                   # below shingle width
    (5, "one two three", "es", "src4"),         # exactly shingle width
    (6, "dup dup dup dup", "en", "src5"),       # repeated token
    (7, "café naïve ↔ ☃", "de", "src6"),  # non-ASCII
    (8, "x " * 100, "zh", "src7"),              # long, trailing space
    (9, "shared exact duplicate text", "en", "src8"),
    (10, "shared exact duplicate text", "en", "src19"),  # dup + new batch
    (11, "tab\tand\nnewline separated", "en", "src19"),
    # PII-looking strings so pii_pattern_audit counts real matches
    (12, "contact jane.doe@example.com or 555-123-4567 today", "en", "src9"),
    (13, "server 192.168.1.1 ssn 123-45-6789 email a@b.io", "en", "src9"),
    # NULL text — crawl pipelines see these; every text path must agree
    # with the oracle on NULL propagation, not crash
    (14, None, "en", "src9"),
    # NULL doc_id (broken upstream id assignment): groupings keep a
    # NULL group identically, pair joins drop NULL comparisons
    # identically, and a NULL lang rides along for the per-lang paths
    (None, "orphan row with no id", None, "src9"),
    # duplicate doc_id with DIFFERENT text — id-keyed dedup/chunk paths
    # must treat it deterministically in both engines
    (11, "tab and newline separated but different", "en", "src19"),
]


def _doc_queries() -> list[str]:
    # Select by ORACLE TEXT, not tags: every oracle-bearing query that
    # reads documents must survive the edge rows. The previous tag
    # filter let the r9 media-certification family (image/audio/
    # real-codec tags only) dodge the duplicate-doc_id fixture and ship
    # a per-row-vs-GROUP-BY divergence (VERDICT r9 what's-wrong #1-2).
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and "documents" in q.oracle and "streaming" not in q.tags
    )


def _all_oracle_queries() -> list[str]:
    return sorted(
        n for n, q in _Q.items() if q.oracle and "streaming" not in q.tags
    )


@pytest.fixture(scope="session")
def edge_docs_dir(tmp_path_factory, spark) -> str:
    """sf0.001 with documents replaced by the edge-case rows."""
    d = str(tmp_path_factory.mktemp("edge_docs_sf"))
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    schema = spark.read.parquet(table_path(SF_DIR, "documents")).schema
    rows = [
        (i, s, lang, src, len(s) if s is not None else None)
        for i, s, lang, src in _EDGE_DOCS
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


@pytest.fixture(scope="session")
def empty_tables_dir(tmp_path_factory, spark) -> str:
    """Every table present with its production schema and ZERO rows."""
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        schema = spark.read.parquet(table_path(SF_DIR, t)).schema
        spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"_{t}_tmp")
        )
        part = next(
            f
            for f in os.listdir(os.path.join(d, f"_{t}_tmp"))
            if f.endswith(".parquet")
        )
        shutil.copyfile(os.path.join(d, f"_{t}_tmp", part), table_path(d, t))
    return d


@pytest.mark.parametrize("name", _doc_queries())
def test_edge_documents_parity(spark, edge_docs_dir, name):
    compare_query(spark, edge_docs_dir, _Q[name].builder, _Q[name].oracle)


@pytest.mark.parametrize("name", _all_oracle_queries())
def test_empty_tables_parity(spark, empty_tables_dir, name):
    compare_query(spark, empty_tables_dir, _Q[name].builder, _Q[name].oracle)


#: degenerate embeddings — zero vectors (undefined cosine), exact
#: duplicates and scaled copies (cosine-1 ties), orthogonal basis
#: vectors (cosine-0 ties), so ANN tie-breaks and the zero-norm
#: division path are exercised under the oracle hash (VERDICT r2
#: task 7: "ANN tie-breaks are where cross-engine drift hides").
def _edge_vectors() -> list[tuple[int, list[float], int]]:
    dim = 64
    zero = [0.0] * dim
    ones = [1.0] * dim
    alt = [1.0 if i % 2 == 0 else -1.0 for i in range(dim)]

    def basis(i: int, scale: float = 1.0) -> list[float]:
        v = [0.0] * dim
        v[i] = scale
        return v

    def step(k: int) -> list[float]:
        return [1.0 if i < k else 0.0 for i in range(dim)]

    rows: list[tuple[int, list[float], int]] = [
        (0, zero, 0),                 # zero-vector QUERY
        (1, ones, 1),
        (2, list(ones), 1),           # exact duplicate of 1 → cosine-1 tie
        (3, basis(0), 2),
        (4, basis(1), 2),             # orthogonal to 3 → cosine-0 ties
        (5, [2.0] * dim, 1),          # scaled copy of 1 → cosine 1, other norm
        (6, alt, 3),
        (7, [-1.0] * dim, 3),         # antipode of 1 → cosine −1
        (8, basis(0, 3.0), 2),        # scaled copy of 3
        (9, list(zero), 0),           # second zero vector (dup of 0)
    ]
    rows += [(10 + i, list(ones), 1) for i in range(4)]          # more cosine-1 ties
    rows += [(14 + i, basis(2 + i), 2) for i in range(4)]        # more orthogonals
    rows.append((18, list(zero), 0))                             # zero-vector NEIGHBOR
    rows.append((19, list(alt), 3))                              # duplicate of 6
    rows += [(20 + i, step(4 + 8 * i), 4 + i % 6) for i in range(8)]
    rows.append((28, None, 5))  # NULL embedding — must propagate, not crash
    # NULL label: label-filtered search and per-label aggregates must
    # treat the unlabeled vector identically in both engines
    rows.append((29, step(12), None))
    return rows


def _similarity_queries() -> list[str]:
    wanted = {"similarity", "vectors", "embedding", "vector"}
    return sorted(
        n for n, q in _Q.items() if q.oracle and (set(q.tags) & wanted)
    )


@pytest.fixture(scope="session")
def edge_embeddings_dir(tmp_path_factory, spark) -> str:
    """sf0.001 with embeddings replaced by the degenerate vectors."""
    d = str(tmp_path_factory.mktemp("edge_emb_sf"))
    for t in TABLES:
        if t != "embeddings":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    schema = spark.read.parquet(table_path(SF_DIR, "embeddings")).schema
    spark.createDataFrame(_edge_vectors(), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "_emb_tmp"))
    part = next(
        f for f in os.listdir(os.path.join(d, "_emb_tmp")) if f.endswith(".parquet")
    )
    shutil.copyfile(os.path.join(d, "_emb_tmp", part), table_path(d, "embeddings"))
    return d


@pytest.mark.parametrize("name", _similarity_queries())
def test_edge_embeddings_parity(spark, edge_embeddings_dir, name):
    compare_query(spark, edge_embeddings_dir, _Q[name].builder, _Q[name].oracle)


#: degenerate events — exact-timestamp ties (window tie-breaks), rows
#: landing exactly ON hour/window boundaries, events exactly AT the
#: session gap, NULL value / NULL props / malformed JSON / NULL
#: event_type — the drift surface of every window/session/funnel query.
def _edge_events() -> list[tuple]:
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    m = timedelta(minutes=1)
    rows = [
        # user 1: three events at the IDENTICAL timestamp (tie-break),
        # one exactly on the hour boundary
        (0, t0, 1, "view", 10.0, '{"k": 1}'),
        (1, t0, 1, "click", 20.0, '{"k": 2}'),
        (2, t0, 1, "view", 30.0, '{"k": 3}'),
        (3, datetime(2024, 1, 1, 1, 0, 0), 1, "purchase", 40.0, '{"k": 4}'),
        # user 2: session-gap edges — consecutive events exactly 30 min
        # apart (the classic <= vs < sessionization boundary)
        (4, t0, 2, "view", 1.0, '{"k": 5}'),
        (5, t0 + 30 * m, 2, "click", 2.0, '{"k": 6}'),
        (6, t0 + 60 * m, 2, "purchase", 3.0, '{"k": 7}'),
        # user 3: NULL value, NULL props, malformed/empty JSON, NULL type
        (7, t0 + 5 * m, 3, "view", None, '{"k": 8}'),
        (8, t0 + 6 * m, 3, "click", 5.0, None),
        (9, t0 + 7 * m, 3, "purchase", 6.0, "not json"),
        (10, t0 + 8 * m, 3, "error", 7.0, ""),
        (11, t0 + 9 * m, 3, None, 8.0, '{"k": 9}'),
        # user 4: identical duplicate rows except event_id
        (12, t0 + 90 * m, 4, "signup", 9.0, '{"k": 10}'),
        (13, t0 + 90 * m, 4, "signup", 9.0, '{"k": 10}'),
        # user 5: a lone event (single-row windows/sessions)
        (14, t0 + 120 * m, 5, "error", 11.5, '{"k": 11}'),
        # user 6: equal values at distinct ts (value-order ties),
        # sub-second microsecond offsets
        (15, t0 + 10 * m, 6, "view", 42.0, '{"k": 12}'),
        (16, t0 + 10 * m + timedelta(microseconds=1), 6, "view", 42.0, '{"k": 13}'),
        (17, t0 + 11 * m, 6, "click", 42.0, '{"k": 14}'),
        # user 7: a NULL timestamp — the engines' ASC NULL orderings
        # DISAGREE by default (Spark first, DuckDB last), so every
        # event-time window/filter must handle it explicitly
        (18, None, 7, "view", 13.0, '{"k": 15}'),
        # NULL user: per-user windows get a NULL partition (consistent
        # in both engines), user joins must drop it identically, and
        # the salted join must hash it deterministically
        (19, t0 + 15 * m, None, "view", 14.0, '{"k": 16}'),
    ]
    return rows


def _event_queries() -> list[str]:
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and "events" in q.oracle and "streaming" not in q.tags
    )


@pytest.fixture(scope="session")
def edge_events_dir(tmp_path_factory, spark) -> str:
    """sf0.001 with events replaced by the edge rows."""
    d = str(tmp_path_factory.mktemp("edge_events_sf"))
    for t in TABLES:
        if t != "events":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    schema = spark.read.parquet(table_path(SF_DIR, "events")).schema
    spark.createDataFrame(_edge_events(), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "_ev_tmp"))
    part = next(
        f for f in os.listdir(os.path.join(d, "_ev_tmp")) if f.endswith(".parquet")
    )
    shutil.copyfile(os.path.join(d, "_ev_tmp", part), table_path(d, "events"))
    return d


@pytest.mark.parametrize("name", _event_queries())
def test_edge_events_parity(spark, edge_events_dir, name):
    compare_query(spark, edge_events_dir, _Q[name].builder, _Q[name].oracle)


@pytest.fixture(scope="session")
def corrupted_orders_dir(tmp_path_factory, spark) -> str:
    """sf0.001 with orders deliberately damaged: a duplicated order key,
    a NULL customer key, and an orphan customer reference."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("corrupt_sf"))
    for t in TABLES:
        if t != "orders":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    orders = spark.read.parquet(table_path(SF_DIR, "orders"))
    first = orders.limit(1)
    dup_key = first  # duplicates an existing o_orderkey
    null_cust = first.withColumn("o_orderkey", F.lit(999_999_001)).withColumn(
        "o_custkey", F.lit(None).cast("long")
    )
    orphan = first.withColumn("o_orderkey", F.lit(999_999_002)).withColumn(
        "o_custkey", F.lit(888_888_888)  # no such customer
    )
    # NULL measure / date / status / priority: revenue aggregates,
    # histograms (a NULL bucket), date filters, and every window that
    # orders by price or date must handle NULLs identically — the
    # engines' ASC NULL defaults disagree (Spark first, DuckDB last)
    null_price = first.withColumn("o_orderkey", F.lit(999_999_003)).withColumn(
        "o_totalprice", F.lit(None).cast("double")
    )
    null_date = first.withColumn("o_orderkey", F.lit(999_999_004)).withColumn(
        "o_orderdate", F.lit(None).cast("timestamp")
    )
    null_status = (
        first.withColumn("o_orderkey", F.lit(999_999_005))
        .withColumn("o_orderstatus", F.lit(None).cast("string"))
        .withColumn("o_orderpriority", F.lit(None).cast("string"))
    )
    damaged = (
        orders.unionByName(dup_key)
        .unionByName(null_cust)
        .unionByName(orphan)
        .unionByName(null_price)
        .unionByName(null_date)
        .unionByName(null_status)
    )
    tmp = os.path.join(d, "_orders_tmp")
    damaged.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(tmp, part), table_path(d, "orders"))
    return d


def _orders_queries() -> list[str]:
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and "orders" in q.oracle and "streaming" not in q.tags
    )


@pytest.mark.parametrize("name", _orders_queries())
def test_corrupted_orders_parity(spark, corrupted_orders_dir, name):
    """Every orders-touching oracle query must stay engine-identical on
    damaged data too — duplicate keys, NULL FKs, and orphan references
    flow through joins, windows, and aggregates on both engines."""
    compare_query(spark, corrupted_orders_dir, _Q[name].builder, _Q[name].oracle)


def test_quality_audit_catches_planted_violations(spark, corrupted_orders_dir):
    """The audit must report exactly the planted damage — and still
    hash-match the DuckDB oracle run over the same damaged data."""
    q = _Q["data_quality_audit"]
    compare_query(spark, corrupted_orders_dir, q.builder, q.oracle)
    got = {r.check_name: r.violations for r in q.builder(spark, corrupted_orders_dir).collect()}
    assert got["dup_o_orderkey"] == 1
    assert got["null_o_custkey"] == 1
    # 2 = the planted orphan key + the NULL key (a NULL FK can never
    # match a parent, so it fails the referential check in BOTH engines
    # — SQL NOT EXISTS and Spark left-anti agree)
    assert got["orphan_orders_customer"] == 2
    # lineitem orphans: the two synthetic orders have no lineitems, so
    # the lineitem->orders direction stays clean
    assert got["orphan_lineitem_orders"] == 0


#: corrupted lineitem — the biggest fact table gets the same treatment
#: as orders: a fully duplicated line, a NULL measure (l_quantity —
#: exercises the per-measure non-null denominators in q1), a NULL
#: group key (l_returnflag), an orphan l_orderkey, a hostile row
#: (negative quantity, discount > 1 → negative revenue), and a NULL
#: ship date (falls out of every date filter in BOTH engines).
@pytest.fixture(scope="session")
def corrupted_lineitem_dir(tmp_path_factory, spark) -> str:
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("corrupt_li_sf"))
    for t in TABLES:
        if t != "lineitem":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    li = spark.read.parquet(table_path(SF_DIR, "lineitem"))
    first = li.limit(1)
    dup = first  # exact duplicate line
    null_qty = first.withColumn("l_linenumber", F.lit(901)).withColumn(
        "l_quantity", F.lit(None).cast("double")
    )
    null_flag = first.withColumn("l_linenumber", F.lit(902)).withColumn(
        "l_returnflag", F.lit(None).cast("string")
    )
    orphan = first.withColumn("l_orderkey", F.lit(999_999_777))
    hostile = (
        first.withColumn("l_linenumber", F.lit(903))
        .withColumn("l_quantity", F.lit(-4.0))
        .withColumn("l_discount", F.lit(1.5))
    )
    null_date = first.withColumn("l_linenumber", F.lit(904)).withColumn(
        "l_shipdate", F.lit(None).cast("timestamp")
    )
    damaged = (
        li.unionByName(dup)
        .unionByName(null_qty)
        .unionByName(null_flag)
        .unionByName(orphan)
        .unionByName(hostile)
        .unionByName(null_date)
    )
    tmp = os.path.join(d, "_li_tmp")
    damaged.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(tmp, part), table_path(d, "lineitem"))
    return d


def _lineitem_queries() -> list[str]:
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and "lineitem" in q.oracle and "streaming" not in q.tags
    )


@pytest.mark.parametrize("name", _lineitem_queries())
def test_corrupted_lineitem_parity(spark, corrupted_lineitem_dir, name):
    """Every lineitem-touching oracle query must stay engine-identical
    on damaged data — NULL measures, NULL group keys, orphan FKs,
    negative quantities, and >100% discounts flow through the TPC-H
    suite, percentiles, moment stats, and the bucketed join on both
    engines."""
    compare_query(spark, corrupted_lineitem_dir, _Q[name].builder, _Q[name].oracle)


#: corrupted customer — the most-joined dimension: a duplicated
#: custkey (fans out every customer join), a NULL nation FK, an orphan
#: nation FK, a NULL market segment (NULL group key through set ops,
#: shares, and RFM), and a NULL + negative account balance (windows,
#: ntile, percentiles over NULLs).
@pytest.fixture(scope="session")
def corrupted_customer_dir(tmp_path_factory, spark) -> str:
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("corrupt_cust_sf"))
    for t in TABLES:
        if t != "customer":
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    cust = spark.read.parquet(table_path(SF_DIR, "customer"))
    first = cust.limit(1)
    dup = first  # duplicate key: every join over c_custkey fans out
    null_nation = first.withColumn("c_custkey", F.lit(999_999_101)).withColumn(
        "c_nationkey", F.lit(None).cast("int")
    )
    orphan_nation = first.withColumn("c_custkey", F.lit(999_999_102)).withColumn(
        "c_nationkey", F.lit(777)
    )
    null_segment = first.withColumn("c_custkey", F.lit(999_999_103)).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    bad_balance = (
        first.withColumn("c_custkey", F.lit(999_999_104))
        .withColumn("c_acctbal", F.lit(None).cast("double"))
    )
    neg_balance = (
        first.withColumn("c_custkey", F.lit(999_999_105))
        .withColumn("c_acctbal", F.lit(-123456.78))
    )
    damaged = (
        cust.unionByName(dup)
        .unionByName(null_nation)
        .unionByName(orphan_nation)
        .unionByName(null_segment)
        .unionByName(bad_balance)
        .unionByName(neg_balance)
    )
    tmp = os.path.join(d, "_cust_tmp")
    damaged.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(tmp, part), table_path(d, "customer"))
    return d


def _customer_queries() -> list[str]:
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and "customer" in q.oracle and "streaming" not in q.tags
    )


@pytest.mark.parametrize("name", _customer_queries())
def test_corrupted_customer_parity(spark, corrupted_customer_dir, name):
    """Every customer-touching oracle query must stay engine-identical
    on damaged dimension data — duplicate keys fan out joins, NULL and
    orphan FKs flow through outer joins and set ops, NULL segments and
    balances hit group keys, windows, and quartile assignment on both
    engines."""
    compare_query(spark, corrupted_customer_dir, _Q[name].builder, _Q[name].oracle)


def _corrupt_dim(spark, table: str, rows) -> str:
    """Shared builder: copy sf0.001, replace ``table`` with the damaged
    union (original + the provided mutated single rows)."""
    import tempfile

    d = tempfile.mkdtemp(prefix=f"corrupt_{table}_sf")
    for t in TABLES:
        if t != table:
            shutil.copyfile(table_path(SF_DIR, t), table_path(d, t))
    base = spark.read.parquet(table_path(SF_DIR, table))
    damaged = base
    for r in rows(base.limit(1)):
        damaged = damaged.unionByName(r)
    tmp = os.path.join(d, f"_{table}_tmp")
    damaged.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.copyfile(os.path.join(tmp, part), table_path(d, table))
    return d


@pytest.fixture(scope="session")
def corrupted_part_dir(tmp_path_factory, spark) -> str:
    """part damaged: duplicate partkey, NULL brand (group key), NULL
    retail price (measure), NULL type/size (filter columns)."""
    from pyspark.sql import functions as F

    def rows(first):
        return [
            first,  # duplicate key
            first.withColumn("p_partkey", F.lit(999_999_201)).withColumn(
                "p_brand", F.lit(None).cast("string")
            ),
            first.withColumn("p_partkey", F.lit(999_999_202)).withColumn(
                "p_retailprice", F.lit(None).cast("double")
            ),
            first.withColumn("p_partkey", F.lit(999_999_203))
            .withColumn("p_type", F.lit(None).cast("string"))
            .withColumn("p_size", F.lit(None).cast("int")),
        ]

    return _corrupt_dim(spark, "part", rows)


@pytest.fixture(scope="session")
def corrupted_supplier_dir(tmp_path_factory, spark) -> str:
    """supplier damaged: duplicate suppkey, NULL nation FK, orphan
    nation FK, NULL account balance."""
    from pyspark.sql import functions as F

    def rows(first):
        return [
            first,  # duplicate key
            first.withColumn("s_suppkey", F.lit(999_999_301)).withColumn(
                "s_nationkey", F.lit(None).cast("int")
            ),
            first.withColumn("s_suppkey", F.lit(999_999_302)).withColumn(
                "s_nationkey", F.lit(777)
            ),
            first.withColumn("s_suppkey", F.lit(999_999_303)).withColumn(
                "s_acctbal", F.lit(None).cast("double")
            ),
        ]

    return _corrupt_dim(spark, "supplier", rows)


def _queries_touching(table: str) -> list[str]:
    return sorted(
        n
        for n, q in _Q.items()
        if q.oracle and table in q.oracle and "streaming" not in q.tags
    )


@pytest.mark.parametrize("name", _queries_touching("part"))
def test_corrupted_part_parity(spark, corrupted_part_dir, name):
    compare_query(spark, corrupted_part_dir, _Q[name].builder, _Q[name].oracle)


@pytest.mark.parametrize("name", _queries_touching("supplier"))
def test_corrupted_supplier_parity(spark, corrupted_supplier_dir, name):
    compare_query(spark, corrupted_supplier_dir, _Q[name].builder, _Q[name].oracle)


@pytest.fixture(scope="session")
def corrupted_nation_dir(tmp_path_factory, spark) -> str:
    """nation damaged: duplicate nationkey (fans out every enrichment
    join), NULL name (the join OUTPUT/group key of most queries), NULL
    and orphan region FKs."""
    from pyspark.sql import functions as F

    def rows(first):
        return [
            first,  # duplicate key
            first.withColumn("n_nationkey", F.lit(901)).withColumn(
                "n_name", F.lit(None).cast("string")
            ),
            first.withColumn("n_nationkey", F.lit(902)).withColumn(
                "n_regionkey", F.lit(None).cast("int")
            ),
            first.withColumn("n_nationkey", F.lit(903)).withColumn(
                "n_regionkey", F.lit(77)
            ),
        ]

    return _corrupt_dim(spark, "nation", rows)


@pytest.mark.parametrize("name", _queries_touching("nation"))
def test_corrupted_nation_parity(spark, corrupted_nation_dir, name):
    compare_query(spark, corrupted_nation_dir, _Q[name].builder, _Q[name].oracle)


@pytest.fixture(scope="session")
def corrupted_region_dir(tmp_path_factory, spark) -> str:
    """region damaged: duplicate regionkey and a NULL name."""
    from pyspark.sql import functions as F

    def rows(first):
        return [
            first,  # duplicate key
            first.withColumn("r_regionkey", F.lit(91)).withColumn(
                "r_name", F.lit(None).cast("string")
            ),
        ]

    return _corrupt_dim(spark, "region", rows)


@pytest.mark.parametrize("name", _queries_touching("region"))
def test_corrupted_region_parity(spark, corrupted_region_dir, name):
    compare_query(spark, corrupted_region_dir, _Q[name].builder, _Q[name].oracle)
