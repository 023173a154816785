"""Iterative graph analytics: PageRank over the token co-occurrence
graph — the engine's demonstration of driver-coordinated iteration
(the same pattern as the connected-components dedup clustering in
``dedup.py``, which carries the recursive-CTE oracle).

The reference has no iteration at all (one fixed pipeline, SURVEY.md
§3); PageRank is the canonical fixed-point computation a distributed
engine must express: rank_{k+1} = (1−d)/N + d·Σ_in rank_k/outdeg.

Scale notes: each iteration is one shuffle — ranks join edges on the
source key, contributions groupBy the destination key; the edge table
partitioning is reused every round (persist), only the slim rank
table (|nodes| rows) changes. Iteration count is FIXED (driver-side
for-loop, no data-dependent convergence test), so the whole job is a
static 10-stage DAG — at 100 TB you checkpoint every few rounds to
truncate lineage.

Oracle story (promoted from rows-only in round 3): per-edge
contributions ``rank·p`` are identical IEEE doubles on both engines,
and each iteration's inflow sums them through DECIMAL(38,25) — exact
and order-independent — so the ranks stay engine-identical through
all 10 rounds. The DuckDB oracle unrolls the fixed iteration count as
ten chained CTEs (aggregates are not allowed in recursive terms), and
a pytest still cross-checks against a NumPy power iteration to 1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.caching import (
    guard_checkpoint_result,
    tracked_local_checkpoint,
    tracked_persist,
)
from ..plans.registry import register
from ..sources.tables import load_table

DAMPING = 0.85
N_ITER = 10
DEC25 = "decimal(38,25)"


def cooccurrence_half_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-ordered (``src < dst``) undirected co-occurrence edges
    between tokens appearing in the same document, weighted by the
    number of such documents."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
            )
        ).alias("token"),
    ).distinct()
    a = toks.select("doc_id", F.col("token").alias("src"))
    b = toks.select(F.col("doc_id").alias("d2"), F.col("token").alias("dst"))
    return (
        a.join(b, (a["doc_id"] == b["d2"]) & (a["src"] < b["dst"]))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-occurrence edges (both directions materialized)."""
    half = cooccurrence_half_edges(spark, sf_dir)
    return half.unionByName(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )


def _pagerank_oracle() -> str:
    # the teleport/damping doubles are rendered via repr() so the SQL
    # string round-trips to the EXACT Python floats the Spark plan uses
    one_minus_d = repr(1.0 - DAMPING)
    d = repr(DAMPING)
    iters = []
    prev = "r0"
    for k in range(1, N_ITER + 1):
        iters.append(
            f"""r{k} AS (
  SELECT n.dst AS token,
         (CAST('{one_minus_d}' AS DOUBLE) / (SELECT cnt FROM nn))
         + CAST('{d}' AS DOUBLE)
           * CAST(sum(CAST(r.rank * n.p AS DECIMAL(38,25))) AS DOUBLE) AS rank
  FROM {prev} r JOIN norm n ON r.token = n.src
  GROUP BY n.dst
)"""
        )
        prev = f"r{k}"
    chained = ",\n".join(iters)
    return rf"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(
    list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))) AS token
  FROM documents
), half AS (
  SELECT a.token AS src, b.token AS dst, count(*) AS weight
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
), edges AS (
  SELECT src, dst, weight FROM half
  UNION ALL SELECT dst, src, weight FROM half
), outw AS (
  SELECT src, sum(weight) AS ow FROM edges GROUP BY src
), norm AS (
  SELECT e.src, e.dst,
         CAST(e.weight AS DOUBLE) / CAST(o.ow AS DOUBLE) AS p
  FROM edges e JOIN outw o ON e.src = o.src
), nodes AS (
  SELECT DISTINCT src AS token FROM edges
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes
), r0 AS (
  SELECT token, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM nn) AS rank FROM nodes
),
{chained}
SELECT token,
       CAST(round(CAST(rank AS DECIMAL(30,12)), 9) AS DOUBLE) AS rank
FROM r{N_ITER}
ORDER BY rank DESC, token
"""


@register(
    "token_pagerank",
    oracle=_pagerank_oracle(),
    description="Weighted PageRank (d=0.85, 10 fixed iterations) over "
    "the token co-occurrence graph. Each iteration joins the slim rank "
    "table to the persisted edge table on src and re-aggregates by dst "
    "— one shuffle per round over |nodes| rows, edges never move after "
    "the first partitioning. Driver-coordinated fixed iteration: the "
    "DAG is static, lineage bounded, checkpointable. Oracle-checked: "
    "per-iteration inflows sum through DECIMAL(38,25), making every "
    "round's ranks exact and order-independent, so DuckDB (with the "
    "fixed iteration count unrolled as chained CTEs) reproduces the "
    "ranks bit-for-bit; a NumPy power iteration cross-checks to 1e-9.",
    tags=("graph", "pagerank", "iterative"),
)
def token_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_edges(spark, sf_dir).transform(tracked_persist)
    outw = edges.groupBy("src").agg(F.sum("weight").alias("ow"))
    norm = edges.join(outw, "src").select(
        "src", "dst",
        (F.col("weight").cast("double") / F.col("ow").cast("double")).alias("p"),
    ).transform(tracked_persist)
    nodes = edges.select(F.col("src").alias("token")).distinct().transform(tracked_persist)
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty corpus → empty graph → empty ranks (the oracle's chained
        # CTEs propagate emptiness the same way); guards the Python-side
        # 1/N from a ZeroDivisionError
        return spark.createDataFrame([], "token string, rank double")
    ranks = nodes.select("token", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - DAMPING) / n_nodes
    for it in range(N_ITER):
        # decimal fold of the per-edge double contributions: exact and
        # order-independent, so every iteration's ranks are identical
        # across engines AND partitionings (the oracle enabler)
        contrib = (
            ranks.join(norm, ranks["token"] == norm["src"])
            .select("dst", (F.col("rank") * F.col("p")).cast(DEC25).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        # every node has outdegree ≥1 here (co-occurrence graph), so no
        # dangling-mass redistribution term is needed; inner join below
        # matches the oracle (every node also has indegree ≥1 — the
        # graph is symmetric)
        ranks = nodes.join(
            contrib, nodes["token"] == contrib["dst"], "left"
        ).select(
            "token",
            (
                F.lit(teleport)
                + F.lit(DAMPING) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        )
        # truncate lineage every 3 rounds: the rank plan otherwise nests
        # all previous iterations and Catalyst's analysis time grows
        # superlinearly with depth (measured 25s → ~8s at sf0.01 for the
        # whole query). Values are unchanged — checkpointing only
        # materializes. The 100 TB analogue is reliable-storage
        # checkpointing, same cadence.
        if it % 3 == 2:
            ranks = ranks.transform(tracked_local_checkpoint)
    # fail-fast guard: the plan reads tracked checkpoint blocks, which
    # the NEXT top-level build releases (see plans/caching.py)
    return guard_checkpoint_result(
        ranks.select(
            "token",
            F.round(F.col("rank").cast("decimal(30,12)"), 9).cast("double").alias("rank"),
        ).orderBy(F.desc("rank"), "token")
    )


# --------------------------------------------------------------------------
# triangle counting / local clustering coefficient (degree-ordered)
# --------------------------------------------------------------------------

_TRIANGLE_ORACLE = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(list_distinct(
    list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0))) AS token
  FROM documents
), half AS (
  SELECT a.token AS src, b.token AS dst
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
), deg AS (
  SELECT token, count(*) AS degree FROM (
    SELECT src AS token FROM half UNION ALL SELECT dst AS token FROM half
  ) GROUP BY token
), oriented AS (
  -- orient every edge from the lower-(degree, name) endpoint to the
  -- higher one; src < dst by name already, so a degree tie keeps src
  SELECT CASE WHEN ds.degree <= dd.degree THEN h.src ELSE h.dst END AS u,
         CASE WHEN ds.degree <= dd.degree THEN h.dst ELSE h.src END AS v
  FROM half h
  JOIN deg ds ON h.src = ds.token
  JOIN deg dd ON h.dst = dd.token
), tri AS (
  -- each triangle has exactly one vertex with BOTH out-edges (the
  -- (degree, name)-minimum); v < w picks the wedge once; the closing
  -- edge is looked up in the name-ordered half table
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM oriented e1
  JOIN oriented e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN half h ON h.src = e1.v AND h.dst = e2.v
), per_node AS (
  SELECT token, count(*) AS triangles FROM (
    SELECT a AS token FROM tri
    UNION ALL SELECT b AS token FROM tri
    UNION ALL SELECT c AS token FROM tri
  ) GROUP BY token
)
SELECT d.token, d.degree,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2 THEN
         CAST(round(CAST(
           (CAST(2 AS DOUBLE) * COALESCE(p.triangles, 0))
           / (d.degree * (d.degree - 1))
         AS DECIMAL(30,12)), 6) AS DOUBLE)
       ELSE CAST(0 AS DOUBLE) END AS clustering
FROM deg d LEFT JOIN per_node p ON d.token = p.token
ORDER BY triangles DESC, d.token
"""


@register(
    "token_triangle_counts",
    oracle=_TRIANGLE_ORACLE,
    description="Per-token triangle count and local clustering "
    "coefficient over the co-occurrence graph, via degree-ordered "
    "edge orientation: every edge points from its lower-(degree, name) "
    "endpoint to the higher, so each triangle is found exactly once at "
    "its minimum vertex and the wedge join's fan-out per node is the "
    "ORIENTED out-degree — O(√m) on any graph — instead of the raw "
    "degree. Hot boilerplate tokens (the skew risk) have high degree, "
    "therefore mostly IN-edges, therefore near-zero wedge fan-out.",
    tags=("graph", "triangles", "clustering-coefficient", "join"),
)
def token_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the token co-occurrence graph.

    Scale notes: the naive wedge join (each node pairs its full
    neighbor list) is quadratic in the hottest degree — a boilerplate
    token in every document yields |vocab|² wedges. Degree-ordered
    orientation is the standard fix (classic MapReduce triangle
    counting): after orienting edges low→high, every node's out-degree
    is ≤ O(√m), so Σ outdeg² — the wedge join's total fan-out — is
    bounded by O(m^1.5) regardless of skew. Both the wedge self-join
    (on u) and the closing-edge lookup (on (v, w)) are plain equi-join
    shuffles; nothing is broadcast-sized except the degree table,
    which Spark handles via its own stats."""
    # persist all three shared relations: half feeds the degree count,
    # the orientation join, and the closing-edge lookup; deg feeds the
    # orientation (both sides) and the final join; oriented self-joins.
    # Without the persists the plan recomputes the edge derivation per
    # branch — 26 parquet scans / 53 exchanges, measured (the same
    # ReuseExchange-defeated-by-pruning pathology the funnel had).
    half = cooccurrence_half_edges(spark, sf_dir).select("src", "dst").transform(tracked_persist)
    deg = (
        half.select(F.col("src").alias("token"))
        .unionAll(half.select(F.col("dst").alias("token")))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("degree"))
        .transform(tracked_persist)
    )
    ds = deg.select(F.col("token").alias("src"), F.col("degree").alias("_ds"))
    dd = deg.select(F.col("token").alias("dst"), F.col("degree").alias("_dd"))
    keep = F.col("_ds") <= F.col("_dd")  # src < dst by name breaks ties
    oriented = (
        half.join(ds, "src")
        .join(dd, "dst")
        .select(
            F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("u"),
            F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("v"),
        )
        .transform(tracked_persist)
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    tri = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")))
        .join(
            half,
            (F.col("src") == F.col("e1.v")) & (F.col("dst") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    t = F.coalesce(F.col("triangles"), F.lit(0).cast("long"))
    d = F.col("degree")
    clustering = F.when(
        d >= 2,
        F.round(
            ((F.lit(2).cast("double") * t) / (d * (d - 1))).cast("decimal(30,12)"),
            6,
        ).cast("double"),
    ).otherwise(F.lit(0).cast("double"))
    return (
        deg.join(per_node, "token", "left")
        .select("token", "degree", t.alias("triangles"), clustering.alias("clustering"))
        .orderBy(F.desc("triangles"), "token")
    )
