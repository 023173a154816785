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

from ..plans.registry import register
from ..sources.tables import load_table

DAMPING = 0.85
N_ITER = 10
DEC25 = "decimal(38,25)"


def cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-occurrence edges (both directions materialized)
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
    half = (
        a.join(b, (a["doc_id"] == b["d2"]) & (a["src"] < b["dst"]))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
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
    edges = cooccurrence_edges(spark, sf_dir).persist()
    outw = edges.groupBy("src").agg(F.sum("weight").alias("ow"))
    norm = edges.join(outw, "src").select(
        "src", "dst",
        (F.col("weight").cast("double") / F.col("ow").cast("double")).alias("p"),
    ).persist()
    nodes = edges.select(F.col("src").alias("token")).distinct().persist()
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
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "token", F.round(F.col("rank").cast("decimal(30,12)"), 9).cast("double").alias("rank")
    ).orderBy(F.desc("rank"), "token")
