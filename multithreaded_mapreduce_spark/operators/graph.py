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
truncate lineage. Rows-only driver check (recursive SQL with mutual
recursion over a dense graph is not oracle-practical); pytest verifies
against a NumPy power iteration to 1e-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

DAMPING = 0.85
N_ITER = 10


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


@register(
    "token_pagerank",
    oracle=None,  # fixed-point iteration; verified against a NumPy
    # power iteration in tests/test_graph.py (1e-9 agreement)
    description="Weighted PageRank (d=0.85, 10 fixed iterations) over "
    "the token co-occurrence graph. Each iteration joins the slim rank "
    "table to the persisted edge table on src and re-aggregates by dst "
    "— one shuffle per round over |nodes| rows, edges never move after "
    "the first partitioning. Driver-coordinated fixed iteration: the "
    "DAG is static, lineage bounded, checkpointable.",
    tags=("graph", "pagerank", "iterative"),
)
def token_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = cooccurrence_edges(spark, sf_dir).persist()
    outw = edges.groupBy("src").agg(F.sum("weight").alias("outw"))
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("weight") / F.col("outw")).alias("p")
    ).persist()
    nodes = edges.select(F.col("src").alias("token")).distinct().persist()
    n_nodes = nodes.count()
    ranks = nodes.select("token", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - DAMPING) / n_nodes
    for it in range(N_ITER):
        contrib = (
            ranks.join(norm, ranks["token"] == norm["src"])
            .select("dst", (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # every node has outdegree ≥1 here (co-occurrence graph), so no
        # dangling-mass redistribution term is needed
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
