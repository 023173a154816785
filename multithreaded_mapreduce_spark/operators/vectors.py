"""Vector-column aggregation over ``embeddings``: per-label centroids
and L2 norms — the embedding-space statistics a training-data pipeline
computes for clustering sanity checks and class-balance audits.

The reference has no numeric aggregation beyond counting (SURVEY.md
§2.1). Here the ``array<float>`` column is aggregated dimension-wise:
``posexplode`` → (label, dim) groupBy with exact decimal sums, so the
centroid is bit-identical under any partitioning (float → double is an
exact widening; double → decimal rounds identically in both engines).

Scale notes: the explode produces |rows|×64 slim rows that partial-
aggregate map-side down to |labels|×64 before the shuffle — the
at-scale alternative (``F.aggregate`` over a zipped array accumulator)
keeps rows intact but cannot map-side-combine across rows without a
custom UDAF; the explode form gets that for free from HashAggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import DEC
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "embedding_label_centroids",
    oracle=f"""
WITH dims AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, dim, count(*) AS n_vectors,
       CAST(round(CAST(CAST(sum(CAST(CAST(v AS DOUBLE) AS {DEC})) AS DOUBLE) / count(*)
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS centroid,
       CAST(round(CAST(CAST(sum(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS {DEC})) AS DOUBLE)
                       / count(*) AS DECIMAL(30,12)), 6) AS DOUBLE) AS mean_sq
FROM dims GROUP BY label, dim
ORDER BY label, dim
""",
    description="Dimension-wise centroid and mean-square per label over "
    "64-dim float embeddings: posexplode to slim (label, dim, value) "
    "rows, exact decimal sums partial-aggregated map-side down to "
    "|labels|×64 rows before the shuffle. Bit-identical to the oracle "
    "under any partitioning.",
    tags=("vectors", "embeddings", "centroid", "aggregate"),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select("label", "dim", F.col("v").cast("double").alias("v"))
    return (
        dims.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                (F.sum(F.col("v").cast(DEC)).cast("double") / F.count(F.lit(1))).cast(
                    "decimal(30,12)"
                ),
                6,
            )
            .cast("double")
            .alias("centroid"),
            F.round(
                (
                    F.sum((F.col("v") * F.col("v")).cast(DEC)).cast("double")
                    / F.count(F.lit(1))
                ).cast("decimal(30,12)"),
                6,
            )
            .cast("double")
            .alias("mean_sq"),
        )
        .orderBy("label", "dim")
    )


@register(
    "embedding_standardize",
    oracle=f"""
WITH dims AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), st AS (
  SELECT dim, count(*) AS n,
         CAST(sum(CAST(v AS {DEC})) AS DOUBLE) AS sx,
         CAST(sum(CAST(v * v AS {DEC})) AS DOUBLE) AS sxx
  FROM dims GROUP BY dim
)
SELECT d.vec_id,
       list(CAST(round(CAST((d.v - st.sx / st.n)
              / sqrt((st.sxx - st.sx * st.sx / st.n) / (st.n - 1))
            AS DECIMAL(30,12)), 4) AS DOUBLE) ORDER BY d.dim) AS zvec
FROM dims d JOIN st USING (dim)
GROUP BY d.vec_id
ORDER BY d.vec_id
""",
    description="Per-dimension z-score standardization of the embedding "
    "matrix (feature scaling before clustering/ANN): posexplode to slim "
    "(vec_id, dim, value) rows, per-dim mean/std from exact decimal "
    "power sums (map-side-combined to 64 rows), broadcast back, then "
    "re-assemble each vector with array_sort ∘ collect_list. The stats "
    "branch re-scans the exploded projection — at 100 TB persist the "
    "slim projection or accept the second column-pruned scan.",
    tags=("vectors", "embeddings", "ml-prep", "aggregate"),
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.col("v").cast("double").alias("v"))
    v = F.col("v")
    stats = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast(DEC)).cast("double").alias("sx"),
        F.sum((v * v).cast(DEC)).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx") / nd
    # try_divide twice: n=1 makes the variance denominator 0, and a
    # constant dimension makes std 0 — DuckDB returns NULL for double
    # division by zero in both spots, so NULL z (not an ANSI crash)
    # keeps the engines identical on degenerate input
    std = F.sqrt(
        F.try_divide(F.col("sxx") - F.col("sx") * F.col("sx") / nd, nd - 1)
    )
    z = F.round(F.try_divide(v - mean, std).cast("decimal(30,12)"), 4).cast("double")
    return (
        dims.join(F.broadcast(stats), "dim")
        .select("vec_id", "dim", z.alias("z"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "z"))),
                lambda s: s["z"],
            ).alias("zvec")
        )
        .orderBy("vec_id")
    )
