"""Deterministic sampling / dataset-splitting operators for a
training-data pipeline (SURVEY.md §2.3 extension surface).

The reference engine has no sampling story (it consumes one fixture
file whole — reference ``1.cpp:60-71``); a 100 TB corpus pipeline
needs reproducible splits and per-stratum samples that do NOT depend
on partitioning, row order, or executor count. Both operators below
derive their randomness from ``md5`` of a stable business key, so the
same row lands in the same split on a laptop and on a 1000-executor
cluster, and both are exactly reproducible in the DuckDB oracle.

Scale notes: the split is a narrow per-row projection (no shuffle —
it pipelines into whatever consumes it); the stratified sample
shuffles once on the stratum key for the per-stratum rank, which is
the minimal plan for exact-k-per-stratum semantics. For approximate
fractions at extreme scale, ``df.sampleBy`` is cheaper but neither
deterministic across engines nor exact-k — this operator is the
reproducible path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

#: train fraction 0.8 expressed as a 4-hex-digit threshold: the first
#: 4 hex chars of md5(key) are uniform over [0, 65536); 0xCCCD = 52429
#: ≈ 0.8 * 65536. Fixed-width lowercase hex compares lexicographically
#: exactly like the number it encodes, in Spark and DuckDB alike.
TRAIN_HEX_THRESHOLD = "cccd"

SAMPLE_PER_STRATUM = 10


@register(
    "train_test_split",
    oracle=f"""
SELECT doc_id, source,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{TRAIN_HEX_THRESHOLD}'
            THEN 'train' ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
""",
    description="Deterministic 80/20 train/test assignment by md5 of the "
    "document key: partition-order-independent, reproducible across "
    "engines and cluster sizes, and stable when the corpus grows (a doc's "
    "split never changes as neighbors are added — unlike rand() seeds or "
    "row-number modulo). Pure projection: no shuffle, pipelines into the "
    "scan.",
    tags=("sampling", "split", "pipeline"),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return docs.select(
        "doc_id",
        "source",
        F.when(bucket < TRAIN_HEX_THRESHOLD, "train").otherwise("test").alias("split"),
    ).orderBy("doc_id")


@register(
    "stratified_sample",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source, lang, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, source, lang, n_chars
FROM ranked
WHERE rk <= {SAMPLE_PER_STRATUM}
ORDER BY source, doc_id
""",
    description="Exact k-per-stratum sample (k=10 per source): rank rows "
    "within each stratum by md5(key) — a deterministic pseudo-random "
    "order — and keep the first k. One shuffle on the stratum key; at "
    "100 TB strata are handled independently so the plan parallelizes "
    "across all executors, and AQE coalesces the post-shuffle "
    "partitions. Deterministic alternative to sampleBy(), which is "
    "approximate-fraction and seed/partitioning-dependent.",
    tags=("sampling", "stratified", "pipeline"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", "lang", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= SAMPLE_PER_STRATUM)
        .drop("rk")
        .orderBy("source", "doc_id")
    )


#: language-mixing weights (keep-fraction per lang) expressed as
#: 4-hex-digit md5 thresholds, like TRAIN_HEX_THRESHOLD above.
#: "zzzz" compares above every hex string → keep-all (a 5-digit
#: "10000" would sort BELOW "8000" lexicographically — string order,
#: not numeric order, so the keep-all sentinel must stay 4 chars-ish
#: and > 'f').
MIX_WEIGHTS_HEX = {
    "en": "8000",  # 0.50 — downsample the dominant language
    "zh": "c000",  # 0.75
    "de": "zzzz",  # 1.00
    "fr": "zzzz",  # 1.00
    "es": "zzzz",  # 1.00
}


@register(
    "domain_mix_sample",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE lang
        WHEN 'en' THEN '{MIX_WEIGHTS_HEX["en"]}'
        WHEN 'zh' THEN '{MIX_WEIGHTS_HEX["zh"]}'
        ELSE 'zzzz'
      END
ORDER BY doc_id
""",
    description="Corpus mixing: per-language keep-fractions (en 0.5, "
    "zh 0.75, rest 1.0) applied via the same md5-threshold trick as "
    "train_test_split, so the mix is deterministic, partition-order-"
    "independent, and composes with the split (a doc's fate under both "
    "operators is fixed by its key alone). Pure per-row filter — no "
    "shuffle, pipelines into the scan, and the filter pushes into the "
    "parquet reader's row-group pruning where stats allow.",
    tags=("sampling", "mixing", "pipeline"),
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    thr = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in MIX_WEIGHTS_HEX.items() for x in kv]
            ),
            F.col("lang"),
        ),
        F.lit("zzzz"),
    )
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return (
        docs.filter(bucket < thr)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


#: weighted-sample size (top-N of the exponential race)
WEIGHTED_SAMPLE_N = 100

#: SQL for the first 8 hex chars of md5(key) as a BIGINT in [0, 2^32):
#: DuckDB has no hex→int conv(), so the digits decode positionally.
_SQL_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substring(md5('ws:' || CAST(o_orderkey AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@register(
    "weighted_sample_orders",
    oracle=f"""
WITH keyed AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(round(CAST(
           ln((CAST({_SQL_HEX8} AS DOUBLE) + 0.5) / 4294967296.0)
             / o_totalprice
         AS DECIMAL(30,15)), 9) AS DOUBLE) AS race_key
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, race_key
FROM keyed
ORDER BY race_key DESC, o_orderkey
LIMIT {WEIGHTED_SAMPLE_N}
""",
    description=f"Weighted sample without replacement (top-{WEIGHTED_SAMPLE_N} "
    "orders, weight = o_totalprice) via the Efraimidis–Spirakis "
    "exponential race: rank by ln(u)/w where u derives from md5 of the "
    "order key, so inclusion probability is proportional to weight yet "
    "the sample is deterministic across engines, partitionings, and "
    "cluster sizes. u = (hex64(md5)+0.5)/2^32 is exact in binary "
    "floating point (power-of-two divisor), leaving ln() as the only "
    "libm call — identical ranking both engines, ties broken by key. "
    "Executes as a TakeOrdered (per-partition top-N, no global sort).",
    tags=("sampling", "weighted", "pipeline"),
)
def weighted_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("o_orderkey").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + 0.5) / 4294967296.0
    race = F.log(u) / F.col("o_totalprice")
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round(race.cast("decimal(30,15)"), 9).cast("double").alias("race_key"),
        )
        .orderBy(F.desc("race_key"), "o_orderkey")
        .limit(WEIGHTED_SAMPLE_N)
    )


@register(
    "split_leakage_audit",
    oracle=f"""
WITH s AS (
  SELECT doc_id, source, text,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{TRAIN_HEX_THRESHOLD}'
              THEN 'train' ELSE 'test' END AS split
  FROM documents
), norm AS (
  SELECT doc_id, source, split,
         md5(text) AS th,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(text, '\\s+'),
                         t -> length(t) > 0))), ' ')) AS nh
  FROM s
), tr AS (SELECT DISTINCT th FROM norm WHERE split = 'train'),
trn AS (SELECT DISTINCT nh FROM norm WHERE split = 'train'),
te AS (
  SELECT n.source,
         CASE WHEN t1.th IS NOT NULL THEN 1 ELSE 0 END AS ex,
         CASE WHEN t2.nh IS NOT NULL THEN 1 ELSE 0 END AS nx
  FROM norm n
  LEFT JOIN tr t1 ON n.th = t1.th
  LEFT JOIN trn t2 ON n.nh = t2.nh
  WHERE n.split = 'test'
), testc AS (
  SELECT source, count(*) AS n_test,
         CAST(sum(ex) AS BIGINT) AS exact_leaked,
         CAST(sum(nx) AS BIGINT) AS normalized_leaked
  FROM te GROUP BY source
), trainc AS (
  SELECT source, count(*) AS n_train FROM norm WHERE split = 'train'
  GROUP BY source
)
SELECT coalesce(trainc.source, testc.source) AS source,
       coalesce(n_train, 0) AS n_train,
       coalesce(n_test, 0) AS n_test,
       coalesce(exact_leaked, 0) AS exact_leaked,
       coalesce(normalized_leaked, 0) AS normalized_leaked
FROM trainc FULL OUTER JOIN testc
  ON trainc.source IS NOT DISTINCT FROM testc.source
ORDER BY source
""",
    description="Train/test contamination audit per source: after the "
    "deterministic md5 split, count test documents whose EXACT text "
    "hash appears anywhere in train, and whose NORMALIZED content hash "
    "(sorted distinct whitespace tokens re-joined — catching "
    "reordered/duplicated-token paraphrases) appears in train. Both "
    "checks are hash semi-joins: the shuffle carries 32-byte digests, "
    "never text, so the audit runs at corpus scale like exact dedup "
    "does. The evaluation-set hygiene counterpart to "
    "decontaminate_ngram_overlap (which handles partial n-gram "
    "overlap; this one is the exact/normalized tier).",
    tags=("sampling", "split", "pipeline", "dedup", "audit"),
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    norm_hash = F.md5(
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
                )
            ),
            " ",
        )
    )
    norm = docs.select(
        "source",
        F.when(bucket < TRAIN_HEX_THRESHOLD, "train").otherwise("test").alias("split"),
        F.md5("text").alias("th"),
        norm_hash.alias("nh"),
    )
    train = norm.filter(F.col("split") == "train")
    test = norm.filter(F.col("split") == "test")
    tr = train.select("th").distinct().withColumnsRenamed({"th": "t_th"})
    trn = train.select("nh").distinct().withColumnsRenamed({"nh": "t_nh"})
    te = (
        test.join(tr, F.col("th") == F.col("t_th"), "left")
        .join(trn, F.col("nh") == F.col("t_nh"), "left")
        .select(
            "source",
            F.when(F.col("t_th").isNotNull(), 1).otherwise(0).alias("ex"),
            F.when(F.col("t_nh").isNotNull(), 1).otherwise(0).alias("nx"),
        )
    )
    testc = te.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum("ex").alias("exact_leaked"),
        F.sum("nx").alias("normalized_leaked"),
    )
    trainc = (
        train.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_train"))
        .withColumnsRenamed({"source": "tr_source"})
    )
    return (
        trainc.join(
            testc, F.col("tr_source").eqNullSafe(F.col("source")), "full_outer"
        )
        .select(
            F.coalesce(F.col("tr_source"), F.col("source")).alias("source"),
            F.coalesce("n_train", F.lit(0)).alias("n_train"),
            F.coalesce("n_test", F.lit(0)).alias("n_test"),
            F.coalesce("exact_leaked", F.lit(0)).alias("exact_leaked"),
            F.coalesce("normalized_leaked", F.lit(0)).alias("normalized_leaked"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# temperature-scaled mixing allocation (the XLM-R / multilingual
# sampling rule): q_s ∝ n_s^alpha re-weights sources so low-resource
# slices are up-sampled relative to their natural share; the planner
# output is the per-source document budget a downstream mix applies.
# domain_mix_sample above applies FIXED fractions; this computes the
# fractions FROM the corpus itself.
# ------------------------------------------------------------------

MIX_ALPHA = 0.7
MIX_BUDGET_DOCS = 10_000


@register(
    "temperature_mix_allocation",
    oracle=f"""
WITH n AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), t AS (
  SELECT *, pow(CAST(n_docs AS DOUBLE), {MIX_ALPHA}) AS w FROM n
), z AS (
  SELECT sum(w) AS z FROM t
)
SELECT source, n_docs,
       CAST(round(CAST(w / z AS DECIMAL(30,12)), 6) AS DOUBLE) AS q,
       CAST(least(CAST(n_docs AS DOUBLE),
                  floor(CAST(w / z * {MIX_BUDGET_DOCS} AS DECIMAL(30,12))))
            AS BIGINT) AS alloc_docs
FROM t CROSS JOIN z
ORDER BY source
""",
    description=f"Temperature-scaled mixing allocation (the XLM-R "
    f"multilingual sampling rule, alpha={MIX_ALPHA}): per-source "
    "sampling probability q_s = n_s^alpha / sum n_t^alpha computed "
    f"FROM the corpus itself, and the per-source document budget for "
    f"a {MIX_BUDGET_DOCS}-doc mix (capped at availability) — the "
    "planner half of corpus mixing, whose output drives a "
    "domain_mix_sample-style keep filter. One tiny aggregate: the "
    "per-source counts partial-aggregate map-side, the normalizer is "
    "a |sources|-row sum broadcast back.",
    tags=("sampling", "mixing", "pipeline"),
)
def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    t = n.withColumn("w", F.pow(F.col("n_docs").cast("double"), F.lit(MIX_ALPHA)))
    z = t.agg(F.sum("w").alias("z"))
    return (
        t.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.round((F.col("w") / F.col("z")).cast("decimal(30,12)"), 6)
            .cast("double")
            .alias("q"),
            # snap before floor: pow() is not correctly rounded, so an
            # unsnapped quotient within an ulp of an integer could
            # floor differently across engines
            F.least(
                F.col("n_docs").cast("double"),
                F.floor(
                    (F.col("w") / F.col("z") * MIX_BUDGET_DOCS).cast(
                        "decimal(30,12)"
                    )
                ).cast("double"),
            )
            .cast("bigint")
            .alias("alloc_docs"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------------------
# token-budget epoch planning: the "how many epochs of each domain"
# table. temperature_mix_allocation above plans a DOC budget capped at
# availability (sub-sampling only); real pretraining mixes also
# UP-sample scarce high-value domains past 1 epoch (the repeat factors
# published for LLaMA-class runs), and the budget is measured in
# TOKENS, not documents.
# ------------------------------------------------------------------

EPOCH_PLAN_ALPHA = 0.5
EPOCH_PLAN_TOKEN_BUDGET = 200_000


@register(
    "token_budget_epoch_plan",
    oracle=f"""
WITH tok AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(coalesce(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                           t -> length(t) > 0))), 0) AS BIGINT)
             AS n_tokens
  FROM documents GROUP BY source
), t AS (
  SELECT *, pow(CAST(n_tokens AS DOUBLE), {EPOCH_PLAN_ALPHA}) AS w FROM tok
), z AS (
  SELECT sum(w) AS z FROM t
)
SELECT source, n_docs, n_tokens,
       CAST(round(CAST(w / z AS DECIMAL(30,12)), 6) AS DOUBLE) AS q,
       CAST(floor(CAST(w / z * {EPOCH_PLAN_TOKEN_BUDGET} AS DECIMAL(30,12)))
            AS BIGINT) AS alloc_tokens,
       CAST(round(CAST(
         CAST(floor(CAST(w / z * {EPOCH_PLAN_TOKEN_BUDGET} AS DECIMAL(30,12)))
              AS DOUBLE) / nullif(n_tokens, 0) AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS epochs
FROM t CROSS JOIN z
ORDER BY source
""",
    description=f"Token-budget epoch plan (alpha={EPOCH_PLAN_ALPHA}): "
    "per-source whitespace-token counts feed a temperature-scaled "
    "share q_s = tok_s^alpha / sum tok_t^alpha, an allocated token "
    f"budget out of {EPOCH_PLAN_TOKEN_BUDGET} total, and the EPOCHS "
    "repeat factor alloc/available — the published-for-LLaMA-class-"
    "runs mixing table where scarce high-value domains exceed 1 epoch "
    "(up-sampling) and bulk domains fall below it. Complements "
    "temperature_mix_allocation (doc budget, availability-capped, "
    "sub-sampling only). Token counting is scan-side array math; the "
    "plan is one map-side-combinable aggregate plus a |sources|-row "
    "normalizer broadcast back; every pow/divide snaps through "
    "DECIMAL(30,12) before floor/round so both engines agree to the "
    "last bit. Sources with zero tokens report NULL epochs "
    "identically in both engines.",
    tags=("sampling", "mixing", "pipeline", "tokens"),
)
def token_budget_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0))
    tok = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(ntok), F.lit(0)).cast("bigint").alias("n_tokens"),
    )
    t = tok.withColumn(
        "w", F.pow(F.col("n_tokens").cast("double"), F.lit(EPOCH_PLAN_ALPHA))
    )
    z = t.agg(F.sum("w").alias("z"))
    alloc = F.floor(
        (F.col("w") / F.col("z") * EPOCH_PLAN_TOKEN_BUDGET).cast("decimal(30,12)")
    ).cast("bigint")
    return (
        t.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round((F.col("w") / F.col("z")).cast("decimal(30,12)"), 6)
            .cast("double")
            .alias("q"),
            alloc.alias("alloc_tokens"),
            F.round(
                F.try_divide(
                    alloc.cast("double"),
                    F.nullif(F.col("n_tokens"), F.lit(0)).cast("double"),
                ).cast("decimal(30,12)"),
                4,
            )
            .cast("double")
            .alias("epochs"),
        )
        .orderBy("source")
    )


#: hex digits for the admission hash: 13 → values in [0, 2^52), every
#: one exactly representable as a double, so u = units / 2^52 is an
#: exact IEEE quotient in both engines.
_QWS_DIGITS = 13
_QWS_SCALE = float(1 << 52)


@register(
    "quality_weighted_sample",
    oracle=None,  # set below — composes doc_quality_composite's oracle
    description="Quality-weighted deterministic sampling: each document "
    "is admitted with probability quality_score/100 (the 0-100 "
    "composite), decided by comparing an md5-derived uniform in [0,1) "
    "against the score — no RNG, so the sample is reproducible across "
    "runs, engines, and cluster sizes (the property temperature/domain "
    "mixing need for auditable training mixes). The uniform's 13-hex "
    "prefix is exact in a double; admission is one projection + filter "
    "on top of the composite's scan — nothing new shuffles.",
    tags=("sampling", "quality", "pipeline"),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spark_hex_id
    from .quality_repetition import doc_quality_composite

    scored = doc_quality_composite(spark, sf_dir).select("doc_id", "quality_score")
    u = _spark_hex_id(F.col("doc_id").cast("string"), _QWS_DIGITS).cast(
        "double"
    ) / F.lit(_QWS_SCALE)
    # NULL doc_id is EXPLICITLY excluded on both sides: a doc with no id
    # has no hashable admission key. (In Spark the NULL comparison would
    # drop it anyway, but DuckDB's list_prepend(0, NULL) → [0] folds a
    # NULL md5 to u = 0 and would admit it — adversarial-fixture find.)
    from ..plans.caching import guard_checkpoint_result

    # plan reads the memoized quality-gates checkpoint (r11) —
    # stale-handle fail-fast, same contract as the CC consumers
    return guard_checkpoint_result(
        scored.filter(F.col("doc_id").isNotNull())
        .withColumn("u", u)
        .filter(F.col("u") < F.col("quality_score").cast("double") / F.lit(100.0))
        .select("doc_id", "quality_score")
        .orderBy("doc_id")
    )


def _qws_oracle() -> str:
    from .dedup import _oracle_hex_id
    from .quality_repetition import doc_quality_composite  # noqa: F401

    from ..plans.registry import _REGISTRY

    comp = _REGISTRY["doc_quality_composite"].oracle
    u = _oracle_hex_id("CAST(doc_id AS VARCHAR)", _QWS_DIGITS)
    return f"""
WITH comp AS (
{comp}
)
SELECT doc_id, quality_score
FROM comp
WHERE doc_id IS NOT NULL
  AND CAST({u} AS DOUBLE) / {_QWS_SCALE!r} < CAST(quality_score AS DOUBLE) / 100.0
ORDER BY doc_id
"""


# late-bind the oracle (the composite's oracle string is registered on
# the same module-import pass). dataclasses.replace keeps every other
# field by NAME, so a future QueryDef field reorder can't silently
# mis-assign them (ADVICE r5).
import dataclasses  # noqa: E402

from ..plans.registry import _REGISTRY as _REG  # noqa: E402

_REG["quality_weighted_sample"] = dataclasses.replace(
    _REG["quality_weighted_sample"], oracle=_qws_oracle()
)
del _REG


# ---------------------------------------------------------------------------
# deterministic stratified k-fold assignment
# ---------------------------------------------------------------------------

KFOLD_K = 5
_KFOLD_DIGITS = 8


def _kfold_oracle() -> str:
    from .dedup import _oracle_hex_id

    u = _oracle_hex_id("'fold:' || CAST(doc_id AS VARCHAR)", _KFOLD_DIGITS)
    return f"""
WITH base AS (
  SELECT DISTINCT doc_id, source FROM documents WHERE doc_id IS NOT NULL
)
SELECT doc_id, source,
       CAST({u} % {KFOLD_K} AS INT) AS fold
FROM base
ORDER BY doc_id, source
"""


@register(
    "stratified_kfold_assignment",
    description=f"Deterministic {KFOLD_K}-fold cross-validation "
    "assignment: fold = md5-uniform draw on the doc_id, reproducible "
    "on any cluster size with no RNG and no shuffle (a pure scan "
    "projection) — every executor computes the same fold for the same "
    "document, so CV splits survive repartitioning, retries, and "
    "re-runs. Stratification is free downstream: the fold draw is "
    "independent of source, so within every stratum the folds are "
    "md5-uniform (the same property quality_weighted_sample and "
    "cluster_aware_split build on). NULL-id docs have no identity to "
    "fold and are excluded identically in both engines.",
    tags=("sampling", "ml-prep", "split"),
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spark_hex_id

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "source")
        .distinct()
    )
    u = _spark_hex_id(
        F.concat(F.lit("fold:"), F.col("doc_id").cast("string")),
        _KFOLD_DIGITS,
    )
    return base.select(
        "doc_id",
        "source",
        F.pmod(u, F.lit(KFOLD_K)).cast("int").alias("fold"),
    ).orderBy("doc_id", "source")


import dataclasses as _dc  # noqa: E402

from ..plans.registry import _REGISTRY as _REG2  # noqa: E402

_REG2["stratified_kfold_assignment"] = _dc.replace(
    _REG2["stratified_kfold_assignment"], oracle=_kfold_oracle()
)
del _REG2


# ---------------------------------------------------------------------------
# k-fold leakage report: near-dup pairs straddling CV folds
# ---------------------------------------------------------------------------


def _kfold_leakage_oracle() -> str:
    from .dedup import _SAMPLED_PAIRS_CTE, _oracle_hex_id

    def fold(col: str) -> str:
        u = _oracle_hex_id(f"'fold:' || CAST({col} AS VARCHAR)", _KFOLD_DIGITS)
        return f"({u} % {KFOLD_K})"

    return (
        _SAMPLED_PAIRS_CTE
        + f"""
SELECT count(*) AS n_pairs,
       CAST(coalesce(sum(CASE WHEN {fold('doc_a')} != {fold('doc_b')}
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cross_fold,
       CAST(round(CAST(
         CAST(coalesce(sum(CASE WHEN {fold('doc_a')} != {fold('doc_b')}
                            THEN 1 ELSE 0 END), 0) AS DOUBLE)
           / nullif(count(*), 0) AS DECIMAL(30,12)), 6) AS DOUBLE) AS leak_rate
FROM pairs
"""
    )


@register(
    "kfold_leakage_report",
    description=f"Cross-validation leakage audit: of all jaccard>=0.8 "
    "near-dup pairs, how many straddle two different folds of the "
    f"deterministic {KFOLD_K}-fold assignment — each such pair leaks "
    "eval-fold content into training whenever that fold is held out. "
    "The doc-level hash fold is intentionally cluster-BLIND (the same "
    "draw stratified_kfold_assignment publishes), so this report "
    "quantifies exactly the leakage a cluster-aware splitter "
    "(cluster_aware_split) eliminates; expected leak_rate for an "
    f"independent uniform draw is (k-1)/k = {(KFOLD_K - 1) / KFOLD_K}. "
    "One aggregate over the pair relation — folds are scan-side row "
    "math, no extra join or shuffle; empty pair sets report NULL "
    "leak_rate identically in both engines. Past "
    "EVAL_SAMPLE_TARGET_DOCS documents the pair relation is computed "
    "over the md5-uniform eval sample (mirrored in the oracle) — the "
    "leak RATE is an unbiased pair-level estimate and the audit stays "
    "bounded at any corpus size; under the target it is exact.",
    tags=("sampling", "ml-prep", "dedup", "report"),
)
def kfold_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.caching import guard_checkpoint_result
    from .dedup import _eval_pairs, _spark_hex_id

    def fold(col: str):
        return F.pmod(
            _spark_hex_id(
                F.concat(F.lit("fold:"), F.col(col).cast("string")),
                _KFOLD_DIGITS,
            ),
            F.lit(KFOLD_K),
        )

    pairs = _eval_pairs(spark, sf_dir)
    cross = F.sum(
        F.when(fold("doc_a") != fold("doc_b"), 1).otherwise(0)
    )
    out = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(cross, F.lit(0)).cast("bigint").alias("n_cross_fold"),
        F.round(
            F.try_divide(
                F.coalesce(cross, F.lit(0)).cast("double"),
                F.when(F.count(F.lit(1)) == 0, F.lit(None)).otherwise(
                    F.count(F.lit(1))
                ),
            ).cast("decimal(30,12)"),
            6,
        )
        .cast("double")
        .alias("leak_rate"),
    )
    # reads the memoized pair checkpoint — stale-handle fail-fast
    return guard_checkpoint_result(out)


from ..plans.registry import _REGISTRY as _REG3  # noqa: E402

_REG3["kfold_leakage_report"] = _dc.replace(
    _REG3["kfold_leakage_report"], oracle=_kfold_leakage_oracle()
)
del _REG3
