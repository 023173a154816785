"""Repetition-based quality filtering and unigram language-model
scoring over ``documents`` — the Gopher/MassiveText-style signals a
pretraining pipeline applies after the cheap length/stopword gates
(SURVEY.md §2.3 text-analysis surface; the reference itself stops at
raw counts, reference ``1.cpp`` whole file).

Scale notes:

* ``repetition_metrics`` is computed entirely with per-row array
  expressions — one corpus scan, zero shuffles before the final sort.
  That is deliberate: the naive formulation (explode tokens, groupBy
  (doc_id, token)) shuffles the ENTIRE token stream just to find each
  document's top token, which at 100 TB is the biggest shuffle in the
  whole pipeline. Per-document metrics belong inside the row.
* ``unigram_logprob_scores`` needs corpus-global token frequencies, so
  it scans twice (once to build the vocabulary, once to score) and
  broadcasts the vocabulary to the scoring join — the classic
  small-model-big-corpus shape. At 100 TB the vocabulary of a cleaned
  corpus is millions of rows (MBs) and still broadcasts; if it ever
  outgrows that, the join key is a token → plain shuffle join, no plan
  change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.caching import tracked_persist
from ..plans.registry import register
from ..sources.tables import load_table, spread
from .textstats import _sql_tokens, _tokens

#: repetition gates (Gopher-style): a document fails when any single
#: token exceeds TOP_TOKEN_MAX of the stream or its duplicate-bigram
#: share exceeds DUP_BIGRAM_MAX.
TOP_TOKEN_MAX = 0.20
DUP_BIGRAM_MAX = 0.25


@register(
    "repetition_metrics",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens()} AS ts FROM documents
), m AS (
  SELECT doc_id,
         len(ts) AS n_tokens,
         len(list_distinct(ts)) AS n_distinct,
         CASE WHEN len(ts) > 0 THEN
           list_max(list_transform(list_distinct(ts),
                                   t -> len(list_filter(ts, x -> x = t))))
         ELSE 0 END AS top_cnt,
         CASE WHEN len(ts) >= 2 THEN
           list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])
         ELSE CAST([] AS VARCHAR[]) END AS bi
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(round(CAST(CAST(n_distinct AS DOUBLE) / n_tokens
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS distinct_token_ratio,
       CAST(round(CAST(CAST(top_cnt AS DOUBLE) / n_tokens
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS top_token_frac,
       CAST(round(CAST(CASE WHEN len(bi) > 0
                 THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
                 ELSE 0.0 END AS DECIMAL(30,12)), 6) AS DOUBLE) AS dup_bigram_frac,
       CASE WHEN CAST(top_cnt AS DOUBLE) / n_tokens <= {TOP_TOKEN_MAX}
             AND (CASE WHEN len(bi) > 0
                  THEN 1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi)
                  ELSE 0.0 END) <= {DUP_BIGRAM_MAX}
            THEN 1 ELSE 0 END AS passes_repetition
FROM m
WHERE n_tokens > 0
ORDER BY doc_id
""",
    description="Gopher-style repetition signals per document: "
    "distinct-token ratio, top-token fraction, duplicate-bigram "
    "fraction, and a pass/fail repetition gate. Computed entirely with "
    "per-row array expressions — one corpus scan, no shuffle of the "
    "token stream (the explode+groupBy formulation would shuffle every "
    "token at 100 TB just to find per-doc maxima).",
    tags=("text", "quality", "repetition", "pipeline"),
)
def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the n_tokens > 0 gate runs against the raw text (rlike('\\S') ⟺
    # at least one token): filtering on the computed size() would push
    # the whole tokenize chain into the single-task FileScan. spread()
    # parallelizes the O(distinct·n) per-row folds on single-file input.
    docs = spread(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").rlike(r"\S"))
    )
    base = docs.select("doc_id", _tokens().alias("ts"))
    ts = F.col("ts")
    n = F.size(ts)
    # per-distinct-token occurrence count folded inside the row; the
    # corpus's docs are short, so the O(distinct·n) fold is constant
    # work per document and trades a full-corpus shuffle for it
    top_cnt = F.when(
        n > 0,
        F.array_max(
            F.transform(
                F.array_distinct(ts),
                lambda t: F.size(F.filter(ts, lambda x: x == t)),
            )
        ),
    ).otherwise(F.lit(0))
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ts, i), F.element_at(ts, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    m = base.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
        top_cnt.alias("top_cnt"),
        bi.alias("bi"),
    )  # the rlike prune above already guarantees n_tokens > 0
    n_bi = F.size("bi")
    dup_bi = F.when(
        n_bi > 0,
        F.lit(1.0) - F.size(F.array_distinct("bi")).cast("double") / n_bi,
    ).otherwise(F.lit(0.0))

    def snap6(c):
        return F.round(c.cast("decimal(30,12)"), 6).cast("double")

    top_frac = F.col("top_cnt").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        "n_tokens",
        snap6(
            F.col("n_distinct").cast("double") / F.col("n_tokens")
        ).alias("distinct_token_ratio"),
        snap6(top_frac).alias("top_token_frac"),
        snap6(dup_bi).alias("dup_bigram_frac"),
        F.when(
            (top_frac <= TOP_TOKEN_MAX) & (dup_bi <= DUP_BIGRAM_MAX), 1
        )
        .otherwise(0)
        .alias("passes_repetition"),
    ).orderBy("doc_id")


@register(
    "unigram_logprob_scores",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens()} AS ts FROM documents
), tok AS (
  SELECT doc_id, unnest(ts) AS token FROM t
), v AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT sum(c) AS total FROM v
), scored AS (
  SELECT tok.doc_id,
         count(*) AS n_tokens,
         sum(ln(CAST(v.c AS DOUBLE) / tot.total)) AS lp
  FROM tok JOIN v USING (token) CROSS JOIN tot
  GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens,
       CAST(round(CAST(lp / n_tokens AS DECIMAL(30,12)), 6) AS DOUBLE)
         AS avg_token_logprob
FROM scored
ORDER BY doc_id
""",
    description="Unigram LM score per document: mean ln-probability of "
    "its tokens under the corpus's own unigram distribution — the "
    "cheapest perplexity-style quality signal (gibberish and boilerplate "
    "separate at the two tails). Vocabulary built in one aggregate and "
    "broadcast to the scoring join; the token stream shuffles only into "
    "the per-document mean.",
    tags=("text", "quality", "lm", "pipeline"),
)
def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    v = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = v.agg(F.sum("c").alias("total"))
    vocab = F.broadcast(v.crossJoin(F.broadcast(tot)))
    scored = (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log(F.col("c").cast("double") / F.col("total"))
            ).alias("lp"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(
            (F.col("lp") / F.col("n_tokens")).cast("decimal(30,12)"), 6
        )
        .cast("double")
        .alias("avg_token_logprob"),
    ).orderBy("doc_id")


#: CCNet-style bucketing: per-language LM-score terciles assign each
#: document to head / middle / tail (Wenzek et al., "CCNet: Extracting
#: High Quality Monolingual Datasets from Web Crawl Data", 2020 — the
#: standard recipe for perplexity-stratified corpus curation). The
#: tercile positions as IEEE doubles, shared verbatim with the oracle.
TERCILE_1 = 1 / 3
TERCILE_2 = 2 / 3


@register(
    "ccnet_perplexity_buckets",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {_sql_tokens()} AS ts FROM documents
), tok AS (
  SELECT doc_id, lang, unnest(ts) AS token FROM t
), v AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT sum(c) AS total FROM v
), scored AS (
  SELECT tok.doc_id, tok.lang,
         CAST(round(CAST(
           sum(ln(CAST(v.c AS DOUBLE) / tot.total)) / count(*)
         AS DECIMAL(30,12)), 6) AS DOUBLE) AS score
  FROM tok JOIN v USING (token) CROSS JOIN tot
  GROUP BY tok.doc_id, tok.lang
), cuts AS (
  SELECT lang,
         CAST(round(CAST(quantile_cont(score, {TERCILE_1!r}) AS DECIMAL(30,12)), 4)
              AS DOUBLE) AS t1,
         CAST(round(CAST(quantile_cont(score, {TERCILE_2!r}) AS DECIMAL(30,12)), 4)
              AS DOUBLE) AS t2
  FROM scored GROUP BY lang
)
SELECT s.lang,
       CASE WHEN s.score >= c.t2 THEN 'head'
            WHEN s.score >= c.t1 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       CAST(round(CAST(avg(s.score) AS DECIMAL(30,12)), 4) AS DOUBLE) AS avg_score
FROM scored s JOIN cuts c USING (lang)
GROUP BY s.lang, bucket
ORDER BY lang, bucket
""",
    description="CCNet-style corpus stratification: score every document "
    "under the corpus unigram LM (mean token ln-probability), cut each "
    "language's score distribution at its own terciles, and report "
    "head / middle / tail membership counts per language. The adaptive "
    "per-language threshold is the point — an absolute score gate "
    "misclassifies whole languages whose LM is better or worse fit. "
    "Two-pass shape: the scoring pass shuffles tokens into per-doc "
    "means once; the tercile relation is |langs| rows, broadcast back "
    "onto the persisted per-doc scores. Scores and cuts snap to fixed "
    "decimals in BOTH engines so the bucket decision is deterministic "
    "cross-engine (no raw-double boundary comparisons).",
    tags=("text", "quality", "lm", "pipeline", "percentile"),
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # the exploded token stream feeds both the vocabulary aggregate and
    # the scoring join; it is NOT persisted on purpose — at 100 TB the
    # token stream dwarfs memory, and re-running a columnar scan +
    # explode is cheaper than caching it (same call as
    # unigram_logprob_scores above)
    tok = docs.select("doc_id", "lang", F.explode(_tokens()).alias("token"))
    v = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = v.agg(F.sum("c").alias("total"))
    vocab = F.broadcast(v.crossJoin(F.broadcast(tot)))
    scored = (
        tok.join(vocab, "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.log(F.col("c").cast("double") / F.col("total"))).alias("lp"),
        )
        .select(
            "doc_id",
            "lang",
            F.round((F.col("lp") / F.col("n")).cast("decimal(30,12)"), 6)
            .cast("double")
            .alias("score"),
        )
        # one row per document; consumed by the tercile aggregate AND
        # the bucket assignment — persist or the whole scoring join
        # (the expensive pass) runs twice
        .transform(tracked_persist)
    )

    def snap4(c):
        return F.round(c.cast("decimal(30,12)"), 4).cast("double")

    cuts = scored.groupBy("lang").agg(
        snap4(F.percentile("score", F.lit(TERCILE_1))).alias("t1"),
        snap4(F.percentile("score", F.lit(TERCILE_2))).alias("t2"),
    )
    bucket = (
        F.when(F.col("score") >= F.col("t2"), "head")
        .when(F.col("score") >= F.col("t1"), "middle")
        .otherwise("tail")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            snap4(F.avg("score")).alias("avg_score"),
        )
        .orderBy("lang", "bucket")
    )
