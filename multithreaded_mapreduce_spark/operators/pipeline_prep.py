"""Training-corpus preparation operators: benchmark decontamination
and sequence packing (SURVEY.md §2.3 extension surface).

The reference engine ends at word counts (reference ``1.cpp`` whole
file); a pretraining-data pipeline additionally needs (a) eval-set
decontamination — find corpus documents sharing long n-grams with a
held-out benchmark set — and (b) packing documents into fixed-token
training sequences. Both are implemented as pure DataFrame plans (no
Python UDFs) with exact DuckDB oracles.

Scale notes (local[32] today, 1000 executors tomorrow):

* Decontamination dedups shingles per document BEFORE the join (the
  corpus here is a 31-token word soup, so raw shingle streams repeat;
  see the MinHash operator for the same lesson), and the eval side is
  by construction a tiny fraction of the corpus (~1%), so it
  broadcasts: the corpus-side shingle stream never shuffles at all.
  At 100 TB the eval set is still a few thousand benchmark documents
  → still a broadcast; the plan is a single corpus scan.
* Packing needs a GLOBAL running token count, which naively is a
  single-partition window — a non-starter at scale. Instead it uses
  the classic distributed prefix sum: chunk by doc-id range, cumsum
  within each chunk in parallel, cumsum the per-chunk totals (tiny —
  one row per chunk), and broadcast the offsets back. No stage ever
  sees more than one chunk in one task. The slim (doc_id, n_tokens)
  projection is scanned twice (once per branch); at 100 TB persist it
  or let the column-pruned parquet scan absorb the cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table, spread
from .textstats import _sql_tokens, _tokens

#: decontamination shingle width and the minimum shared-shingle count
#: that flags a document as contaminated. Production pipelines use
#: 8-13-gram exact match (GPT-3 used 13); this corpus's near-dups are
#: bag-of-words perturbations whose token ORDER survives only at
#: trigram granularity, so wider shingles find nothing here.
NGRAM = 3
MIN_SHARED = 2

#: every 97th document plays the role of the held-out benchmark set.
EVAL_MOD = 97

#: target training-sequence length in whitespace tokens, and the
#: doc-id chunk width for the distributed prefix sum.
MAX_SEQ_TOKENS = 2048
PACK_CHUNK = 256


def _shingles(toks) -> F.Column:
    """Distinct ``NGRAM``-token shingles of a token array (empty when
    the document is shorter than ``NGRAM`` — Spark's ``sequence(1, 0)``
    counts DOWN, so the short case must be guarded explicitly).

    Shingles are xxhash64-compressed to 8-byte longs: the overlap
    count is over DISTINCT shingles, which hashing preserves absent
    collisions (odds ~|shingles|²/2⁶⁴ — nil), and the exploded stream
    plus the join carry longs instead of ~60-byte strings (measured
    ~16% on the decontamination query, and proportionally less shuffle
    at scale)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (NGRAM - 1))
    built = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, NGRAM))))
    return F.array_distinct(
        F.when(F.size(toks) >= NGRAM, built).otherwise(F.array().cast("array<bigint>"))
    )


@register(
    "decontaminate_ngram_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens()} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{NGRAM - 1}], ' ') AS shingle
  FROM t, unnest(generate_series(1, len(toks) - {NGRAM - 1})) AS u(i)
  WHERE len(toks) >= {NGRAM}
)
SELECT c.doc_id AS corpus_doc_id, e.doc_id AS eval_doc_id,
       count(*) AS n_shared_ngrams
FROM sh c JOIN sh e USING (shingle)
WHERE e.doc_id % {EVAL_MOD} = 0 AND c.doc_id % {EVAL_MOD} <> 0
GROUP BY 1, 2
HAVING count(*) >= {MIN_SHARED}
ORDER BY corpus_doc_id, eval_doc_id
""",
    description="Benchmark decontamination: corpus documents sharing "
    f"≥{MIN_SHARED} distinct {NGRAM}-gram shingles with any held-out "
    "eval document (every 97th doc plays the eval set). Shingles are "
    "deduped per document before the join and the eval side broadcasts, "
    "so the corpus shingle stream is scanned once and never shuffled; "
    "only the tiny (corpus_doc, eval_doc) pair aggregate exchanges.",
    tags=("text", "dedup", "decontamination", "pipeline"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    sh = docs.select(
        "doc_id", F.explode(_shingles(_tokens())).alias("shingle")
    )
    corpus = sh.filter(F.col("doc_id") % EVAL_MOD != 0).withColumnRenamed(
        "doc_id", "corpus_doc_id"
    )
    eval_sh = sh.filter(F.col("doc_id") % EVAL_MOD == 0).withColumnRenamed(
        "doc_id", "eval_doc_id"
    )
    return (
        corpus.join(F.broadcast(eval_sh), "shingle")
        .groupBy("corpus_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .filter(F.col("n_shared_ngrams") >= MIN_SHARED)
        .orderBy("corpus_doc_id", "eval_doc_id")
    )


def pack_oracle_tail() -> str:
    """The cumsum + sequence-assignment half of the packing oracle,
    over a preceding CTE ``t(doc_id, n_tokens)`` — shared with the
    BPE-token packer (corpus_ops.pack_bpe_sequences)."""
    return f""", c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT CAST((cum - n_tokens) // {MAX_SEQ_TOKENS} AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc_id,
       max(doc_id) AS last_doc_id
FROM c
GROUP BY 1
ORDER BY seq_id
"""


def pack_prefix_sum(toks: DataFrame) -> DataFrame:
    """Distributed prefix-sum packer over a ``(doc_id, n_tokens)``
    relation: per-chunk cumsum in parallel, a one-row-per-chunk offset
    cascade, broadcast-joined back — no single-partition window ever
    touches the full relation. Shared by the whitespace-token and
    BPE-token packers."""
    toks = toks.withColumn(
        "chunk", F.floor(F.col("doc_id") / PACK_CHUNK)
    )
    w_local = (
        Window.partitionBy("chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    # one row per chunk → the offset cascade is a tiny single-task window.
    # partitionBy(lit(0)) pins the same single-partition plan explicitly
    # (it IS the intent here) without tripping WindowExec's
    # no-partition-defined warning in every bench run.
    w_prev = (
        Window.partitionBy(F.lit(0))
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("chunk")
        .agg(F.sum("n_tokens").alias("chunk_total"))
        .select(
            "chunk",
            F.coalesce(F.sum("chunk_total").over(w_prev), F.lit(0)).alias("offset"),
        )
    )
    packed = (
        local.join(F.broadcast(offsets), "chunk")
        .withColumn("cum", F.col("local_cum") + F.col("offset"))
        .withColumn("seq_id", F.expr(f"(cum - n_tokens) div {MAX_SEQ_TOKENS}"))
    )
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("seq_id")
    )


@register(
    "pack_training_sequences",
    oracle=f"""
WITH t AS (
  -- packing is DEFINED by doc_id order: a row with no id has no
  -- position in the pack (and the engines' NULL orderings disagree),
  -- so unidentified rows are excluded identically in both engines
  SELECT doc_id, len({_sql_tokens()}) AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL
){pack_oracle_tail()}""",
    description="Pack documents (in doc_id order) into fixed "
    f"{MAX_SEQ_TOKENS}-token training sequences by global running token "
    "count, via a distributed prefix sum: per-chunk cumsum in parallel, "
    "a one-row-per-chunk offset cascade, broadcast-joined back. No "
    "single-partition window ever touches the full corpus.",
    tags=("pipeline", "packing", "prefix-sum"),
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL doc_id excluded in both engines — see the oracle comment
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    toks = docs.select("doc_id", F.size(_tokens()).alias("n_tokens"))
    return pack_prefix_sum(toks)


#: sliding-window chunking: window width / stride in tokens.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@register(
    "chunk_documents",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens()} AS toks FROM documents
)
SELECT doc_id,
       CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(least({CHUNK_TOKENS}, len(toks) - start + 1) AS BIGINT)
         AS n_chunk_tokens,
       md5(array_to_string(toks[start:start + {CHUNK_TOKENS - 1}], ' '))
         AS chunk_hash
FROM t, unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS u(start)
ORDER BY doc_id, chunk_idx
""",
    description=f"Context chunking: split each document into "
    f"{CHUNK_TOKENS}-token windows every {CHUNK_STRIDE} tokens "
    f"({CHUNK_TOKENS - CHUNK_STRIDE}-token overlap) — the RAG/pretraining "
    "chunker. Pure higher-order array functions (sequence → posexplode → "
    "slice), one scan, no shuffle except the final sort; the md5 chunk "
    "hash feeds downstream chunk-level dedup.",
    tags=("text", "chunking", "pipeline"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = _tokens()
    with_starts = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.posexplode(
            # Guard the empty-token case: F.sequence(1, 0) throws
            # 'Illegal sequence boundaries' while the DuckDB oracle's
            # generate_series(1, 0) returns empty (same gotcha _shingles
            # guards above).
            F.when(
                F.size(toks) >= 1,
                F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos", "start"),
    )
    n = F.size(F.col("toks"))
    start = F.col("start")
    return (
        with_starts.select(
            "doc_id",
            ((start - 1) / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), n - start + 1)
            .cast("long")
            .alias("n_chunk_tokens"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("toks"), start, CHUNK_TOKENS))
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "dedup_chunks",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens()} AS toks FROM documents
), c AS (
  SELECT doc_id,
         CAST((start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
         md5(array_to_string(toks[start:start + {CHUNK_TOKENS - 1}], ' '))
           AS chunk_hash
  FROM t, unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS u(start)
), g AS (
  SELECT chunk_hash, count(*) AS n_occurrences, min(doc_id) AS keep_doc_id
  FROM c GROUP BY 1
)
SELECT g.chunk_hash AS chunk_hash, g.n_occurrences, g.keep_doc_id,
       min(c.chunk_idx) AS keep_chunk_idx
FROM g JOIN c ON c.chunk_hash = g.chunk_hash AND c.doc_id = g.keep_doc_id
WHERE g.n_occurrences >= 2
GROUP BY 1, 2, 3
ORDER BY chunk_hash
""",
    description="Cross-document chunk-level dedup (the fineweb/CCNet "
    "line-dedup pattern one level up): documents chunk into "
    f"{CHUNK_TOKENS}-token windows (stride {CHUNK_STRIDE}), chunks group "
    "by content hash, and any hash seen more than once reports its "
    "occurrence count plus the canonical (lowest doc_id, lowest "
    "chunk_idx) copy to keep. The shuffle carries 32-byte hashes — "
    "never chunk text — and the min(struct) keep-pick is a single "
    "aggregate, not a window over the full chunk stream.",
    tags=("text", "dedup", "chunking", "pipeline"),
)
def dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = chunk_documents(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("keep"),
        )
        .filter(F.col("n_occurrences") >= 2)
        .select(
            "chunk_hash",
            "n_occurrences",
            F.col("keep.doc_id").alias("keep_doc_id"),
            F.col("keep.chunk_idx").alias("keep_chunk_idx"),
        )
        .orderBy("chunk_hash")
    )


@register(
    "pack_sequences_ffd",
    # promoted out of rows-only (VERDICT r4 task 7): FFD is greedy but
    # DETERMINISTIC, so the oracle simulates it with a recursive CTE —
    # one item placed per recursion step per chunk (set-wise: all
    # chunks advance in parallel), bin loads/counts carried as lists.
    # The first-fit index is the first position whose load still
    # admits the item; items are ranked (n_tokens DESC, doc_id) exactly
    # like the pandas sort. Zero-token / NULL-id docs are excluded on
    # both sides (they cannot contribute tokens / have no chunk).
    oracle=f"""
WITH RECURSIVE base AS (
  SELECT doc_id, len({_sql_tokens()}) AS n_tokens,
         CAST(floor(doc_id / {PACK_CHUNK}) AS BIGINT) AS chunk
  FROM documents
  WHERE doc_id IS NOT NULL
), items AS (
  SELECT chunk, n_tokens,
         row_number() OVER (PARTITION BY chunk
                            ORDER BY n_tokens DESC, doc_id) AS rnk
  FROM base WHERE n_tokens > 0
), sizes AS (
  SELECT chunk, max(rnk) AS n_items FROM items GROUP BY chunk
), pack AS (
  SELECT chunk, 0 AS step,
         CAST([] AS BIGINT[]) AS loads, CAST([] AS BIGINT[]) AS ndocs
  FROM sizes
  UNION ALL
  SELECT p.chunk, p.step + 1,
         CASE WHEN list_filter(range(1, len(p.loads) + 1),
                               j -> p.loads[j] + i.n_tokens <= {MAX_SEQ_TOKENS})[1]
                   IS NULL
              THEN list_append(p.loads, i.n_tokens)
              ELSE list_transform(range(1, len(p.loads) + 1),
                     j -> CASE WHEN j = list_filter(range(1, len(p.loads) + 1),
                                    k -> p.loads[k] + i.n_tokens <= {MAX_SEQ_TOKENS})[1]
                               THEN p.loads[j] + i.n_tokens ELSE p.loads[j] END)
         END,
         CASE WHEN list_filter(range(1, len(p.loads) + 1),
                               j -> p.loads[j] + i.n_tokens <= {MAX_SEQ_TOKENS})[1]
                   IS NULL
              THEN list_append(p.ndocs, 1)
              ELSE list_transform(range(1, len(p.ndocs) + 1),
                     j -> CASE WHEN j = list_filter(range(1, len(p.loads) + 1),
                                    k -> p.loads[k] + i.n_tokens <= {MAX_SEQ_TOKENS})[1]
                               THEN p.ndocs[j] + 1 ELSE p.ndocs[j] END)
         END
  FROM pack p
  JOIN items i ON i.chunk = p.chunk AND i.rnk = p.step + 1
), final AS (
  SELECT p.chunk, p.loads, p.ndocs
  FROM pack p JOIN sizes s ON p.chunk = s.chunk AND p.step = s.n_items
)
SELECT chunk, CAST(u.i - 1 AS BIGINT) AS bin_id,
       CAST(ndocs[u.i] AS BIGINT) AS n_docs,
       CAST(loads[u.i] AS BIGINT) AS bin_tokens
FROM final, unnest(generate_series(1, len(loads))) AS u(i)
ORDER BY chunk, bin_id
""",
    description="First-fit-decreasing bin packing of documents into "
    f"{MAX_SEQ_TOKENS}-token training sequences, per doc-id chunk, via "
    "grouped-map applyInPandas (Arrow-batched): within each chunk, docs "
    "are packed greedily largest-first, giving tighter utilization than "
    "the order-preserving cumsum packer. The imperative greedy state is "
    "what SQL cannot express — everything around it (chunking, the "
    "final rollup) stays declarative, and chunks pack independently in "
    "parallel on any number of executors.",
    tags=("pipeline", "packing", "applyInPandas"),
)
def pack_sequences_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_CHUNK).alias("chunk"),
    )

    empty = pd.DataFrame(
        {"chunk": [], "bin_id": [], "n_docs": [], "bin_tokens": []}
    )

    def ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # edge guards INSIDE the UDF (a DataFrame-level filter over the
        # tokenize chain would be pushed into the FileScan — the
        # plan-linted Catalyst trap): zero-token / NULL-token docs pack
        # nothing, and a NULL doc_id has no chunk. Mirrored in the
        # oracle's WHERE clauses.
        pdf = pdf[pdf["n_tokens"].notna() & (pdf["n_tokens"] > 0)]
        if len(pdf) == 0 or pd.isna(pdf["chunk"].iloc[0]):
            return empty
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        chunk = int(pdf["chunk"].iloc[0])
        space: list[int] = []  # remaining capacity per bin
        counts: list[int] = []
        for nt in pdf["n_tokens"].astype(int):
            for b, rem in enumerate(space):
                if nt <= rem:
                    space[b] -= nt
                    counts[b] += 1
                    break
            else:
                space.append(MAX_SEQ_TOKENS - nt)
                counts.append(1)
        return pd.DataFrame(
            {
                "chunk": chunk,
                "bin_id": range(len(space)),
                "n_docs": counts,
                "bin_tokens": [MAX_SEQ_TOKENS - rem for rem in space],
            }
        )

    return (
        toks.groupBy("chunk")
        .applyInPandas(ffd, "chunk long, bin_id long, n_docs long, bin_tokens long")
        .orderBy("chunk", "bin_id")
    )


@register(
    "packing_efficiency_report",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len({_sql_tokens()}) AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
), s AS (
  SELECT CAST((cum - n_tokens) // {MAX_SEQ_TOKENS} AS BIGINT) AS seq_id,
         CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
  FROM c GROUP BY 1
)
SELECT count(*) AS n_sequences,
       CAST(coalesce(sum(seq_tokens), 0) AS BIGINT) AS total_tokens,
       CAST(coalesce(sum(CASE WHEN seq_tokens >= {MAX_SEQ_TOKENS}
                          THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS full_sequences,
       CAST(round(CAST(CAST(sum(seq_tokens) AS DOUBLE)
                 / nullif(count(*) * {MAX_SEQ_TOKENS}, 0) AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS fill_ratio
FROM s
""",
    description="Packing-efficiency report over the whitespace-token "
    f"packer: sequence count, packed token total, sequences at the "
    f"{MAX_SEQ_TOKENS}-token boundary, and the fill ratio (tokens / "
    "capacity — what padding would waste at training time). Composes "
    "pack_prefix_sum into a one-row aggregate; an empty corpus yields "
    "one (0, 0, 0, NULL) row — the nullif keeps the ratio NULL, not NaN.",
    tags=("pipeline", "packing"),
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = pack_training_sequences(spark, sf_dir)
    cap = F.count(F.lit(1)) * MAX_SEQ_TOKENS
    return packed.agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.coalesce(F.sum("seq_tokens"), F.lit(0)).cast("bigint").alias("total_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("seq_tokens") >= MAX_SEQ_TOKENS, 1).otherwise(0)),
            F.lit(0),
        ).cast("bigint").alias("full_sequences"),
        F.round(
            (F.sum("seq_tokens").cast("double") / F.nullif(cap, F.lit(0))).cast(
                "decimal(30,12)"
            ),
            4,
        )
        .cast("double")
        .alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# curriculum schedule: deterministic global training order, no global sort
# ---------------------------------------------------------------------------

#: sequence-length curriculum stages: short docs first (stage 0),
#: medium next, long last — the classic easy-to-hard schedule
CURRICULUM_STAGE_TOKENS = (50, 200)
#: md5-uniform shuffle key width and its chunk fan-out for the
#: two-level prefix-sum rank (u is uniform in [0, 16^8), so the chunk
#: id is a row-pure function of u — same determinism argument as
#: part_price_deciles_exact's equi-width binning, with zero driver
#: collects because the value range is known a priori)
_CURR_DIGITS = 8
_CURR_CHUNKS = 32
_CURR_CHUNK_WIDTH = (16 ** _CURR_DIGITS) // _CURR_CHUNKS


def _curriculum_oracle() -> str:
    from .dedup import _oracle_hex_id

    lo, hi = CURRICULUM_STAGE_TOKENS
    u = _oracle_hex_id("'curr:' || CAST(doc_id AS VARCHAR)", _CURR_DIGITS)
    return f"""
WITH t AS (
  SELECT doc_id, max(len({_sql_tokens()})) AS n_toks
  FROM documents WHERE doc_id IS NOT NULL
  GROUP BY doc_id
), staged AS (
  SELECT doc_id, n_toks,
         CASE WHEN n_toks < {lo} THEN 0
              WHEN n_toks < {hi} THEN 1
              ELSE 2 END AS stage,
         {u} AS u
  FROM t
)
SELECT doc_id, CAST(stage AS INT) AS stage,
       CAST(row_number() OVER (ORDER BY stage, u, doc_id) AS BIGINT) AS position
FROM staged
ORDER BY doc_id
"""


@register(
    "curriculum_length_schedule",
    description=f"Deterministic curriculum schedule: every document "
    "gets a global training POSITION ordered by (length stage, "
    "md5-uniform shuffle key) — short docs (< "
    f"{CURRICULUM_STAGE_TOKENS[0]} tokens) first, medium next, long "
    f"(>= {CURRICULUM_STAGE_TOKENS[1]}) last, uniformly shuffled "
    "within each stage. The global order is assembled WITHOUT a "
    "single-task global sort: the shuffle key's known [0, 16^8) range "
    "gives a row-pure chunk id, local row_numbers run per "
    "(stage, chunk) at stages x chunks parallelism, and a prefix sum "
    "over the tiny per-(stage, chunk) count relation broadcasts the "
    "offsets back — the part_price_deciles_exact / "
    "pack_training_sequences two-level rank pattern. Duplicate doc_id "
    "rows collapse to their LONGEST version (max token count) before "
    "staging, identically in both engines.",
    tags=("sampling", "ml-prep", "pipeline", "prefix-sum"),
)
def curriculum_length_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _spark_hex_id

    lo, hi = CURRICULUM_STAGE_TOKENS
    docs = spread(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "text")
    )
    t = docs.select("doc_id", F.size(_tokens()).alias("n")).groupBy(
        "doc_id"
    ).agg(F.max("n").alias("n_toks"))
    u = _spark_hex_id(
        F.concat(F.lit("curr:"), F.col("doc_id").cast("string")), _CURR_DIGITS
    )
    staged = t.select(
        "doc_id",
        F.when(F.col("n_toks") < lo, 0)
        .when(F.col("n_toks") < hi, 1)
        .otherwise(2)
        .cast("int")
        .alias("stage"),
        u.alias("u"),
    ).withColumn(
        "chunk", (F.col("u") / _CURR_CHUNK_WIDTH).cast("int")
    )
    # local ranks: stages × chunks concurrent sorts
    wl = Window.partitionBy("stage", "chunk").orderBy("u", "doc_id")
    local = staged.withColumn("lrn", F.row_number().over(wl))
    # running offsets over the tiny (stage, chunk) count relation —
    # |stages × chunks| rows, so the single-partition window is free
    counts = staged.groupBy("stage", "chunk").agg(F.count(F.lit(1)).alias("c"))
    wo = (
        Window.orderBy("stage", "chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "stage",
        "chunk",
        F.coalesce(F.sum("c").over(wo), F.lit(0)).alias("offset"),
    )
    return (
        local.join(F.broadcast(offsets), ["stage", "chunk"])
        .select(
            "doc_id",
            "stage",
            (F.col("offset") + F.col("lrn")).cast("bigint").alias("position"),
        )
        .orderBy("doc_id")
    )


import dataclasses as _dc2  # noqa: E402

from ..plans.registry import _REGISTRY as _REG_CUR  # noqa: E402

_REG_CUR["curriculum_length_schedule"] = _dc2.replace(
    _REG_CUR["curriculum_length_schedule"], oracle=_curriculum_oracle()
)
del _REG_CUR
