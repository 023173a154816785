"""The flagship: word frequency — full parity with the reference's one
query (tokenize → clean → filter → count → binary-ascending sort;
reference pipeline ``1.cpp:239-327``).

Spark-first mapping (SURVEY.md §3.4): the whole 4-phase
mapper/shuffle/reducer pipeline with its mutex barriers collapses to a
declarative ``groupBy().count()`` — Catalyst plans the partial
(map-side) aggregate the reference implements by sort-and-merge-
adjacent (``1.cpp:144-158``), the shuffle exchange it implements with a
shared array + global sort (``1.cpp:120-124``), and the final merge it
implements with an O(n²) linear probe (``1.cpp:190-204``). At 100 TB
this is the plan you want: partial agg shrinks the shuffle to
|distinct words| per partition, AQE sizes the reduce side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import clean_word
from ..plans.registry import register
from ..sources.tables import load_table
from ..sources.text import tokens_from_lines


def word_count(lines: DataFrame, column: str = "value") -> DataFrame:
    """Count cleaned words in a DataFrame of text lines.

    Returns ``(word string, cnt long)`` in ascending binary order —
    Spark's default UTF8 binary comparison matches the reference's
    ``strcmp`` sort (``1.cpp:316-320``): digits before letters, no
    locale collation.

    The clean step runs at LINE level before tokenization: deleting
    every char outside ``[0-9A-Za-z\\s]`` never creates or destroys
    whitespace, so it commutes with the whitespace split — provably the
    same counts as the reference's per-token ``clean_word``
    (``1.cpp:60-68``), at one regex invocation per line instead of per
    token (measured 0.63 s → 0.47 s at sf0.1; golden-fixture parity
    tests cover the equivalence, unicode punctuation included). Java's
    ``\\s`` is the ASCII set [ \\t\\n\\x0B\\f\\r] — exactly the C
    ``isspace`` delimiters ``fscanf %s`` skips (``1.cpp:260``).
    """
    cleaned = lines.select(
        F.lower(F.regexp_replace(F.col(column), r"[^0-9A-Za-z\s]", "")).alias("_t")
    )
    return (
        cleaned.select(F.explode(F.split("_t", r"\s+")).alias("word"))
        .filter(F.length("word") > 0)  # reference 1.cpp:84: drop empty-cleaned tokens
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


WORDCOUNT_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents
), cleaned AS (
  SELECT lower(regexp_replace(token, '[^0-9A-Za-z]', '', 'g')) AS word
  FROM toks WHERE length(token) > 0
)
SELECT word, count(*) AS cnt
FROM cleaned
WHERE length(word) > 0
GROUP BY word
ORDER BY word
"""


@register(
    "wordcount",
    oracle=WORDCOUNT_ORACLE,
    description="Reference-parity word frequency over documents.text "
    "(tokenize, clean [^0-9A-Za-z], lowercase, count, binary asc sort).",
    tags=("reference-parity", "text"),
)
def wordcount_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    return word_count(docs, "text")


@register(
    "wordcount_per_doc",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token FROM documents
), cleaned AS (
  SELECT doc_id, lower(regexp_replace(token, '[^0-9A-Za-z]', '', 'g')) AS word
  FROM toks WHERE length(token) > 0
)
SELECT doc_id, count(*) AS n_tokens, count(DISTINCT word) AS n_distinct
FROM cleaned
WHERE length(word) > 0
GROUP BY doc_id
ORDER BY doc_id
""",
    description="Per-document token and distinct-word counts (grouped "
    "variant of the flagship; shows keyed aggregation over exploded text).",
    tags=("reference-parity", "text"),
)
def wordcount_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("token")
    ).filter(F.length("token") > 0)
    return (
        toks.select("doc_id", clean_word("token").alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("word").alias("n_distinct"),
        )
        .orderBy("doc_id")
    )


@register(
    "wordcount_grouped_trace",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents
), cleaned AS (
  SELECT lower(regexp_replace(token, '[^0-9A-Za-z]', '', 'g')) AS word
  FROM toks WHERE length(token) > 0
)
SELECT word, count(*) AS n_ones, count(*) AS cnt
FROM cleaned
WHERE length(word) > 0
GROUP BY word
ORDER BY word
""",
    description="The reference's shuffle-phase 'grouped view' (operator #8, "
    "1.cpp:126-142): per word, the list of emitted 1s — materialized here "
    "as collect_list(1) whose size doubles as the count. Cosmetic in the "
    "reference (only ever printed); kept for operator-inventory parity.",
    tags=("reference-parity", "text", "trace"),
)
def wordcount_grouped_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = tokens_from_lines(docs, "text")
    return (
        toks.select(clean_word("token").alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.collect_list(F.lit(1)).alias("ones"))
        .select(
            "word",
            F.size("ones").cast("long").alias("n_ones"),
            F.size("ones").cast("long").alias("cnt"),
        )
        .orderBy("word")
    )
