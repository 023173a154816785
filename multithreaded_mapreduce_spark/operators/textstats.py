"""Text-analysis operators for a training-data pipeline: quality
scoring, language identification, token counting, fingerprinting
(SURVEY.md §2.3). All pure Column expressions (split / filter /
aggregate higher-order functions + md5) — no Python UDFs, every plan
stays in whole-stage codegen, and every query has a DuckDB oracle.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.caching import tracked_persist
from ..plans.registry import register
from ..sources.tables import load_table, spread

# small embedded stopword lists (public, standard function words)
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "fr": ("le", "la", "et", "de", "les", "des", "un"),
    "es": ("el", "la", "y", "de", "los", "que", "un"),
    "de": ("der", "die", "und", "das", "von", "ein", "zu"),
    "zh": ("的", "是", "在", "了", "和"),
}

#: BPE-ish word/number/symbol tokenizer (ASCII-explicit like clean_word)
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(col: str = "text") -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def _sql_tokens(col: str = "text") -> str:
    return f"list_filter(string_split_regex({col}, '\\s+'), t -> length(t) > 0)"


@register(
    "text_quality_scores",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, source, n_chars, text,
         {_sql_tokens()} AS toks
  FROM documents
), m AS (
  SELECT doc_id, lang, source, n_chars,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> list_contains({list(STOPWORDS["en"])}, x))) AS n_stopwords,
         length(replace(text, ' ', '')) AS n_nonspace_chars
  FROM t
)
SELECT doc_id, lang, source, n_chars, n_tokens,
       CAST(round(CAST(CAST(n_nonspace_chars AS DOUBLE) / nullif(n_tokens, 0) AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS avg_token_len,
       CAST(round(CAST(CAST(n_stopwords AS DOUBLE) / nullif(n_tokens, 0) AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS stopword_ratio,
       CASE WHEN n_tokens >= 20
             AND CAST(n_stopwords AS DOUBLE) / nullif(n_tokens, 0) BETWEEN 0.02 AND 0.6
            THEN 1 ELSE 0 END AS passes_quality
FROM m
ORDER BY doc_id
""",
    description="Per-document quality signals: token count, average token "
    "length, stopword ratio, and a pass/fail gate (the C4-style length + "
    "stopword heuristic). One scan, no shuffle except the final sort.",
    tags=("text", "quality"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    n_nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    # nullif: a zero-token document yields NULL ratios (not an ANSI
    # divide-by-zero error, not NaN) — identical to the oracle's nullif
    safe_n = F.nullif(n_tokens, F.lit(0))
    stop_ratio = n_stop.cast("double") / safe_n
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            n_tokens.alias("n_tokens"),
            F.round((n_nonspace.cast("double") / safe_n).cast("decimal(30,12)"), 4)
            .cast("double")
            .alias("avg_token_len"),
            F.round(stop_ratio.cast("decimal(30,12)"), 4).cast("double").alias("stopword_ratio"),
            F.when((n_tokens >= 20) & stop_ratio.between(0.02, 0.6), 1)
            .otherwise(0)
            .alias("passes_quality"),
        )
        .orderBy("doc_id")
    )


def _lang_score(toks: Column, lang: str) -> Column:
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def _sql_lang_score(lang: str) -> str:
    return f"len(list_filter(toks, x -> list_contains({list(STOPWORDS[lang])}, x)))"


@register(
    "language_id",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {_sql_tokens()} AS toks FROM documents
), scores AS (
  SELECT doc_id, lang,
         {_sql_lang_score("en")} AS c_en,
         {_sql_lang_score("fr")} AS c_fr,
         {_sql_lang_score("es")} AS c_es,
         {_sql_lang_score("de")} AS c_de,
         {_sql_lang_score("zh")} AS c_zh
  FROM t
)
SELECT doc_id, lang AS labeled_lang,
       CASE
         WHEN greatest(c_en, c_fr, c_es, c_de, c_zh) = 0 THEN 'und'
         WHEN c_en >= greatest(c_fr, c_es, c_de, c_zh) THEN 'en'
         WHEN c_fr >= greatest(c_es, c_de, c_zh) THEN 'fr'
         WHEN c_es >= greatest(c_de, c_zh) THEN 'es'
         WHEN c_de >= c_zh THEN 'de'
         ELSE 'zh'
       END AS guessed_lang
FROM scores
ORDER BY doc_id
""",
    description="Stopword-overlap language ID: score each doc against five "
    "embedded function-word lists, argmax with a fixed precedence order "
    "(n-gram-free heuristic; the synthetic corpus is English-vocab so the "
    "guess is honestly 'en' everywhere — the operator is the point).",
    tags=("text", "langid"),
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[_lang_score(toks, lang).alias(f"c_{lang}") for lang in ("en", "fr", "es", "de", "zh")],
    )
    c = {lang: F.col(f"c_{lang}") for lang in ("en", "fr", "es", "de", "zh")}
    guess = (
        F.when(F.greatest(c["en"], c["fr"], c["es"], c["de"], c["zh"]) == 0, "und")
        .when(c["en"] >= F.greatest(c["fr"], c["es"], c["de"], c["zh"]), "en")
        .when(c["fr"] >= F.greatest(c["es"], c["de"], c["zh"]), "fr")
        .when(c["es"] >= F.greatest(c["de"], c["zh"]), "es")
        .when(c["de"] >= c["zh"], "de")
        .otherwise("zh")
    )
    return scored.select("doc_id", "labeled_lang", guess.alias("guessed_lang")).orderBy("doc_id")


@register(
    "token_counting",
    oracle=f"""
SELECT doc_id,
       len({_sql_tokens()}) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct({_sql_tokens()})) AS n_distinct_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_llm_tokens
FROM documents
ORDER BY doc_id
""",
    description="Token counting three ways: whitespace tokens, BPE-ish "
    "regex pieces (letters|digits|symbol), distinct tokens, and the "
    "chars/4 LLM-token estimate.",
    tags=("text", "tokens"),
)
def token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.size(_tokens()).alias("n_ws_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("n_bpe_tokens"),
            F.size(F.array_distinct(_tokens())).alias("n_distinct_tokens"),
            F.ceil(F.length("text") / 4.0).cast("long").alias("approx_llm_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_fingerprints",
    oracle=f"""
SELECT doc_id,
       md5(text) AS content_md5,
       md5(coalesce(array_to_string(list_sort(list_distinct({_sql_tokens()})), ' '), '')) AS vocab_md5,
       substring(md5(text), 1, 8) AS short_id
FROM documents
ORDER BY doc_id
""",
    description="Document fingerprints: exact content digest plus an "
    "order-insensitive vocabulary digest (md5 of the sorted distinct token "
    "set) — the pair distinguishes exact dups from shuffled near-dups in "
    "O(1) per comparison downstream.",
    tags=("text", "fingerprint"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vocab = F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))
    return (
        docs.select(
            "doc_id",
            F.md5("text").alias("content_md5"),
            F.md5(vocab).alias("vocab_md5"),
            F.substring(F.md5("text"), 1, 8).alias("short_id"),
        )
        .orderBy("doc_id")
    )


@register(
    "corpus_stats_by_source",
    oracle=f"""
WITH t AS (
  SELECT source, lang, n_chars, len({_sql_tokens()}) AS n_tokens FROM documents
)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(round(CAST(CAST(sum(n_chars) AS DOUBLE) / count(*) AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS avg_chars
FROM t
GROUP BY source
ORDER BY source
""",
    description="Corpus rollup per source: doc/lang/token/char stats — the "
    "dashboard query of a crawl pipeline (single scan + one shuffle).",
    tags=("text", "stats"),
)
def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", "lang", "n_chars", F.size(_tokens()).alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round((F.sum("n_chars").cast("double") / F.count(F.lit(1))).cast("decimal(30,12)"), 4)
            .cast("double")
            .alias("avg_chars"),
        )
        .orderBy("source")
    )


@register(
    "clean_corpus_pipeline",
    oracle=r"""
WITH q AS (
  SELECT doc_id, source, lang, n_chars, md5(text) AS h,
         len(list_filter(string_split_regex(text, '\s+'),
                         t -> length(t) > 0)) AS n_toks
  FROM documents
  WHERE len(list_filter(string_split_regex(text, '\s+'),
                        t -> length(t) > 0)) >= 10
    AND n_chars <= 400
), kept AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM q
)
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
FROM kept WHERE rn = 1
GROUP BY source, lang
ORDER BY source, lang
""",
    description="End-to-end training-corpus curation in one plan: "
    "quality gate (>= 10 tokens, <= 400 chars) → exact dedup keeping "
    "the lowest doc_id per content digest → per-(source, lang) corpus "
    "stats. The composition the LLM-data extensions exist for, as a "
    "single Catalyst plan: the quality filter pushes into the scan, "
    "dedup shuffles 32-byte digests (never text), and the final rollup "
    "is partial+final. At 100 TB each stage feeds the next without "
    "materialization.",
    tags=("text", "pipeline", "dedup", "quality"),
)
def clean_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0))
    qual = docs.select(
        "doc_id", "source", "lang", "n_chars",
        F.md5("text").alias("h"),
        n_toks.alias("n_toks"),
    ).filter((F.col("n_toks") >= 10) & (F.col("n_chars") <= 400))
    rn = F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
    kept = qual.withColumn("rn", rn).filter(F.col("rn") == 1)
    return (
        kept.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
        )
        .orderBy("source", "lang")
    )


@register(
    "documents_profile",
    oracle="""
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars,
       CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       count(DISTINCT md5(text)) AS n_unique_texts
FROM documents
""",
    description="Single-scan data-profiling report over the corpus: row "
    "count, empty-text count, language/source cardinalities, char-length "
    "range and mean, short-doc count, and distinct-content count (via "
    "digest, so the distinct state is 32 bytes per unique doc, not the "
    "text). The validation pass a training pipeline runs before "
    "ingesting a new crawl — one scan, partial+final aggregation, no "
    "joins.",
    tags=("text", "profiling", "quality"),
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    empty = F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)
    short = F.when(F.col("n_chars") < 100, 1).otherwise(0)
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(empty).alias("n_empty"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
        F.sum(short).alias("n_short"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


# --------------------------------------------------------------------------
# PII pattern audit — the scrub/compliance pass before releasing a corpus
# --------------------------------------------------------------------------

#: ASCII-explicit patterns valid in BOTH Java regex (Spark) and RE2
#: (DuckDB): no lookarounds, no backreferences, no unicode classes.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


@register(
    "pii_pattern_audit",
    oracle="""
WITH m AS (
  SELECT source,
"""
    + ",\n".join(
        f"         len(regexp_extract_all(text, '{p}')) AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    + """
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
"""
    + ",\n".join(
        f"       CAST(sum(n_{k}) AS BIGINT) AS {k}_matches" for k in PII_PATTERNS
    )
    + """,
       CAST(sum(CASE WHEN n_email + n_phone + n_ipv4 + n_ssn > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
FROM m
GROUP BY source
ORDER BY source
""",
    description="PII-pattern audit per source: per-document regexp_count "
    "of email/phone/IPv4/SSN shapes, rolled up to match totals and a "
    "docs-with-any-PII count — the compliance scan a corpus release "
    "runs before publication. Patterns are ASCII-explicit and live in "
    "the common Java-regex/RE2 dialect subset so both engines count "
    "identically. One scan, no shuffle beyond the per-source "
    "partial+final aggregate; at 100 TB the regex work is "
    "embarrassingly parallel and the shuffle carries |sources| rows. "
    "Degenerate inputs (unicode, empty text) are parity-swept in "
    "tests/test_adversarial_fixtures.py, which plants real-looking "
    "PII strings.",
    tags=("text", "pii", "audit", "quality"),
)
def pii_pattern_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "source",
        *[
            F.regexp_count("text", F.lit(p)).alias(f"n_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    )
    any_pii = F.when(
        sum(F.col(f"n_{k}") for k in PII_PATTERNS) > 0, 1
    ).otherwise(0)
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[F.sum(f"n_{k}").alias(f"{k}_matches") for k in PII_PATTERNS],
            F.sum(any_pii).alias("docs_with_pii"),
        )
        .orderBy("source")
    )


@register(
    "pii_redact_documents",
    oracle="""
SELECT doc_id,
"""
    + ",\n".join(
        f"       len(regexp_extract_all(text, '{p}')) AS n_{k}"
        for k, p in PII_PATTERNS.items()
    )
    + """,
       md5("""
    + "".join(
        f"regexp_replace(" for _ in PII_PATTERNS
    )
    + "text"
    + "".join(
        f", '{p}', '<{k.upper()}>', 'g')" for k, p in PII_PATTERNS.items()
    )
    + """) AS redacted_md5,
       length("""
    + "".join(
        f"regexp_replace(" for _ in PII_PATTERNS
    )
    + "text"
    + "".join(
        f", '{p}', '<{k.upper()}>', 'g')" for k, p in PII_PATTERNS.items()
    )
    + """) AS redacted_len
FROM documents
ORDER BY doc_id
""",
    description="PII redaction — the TRANSFORM counterpart of "
    "pii_pattern_audit's detection scan: every email/phone/IPv4/SSN "
    "match is replaced by its typed placeholder (<EMAIL>, <PHONE>, "
    "<IPV4>, <SSN>), applied in a fixed pattern order in both engines, "
    "with per-document match counts on the ORIGINAL text plus an md5 "
    "certificate and length of the redacted text (the release "
    "pipeline writes the redacted column; the certificate makes the "
    "transform itself value-hash-checkable without shipping text "
    "through the comparator). Pure projection — one scan, zero "
    "shuffles, embarrassingly parallel at 100 TB; patterns live in "
    "the common Java-regex/RE2 dialect subset (PII_PATTERNS above). "
    "NULL text propagates NULL counts/certificate identically.",
    tags=("text", "pii", "quality", "pipeline"),
)
def pii_redact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    red = F.col("text")
    for k, p in PII_PATTERNS.items():
        red = F.regexp_replace(red, p, f"<{k.upper()}>")
    return docs.select(
        "doc_id",
        *[
            F.regexp_count("text", F.lit(p)).alias(f"n_{k}")
            for k, p in PII_PATTERNS.items()
        ],
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    ).orderBy("doc_id")


#: ASCII character classes for the script profile — like PII_PATTERNS,
#: every class lives in the exact common Java-regex/RE2 dialect subset
#: (verified identical on the unicode edge strings): no \p{...} (the
#: engines' unicode-property tables differ), no \s (Java includes
#: \x0B, RE2 \f — explicit list instead), no \x escapes (syntaxes
#: differ). non-ASCII falls out as the remainder. CAVEAT: astral-plane
#: chars (emoji) count 2 in Spark's UTF-16 length and 1 in DuckDB's —
#: the corpus and edge fixtures are BMP-only, same contract as every
#: other length() consumer here.
SCRIPT_CLASSES = {
    "alpha": "[A-Za-z]",
    "digit": "[0-9]",
    "space": "[ \\t\\n\\r]",
    "punct": "[!-/:-@\\[-`{-~]",
}


@register(
    "script_char_profile",
    oracle="""
WITH m AS (
  SELECT doc_id, length(text) AS n_chars_m,
"""
    + ",\n".join(
        f"         len(regexp_extract_all(text, '{p}')) AS n_{k}"
        for k, p in SCRIPT_CLASSES.items()
    )
    + """
  FROM documents
)
SELECT doc_id, n_alpha, n_digit, n_space, n_punct,
       n_chars_m - n_alpha - n_digit - n_space - n_punct AS n_non_ascii,
       CAST(round(CAST(CAST(n_chars_m - n_alpha - n_digit - n_space - n_punct
                 AS DOUBLE) / nullif(n_chars_m, 0) AS DECIMAL(30,12)), 4)
            AS DOUBLE) AS non_ascii_ratio
FROM m
ORDER BY doc_id
""",
    description="Per-document script/character-class profile — the "
    "C4/CCNet-style non-ASCII gate signal: counts of ASCII alpha / "
    "digit / whitespace / punctuation characters, the non-ASCII "
    "remainder, and its ratio (NULL on empty text, the nullif "
    "contract). Classes live in the shared Java-regex/RE2 dialect "
    "subset (SCRIPT_CLASSES above — no \\p, no \\s, no hex escapes). "
    "Pure projection: one scan, zero shuffles, embarrassingly "
    "parallel at 100 TB.",
    tags=("text", "quality", "script"),
)
def script_char_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        *[
            F.regexp_count("text", F.lit(p)).alias(f"n_{k}")
            for k, p in SCRIPT_CLASSES.items()
        ],
    )
    non_ascii = (
        F.col("n_chars_m")
        - F.col("n_alpha")
        - F.col("n_digit")
        - F.col("n_space")
        - F.col("n_punct")
    )
    return counts.select(
        "doc_id",
        "n_alpha",
        "n_digit",
        "n_space",
        "n_punct",
        non_ascii.alias("n_non_ascii"),
        F.round(
            (non_ascii.cast("double") / F.nullif(F.col("n_chars_m"), F.lit(0))).cast(
                "decimal(30,12)"
            ),
            4,
        )
        .cast("double")
        .alias("non_ascii_ratio"),
    ).orderBy("doc_id")


#: Zipf fit window: rank-frequency regression runs over the top-K
#: vocabulary only (the head is where Zipf's law binds; the long tail
#: of hapaxes flattens any fit and costs a full-vocab sort).
ZIPF_TOP_K = 500


@register(
    "zipf_vocab_fit",
    oracle=f"""
WITH t AS (
  SELECT {_sql_tokens()} AS ts FROM documents
), tok AS (
  SELECT unnest(ts) AS token FROM t
), v AS (
  SELECT token, count(*) AS c FROM tok GROUP BY token
), w AS (
  SELECT token, c FROM v ORDER BY c DESC, token LIMIT {ZIPF_TOP_K}
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r FROM w
), fit AS (
  SELECT count(*) AS k_used,
         CAST(round(CAST(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE)))
              AS DECIMAL(30,12)), 4) AS DOUBLE) AS zipf_slope,
         CAST(round(CAST(regr_intercept(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE)))
              AS DECIMAL(30,12)), 4) AS DOUBLE) AS zipf_intercept,
         CAST(round(CAST(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE)))
              AS DECIMAL(30,12)), 4) AS DOUBLE) AS fit_r2
  FROM ranked
), corpus AS (
  SELECT count(*) AS vocab_size, CAST(sum(c) AS BIGINT) AS total_tokens FROM v
)
SELECT corpus.vocab_size, corpus.total_tokens, fit.k_used,
       fit.zipf_slope, fit.zipf_intercept, fit.fit_r2
FROM fit CROSS JOIN corpus
""",
    description="Corpus vocabulary profile: Zipf's-law fit over the "
    "top-K token frequencies — OLS slope / intercept / R² of "
    "ln(frequency) on ln(rank) — plus vocabulary size and total token "
    "count. A natural corpus fits slope ≈ −1; synthetic or heavily "
    "deduplicated text departs visibly, so the fit is a cheap whole-"
    "corpus health check. The token shuffle aggregates to the "
    "vocabulary once (persisted: the fit and the corpus totals both "
    "consume it); the rank window runs on K rows via "
    "TakeOrderedAndProject, never a full-vocab global sort.",
    tags=("text", "corpus", "stats", "pipeline"),
)
def zipf_vocab_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("text")
    tok = docs.select(F.explode(_tokens()).alias("token"))
    # vocabulary feeds two branches (top-K fit + corpus totals);
    # persist so the token-stream shuffle runs once. |vocab| is
    # MB-scale even at 100 TB corpus size (same argument as the
    # unigram-LM broadcast in quality_repetition.py).
    v = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c")).transform(tracked_persist)
    # top-K via orderBy+limit → TakeOrderedAndProject: each partition
    # keeps its local K, the driver merges K·partitions rows — no
    # global sort. The rank window then runs on K rows (single task
    # by construction, which is exactly right for K=500).
    w = v.orderBy(F.desc("c"), "token").limit(ZIPF_TOP_K)
    ranked = w.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("token")))
        .alias("r"),
    )
    ln_c = F.log(F.col("c").cast("double"))
    ln_r = F.log(F.col("r").cast("double"))

    def snap4(c):
        return F.round(c.cast("decimal(30,12)"), 4).cast("double")

    fit = ranked.agg(
        F.count(F.lit(1)).alias("k_used"),
        snap4(F.regr_slope(ln_c, ln_r)).alias("zipf_slope"),
        snap4(F.regr_intercept(ln_c, ln_r)).alias("zipf_intercept"),
        snap4(F.regr_r2(ln_c, ln_r)).alias("fit_r2"),
    )
    corpus = v.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("total_tokens"),
    )
    return fit.crossJoin(F.broadcast(corpus)).select(
        "vocab_size", "total_tokens", "k_used",
        "zipf_slope", "zipf_intercept", "fit_r2",
    )


# ------------------------------------------------------------------
# vocabulary coverage / OOV rate — the tokenizer-budgeting question:
# "with a top-V vocabulary, how much of each document falls out?"
# ------------------------------------------------------------------

#: small enough that the boundary actually cuts on the driver corpus
#: (31 distinct tokens at sf0.01) — the operator's shape is V-agnostic
OOV_VOCAB_SIZE = 20


@register(
    "vocab_oov_rates",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_sql_tokens()} AS ts FROM documents
), tok AS (
  SELECT doc_id, unnest(ts) AS token FROM t
), v AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY count(*) DESC, token) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= {OOV_VOCAB_SIZE}
)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(round(CAST(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS DECIMAL(30,12)), 6) AS DOUBLE) AS oov_rate
FROM tok LEFT JOIN v USING (token)
GROUP BY tok.doc_id
ORDER BY tok.doc_id
""",
    description=f"Tokenizer vocabulary budgeting: build the top-"
    f"{OOV_VOCAB_SIZE} vocabulary by corpus frequency (ties broken by "
    "token, so the boundary is deterministic on both engines) and "
    "report every document's out-of-vocabulary token count and rate — "
    "the coverage curve input that decides a tokenizer's vocab size. "
    "Scale notes: the vocabulary is a TakeOrderedAndProject over the "
    "token aggregate and broadcasts to the scoring join; the token "
    "stream shuffles once into per-document counts. The corpus-sized "
    "output skips a global presentation sort.",
    tags=("text", "tokenizer", "pipeline"),
)
def vocab_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = docs.select("doc_id", F.explode(_tokens()).alias("token")).transform(
        tracked_persist
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(OOV_VOCAB_SIZE)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                (F.col("n_oov").cast("double") / F.col("n_tokens")).cast(
                    "decimal(30,12)"
                ),
                6,
            )
            .cast("double")
            .alias("oov_rate"),
        )
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# token frequency spectrum (frequency-of-frequencies)
# ---------------------------------------------------------------------------


@register(
    "token_frequency_spectrum",
    oracle=f"""
WITH toks AS (
  SELECT unnest({_sql_tokens()}) AS token FROM documents
), tf AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY token
)
SELECT CAST(length(bin(cnt)) - 1 AS INT) AS freq_bucket,
       CAST(1 AS BIGINT) << (length(bin(cnt)) - 1) AS bucket_min,
       count(*) AS n_tokens,
       CAST(sum(cnt) AS BIGINT) AS n_occurrences
FROM tf
GROUP BY 1, 2
ORDER BY freq_bucket
""",
    description="Token frequency-of-frequencies spectrum: distinct "
    "tokens and total occurrences per power-of-two frequency bucket "
    "(bucket = floor(log2(count)), computed as the binary-string "
    "length so both engines bucket exact powers of two identically — "
    "float log2 is off-by-an-ulp there). The classic Zipf diagnostic "
    "behind vocabulary sizing and min-frequency cutoffs: the hapax "
    "bucket's mass tells you what a min-count filter would drop. Two "
    "map-side-combinable aggregates over the token stream (wordcount "
    "class); the second groupBy input is vocabulary-sized.",
    tags=("text", "tokenizer", "report", "aggregate"),
)
def token_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("text"))
    tf = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bucket = (F.length(F.conv(F.col("cnt"), 10, 2)) - 1).cast("int")
    return (
        tf.select(bucket.alias("freq_bucket"), "cnt")
        # pyspark's shiftleft() binding only takes a literal shift —
        # the SQL form accepts a column expression
        .withColumn(
            "bucket_min", F.expr("shiftleft(CAST(1 AS BIGINT), freq_bucket)")
        )
        .groupBy("freq_bucket", "bucket_min")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
        )
        .orderBy("freq_bucket")
    )


#: Flesch reading-ease coefficients (public formula, Flesch 1948) and
#: the shared regex classes: sentence boundaries are runs of .!? and
#: the syllable proxy is runs of vowels (incl. y) — the standard
#: hyphenation-free approximation. Both patterns sit in the verified
#: Java/RE2-compatible dialect subset used by the PII operators.
FLESCH_BASE = 206.835
FLESCH_WORDS_PER_SENTENCE = 1.015
FLESCH_SYLLABLES_PER_WORD = 84.6
SENTENCE_RE = r"[.!?]+"
VOWEL_RUN_RE = r"[aeiouy]+"


@register(
    "readability_scores",
    oracle=f"""
WITH m AS (
  SELECT doc_id, lang,
         len({_sql_tokens()}) AS n_words,
         greatest(1, len(regexp_extract_all(coalesce(text, ''),
                                            '{SENTENCE_RE.replace("'", "''")}')))
             AS n_sentences,
         len(regexp_extract_all(lower(coalesce(text, '')), '{VOWEL_RUN_RE}'))
             AS n_syllables
  FROM documents
  -- equivalent to n_words > 0 without re-deriving the tokenize chain:
  -- a document has a token iff it has a non-whitespace char
  WHERE regexp_matches(coalesce(text, ''), '\\S')
)
SELECT doc_id, lang, n_words, n_sentences, n_syllables,
       CAST(round(CAST({FLESCH_BASE}
                       - {FLESCH_WORDS_PER_SENTENCE}
                         * (CAST(n_words AS DOUBLE) / n_sentences)
                       - {FLESCH_SYLLABLES_PER_WORD}
                         * (CAST(n_syllables AS DOUBLE) / n_words)
                  AS DECIMAL(30,12)), 4) AS DOUBLE) AS flesch,
       CASE WHEN {FLESCH_BASE}
                 - {FLESCH_WORDS_PER_SENTENCE}
                   * (CAST(n_words AS DOUBLE) / n_sentences)
                 - {FLESCH_SYLLABLES_PER_WORD}
                   * (CAST(n_syllables AS DOUBLE) / n_words) >= 60 THEN 'easy'
            WHEN {FLESCH_BASE}
                 - {FLESCH_WORDS_PER_SENTENCE}
                   * (CAST(n_words AS DOUBLE) / n_sentences)
                 - {FLESCH_SYLLABLES_PER_WORD}
                   * (CAST(n_syllables AS DOUBLE) / n_words) >= 30 THEN 'medium'
            ELSE 'hard' END AS band
FROM m
ORDER BY doc_id
""",
    description="Flesch reading-ease per document: whitespace words, "
    "sentence count (runs of .!?, floored at 1 so headline-only docs "
    "score), and the standard vowel-run syllable proxy, combined by "
    "the published 206.835 − 1.015·(words/sentence) − "
    "84.6·(syllables/word) formula plus an easy/medium/hard band. A "
    "readability gate is a stock corpus-quality signal next to the "
    "stopword/entropy gates. Pure regexp_count row math in one scan "
    "projection — zero shuffles, zero UDFs; the decimal snap makes "
    "the double math oracle-stable.",
    tags=("text", "quality", "report"),
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    text = F.coalesce(F.col("text"), F.lit(""))
    # n_words > 0 rewritten as a cheap raw-column predicate so the
    # tokenize chain is never pushed into the FileScan (plan lint)
    m = load_table(spark, sf_dir, "documents").filter(text.rlike(r"\S")).select(
        "doc_id",
        "lang",
        F.size(_tokens()).alias("n_words"),
        F.greatest(F.lit(1), F.regexp_count(text, F.lit(SENTENCE_RE))).alias(
            "n_sentences"
        ),
        F.regexp_count(F.lower(text), F.lit(VOWEL_RUN_RE)).alias("n_syllables"),
    )
    flesch = (
        F.lit(FLESCH_BASE)
        - F.lit(FLESCH_WORDS_PER_SENTENCE)
        * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(FLESCH_SYLLABLES_PER_WORD)
        * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    return (
        m.select(
            "doc_id",
            "lang",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.round(flesch.cast("decimal(30,12)"), 4).cast("double").alias("flesch"),
            F.when(flesch >= 60, "easy")
            .when(flesch >= 30, "medium")
            .otherwise("hard")
            .alias("band"),
        )
        .orderBy("doc_id")
    )


def _langid_oracle() -> str:
    """The registered language_id oracle, reused VERBATIM as the
    confusion matrix's inner CTE so the evaluated path IS the
    registered query (same composition rule as ann_recall_report)."""
    from ..plans.registry import _REGISTRY

    return _REGISTRY["language_id"].oracle


@register(
    "language_confusion_matrix",
    oracle=f"""
WITH li AS ({_langid_oracle()})
SELECT labeled_lang, guessed_lang, count(*) AS n_docs,
       CAST(round(CAST(count(*) * 1.0
                       / sum(count(*)) OVER (PARTITION BY labeled_lang)
                  AS DECIMAL(30,12)), 4) AS DOUBLE) AS row_share
FROM li
GROUP BY labeled_lang, guessed_lang
ORDER BY labeled_lang, guessed_lang
""",
    description="Language-ID evaluation: the labeled-vs-guessed "
    "confusion matrix over the registered language_id query (reused "
    "verbatim — the evaluated path is the production path, same "
    "composition rule as ann_recall_report), with each cell's share "
    "of its labeled-language row. The corpus is English-vocab "
    "synthetic, so the honest reading is one dominant (en, en) cell "
    "with the other labels exposing the heuristic's confusion — "
    "which is exactly what an eval artifact is for. A |langs|²-row "
    "aggregate; the row-share window runs on that bounded relation.",
    tags=("text", "langid", "report", "aggregate"),
)
def language_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per = (
        language_id(spark, sf_dir)
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    tot = F.sum("n_docs").over(Window.partitionBy("labeled_lang"))
    return per.select(
        "labeled_lang",
        "guessed_lang",
        "n_docs",
        F.round((F.col("n_docs") * 1.0 / tot).cast("decimal(30,12)"), 4)
        .cast("double")
        .alias("row_share"),
    ).orderBy("labeled_lang", "guessed_lang")
