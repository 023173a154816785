"""Frequency / heavy-hitter operators over the token stream.

The reference's one query IS a frequency table (word count, reference
``1.cpp:110-130``); these operators widen it to the two shapes a
100 TB corpus needs:

* ``heavy_hitters_exact`` — tokens above a support threshold, exact.
* ``heavy_hitters_cms`` — the same counts through a distributed
  count-min sketch (Cormode & Muthukrishnan 2005): d=4 salted hash
  rows × w=16 buckets. The sketch is built from the RAW token stream
  with a single groupBy on (salt, bucket) — map-side partial
  aggregation collapses every partition to ≤ d·w rows, so the shuffle
  is O(d·w · partitions) no matter how large the vocabulary or corpus
  is. That bounded-state property (not accuracy on this tiny vocab) is
  why a sketch replaces exact counting at scale.

Both hash with md5, so the whole sketch is deterministic and the
DuckDB oracle rebuilds it bit-for-bit — the CMS query is fully
value-checked, not rows-only. CMS guarantees estimate >= true count;
tests assert the property against the exact counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table

#: d=4 independent hash functions, derived from one md5 by salting
CMS_SALTS = ("cms0:", "cms1:", "cms2:", "cms3:")
#: w=16 buckets per hash row — one hex digit of the salted md5
CMS_WIDTH = 16

#: heavy-hitter support threshold: count * DENOM > total (> 1/30 ≈ 3.3%
#: — sits inside this corpus's 0.1%..3.5% token-frequency band so the
#: query returns a non-trivial hitter set at every scale factor)
HH_DENOM = 30

_SQL_TOKENS = "list_filter(string_split_regex(text, '\\s+'), t -> length(t) > 0)"
_SQL_SALTS = "(VALUES ('cms0:'), ('cms1:'), ('cms2:'), ('cms3:')) s(salt)"
#: hex digit -> 0..15, identical semantics to Spark's conv(x, 16, 10)
_SQL_BUCKET = "strpos('0123456789abcdef', substring(md5(salt || token), 1, 1)) - 1"


def _tokens() -> Column:
    return F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)


def _bucket(salt: str, token: Column) -> Column:
    """Hash row for ``salt``: first hex digit of md5(salt || token)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), token)), 1, 1), 16, 10).cast("int")


@register(
    "heavy_hitters_exact",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_SQL_TOKENS}) AS token FROM documents
), c AS (
  SELECT token, count(*) AS cnt FROM tok GROUP BY token
), t AS (
  SELECT sum(cnt) AS total FROM c
)
SELECT token, cnt,
       CAST(round(CAST(CAST(cnt AS DOUBLE) / total AS DECIMAL(30,12)), 6) AS DOUBLE) AS freq
FROM c, t
WHERE cnt * {HH_DENOM} > total
ORDER BY cnt DESC, token
""",
    description="Tokens with support > 1/30 of the stream, with exact "
    "counts and frequencies. One explode + one 31-group aggregate; the "
    "support filter uses integer arithmetic (cnt*30 > total) so the "
    "threshold never hits a float boundary.",
    tags=("freq", "heavyhitters"),
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Stream total as a scalar aggregate broadcast back to the vocab
    # rows: at 100 TB the vocabulary is itself huge, so an unpartitioned
    # window over it (single partition) would be the bottleneck.
    total = F.broadcast(cnts.agg(F.sum("cnt").alias("total")))
    freq = F.round((F.col("cnt").cast("double") / F.col("total")).cast("decimal(30,12)"), 6)
    return (
        cnts.crossJoin(total)
        .filter(F.col("cnt") * HH_DENOM > F.col("total"))
        .select("token", "cnt", freq.cast("double").alias("freq"))
        .orderBy(F.desc("cnt"), "token")
    )


@register(
    "heavy_hitters_cms",
    oracle=f"""
WITH tok AS (
  SELECT unnest({_SQL_TOKENS}) AS token FROM documents
), salted AS (
  SELECT salt, {_SQL_BUCKET} AS bucket
  FROM tok CROSS JOIN {_SQL_SALTS}
), sketch AS (
  SELECT salt, bucket, count(*) AS c FROM salted GROUP BY salt, bucket
), q AS (
  SELECT DISTINCT token FROM tok
), qb AS (
  SELECT token, salt, {_SQL_BUCKET} AS bucket
  FROM q CROSS JOIN {_SQL_SALTS}
)
SELECT token, min(c) AS cms_count
FROM qb JOIN sketch USING (salt, bucket)
GROUP BY token
ORDER BY token
""",
    description="Count-min-sketch frequency estimate per distinct token "
    "(d=4 md5-salted hash rows, w=16 buckets). The sketch aggregate "
    "carries at most d*w=64 groups per partition through the shuffle "
    "regardless of corpus size — the bounded-memory path to frequencies "
    "at 100 TB. Deterministic md5 hashing makes the estimates exactly "
    "reproducible: the oracle rebuilds the identical sketch in SQL. "
    "Estimates over-count only (collisions), never under — asserted "
    "against heavy_hitters_exact in tests.",
    tags=("freq", "heavyhitters", "sketch", "approx"),
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("token"))
    salted = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"), _bucket(s, F.col("token")).alias("bucket")
                    )
                    for s in CMS_SALTS
                ]
            )
        ).alias("sb")
    ).select("sb.salt", "sb.bucket")
    sketch = salted.groupBy("salt", "bucket").agg(F.count(F.lit(1)).alias("c"))
    qb = toks.distinct().select(
        "token",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"), _bucket(s, F.col("token")).alias("bucket")
                    )
                    for s in CMS_SALTS
                ]
            )
        ).alias("sb"),
    ).select("token", "sb.salt", "sb.bucket")
    return (
        qb.join(F.broadcast(sketch), ["salt", "bucket"])
        .groupBy("token")
        .agg(F.min("c").alias("cms_count"))
        .orderBy("token")
    )
