"""Edit-distance (Levenshtein) near-duplicate detection with length-
band blocking — the character-level member of the dedup family
(complementing token-set Jaccard, shingles, MinHash, SimHash,
embedding cosine: SURVEY.md §2.3).

Scale notes: edit distance ≤ K forces |len(a) − len(b)| ≤ K, so docs
block into length bands of width K+1 and each left row probes only its
own and the two adjacent bands — an equi-join on the exploded band
id, never an all-pairs loop. The verify uses Spark's thresholded
``levenshtein(l, r, K)`` which early-exits the DP at K+1 (O(len·K)
instead of O(len²)). Band blocking is exact (no recall loss), unlike
the sketch-based members of the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table, spread

MAX_EDITS = 5
BAND = MAX_EDITS + 1


@register(
    "dedup_edit_distance",
    oracle=f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text) AS edits
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id
 AND abs(a.n_chars - b.n_chars) <= {MAX_EDITS}
 AND levenshtein(a.text, b.text) <= {MAX_EDITS}
ORDER BY doc_a, doc_b
""",
    description="Document pairs within 5 character edits: length-band "
    "blocking (edit distance ≤ K bounds the length gap to K, so each "
    "doc equi-joins its own and adjacent width-6 length bands) followed "
    "by thresholded Levenshtein verification that early-exits at K+1 — "
    "O(len·K) per candidate, no all-pairs comparison anywhere.",
    tags=("dedup", "neardup", "levenshtein", "fuzzy"),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "n_chars"
    )
    band = F.floor(F.col("n_chars") / BAND)
    left = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.col("n_chars").alias("len_a"),
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    right = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.col("n_chars").alias("len_b"),
        band.alias("band"),
    )
    edits = F.levenshtein("text_a", "text_b", MAX_EDITS)
    return (
        left.join(
            right,
            (left["band"] == right["band"])
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= MAX_EDITS),
        )
        .select("doc_a", "doc_b", edits.alias("edits"))
        .filter(F.col("edits") >= 0)  # thresholded lev returns -1 past K
        # no global output sort — order-insensitive compare, large relation
    )
