"""Text sources: the reference's two scan operators, Spark-first.

The reference reads whitespace-delimited tokens from stdin (with an
``END`` sentinel, reference ``1.cpp:239-247``) or from a text file via
``fscanf("%s")`` (no sentinel, ``1.cpp:248-264``). Both collapse to the
same logical source: *one row per whitespace-delimited token*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: regex matching any run of ASCII/Unicode whitespace (Java regex \s is
#: ASCII-only by default, matching the reference's isspace-delimited scan)
WHITESPACE = r"\s+"


def tokens_from_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    """Explode a DataFrame of text lines into one row per raw token.

    Equivalent of the reference's file scan loop (``1.cpp:259-263``):
    multi-line input collapses because tokenization is purely
    whitespace-driven. Empty strings produced by leading separators are
    dropped here (fscanf never yields an empty token).
    """
    return (
        lines.select(F.explode(F.split(F.col(column), WHITESPACE)).alias("token"))
        .filter(F.length("token") > 0)
    )


def read_tokens(spark: SparkSession, path: str) -> DataFrame:
    """Scan a text file into one row per whitespace-delimited token
    (reference entry point B, ``1.cpp:248-264``)."""
    return tokens_from_lines(spark.read.text(path), "value")


def tokens_from_list(spark: SparkSession, tokens: list[str], sentinel: str | None = "END") -> DataFrame:
    """Emulate the reference's interactive stdin source (entry point A,
    ``1.cpp:239-247``): tokens up to (excluding) the first ``sentinel``.

    Driver-side only — used by parity tests, never in the engine's hot
    path.
    """
    if sentinel is not None and sentinel in tokens:
        tokens = tokens[: tokens.index(sentinel)]
    return spark.createDataFrame([(t,) for t in tokens], "token string")
