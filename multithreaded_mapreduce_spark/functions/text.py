"""Scalar text functions — all built-in Column expressions (JVM-side,
codegen-friendly); zero Python UDFs.

``clean_word`` reproduces the reference's only scalar function
(``clean_word``, reference ``1.cpp:60-68`` / ``project.cpp:49-57``):
delete every byte outside ASCII ``[0-9A-Za-z]`` (no separator left
behind — ``"c++" -> "c"``, ``"it’s" -> "its"``) and lowercase the rest.
The character class is kept ASCII-explicit (NOT ``\\W``, which is
Unicode-aware in Java regex and would diverge from C ``isalnum``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ASCII-explicit "not alphanumeric" — must match C isalnum semantics.
NON_ALNUM = "[^0-9A-Za-z]"


def clean_word(col: Column | str) -> Column:
    """lowercase + strip non-[0-9A-Za-z] bytes (reference 1.cpp:60-68)."""
    return F.lower(F.regexp_replace(col, NON_ALNUM, ""))


def tokenize(col: Column | str, pattern: str = r"\s+") -> Column:
    """Split text into an array of whitespace-delimited tokens
    (reference scan loops, 1.cpp:243 / 1.cpp:260)."""
    return F.split(col, pattern)
