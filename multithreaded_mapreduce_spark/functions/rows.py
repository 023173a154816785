"""Literal small-result relations without the Python-RDD round trip.

``spark.createDataFrame(rows, schema)`` parallelizes the rows through
``applySchemaToPythonRDD``: one Python-RDD partition per default-
parallelism slot, each of whose tasks spins up (or checks out) a
Python worker just to deserialize a handful of driver-computed rows.
Profiled at 32 cores (r10 optimization round): two such stages cost
~6 executor-seconds EACH in bpe_learn_merges to ship five rows.

For the driver-computed small relations this engine legitimately
produces (BPE merge tables, power-iteration loadings — the bounded
MLlib-style driver state), :func:`literal_rows_df` builds the same
rows as a pure-JVM plan instead: one projection of literal structs
exploded over ``spark.range(1)``. No Python workers, no RDD, one
0-shuffle stage.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def literal_rows_df(
    spark: SparkSession, rows: Iterable[Sequence], schema: str
) -> DataFrame:
    """DataFrame of ``rows`` (sequences matching ``schema``, a DDL
    string) as a literal-values plan. Intended for SMALL relations
    (bounded driver state: tens to a few thousand rows); every value
    is embedded in the plan as a typed literal."""
    st = StructType.fromDDL(schema)
    rows = list(rows)
    # loud failure past the documented envelope (ADVICE r10): a caller
    # shipping an unbounded relation through plan literals would bloat
    # the driver and every analyzer walk instead of erroring
    if len(rows) > 10_000:
        raise ValueError(
            f"literal_rows_df got {len(rows)} rows; it embeds values as "
            "plan literals and is bounded at 10k — use createDataFrame "
            "or a real source for larger relations"
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    arr_type = f"array<{st.simpleString()}>"
    arr = F.array(*structs) if structs else F.array().cast(arr_type)
    return (
        spark.range(1)
        .select(F.explode(arr.cast(arr_type)).alias("r"))
        .select("r.*")
    )
