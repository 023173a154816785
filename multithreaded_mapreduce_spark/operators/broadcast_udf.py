"""Broadcast-variable dimension lookup inside a vectorized Pandas UDF.

Demonstrates the one remaining join strategy the engine hadn't
exercised: shipping a small dimension to every executor as a broadcast
VARIABLE (not a broadcast join) and resolving it inside an
Arrow-batched ``pandas_udf`` with a pandas ``.map``. This is the
pattern for lookups that aren't expressible as equi-joins — tokenizer
vocabularies, label maps, per-entity model parameters — where the
lookup feeds further Python-side feature code.

The oracle is the equivalent broadcast JOIN, proving the UDF path is
value-identical to the relational one. Scale notes: the dict rides the
broadcast (sent once per executor, not per task); the UDF is
Arrow-batched (10-100× over row-at-a-time Python UDFs). For a lookup
THIS simple a real pipeline should use the broadcast join — the
docstring of record: UDFs are the slow path, this operator exists to
keep that path correct and tested.

Extension surface (SURVEY.md §2.2 UDF row): the reference's only
scalar function is clean_word (reference 1.cpp:60-68), which composes
from built-ins; UDFs appear in this engine only on Arrow-batched
paths like this one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.numeric import davg
from ..plans.registry import register
from ..sources.tables import load_table


@register(
    "broadcast_lookup_udf",
    oracle="""
SELECT n.n_name AS nation,
       count(*) AS n_customers,
       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(c.c_acctbal), 4)
         AS avg_acctbal
FROM customer c
JOIN (SELECT n_nationkey, max(n_name) AS n_name
      FROM nation GROUP BY n_nationkey) n
  ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation
""",
    description="Customer stats by nation name, with the nationkey→name "
    "dimension resolved by a broadcast-variable dict inside an "
    "Arrow-batched pandas_udf instead of a join — the pattern for "
    "non-equi-join lookups (vocabularies, label maps) feeding Python "
    "feature code. A dict lookup is single-valued by construction, so "
    "the dimension is deduplicated deterministically (max name per key) "
    "BEFORE the map is built, and the oracle joins the identically "
    "deduped relation — a duplicate dimension key must not fan rows out "
    "(caught by the corrupted-nation sweep: a plain dict comprehension "
    "kept whichever duplicate collected last).",
    tags=("udf", "broadcast", "pipeline"),
)
def broadcast_lookup_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation_map = {
        int(r.n_nationkey): r.n_name
        for r in load_table(spark, sf_dir, "nation")
        .groupBy("n_nationkey")
        .agg(F.max("n_name").alias("n_name"))
        .collect()
    }
    bc = spark.sparkContext.broadcast(nation_map)

    @pandas_udf("string")
    def nation_name(keys: pd.Series) -> pd.Series:
        return keys.map(bc.value)

    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(nation_name("c_nationkey").alias("nation"), "c_acctbal")
        # a NULL or orphan nationkey maps to NULL — drop it, because the
        # oracle (and the relational twin) is an INNER join: a lookup
        # miss must eliminate the row, not create a NULL group (caught
        # by the corrupted-customer adversarial sweep)
        .filter(F.col("nation").isNotNull())
        .groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n_customers"), davg("c_acctbal").alias("avg_acctbal"))
        .orderBy("nation")
    )
