"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 last row).

The engine's registered queries deliberately keep hot paths JVM-side
(zero row-at-a-time Python UDFs); these tests prove the full Python
extension surface WORKS when a user genuinely needs it, and that each
flavor agrees with the equivalent built-in plan:

* Arrow-optimized scalar Python UDF (`useArrow=True`) — batch-
  serialized, not row-pickled.
* pandas grouped-aggregate UDAF (`@pandas_udf` over a group Series).
* Python UDTF (table function) applied per input row via LATERAL join.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.sources.tables import load_table


def test_arrow_scalar_udf_matches_builtin(spark, sf_dir):
    @F.udf("double", useArrow=True)
    def py_margin(price: float, discount: float) -> float:
        return price * (1.0 - discount)

    li = load_table(spark, sf_dir, "lineitem").limit(500)
    got = li.select(py_margin("l_extendedprice", "l_discount").alias("m")).collect()
    want = li.select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("m")
    ).collect()
    assert all(math.isclose(g.m, w.m, rel_tol=1e-12) for g, w in zip(got, want))


def test_pandas_grouped_agg_udaf_matches_sql_formulation(spark, sf_dir):
    import numpy as np

    @F.pandas_udf("double")
    def gmean(v: pd.Series) -> float:
        return float(np.exp(np.log(v[v > 0]).mean()))

    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: r.g
        for r in ev.groupBy("event_type").agg(gmean("value").alias("g")).collect()
    }
    want = {
        r.event_type: r.g
        for r in ev.filter(F.col("value") > 0)
        .groupBy("event_type")
        .agg(F.exp(F.avg(F.log("value"))).alias("g"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_python_udtf_lateral_join_matches_explode(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, t in enumerate(text.split()):
                yield i, t

    spark.udtf.register("tokenize_udtf", Tokenize)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )
    want = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
        ).alias("pos", "token"),
    )
    cols = ["doc_id", "pos", "token"]
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    w = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert g == w
