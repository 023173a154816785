#!/usr/bin/env python
"""Generate a 10×-scaled copy of the driver's sf0.1 tables for scaling
measurements (SCALE.md's measured-exponent column; VERDICT r3 task 6).

NOT a TPC-H dbgen reimplementation — it replicates the driver's own
sf0.1 data 10× with per-replica key offsets, chosen so every query's
SHAPE scales the way real growth would:

- fact tables (lineitem, orders, events): keys offset per replica;
  dimension keys (custkey, partkey, suppkey, user_id) are left alone,
  so joins fan out 10× against the same dims — matching how a fixed
  customer base generates more orders over time. Event timestamps
  shift +r hours per replica so time windows see denser, not merely
  duplicated, traffic.
- documents: every token gets a per-replica prefix — vocabularies of
  different replicas are DISJOINT, so the near-dup structure of each
  replica is preserved exactly while no cross-replica dup pairs
  appear. Dup density (pairs per doc) stays constant, which is the
  representative shape: a 10× corpus with 10× the dup pairs, not a
  100× quadratic clique blowup of artificial self-similarity.
- embeddings: vec_id offset, a tiny deterministic per-replica
  perturbation keeps vectors distinct (no degenerate cosine ties).

Usage::

    python scripts/gen_scale_data.py [src_sf_dir] [dst_dir] [factor]

defaults: /root/testdata/sf0.1 → /root/repo/.scaledata/sf1, 10×.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from multithreaded_mapreduce_spark.session import get_spark  # noqa: E402

DIMS = ("region", "nation", "customer", "supplier", "part")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    spark = get_spark("gen-scale-data")

    def copy(table: str) -> None:
        spark.read.parquet(f"{src}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{table}.parquet")

    for t in DIMS:
        copy(t)

    def replicate(table: str, transform) -> None:
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = [transform(base, r) for r in range(factor)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # 16 files → splittable scans at the scaled volume
        out.repartition(16).write.mode("overwrite").parquet(
            f"{dst}/{table}.parquet"
        )

    okey_span = 10_000_000  # > max o_orderkey at any local sf

    replicate(
        "orders",
        lambda df, r: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(r * okey_span)
        ),
    )
    replicate(
        "lineitem",
        lambda df, r: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * okey_span)
        ),
    )
    replicate(
        "events",
        lambda df, r: df.withColumn(
            "event_id", F.col("event_id") + F.lit(r * okey_span)
        ).withColumn("ts", F.col("ts") + F.make_interval(hours=F.lit(r))),
    )
    replicate(
        "documents",
        lambda df, r: df.withColumn("doc_id", F.col("doc_id") + F.lit(r * okey_span))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0),
                    lambda t: F.concat(F.lit(f"r{r}q"), t),
                ),
                " ",
            ),
        )
        .withColumn("n_chars", F.length("text")),
    )
    replicate(
        "embeddings",
        lambda df, r: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(r * okey_span)
        ).withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x + (F.lit(r) * (i % 7 - 3)).cast("float") * F.lit(0.001)
                ).cast("float"),
            ),
        ),
    )
    for t in DIMS + ("orders", "lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t:12s} {n:>10,d} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
