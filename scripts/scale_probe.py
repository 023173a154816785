#!/usr/bin/env python
"""Measure how the heaviest queries actually scale: run each at the
driver's sf0.1 and at the generated 10× copy (scripts/gen_scale_data.py)
and report the empirical scaling exponent

    exp = log10(t_sf1 / t_sf0.1)

(1.0 = perfectly linear in data volume, < 1 = fixed overhead amortizing,
> 1 = super-linear — a plan that will NOT survive 100×). Feeds the
measured column in SCALE.md (VERDICT r3 task 6).

Usage::

    python scripts/scale_probe.py [queries...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multithreaded_mapreduce_spark.plans.caching import (  # noqa: E402
    release_result_memos,
    release_tracked,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries  # noqa: E402
from multithreaded_mapreduce_spark.session import get_spark  # noqa: E402

#: the heaviest shapes from the bench set + the round-3/4 additions
DEFAULT_PROBE = (
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_verified",
    "join_chain_revenue",
    "events_zscore_anomalies",
    "q7_volume_shipping",
    "kmeans_lloyd",
    "pack_training_sequences",
    "token_triangle_counts",
    "wordcount",
    # r4 heavy additions
    "dedup_exact_substr",
    "winnowing_fingerprints",
    "bigram_logprob_scores",
    "embedding_top_pc",
    "pretraining_funnel_report",
    # r5: every query whose sf0.1 min exceeds 1 s (VERDICT r4 task 6)
    "knn_ivf_exact_ann",
    "doc_quality_composite",
    "media_frame_dedup",
    "knn_cosine_bruteforce",
    "bpe_learn_merges",
    # r5 heavies
    "knn_mmr_rerank",
    "dedup_containment",
    "bpe_encode_corpus",
    "quality_weighted_sample",
    # r6: tokenizer→packing closure
    "bpe_encode_documents",
    "pack_bpe_sequences",
    # r6: redaction + leakage-proof split (and the components operator
    # they exposed as a never-probed >1 s blind spot)
    "pii_redact_documents",
    "cluster_aware_split",
    "dedup_components",
    "dedup_embedding_components",
    "script_char_profile",
    "corpus_snapshot_diff",
    "packing_efficiency_report",
    "dedup_cluster_keep_best",
    # r7: PQ / mining / calibration / novelty + the new reports
    "knn_pq_ann",
    "hard_negative_mining",
    "dedup_threshold_sweep",
    "shingle_novelty_scores",
    "tokenizer_fertility_report",
    "embedding_outlier_report",
    "kfold_leakage_report",
    "token_frequency_spectrum",
)

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_BIG = os.environ.get("SPARK_GRAFT_BIG_SF_DIR", "/root/repo/.scaledata/sf1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))


def time_query(spark, builder, sf_dir: str) -> float:
    runs = []
    for _ in range(N_RUNS):
        release_tracked()
        release_result_memos()  # exponents must be cold, not memo hits
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def main() -> int:
    names = sys.argv[1:] or list(DEFAULT_PROBE)
    if not os.path.isdir(SF_BIG):
        print(f"missing {SF_BIG}; run scripts/gen_scale_data.py first", file=sys.stderr)
        return 1
    spark = get_spark("scale-probe")
    queries = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    from multithreaded_mapreduce_spark.operators.bucketing import (
        ensure_bucketed_tables,
    )

    ensure_bucketed_tables(spark, SF_SMALL)
    ensure_bucketed_tables(spark, SF_BIG)
    out = {}
    for name in names:
        b = queries[name].builder
        t_small = time_query(spark, b, SF_SMALL)
        t_big = time_query(spark, b, SF_BIG)
        exp = math.log10(t_big / t_small)
        out[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "exponent": round(exp, 3),
        }
        print(
            f"{name:32s} {t_small:7.2f}s -> {t_big:7.2f}s   exp={exp:5.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
