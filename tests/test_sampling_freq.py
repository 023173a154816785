"""Property tests for the sampling/split and frequency/sketch operators
— the invariants their oracles can't state (determinism under
repartitioning, CMS over-count-only, split stability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.plans.registry import all_queries

Q = all_queries()


def test_train_test_split_is_partition_independent(spark, sf_dir):
    """The same doc gets the same split however the input is partitioned —
    the property that makes the split reproducible on any cluster size."""
    df = Q["train_test_split"].builder(spark, sf_dir)
    base = {r.doc_id: r.split for r in df.collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    rekeyed = docs.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "cccd", "train"
        ).otherwise("test").alias("split"),
    )
    assert {r.doc_id: r.split for r in rekeyed.collect()} == base


def test_train_test_split_fraction_near_80_20(spark, sf_dir):
    counts = {
        r.split: r.n
        for r in Q["train_test_split"].builder(spark, sf_dir)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    assert 0.68 <= counts.get("train", 0) / total <= 0.9


def test_stratified_sample_exact_k_per_stratum(spark, sf_dir):
    df = Q["stratified_sample"].builder(spark, sf_dir)
    per = {r.source: r.n for r in df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    avail = {r.source: r.n for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in per.items():
        assert n == min(10, avail[src]), (src, n, avail[src])
    assert set(per) == set(avail)


def test_cms_never_undercounts_and_is_tight_enough(spark, sf_dir):
    """CMS estimates dominate true counts (min of over-counting rows) and
    the d=4 min keeps the worst overestimate within eps*N of truth."""
    exact_df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = {r.token: r.cnt for r in exact_df.collect()}
    n_stream = sum(exact.values())
    est = {r.token: r.cms_count for r in Q["heavy_hitters_cms"].builder(spark, sf_dir).collect()}
    assert set(est) == set(exact)
    for tok, c in exact.items():
        assert est[tok] >= c, f"CMS undercounted {tok}: {est[tok]} < {c}"
        # classic CMS bound with w=16: overshoot <= ~2N/w w.h.p.
        assert est[tok] - c <= 2 * n_stream / 16, (tok, est[tok], c)


def test_heavy_hitters_exact_threshold(spark, sf_dir):
    df = Q["heavy_hitters_exact"].builder(spark, sf_dir)
    rows = df.collect()
    assert rows, "threshold should admit hitters at every sf on this corpus"
    assert all(r.freq > 1 / 30 for r in rows)
    # frequencies of the reported hitters are consistent with counts
    total_est = {round(r.cnt / r.freq) for r in rows}
    assert len(total_est) == 1  # one common denominator: the stream size


def test_broadcast_udf_matches_join(spark, sf_dir):
    """The pandas_udf broadcast-dict lookup is value-identical to the
    equivalent broadcast join."""
    udf_rows = {
        (r.nation, r.n_customers, r.avg_acctbal)
        for r in Q["broadcast_lookup_udf"].builder(spark, sf_dir).collect()
    }
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    from multithreaded_mapreduce_spark.functions.numeric import davg

    join_rows = {
        (r.nation, r.n_customers, r.avg_acctbal)
        for r in cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"), davg("c_acctbal").alias("avg_acctbal"))
        .collect()
    }
    assert udf_rows == join_rows


def test_hll_rollup_tracks_exact_distinct(spark, sf_dir):
    """The rollup's self-verifying output: exact distinct twin matches
    an independent countDistinct, and both bound assertions (merged
    estimate ≈ direct estimate; estimate within 5% of exact) hold."""
    rows = {
        r.event_type: r
        for r in Q["hll_distinct_users_rollup"].builder(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.n_users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, row in rows.items():
        assert row.exact_distinct_users == exact[et], et
        assert row.merge_within_1pct, f"{et}: union-of-dailies drifted from direct"
        assert row.hll_within_5pct, f"{et}: HLL estimate out of 5% band"


def test_weighted_sample_prefers_heavy_orders(spark, sf_dir):
    """The exponential race with weight=o_totalprice must pull the
    sample's mean price well above the population mean."""
    sample = Q["weighted_sample_orders"].builder(spark, sf_dir).collect()
    assert len(sample) == 100
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pop_mean = orders.agg(F.avg("o_totalprice")).first()[0]
    samp_mean = sum(r.o_totalprice for r in sample) / len(sample)
    assert samp_mean > pop_mean, f"sample mean {samp_mean} <= pop mean {pop_mean}"


def test_split_leakage_audit_invariants(spark, sf_dir):
    """Leak counts are bounded by the test-side population, and an exact
    text match implies a normalized match (identical text ⇒ identical
    distinct-token set), so exact_leaked <= normalized_leaked."""
    rows = Q["split_leakage_audit"].builder(spark, sf_dir).collect()
    assert rows
    from pyspark.sql import functions as F

    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert sum(r.n_train + r.n_test for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.exact_leaked <= r.normalized_leaked <= r.n_test, r


def test_temperature_allocation_upsamples_low_resource(spark, sf_dir):
    """alpha < 1 gives every source a q ABOVE its natural share when it
    is small and BELOW when it is large (the up-sampling property);
    probabilities sum to 1 and allocations respect availability."""
    rows = Q["temperature_mix_allocation"].builder(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    qsum = sum(r.q for r in rows)
    assert abs(qsum - 1.0) < 1e-4, qsum
    for r in rows:
        nat = r.n_docs / total
        if nat < 1.0 / len(rows):
            assert r.q >= nat - 1e-9, (r.source, r.q, nat)
        assert 0 <= r.alloc_docs <= r.n_docs


def test_quality_weighted_sample_matches_independent_recompute(spark, sf_dir):
    """The admission set must equal a from-scratch Python recompute
    (hashlib md5 prefix vs score/100) over the composite's scores —
    proving the deterministic-uniform contract independently of the
    DuckDB oracle."""
    import hashlib

    Q = all_queries()
    scored = {
        r.doc_id: r.quality_score
        for r in Q["doc_quality_composite"].builder(spark, sf_dir).collect()
    }
    want = {
        d
        for d, s in scored.items()
        if int(hashlib.md5(str(d).encode()).hexdigest()[:13], 16) / float(1 << 52)
        < s / 100.0
    }
    got = {
        r.doc_id
        for r in Q["quality_weighted_sample"].builder(spark, sf_dir).collect()
    }
    assert got == want
    assert 0 < len(got) < len(scored)  # neither empty nor everything


def test_cluster_aware_split_never_splits_near_dup_pairs(spark, sf_dir):
    """The point of the operator: every jaccard>=0.8 pair must land in
    ONE split (the doc-level md5 split provably strands some pair
    across the boundary on this corpus — the leakage split_leakage_
    audit exists to catch); the split covers every non-NULL doc exactly
    once and both labels actually occur."""
    from multithreaded_mapreduce_spark.operators.dedup import (
        SPLIT_HEX_DIGITS,
        SPLIT_TRAIN_DEN,
        SPLIT_TRAIN_NUM,
        _spark_hex_id,
    )
    from pyspark.sql import functions as F

    Q = all_queries()
    split = {
        r.doc_id: r.split
        for r in Q["cluster_aware_split"].builder(spark, sf_dir).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in Q["dedup_jaccard_pairs"].builder(spark, sf_dir).collect()
    ]
    assert pairs, "fixture lost its near-dup pairs"
    assert all(split[a] == split[b] for a, b in pairs)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_ids = docs.filter(F.col("doc_id").isNotNull()).select("doc_id").distinct().count()
    assert len(split) == n_ids
    assert set(split.values()) <= {"train", "holdout"}
    # negative control: the naive doc-keyed split DOES strand at least
    # one near-dup pair across the boundary on this corpus
    naive_rows = (
        docs.filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.when(
                _spark_hex_id(
                    F.concat(F.lit("split:"), F.col("doc_id").cast("string")),
                    SPLIT_HEX_DIGITS,
                )
                * SPLIT_TRAIN_DEN
                < SPLIT_TRAIN_NUM * (16 ** SPLIT_HEX_DIGITS),
                F.lit("train"),
            )
            .otherwise(F.lit("holdout"))
            .alias("split"),
        )
        .collect()
    )
    naive = {r.doc_id: r.split for r in naive_rows}
    assert any(naive[a] != naive[b] for a, b in pairs), (
        "corpus no longer demonstrates doc-level leakage — pick a wider "
        "fixture or drop the control"
    )


def test_pii_redaction_matches_python_reference(spark, tmp_path):
    """Planted-PII fixture: the redacted-text certificate must equal a
    transparent Python re.sub reference applied in the same pattern
    order, and the counts must see every planted match."""
    import hashlib
    import re as pyre

    from multithreaded_mapreduce_spark.operators.textstats import PII_PATTERNS

    rows = [
        (1, "contact jane.doe@example.com or 555-123-4567 today", "en", "s0"),
        (2, "server 192.168.1.1 ssn 123-45-6789 email a@b.io", "en", "s0"),
        (3, "no pii here at all", "en", "s0"),
        (4, None, "en", "s0"),
        (5, "double a@b.co c@d.org and 10.0.0.1 10.0.0.2", "en", "s0"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    Q = all_queries()
    got = {
        r.doc_id: r
        for r in Q["pii_redact_documents"].builder(spark, str(tmp_path)).collect()
    }
    for doc_id, text, _, _ in rows:
        r = got[doc_id]
        if text is None:
            assert r.redacted_md5 is None and r.redacted_len is None
            continue
        red = text
        counts = {}
        for k, p in PII_PATTERNS.items():
            counts[k] = len(pyre.findall(p, text))
            red = pyre.sub(p, f"<{k.upper()}>", red)
        assert r.redacted_md5 == hashlib.md5(red.encode()).hexdigest(), doc_id
        assert r.redacted_len == len(red)
        for k in PII_PATTERNS:
            assert getattr(r, f"n_{k}") == counts[k], (doc_id, k)


def test_kfold_assignment_deterministic_balanced_and_stratified(spark, sf_dir):
    """Every non-NULL-id doc gets exactly one fold per (doc_id, source)
    row, folds are in [0, K), the assignment is bit-stable across
    rebuilds, and within each source the fold histogram is roughly
    uniform (md5-uniform draw — no fold may be empty-or-hot beyond a
    generous band on the fixture sizes)."""
    from collections import Counter

    from multithreaded_mapreduce_spark.operators.sampling import KFOLD_K

    Q = all_queries()
    a = Q["stratified_kfold_assignment"].builder(spark, sf_dir).collect()
    b = Q["stratified_kfold_assignment"].builder(spark, sf_dir).collect()
    assert [(r.doc_id, r.source, r.fold) for r in a] == [
        (r.doc_id, r.source, r.fold) for r in b
    ]
    assert all(0 <= r.fold < KFOLD_K for r in a)
    per_source = {}
    for r in a:
        per_source.setdefault(r.source, Counter())[r.fold] += 1
    total = Counter()
    for c in per_source.values():
        total.update(c)
    n = sum(total.values())
    assert n == len(a)
    # global uniformity: each fold within [0.4x, 1.8x] of the fair share
    fair = n / KFOLD_K
    for k in range(KFOLD_K):
        assert 0.4 * fair <= total[k] <= 1.8 * fair, (k, total[k], fair)
    # the fold depends only on doc_id: a doc in two sources folds equally
    by_doc = {}
    for r in a:
        by_doc.setdefault(r.doc_id, set()).add(r.fold)
    assert all(len(s) == 1 for s in by_doc.values())


def test_kfold_leakage_ties_out_against_pairs_and_assignment(spark, sf_dir):
    """The one-row report must equal a manual recount: fold(doc) from
    the registered assignment, pair set from the registered jaccard
    relation — and the leak rate of a hash fold on a pair set it is
    independent of sits near (k-1)/k."""
    from multithreaded_mapreduce_spark.operators.sampling import KFOLD_K

    Q = all_queries()
    rep = Q["kfold_leakage_report"].builder(spark, sf_dir).collect()[0]
    folds = {
        r.doc_id: r.fold
        for r in Q["stratified_kfold_assignment"].builder(spark, sf_dir).collect()
    }
    pairs = Q["dedup_jaccard_pairs"].builder(spark, sf_dir).collect()
    n_cross = sum(1 for p in pairs if folds[p.doc_a] != folds[p.doc_b])
    assert rep.n_pairs == len(pairs)
    assert rep.n_cross_fold == n_cross
    if len(pairs) == 0:
        assert rep.leak_rate is None
    else:
        assert abs(rep.leak_rate - n_cross / len(pairs)) < 1e-6
        if len(pairs) >= 100:
            expected = (KFOLD_K - 1) / KFOLD_K
            assert 0.55 * expected <= rep.leak_rate <= 1.0


def test_token_frequency_spectrum_replays_a_counter(spark, sf_dir):
    """Exact replay against collections.Counter over the collected
    token stream: per-bucket distinct-token and occurrence totals, and
    global conservation (Σ n_tokens = vocab, Σ n_occurrences = stream
    length)."""
    from collections import Counter

    Q = all_queries()
    rows = Q["token_frequency_spectrum"].builder(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    tf = Counter()
    for r in docs:
        if r.text:
            tf.update(t for t in r.text.split() if t)
    want = {}
    for _tok, cnt in tf.items():
        b = cnt.bit_length() - 1
        w = want.setdefault(b, [0, 0])
        w[0] += 1
        w[1] += cnt
    got = {r.freq_bucket: r for r in rows}
    assert set(got) == set(want)
    for b, (n_tokens, n_occ) in want.items():
        assert got[b].n_tokens == n_tokens
        assert got[b].n_occurrences == n_occ
        assert got[b].bucket_min == 1 << b
    assert sum(r.n_tokens for r in rows) == len(tf)
    assert sum(r.n_occurrences for r in rows) == sum(tf.values())


def test_curriculum_schedule_is_a_staged_permutation(spark, sf_dir):
    """positions form the exact permutation 1..n; stages are
    non-decreasing along the schedule; within a stage the order is the
    (md5 shuffle key, doc_id) replay — i.e. the two-level prefix-sum
    rank equals a straight global sort."""
    import hashlib

    from multithreaded_mapreduce_spark.operators.pipeline_prep import (
        _CURR_DIGITS,
        CURRICULUM_STAGE_TOKENS,
    )

    Q = all_queries()
    rows = Q["curriculum_length_schedule"].builder(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r.position)
    for a, b in zip(by_pos, by_pos[1:]):
        assert a.stage <= b.stage

    def u(doc_id):
        return int(hashlib.md5(f"curr:{doc_id}".encode()).hexdigest()[:_CURR_DIGITS], 16)

    want = sorted(rows, key=lambda r: (r.stage, u(r.doc_id), r.doc_id))
    assert [r.doc_id for r in by_pos] == [r.doc_id for r in want]
    # stage thresholds replay on the longest version per doc_id
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = {}
    for r in docs:
        if r.doc_id is None:
            continue
        nt = len([t for t in (r.text or "").split() if t])
        toks[r.doc_id] = max(toks.get(r.doc_id, 0), nt)
    lo, hi = CURRICULUM_STAGE_TOKENS
    for r in rows:
        nt = toks[r.doc_id]
        assert r.stage == (0 if nt < lo else 1 if nt < hi else 2), (r.doc_id, nt)


def test_token_budget_epoch_plan_invariants(spark, sf_dir):
    """Allocation shares sum to ~1, allocated tokens sum to within
    |sources| of the budget (per-source floors), epochs = alloc /
    available, and the temperature actually up-samples: the scarcest
    source's epoch factor strictly exceeds the most abundant's."""
    from multithreaded_mapreduce_spark.operators.sampling import (
        EPOCH_PLAN_TOKEN_BUDGET,
    )

    rows = Q["token_budget_epoch_plan"].builder(spark, sf_dir).collect()
    assert rows
    live = [r for r in rows if r.n_tokens > 0]
    assert abs(sum(r.q for r in rows) - 1.0) < 1e-4
    total_alloc = sum(r.alloc_tokens for r in rows)
    assert EPOCH_PLAN_TOKEN_BUDGET - len(rows) <= total_alloc <= EPOCH_PLAN_TOKEN_BUDGET
    for r in live:
        assert abs(r.epochs - round(r.alloc_tokens / r.n_tokens, 4)) < 1e-9
    scarcest = min(live, key=lambda r: r.n_tokens)
    biggest = max(live, key=lambda r: r.n_tokens)
    if scarcest.n_tokens < biggest.n_tokens:
        assert scarcest.epochs > biggest.epochs
