"""Semantic invariants for the corpus-curation / ML-prep operators
added in round 3 (all three are also oracle-hash-checked in
test_oracle_parity.py — these tests pin properties a value hash
can't express, like partition-of-the-corpus and inertia descent)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from multithreaded_mapreduce_spark.operators.vectors import (
    KMEANS_ITERS,
    KMEANS_K,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries
from multithreaded_mapreduce_spark.sources.tables import load_table

Q = all_queries()


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    """Cluster sizes sum to the non-null vector count, ids ⊂ [0, K)."""
    out = Q["kmeans_lloyd"].builder(spark, sf_dir).collect()
    n_vecs = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .count()
    )
    assert sum(r.n_members for r in out) == n_vecs
    assert all(0 <= r.cluster < KMEANS_K for r in out)
    assert all(r.avg_sq_dist >= 0 for r in out)


def test_kmeans_update_does_not_increase_inertia(spark, sf_dir):
    """Lloyd's step is monotone: mean squared distance after the
    centroid update (ITERS=2 report) must not exceed the seed
    assignment's (a one-iteration run). Exact-decimal sums make this
    hold without a float tolerance on the true inertias — but each
    reported avg_sq_dist is rounded to 4 decimals, so reconstructing
    total inertia as Σ avg·n carries up to 0.5e-4·n_members error per
    cluster per run; the slack covers that reconstruction error for
    both runs (1e-4 · total members), not any algorithmic drift."""
    import multithreaded_mapreduce_spark.operators.vectors as vx

    def totals() -> tuple[float, int]:
        rows = vx.kmeans_lloyd(spark, sf_dir).collect()
        return (
            sum(r.avg_sq_dist * r.n_members for r in rows),
            sum(r.n_members for r in rows),
        )

    after, n_after = totals()
    orig = vx.KMEANS_ITERS
    vx.KMEANS_ITERS = 1
    try:
        before, _ = totals()
    finally:
        vx.KMEANS_ITERS = orig
    assert KMEANS_ITERS == 2  # the registered config this test assumes
    assert after <= before + 1e-4 * n_after, (after, before)


def test_ccnet_buckets_partition_each_language(spark, sf_dir):
    """head+middle+tail counts per language equal that language's
    tokenized-document count, and tercile buckets are balanced up to
    score ties (each bucket within ±25% of n/3 on this corpus)."""
    out = Q["ccnet_perplexity_buckets"].builder(spark, sf_dir).collect()
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike(r"\S"))
        .groupBy("lang")
        .count()
        .collect()
    )
    expected = {r.lang: r["count"] for r in docs}
    got: dict[str, dict[str, int]] = {}
    for r in out:
        got.setdefault(r.lang, {})[r.bucket] = r.n_docs
    assert {k: sum(v.values()) for k, v in got.items()} == expected
    for lang, buckets in got.items():
        assert set(buckets) == {"head", "middle", "tail"}, (lang, buckets)
        third = expected[lang] / 3
        for b, n in buckets.items():
            assert abs(n - third) <= max(2.0, 0.25 * third), (lang, b, n, third)
    # head scores strictly above tail scores on average
    for lang, buckets in got.items():
        scores = {r.bucket: r.avg_score for r in out if r.lang == lang}
        assert scores["head"] >= scores["middle"] >= scores["tail"], (lang, scores)


def test_zipf_fit_matches_numpy_ols(spark, sf_dir):
    """The regr_slope/intercept/r2 triple equals an independent OLS on
    the same (ln rank, ln freq) points — guards against swapped x/y
    arguments, off-by-one ranks, and tie-order drift."""
    from multithreaded_mapreduce_spark.operators.textstats import ZIPF_TOP_K

    row = Q["zipf_vocab_fit"].builder(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda t: F.length(t) > 0)
        ).alias("token")
    )
    v = tok.groupBy("token").count().orderBy(F.desc("count"), "token").collect()
    top = v[:ZIPF_TOP_K]
    assert row.k_used == len(top)
    assert row.vocab_size == len(v)
    assert row.total_tokens == sum(r["count"] for r in v)
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(r["count"]) for r in top]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx
    intercept = my - slope * mx
    syy = sum((y - my) ** 2 for y in ys)
    r2 = (sxy * sxy) / (sxx * syy) if syy > 0 else None
    assert abs(row.zipf_slope - slope) < 1e-3, (row.zipf_slope, slope)
    assert abs(row.zipf_intercept - intercept) < 1e-3
    if r2 is not None:
        assert abs(row.fit_r2 - r2) < 1e-3


def test_char_entropy_bounds_and_gate(spark, sf_dir, tmp_path):
    """Entropy is bounded by log2(37) (uniform over the alphabet), the
    shares are in [0, 1], and the gate catches a planted degenerate
    document while passing natural text."""
    rows = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # one char: H = 0
        (2, "The quick brown fox jumps over the lazy dog, "
            "while 42 other animals watch from the shade of 7 old oaks."),
        (3, "!!!???...///"),  # nothing in the alphabet: excluded
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in Q["char_entropy_quality"].builder(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3}, out
    assert out[1].char_entropy == 0.0 and out[1].passes_entropy == 0
    assert out[1].top_char_share == 1.0
    assert out[2].passes_entropy == 1
    # no alphabet chars: NULL metrics, gate fails
    assert out[3].n_alpha == 0 and out[3].char_entropy is None
    assert out[3].passes_entropy == 0
    for r in [out[1], out[2]]:
        assert 0.0 <= r.char_entropy <= math.log2(37) + 1e-9
        assert 0.0 < r.top_char_share <= 1.0
        assert 0.0 < r.alpha_coverage <= 1.0
        assert r.n_alpha > 0


def test_bigram_lm_separates_shuffled_gibberish(spark, tmp_path):
    """A corpus of repeated natural word order gives its in-order
    documents high bigram scores; a same-vocabulary document with
    shuffled order scores strictly lower (its bigrams are rare under
    the corpus model), while unigram scoring cannot tell them apart.
    Also: n_bigrams = n_tokens - 1 and scores are <= 0."""
    base = "the cat sat on the mat and the dog slept"
    rows = [(i, base) for i in range(1, 9)]
    rows.append((9, "mat the dog on sat the cat slept and the"))  # shuffled
    rows.append((10, "solo"))  # single token: no bigrams
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in Q["bigram_logprob_scores"].builder(spark, str(tmp_path)).collect()
    }
    assert 10 not in out  # no bigrams -> absent
    assert set(out) == set(range(1, 10))
    for r in out.values():
        assert r.n_bigrams == 9  # 10 tokens each
        assert r.avg_bigram_logprob <= 0.0
    assert out[9].avg_bigram_logprob < out[1].avg_bigram_logprob - 0.5, (
        out[9].avg_bigram_logprob,
        out[1].avg_bigram_logprob,
    )


def test_top_pc_recovers_planted_direction(spark, tmp_path):
    """On a corpus whose variance is concentrated along a planted
    direction, 3 power-iteration rounds recover it: |cos(pc, planted)|
    is near 1 and the loading vector is unit-norm."""
    dim = 16
    planted = [1.0 if i % 2 == 0 else -1.0 for i in range(dim)]
    nrm = math.sqrt(sum(c * c for c in planted))
    planted = [c / nrm for c in planted]
    rows = []
    for j in range(200):
        scale = (j % 21) - 10  # symmetric spread along the planted axis
        noise = [((j * 31 + i * 7) % 11 - 5) * 0.01 for i in range(dim)]
        rows.append(
            (j, [float(scale * planted[i] + noise[i]) for i in range(dim)], j % 3)
        )
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = Q["embedding_top_pc"].builder(spark, str(tmp_path)).collect()
    assert len(out) == dim
    v = [r.loading for r in sorted(out, key=lambda r: r.dim)]
    assert abs(math.sqrt(sum(c * c for c in v)) - 1.0) < 1e-4
    cos = sum(a * b for a, b in zip(v, planted))
    assert abs(cos) > 0.95, cos


def test_pretraining_funnel_is_monotone_and_consistent(spark, sf_dir):
    """The funnel only removes: each stage count <= the previous one;
    stage counts reconcile with the standalone gate operators at the
    same sf; surviving tokens <= the kept docs' total."""
    row = Q["pretraining_funnel_report"].builder(spark, sf_dir).collect()[0]
    assert (
        row.n_raw
        >= row.n_nonempty
        >= row.n_pass_repetition
        >= row.n_pass_entropy
        >= row.n_after_exact_dedup
        >= row.n_after_span_cut
        >= 0
    ), row
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert row.n_raw == n_docs
    # repetition stage EQUALS the standalone gate's passing set: the
    # funnel's extra non-emptiness condition is exactly the standalone
    # operator's own rlike prune, and both build from the shared
    # helpers in quality_repetition.py — drift fails this
    rep_pass = sum(
        r.passes_repetition
        for r in Q["repetition_metrics"].builder(spark, sf_dir).collect()
    )
    assert row.n_pass_repetition == rep_pass
    assert row.surviving_tokens >= 0


def test_quality_composite_agrees_with_standalone_gates(spark, sf_dir):
    """The composite's per-gate bits must EQUAL the standalone
    operators' verdicts doc-for-doc (all build from the shared
    helpers), the score is 25x the bit sum, and buckets honor the
    75/50 thresholds."""
    comp = {
        r.doc_id: r
        for r in Q["doc_quality_composite"].builder(spark, sf_dir).collect()
    }
    rep = {
        r.doc_id: r.passes_repetition
        for r in Q["repetition_metrics"].builder(spark, sf_dir).collect()
    }
    assert set(comp) == set(rep)  # same domain: docs with >= 1 token
    for did, r in comp.items():
        assert r.g_rep == rep[did], did
        assert r.quality_score == 25 * (r.g_len + r.g_rep + r.g_ent + r.g_lm)
        want = "high" if r.quality_score >= 75 else "mid" if r.quality_score >= 50 else "low"
        assert r.quality_bucket == want
    ent = {
        r.doc_id: r.passes_entropy
        for r in Q["char_entropy_quality"].builder(spark, sf_dir).collect()
    }
    for did, r in comp.items():
        assert r.g_ent == ent[did], did


def test_bpe_learn_merges_hand_computed_and_greedy(spark, tmp_path):
    """Hand-computable corpus pinning the full BPE loop: round k's pair
    counts must reflect round k-1's merges (VERDICT r4 task 4), greedy
    left-to-right non-overlap must hold on a run of repeated symbols
    ('aaab': (a,a) merges once, not twice), and the loop must stop
    early when no pairs remain.

    corpus: 'aaab' ×3, 'ab' ×2
      r1: (a,a)=6 beats (a,b)=5 → aaab=[aa,a,b]
      r2: (a,b)=3+2=5 beats (aa,a)=3 → aaab=[aa,ab], ab=[ab]
      r3: (aa,ab)=3 → aaab=[aaab]
      r4: no pairs → stop (3 rows, not 5)"""
    import duckdb

    rows = [(i, "aaab") for i in range(3)] + [(10 + i, "ab") for i in range(2)]
    spark.createDataFrame(
        [(i, t, "en", "src0") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    q = Q["bpe_learn_merges"]
    got = [tuple(r) for r in q.builder(spark, str(tmp_path)).collect()]
    want = [(1, "a", "a", 6), (2, "a", "b", 5), (3, "aa", "ab", 3)]
    assert got == want, got
    # the oracle agrees on the same fixture (the sf parity test covers
    # the real corpus; this pins the hand-computed semantics)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    assert [tuple(r) for r in con.execute(q.oracle).fetchall()] == want


def test_bpe_encode_matches_hand_computation(spark, tmp_path):
    """Same fixture as the learn test: after the 3 learned merges,
    'aaab'×3 encodes to 1 symbol and 'ab'×2 to 1 symbol — 5 symbols
    over 16 chars, vocabulary {aaab, ab}."""
    rows = [(i, "aaab") for i in range(3)] + [(10 + i, "ab") for i in range(2)]
    spark.createDataFrame(
        [(i, t, "en", "src0") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = Q["bpe_encode_corpus"].builder(spark, str(tmp_path)).collect()[0]
    assert (r.n_words, r.n_chars, r.n_symbols, r.n_vocab) == (5, 16, 5, 2)
    assert r.symbols_per_char == 5 / 16
    # corpus-level sanity at the shared fixture scale: merges can only
    # shrink the symbol stream, never below one symbol per word
    s = Q["bpe_encode_corpus"].builder(spark, "/root/testdata/sf0.001").collect()[0]
    assert s.n_words <= s.n_symbols <= s.n_chars


def test_bpe_apply_merge_edge_cases_match_python_reference(spark):
    """The fold-based merge application must implement greedy
    left-to-right non-overlapping replacement exactly — pinned against
    a transparent Python reference on the tricky shapes: overlapping
    self-pair runs, alternations, merged-symbol re-match bait."""
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_spark.operators.corpus_ops import _bpe_apply_merge

    def py_ref(syms, lhs, rhs):
        out = []
        for s in syms:
            if out and out[-1] == lhs and s == rhs:
                out[-1] = lhs + rhs
            else:
                out.append(s)
        return out

    cases = [
        (list("aaaa"), "a", "a"),      # run of 4 → [aa, aa]
        (list("aaaaa"), "a", "a"),     # run of 5 → [aa, aa, a]
        (list("ababab"), "a", "b"),    # alternation → [ab, ab, ab]
        (list("ababab"), "b", "a"),    # offset alternation → [a, ba, ba, b]
        (["ab", "a", "b"], "a", "b"),  # pre-existing symbol == merged string
        (["a"], "a", "a"),             # single symbol, no pair
        ([], "a", "b"),                # empty word
        (["x", "a", "b", "b", "a"], "a", "b"),
        (["aa", "a", "a", "aa"], "aa", "a"),  # multi-char lhs run bait
    ]
    df = spark.createDataFrame(
        [(i, syms, lhs, rhs) for i, (syms, lhs, rhs) in enumerate(cases)],
        "i int, syms array<string>, lhs string, rhs string",
    )
    rows = []
    for i, (syms, lhs, rhs) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_bpe_apply_merge(F.col("syms"), lhs, rhs).alias("m"))
            .first()["m"]
        )
        rows.append((i, got, py_ref(syms, lhs, rhs)))
    for i, got, want in rows:
        assert got == want, (i, cases[i], got, want)


def test_bpe_encode_documents_sums_to_corpus_symbols(spark, sf_dir):
    """Σ per-document encoded lengths must equal the corpus-level
    symbol count (VERDICT r6 task 2 invariant): bpe_encode_documents
    re-derives the encoding per document via the vocab join, while
    bpe_encode_corpus sums cnt·len(syms) over the trained word
    relation — sf0.001 has no NULL doc_ids, so the two populations
    coincide and the totals must agree exactly."""
    docs = Q["bpe_encode_documents"].builder(spark, sf_dir)
    agg = docs.agg(
        F.sum("n_bpe_tokens").alias("toks"), F.sum("n_words").alias("words")
    ).collect()[0]
    corpus = Q["bpe_encode_corpus"].builder(spark, sf_dir).collect()[0]
    assert agg.toks == corpus.n_symbols
    assert agg.words == corpus.n_words


def test_bpe_encode_documents_hand_fixture(spark, tmp_path):
    """Same aaab/ab fixture as the learn test: after the 3 learned
    merges every word encodes to exactly one symbol equal to itself,
    so each doc's sequence certificate is md5 of its own text."""
    import hashlib

    rows = [(i, "aaab") for i in range(3)] + [(10 + i, "ab") for i in range(2)]
    spark.createDataFrame(
        [(i, t, "en", "src0") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.sequence_md5)
        for r in Q["bpe_encode_documents"].builder(spark, str(tmp_path)).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == {
        **{i: (1, 1, md5("aaab")) for i in range(3)},
        **{10 + i: (1, 1, md5("ab")) for i in range(2)},
    }


def test_pack_bpe_sequences_conserves_tokens_and_docs(spark, sf_dir):
    """Packing is a partition of the document stream: sequence token
    totals and doc counts must conserve the per-document encoding, and
    seq_ids must be contiguous from 0 with every non-final sequence
    within one document of the 2048-token target."""
    from multithreaded_mapreduce_spark.operators.pipeline_prep import (
        MAX_SEQ_TOKENS,
    )

    enc = Q["bpe_encode_documents"].builder(spark, sf_dir)
    tot = enc.agg(
        F.sum("n_bpe_tokens").alias("toks"), F.count("*").alias("docs")
    ).collect()[0]
    packed = Q["pack_bpe_sequences"].builder(spark, sf_dir).collect()
    assert sum(r.seq_tokens for r in packed) == tot.toks
    assert sum(r.n_docs for r in packed) == tot.docs
    assert [r.seq_id for r in packed] == list(range(len(packed)))
    # every sequence but the last crosses the boundary: its cumulative
    # end lies past its seq window start + MAX_SEQ_TOKENS only via the
    # final doc, i.e. dropping the last doc's tokens leaves < MAX
    max_doc = enc.agg(F.max("n_bpe_tokens")).collect()[0][0]
    for r in packed[:-1]:
        assert r.seq_tokens + max_doc >= MAX_SEQ_TOKENS


def test_tokenizer_fertility_consistent_with_doc_encoding(spark, sf_dir):
    """The per-source rollup must tie out exactly against the
    registered per-document encoding: summed word/token counts per
    source, fertility = tokens/words at 6 dp, NULL on all-ineligible
    sources, and n_docs covering every non-NULL-id doc."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    Q = all_queries()
    rep = {r.source: r for r in Q["tokenizer_fertility_report"].builder(spark, sf_dir).collect()}
    per_doc = Q["bpe_encode_documents"].builder(spark, sf_dir).collect()
    src = {
        (r.doc_id, r.source)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "source")
        .distinct()
        .collect()
    }
    by_doc = {r.doc_id: r for r in per_doc}
    want = {}
    for doc_id, source in src:
        w = want.setdefault(source, [0, 0, 0])
        w[0] += 1
        w[1] += by_doc[doc_id].n_words
        w[2] += by_doc[doc_id].n_bpe_tokens
    assert set(rep) == set(want)
    for source, (n_docs, n_words, n_tokens) in want.items():
        r = rep[source]
        assert (r.n_docs, r.n_words, r.n_bpe_tokens) == (n_docs, n_words, n_tokens)
        if n_words == 0:
            assert r.fertility is None
        else:
            snapped = float(
                (Decimal(n_tokens) / Decimal(n_words)).quantize(
                    Decimal("0.000001"), ROUND_HALF_UP
                )
            )
            assert r.fertility == snapped
            # every eligible word encodes to >= 1 symbol
            assert r.fertility >= 1.0


def test_embedding_outliers_match_numpy_zscores(spark, sf_dir):
    """Transparent replay: per-label centroids (6-dp snapped means),
    squared distances, sample-std z-scores recomputed in plain Python
    over the raw parquet must reproduce the operator's dist/z/flag."""
    from decimal import ROUND_HALF_UP, Decimal

    def snap(v):
        # mirror the engines exactly: CAST(x AS DECIMAL(30,12)) first
        # (Spark double->decimal == Decimal(repr(x)) quantized 12dp),
        # THEN round to 6 — the two-step snap can differ from a direct
        # 6-dp quantize on .5-boundary values
        d12 = Decimal(repr(v)).quantize(Decimal(1).scaleb(-12), ROUND_HALF_UP)
        return float(d12.quantize(Decimal(1).scaleb(-6), ROUND_HALF_UP))

    Q = all_queries()
    rows = Q["embedding_outlier_report"].builder(spark, sf_dir).collect()
    raw = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("label").isNotNull() & F.col("embedding").isNotNull())
        .collect()
    )
    by_label = {}
    for r in raw:
        by_label.setdefault(r.label, []).append((r.vec_id, [float(x) for x in r.embedding]))
    got = {r.vec_id: r for r in rows}
    n_checked = 0
    for label, vecs in by_label.items():
        dim = max(len(v) for _i, v in vecs)
        cents = []
        for d in range(dim):
            xs = [v[d] for _i, v in vecs if d < len(v)]
            # exact decimal mean, snapped — mirrors the operator
            # each element is quantized to 6 dp by the money-DEC
            # (decimal(30,6)) cast BEFORE the sum; then decimal sum ->
            # DOUBLE, then double division — the engines' exact order
            q6 = lambda v: Decimal(repr(v)).quantize(
                Decimal(1).scaleb(-6), ROUND_HALF_UP
            )
            tot = sum(q6(x) for x in xs)
            cents.append(snap(float(tot) / len(xs)))
        dists = {}
        for vid, v in vecs:
            d = 0.0
            for a, c in zip(v, cents):
                d = d + (a - c) * (a - c)
            dists[vid] = d
        n = len(dists)
        q12 = lambda v: Decimal(repr(v)).quantize(
            Decimal(1).scaleb(-12), ROUND_HALF_UP
        )
        sd = float(sum(q12(x) for x in dists.values()))
        sdd = float(sum(q12(x * x) for x in dists.values()))
        mean = sd / n
        var = (sdd - sd * sd / n) / (n - 1) if n > 1 else None
        for vid, d in dists.items():
            r = got[vid]
            assert r.dist == snap(d), (vid, r.dist, d)
            if var is None or var < 0 or var == 0:
                assert r.z is None and r.is_outlier is None
            else:
                z = snap((d - mean) / (var ** 0.5))
                assert r.z == z, (vid, r.z, z)
                assert r.is_outlier == (z > 2.0)
            n_checked += 1
    assert n_checked == len(rows)
