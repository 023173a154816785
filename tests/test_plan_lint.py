"""Plan lint over the whole registry: every query's physical plan must
be free of the two classic scale killers —

* ``CartesianProduct`` (an unconstrained cross join executes |L|×|R|
  comparisons; even the intentional all-pairs dedup ops must go
  through a *broadcast* nested loop with a pruning condition, never a
  partitioned cartesian), and
* ``BatchEvalPython`` (row-at-a-time Python UDFs serialize every row
  through pickle; the engine's rule is JVM expressions or Arrow-batched
  Pandas UDFs only).

Streaming queries are excluded (their builders execute the stream to
materialize a memory sink; plan shape is covered by their own tests).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from multithreaded_mapreduce_spark.plans.registry import all_queries

_QUERIES = all_queries()
_LINTABLE = sorted(
    n for n, q in _QUERIES.items() if "streaming" not in q.tags
)

#: one-row-side cross joins (scalar subquery broadcasts) are fine; the
#: plan shows them as BroadcastNestedLoopJoin, not CartesianProduct
FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", _LINTABLE)
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = _QUERIES[name].builder(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("extended")
    plan = buf.getvalue()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: {bad} in physical plan"


#: expression fragments that mean a tokenize/shingle chain got pushed
#: into the FileScan as an inferred filter. Catalyst's constraint
#: propagation will do this whenever a downstream predicate (join
#: condition, size() filter, inferred isnotnull) is derivable from a
#: projected heavy expression — and the scan of a single-file table is
#: ONE task, so the whole corpus pays the chain serially before any
#: repartition. Cheap scalar pushdowns (comparisons, rlike, xxhash64
#: of a numeric key) are fine and deliberately not flagged.
HEAVY_IN_SCAN = ("split(", "array_distinct(", "transform(", "aggregate(")

#: queries whose scan-side heavy filter is the DESIGN, not an accident:
#: clean_corpus_pipeline showcases the quality gate (>= 10 tokens)
#: pushing into the scan — on real multi-split input that skips
#: materializing failing rows, which is worth recomputing the tokenize
#: chain for; there is no downstream repartition being defeated.
SCAN_PUSHDOWN_INTENDED = frozenset({"clean_corpus_pipeline"})


@pytest.mark.parametrize(
    "name", [n for n in _LINTABLE if n not in SCAN_PUSHDOWN_INTENDED]
)
def test_no_heavy_expression_pushed_into_scan(spark, sf_dir, name):
    plan = (
        _QUERIES[name]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.split("\n"):
        if "FileScan" in line:
            for bad in HEAVY_IN_SCAN:
                assert bad not in line, (
                    f"{name}: heavy expression {bad!r} pushed into FileScan — "
                    "filter on the raw column instead (see dedup_jaccard_pairs)"
                )


#: column-name prefixes identifying the bounded dimension tables — a
#: global rank over one of these is inherently |dim| rows, fine forever
_DIM_PREFIXES = ("s_", "n_", "r_")

#: logical nodes that provably bound their output cardinality
_BOUNDING_NODES = ("Aggregate ", "GlobalLimit", "LocalLimit", "Deduplicate")


def _global_windows(jplan):
    """Yield logical Window nodes whose partition spec is empty or all
    foldable literals (``partitionBy(lit(0))`` is as global as none)."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
        if node.nodeName() != "Window":
            continue
        ps = node.partitionSpec()
        if ps.size() == 0 or all(
            ps.apply(i).foldable() for i in range(ps.size())
        ):
            yield node


@pytest.mark.parametrize("name", _LINTABLE)
def test_global_windows_have_bounded_input(spark, sf_dir, name):
    """A window with no (or a constant) partition spec executes in ONE
    task over its whole input — the classic fact-table scale killer.
    Every such window in the catalog must consume a provably bounded
    relation: an aggregate (|groups| rows), a limit (top-K), a
    deduplicate, or a dimension-table scan. A global window whose
    subtree shows none of these fails CI (VERDICT r3 task 8; the
    WindowExec 'No Partition Defined' audit, SCALE.md)."""
    df = _QUERIES[name].builder(spark, sf_dir)
    jplan = df._jdf.queryExecution().optimizedPlan()
    import re

    for w in _global_windows(jplan):
        sub = w.child().toString()
        if any(tag in sub for tag in _BOUNDING_NODES):
            continue
        rel_cols = re.findall(r"Relation \[([^\],#]+)", sub)
        assert rel_cols and all(
            c.startswith(_DIM_PREFIXES) for c in rel_cols
        ), (
            f"{name}: partition-less window over an unbounded relation —\n"
            f"input subtree:\n{sub[:2000]}"
        )


def test_global_window_lint_detects_violations(spark, sf_dir):
    """Negative control: the detector must flag a fact-table global
    window (empty partition spec) and classify a lit(0) partition spec
    as global too — otherwise the catalog-wide lint proves nothing."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    bad = li.withColumn("rn", F.row_number().over(W.orderBy("l_orderkey")))
    gw = list(_global_windows(bad._jdf.queryExecution().optimizedPlan()))
    assert len(gw) == 1
    sub = gw[0].child().toString()
    assert not any(tag in sub for tag in _BOUNDING_NODES)

    lit0 = li.withColumn(
        "rn", F.row_number().over(W.partitionBy(F.lit(0)).orderBy("l_orderkey"))
    )
    assert len(list(_global_windows(lit0._jdf.queryExecution().optimizedPlan()))) == 1

    keyed = li.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("l_returnflag").orderBy("l_orderkey")),
    )
    assert not list(_global_windows(keyed._jdf.queryExecution().optimizedPlan()))


def test_shared_relations_are_cached_or_single_pass(spark, sf_dir):
    """Regression guard for the branch-recomputation pathology
    (scripts/plan_audit.py): queries whose shared derived relation is
    consumed by several branches must either persist it (the branches
    show InMemoryTableScan) or be written as one pass. The funnel
    planned 24 parquet scans before its one-pass rewrite; triangles,
    PMI, and basket lift re-derived their edge/token/basket relations
    per branch before their persists."""
    from multithreaded_mapreduce_spark.plans.registry import all_queries

    qs = all_queries()

    def counts(name):
        df = qs[name].builder(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        return plan.count("FileScan"), plan.count("InMemoryTableScan")

    scans, cache = counts("funnel_view_click_purchase")
    assert scans <= 2 and cache == 0, (scans, cache)  # one-pass, no persist needed
    for name in (
        "token_triangle_counts",
        "token_cooccurrence_pmi",
        "brand_basket_lift",
    ):
        scans, cache = counts(name)
        assert cache >= 2, f"{name}: shared relation no longer persisted"


#: queries whose projections contain the 37-char entropy counts — the
#: expression-blowup regression guard below pins them
_ENTROPY_STAGED = (
    "doc_quality_composite",
    "pretraining_funnel_report",
    "char_entropy_quality",
)


@pytest.mark.parametrize("name", _ENTROPY_STAGED)
def test_entropy_counts_stay_staged(spark, sf_dir, name):
    """Regression guard for the r5 janino blowup: each of the 37
    length-after-replace counts must appear in the optimized plan a
    BOUNDED number of times. Inlined (pre-r5), every entropy term
    re-embedded all 37 replaces (~1.4k copies) — the generated method
    blew janino's 64KB limit, whole-stage codegen fell back to
    interpreted eval, and the scan re-computed subexpressions per row
    (7.0 s → 0.4 s measured at sf0.1 after staging). Staged columns are
    attributes, which CollapseProject must not re-inline into non-cheap
    consumers; if a future refactor collapses them again, this count
    explodes and the lint fires."""
    if name == "doc_quality_composite":
        # r11: the registered builder returns a read of the memoized
        # gates CHECKPOINT (zero replaces by construction) — the staging
        # guard must lint the underlying gates BUILD plan instead
        from multithreaded_mapreduce_spark.operators.quality_repetition import (
            _quality_gates_build,
        )

        df = _quality_gates_build(spark, sf_dir)
    else:
        df = _QUERIES[name].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n = plan.count("replace(")
    # staged plans measure 23-161 occurrences (plan printing truncates
    # long field lists, and persisted subtrees print more than once);
    # the re-inlined blowup measures 2911 — the bound sits an order of
    # magnitude below it
    assert 0 < n <= 400, (
        f"{name}: {n} replace( occurrences in the optimized plan — "
        "entropy counts look re-inlined (janino/codegen regression)"
    )


#: 0.75 × spark.sql.codegen.hugeMethodLimit (65535): methods past the
#: limit silently fall back to interpreted evaluation per subtree —
#: the r5 janino regression cost 3× before anything visibly failed.
#: The lint bound sits below the cliff so drift fails CI first.
_CODEGEN_METHOD_BOUND = 49152


def _codegen_stats(df):
    """(n_subtrees, max maxMethodCodeSize) of the EXECUTED plan — the
    collect finalizes AQE so codegenString sees the real stages."""
    import re as _re

    df.collect()
    spark = df.sparkSession
    mod = getattr(
        spark._jvm.org.apache.spark.sql.execution.debug, "package$"
    ).__getattr__("MODULE$")
    s = mod.codegenString(df._jdf.queryExecution().executedPlan())
    n = int(_re.search(r"Found (\d+) WholeStageCodegen", s).group(1))
    sizes = [int(x) for x in _re.findall(r"maxMethodCodeSize:(\d+)", s)]
    return n, (max(sizes) if sizes else 0)


@pytest.mark.parametrize("name", _ENTROPY_STAGED)
def test_staged_plans_stay_within_codegen_budget(spark, sf_dir, name):
    """VERDICT r5 task 6: the funnel/composite/entropy physical plans
    must keep WholeStageCodegen spans AND keep every generated method
    comfortably under janino's fallback limit — the bytecode-size twin
    of the replace( -count lint above (which bounds the expression
    TREE; this bounds what it compiles to)."""
    n, mx = _codegen_stats(_QUERIES[name].builder(spark, sf_dir))
    assert n >= 1, f"{name}: no WholeStageCodegen subtree in the executed plan"
    assert 0 < mx <= _CODEGEN_METHOD_BOUND, (
        f"{name}: max generated method {mx} B exceeds the lint bound "
        f"{_CODEGEN_METHOD_BOUND} — giant-tree inlining regression"
    )


def test_codegen_budget_lint_detects_blowup(spark):
    """Negative control: the pre-staging build shape — one long
    replace chain re-embedded into every output column (what
    CollapseProject produced before r5 staged the entropy counts) —
    must blow past the lint bound, proving the metric fires."""
    from pyspark.sql import functions as F

    c = F.col("id").cast("string")
    for i in range(150):
        c = F.regexp_replace(c, f"x{i}", f"y{i}")
    big = spark.range(10).select(
        *[(F.length(c) + F.lit(j)).alias(f"c{j}") for j in range(80)]
    )
    n, mx = _codegen_stats(big)
    assert n >= 1
    assert mx > _CODEGEN_METHOD_BOUND, (
        f"negative control only reached {mx} B — lint would not fire"
    )


# --------------------------------------------------------------------------
# Output-schema lint: no complex-typed columns in a final result
# --------------------------------------------------------------------------

#: VERDICT r6 task 2: the driver's result canonicalizer sorts result
#: frames through pandas, and pandas cannot hash list/dict cells — a
#: query whose FINAL schema carries ArrayType/MapType/StructType ends
#: the driver check in ``err`` instead of a verdict (the r6
#: ``embedding_standardize`` crash: its raw ``array<double>`` zvec was
#: the only such column in the whole registry). Complex types are fine
#: INSIDE a plan; the lint bans them only from the output schema of
#: oracle-bearing queries. Rows-only queries are exempt (the driver
#: only counts their rows), and streaming builders are excluded here
#: as in the other lints (their schemas are asserted by their own
#: tests and their oracle-bearing twins are already driver-green with
#: scalar schemas).
_COMPLEX = ("ArrayType", "MapType", "StructType")

_ORACLE_LINTABLE = sorted(
    n
    for n, q in _QUERIES.items()
    if q.oracle is not None and "streaming" not in q.tags
)


def _complex_columns(schema) -> list[str]:
    return [
        f.name
        for f in schema.fields
        if type(f.dataType).__name__ in _COMPLEX
    ]


@pytest.mark.parametrize("name", _ORACLE_LINTABLE)
def test_final_schema_is_scalar(spark, sf_dir, name):
    bad = _complex_columns(_QUERIES[name].builder(spark, sf_dir).schema)
    assert not bad, (
        f"{name}: complex-typed output column(s) {bad} — the driver's "
        "pandas canonicalizer cannot hash list/dict cells (r6 "
        "embedding_standardize err). Serialize through array_join/"
        "to_json/md5 or explode to scalar rows before returning."
    )


def test_scalar_schema_lint_detects_arrays(spark):
    """Negative control: embedding_standardize's PRE-fix output shape
    (collect_list reassembled into a raw array<double> column) must be
    flagged, proving the lint fires on the exact schema that crashed
    the r6 driver comparator."""
    from pyspark.sql import functions as F

    prefix = (
        spark.range(8)
        .select(
            (F.col("id") % 2).alias("vec_id"),
            F.col("id").cast("double").alias("z"),
            F.col("id").alias("dim"),
        )
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "z"))),
                lambda s: s["z"],
            ).alias("zvec")
        )
    )
    assert _complex_columns(prefix.schema) == ["zvec"]
