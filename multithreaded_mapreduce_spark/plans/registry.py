"""Query registry: every public operator of the engine is a named
builder ``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible,
a DuckDB oracle string the driver can run side-by-side.

This is the engine's "catalog of plans" — the analogue of the
reference's single compiled-in query (reference ``1.cpp`` whole file),
widened to the full extension surface in SURVEY.md §2.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB ANSI SQL, or None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, QueryDef] = {}

#: operator modules registering queries at import time
_MODULES = (
    "multithreaded_mapreduce_spark.operators.wordcount",
    "multithreaded_mapreduce_spark.operators.relational",
    "multithreaded_mapreduce_spark.operators.windows",
    "multithreaded_mapreduce_spark.operators.setops",
    "multithreaded_mapreduce_spark.operators.scalar_fns",
    "multithreaded_mapreduce_spark.operators.event_windows",
    "multithreaded_mapreduce_spark.operators.dedup",
    "multithreaded_mapreduce_spark.operators.similarity",
    "multithreaded_mapreduce_spark.operators.textstats",
    "multithreaded_mapreduce_spark.operators.streaming_queries",
    "multithreaded_mapreduce_spark.operators.multimodal_queries",
    "multithreaded_mapreduce_spark.operators.bucketing",
    "multithreaded_mapreduce_spark.operators.skew",
    "multithreaded_mapreduce_spark.operators.sql_frontend",
    "multithreaded_mapreduce_spark.operators.advanced_aggs",
    "multithreaded_mapreduce_spark.operators.asof",
    "multithreaded_mapreduce_spark.operators.rangejoin",
    "multithreaded_mapreduce_spark.operators.sampling",
    "multithreaded_mapreduce_spark.operators.freq",
    "multithreaded_mapreduce_spark.operators.tpch_extra",
    "multithreaded_mapreduce_spark.operators.tpch_full",
    "multithreaded_mapreduce_spark.operators.broadcast_udf",
    "multithreaded_mapreduce_spark.operators.timeseries",
    "multithreaded_mapreduce_spark.operators.subqueries",
    "multithreaded_mapreduce_spark.operators.stats",
    "multithreaded_mapreduce_spark.operators.funnel",
    "multithreaded_mapreduce_spark.operators.reshape",
    "multithreaded_mapreduce_spark.operators.tfidf",
    "multithreaded_mapreduce_spark.operators.format_sources",
    "multithreaded_mapreduce_spark.operators.anomaly",
    "multithreaded_mapreduce_spark.operators.cooccur",
    "multithreaded_mapreduce_spark.operators.vectors",
    "multithreaded_mapreduce_spark.operators.graph",
    "multithreaded_mapreduce_spark.operators.sequences",
    "multithreaded_mapreduce_spark.operators.fuzzy",
    "multithreaded_mapreduce_spark.operators.schema_evolution",
    "multithreaded_mapreduce_spark.operators.pipeline_prep",
    "multithreaded_mapreduce_spark.operators.quality_repetition",
    "multithreaded_mapreduce_spark.operators.sketches",
    "multithreaded_mapreduce_spark.operators.tpch_bridge",
    "multithreaded_mapreduce_spark.operators.corpus_ops",
    "multithreaded_mapreduce_spark.operators.audit",
    "multithreaded_mapreduce_spark.operators.analytics_extra",
)


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, description, tags)
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Operator modules land incrementally; a missing module is
            # fine as long as its queries aren't claimed yet.
            if e.name and e.name.startswith("multithreaded_mapreduce_spark"):
                continue
            raise


def all_queries() -> dict[str, QueryDef]:
    _load()
    return dict(_REGISTRY)


def get_query(name: str) -> QueryDef:
    _load()
    return _REGISTRY[name]
