"""multithreaded_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``AyaanKhan0111/Multithreaded-MapReduce`` (a multithreaded
C++ word-count MapReduce; see SURVEY.md), re-expressed Spark-first:

* the reference's single compiled-in query (whitespace-tokenize ->
  clean ``[^0-9A-Za-z]`` -> lowercase -> count per word -> binary-ascending
  sort; reference ``1.cpp:60-68``, ``1.cpp:239-264``, ``1.cpp:316-327``)
  becomes a declarative DataFrame pipeline (``operators.wordcount``);
* the extension surface a large-scale training-data pipeline needs —
  relational OLAP, windows, dedup, similarity search, text analysis,
  multimodal plumbing, streaming — is built on DataFrame/SQL so Catalyst
  and Tungsten pick the physical strategy.

Every public query is registered in ``plans.registry`` as a
``(spark, sf_dir) -> DataFrame`` builder with (where SQL-expressible) a
DuckDB oracle for correctness checking.
"""

__version__ = "0.1.0"
