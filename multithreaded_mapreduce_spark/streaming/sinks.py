"""Streaming file sink: checkpointed, append-mode parquet output — the
production path (the memory sink in ``events.py`` exists for tests and
the driver harness).

Exactly-once: the parquet sink pairs a write-ahead commit log under
``checkpointLocation`` with the file manifest, so a restarted query
resumes from committed offsets and never double-writes a batch — the
test restarts the same stream on the same checkpoint and asserts the
sink is unchanged. At cluster scale this is how a streaming job feeds
a downstream table: atomic per-batch manifests, partition directories,
and a reader that only sees committed files.

Append mode + watermark means a windowed aggregate emits a window only
once its watermark has passed — late-closing state never rewrites
published files (the memory-sink twins use complete/update mode and
re-emit instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    *,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Drain all available input of ``stream_df`` into a checkpointed
    append-mode parquet sink at ``path``."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
